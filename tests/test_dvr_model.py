"""Composed Stage-2 model test: full loss dict forward + gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.engine.model import DvrModel
from vidu4d_tpu.engine.schedules import progress_schedule, interp_wt
from vidu4d_tpu.models.fields.dyn_nerf import FieldState

FI = FrameInfo.single_video(8)

CONFIG = {
    "field_type": "fg",
    "fg_motion": "bob",
    "train_res": 32,
    "mask_wt": 0.1, "rgb_wt": 0.1, "depth_wt": 1e-4, "flow_wt": 0.5,
    "vis_wt": 1e-2, "feature_wt": 1e-2, "feat_reproj_wt": 5e-2,
    "reg_visibility_wt": 1e-4, "reg_eikonal_wt": 1e-3,
    "reg_deform_cyc_wt": 0.01, "reg_delta_skin_wt": 5e-3,
    "reg_skin_entropy_wt": 5e-4, "reg_gauss_skin_wt": 1e-3,
    "reg_cam_prior_wt": 0.1, "reg_skel_prior_wt": 0.1,
    "reg_gauss_mask_wt": 0.01, "reg_soft_deform_wt": 100.0,
    "lambda_normal": 0.05, "lambda_dist": 0.0,
}


def make_batch(rng, M=2, N=12):
    return {
        "rgb": jnp.array(rng.uniform(size=(M, N, 3)), jnp.float32),
        "mask": jnp.array(rng.uniform(size=(M, N, 1)) > 0.4, jnp.float32),
        "depth": jnp.array(rng.uniform(1, 3, size=(M, N, 1)), jnp.float32),
        "flow": jnp.array(rng.normal(size=(M, N, 2)), jnp.float32),
        "flow_uct": jnp.array(rng.uniform(size=(M, N, 1)), jnp.float32),
        "vis2d": jnp.ones((M, N, 1), jnp.float32),
        "crop2raw": jnp.tile(jnp.array([[1.0, 1.0, 0.0, 0.0]]), (M, 1)),
        "dataid": jnp.zeros((M,), jnp.int32),
        "frameid_sub": jnp.array([0, 1]),
        "frameid": jnp.array([0, 1]),
        "is_detected": jnp.ones((M,), jnp.float32),
        "hxy": jnp.array(
            np.concatenate(
                [rng.uniform(0, 32, (M, N, 2)), np.ones((M, N, 1))], axis=-1
            ),
            jnp.float32,
        ),
        "feature": jnp.array(rng.normal(size=(M, N, 16)), jnp.float32),
    }


def test_interp_wt():
    assert interp_wt((0, 100), (1.0, 0.0), 0) == 1.0
    assert interp_wt((0, 100), (1.0, 0.0), 200) == 0.0
    assert abs(interp_wt((0, 100), (1.0, 0.0), 50) - 0.5) < 1e-6
    assert abs(interp_wt((0, 4000), (1.0, 100.0), 2000, type="log") - 10.0) < 1e-4


def test_progress_schedule():
    w0 = progress_schedule(CONFIG, 0)
    assert w0["alpha"] == 0.6
    assert w0["beta_prob"] == 1.0
    assert w0["lambda_normal"] == 0.0
    w1 = progress_schedule(CONFIG, 10_000)
    assert w1["alpha"] == 1.0
    assert abs(w1["beta_prob"] - 0.2) < 1e-6
    assert w1["lambda_normal"] == 0.05
    assert w1["reg_eikonal_wt"] == CONFIG["reg_eikonal_wt"] * 100


@pytest.mark.slow
def test_dvr_model_loss_and_grads():
    rng = np.random.default_rng(0)
    intr = np.tile(np.array([[40.0, 40.0, 16.0, 16.0]], np.float32), (8, 1))
    rt = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    rt[:, 2, 3] = 3.0

    model = DvrModel(
        frame_info=FI,
        fg_motion="bob",
        intrinsics_prior=tuple(map(tuple, intr)),
        rtmat_prior=tuple(map(tuple, rt.reshape(8, -1))),
        train_res=32,
        train_depth_samples=8,
        field_depth=2,
        field_width=32,
    )
    batch = make_batch(rng)
    states = {"fg": FieldState.initial(FI.num_frames_raw)}
    weights = progress_schedule(CONFIG, 100)

    def loss_fn(params):
        loss_dict, _ = model.apply(
            params, batch, states, CONFIG, weights, jax.random.PRNGKey(1),
            method=model.loss,
        )
        return sum(jax.tree.leaves(loss_dict)), loss_dict

    params = model.init(
        jax.random.PRNGKey(0), batch, states, CONFIG, weights,
        jax.random.PRNGKey(1), method=model.loss,
    )
    (total, loss_dict), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)

    expected_keys = {
        "mask", "rgb", "depth", "flow", "vis", "feature", "feat_reproj",
        "reg_gauss_mask", "reg_visibility", "reg_eikonal", "reg_deform_cyc",
        "reg_delta_skin", "reg_skin_entropy", "reg_gauss_skin", "reg_cam_prior",
    }
    assert expected_keys <= set(loss_dict.keys()), sorted(loss_dict)
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), k
    assert np.isfinite(float(total))

    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # something substantive got gradients
    gnorm = sum(float(jnp.sum(g**2)) for g in flat)
    assert gnorm > 0
