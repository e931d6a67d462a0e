"""Stage-2 -> Stage-3 integration: the full training handoff on a toy scene.

Covers the reference's checkpoint transition contract
(`lab4d/engine/trainer.py:371-422`): Stage-2 trains and exports mesh +
vertex colors/features; Stage-3 initializes surfels on that mesh, imports
the warp/camera/intrinsics weights, trains, and renders.
"""

import os

import numpy as np
import pytest

from tests.helpers import make_fake_db


@pytest.mark.slow
def test_stage2_to_stage3_handoff(tmp_path):
    import jax
    import jax.numpy as jnp

    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    logroot = os.path.join(str(tmp_path), "logdir")
    common = {
        "dataroot": db, "seqname": "toy", "logroot": logroot,
        "data_prefix": "crop", "train_res": 16,
    }

    # ---- stage 2 --------------------------------------------------------
    from vidu4d_tpu.engine.trainer import Stage2Trainer

    s2 = Stage2Trainer({
        **common, "logname": "s2", "pixels_per_image": 4, "imgs_per_gpu": 2,
        "num_rounds": 1, "iters_per_round": 2, "save_freq": 1,
        "fg_motion": "bob", "field_depth": 2, "field_width": 32,
        "train_depth_samples": 8,
    })
    s2.mlp_init(sdf_iters=30, verbose=False)
    s2.train()
    mesh_path = os.path.join(s2.save_dir, "000-fg-geo.obj")
    ckpt_path = os.path.join(s2.save_dir, "ckpt_latest.pth")
    assert os.path.exists(mesh_path) and os.path.exists(ckpt_path)
    assert os.path.exists(mesh_path.replace(".obj", "-colors.npy"))

    # ---- stage 3 --------------------------------------------------------
    from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

    s3 = Stage3Trainer({
        **common, "logname": "s3", "pixels_per_image": -1, "imgs_per_gpu": 1,
        "num_rounds": 1, "iters_per_round": 2, "save_freq": 1,
        "fg_motion": "gs-bob", "gs_capacity": 256, "gs_init_samples": 128,
        "sh_degree": 1, "raster_budget": 64, "raster_tile_chunk": 1,
        "gs_init_mesh": mesh_path,
        "densify_from_iter": 1000, "outlier_filtering_interval": 1000,
    })
    # surfels initialized on the stage-2 mesh with transferred features
    assert int(s3.surfels.num_alive()) == 128
    assert s3.surfels.params.regist_feat.shape[-1] == 16

    # warp transfer: params must match the stage-2 subtree exactly
    warp_before = jax.tree.leaves(s3.params["params"]["warp"])
    s3.load_stage2(ckpt_path)
    import pickle
    with open(ckpt_path, "rb") as f:
        s2_payload = pickle.load(f)
    src = s2_payload["params"]["params"]["fields_fg"]["warp"]
    dst = s3.params["params"]["warp"]
    flat_src = {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_flatten_with_path(src)[0]}
    flat_dst = {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_flatten_with_path(dst)[0]}
    assert set(flat_src) == set(flat_dst)
    for k in flat_src:
        np.testing.assert_array_equal(
            np.asarray(flat_src[k]), np.asarray(flat_dst[k]), err_msg=k
        )

    s3.train()
    assert s3.current_steps == 2

    # ---- render ---------------------------------------------------------
    from vidu4d_tpu.utils.camera_trajectories import construct_batch, get_rotating_cam

    cams = get_rotating_cam(2, distance=0.4, max_angle=90)
    batch = construct_batch(
        inst_id=0, frameid_sub=np.array([0, 1]), eval_res=16,
        field2cam=cams, camera_int=np.tile([16.0, 16, 8, 8], (2, 1)),
        crop2raw=None,
    )
    out = s3.render_batch(batch, res=16)
    assert out["rendered"].shape == (2, 16, 16, 3)
    for k, v in out.items():
        assert np.isfinite(v).all(), k
