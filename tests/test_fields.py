"""Stage-2 field stack tests: embeddings, time MLPs, warps, DynNeRF query."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.articulation import ArticulationFlatMLP
from vidu4d_tpu.models.fields.dyn_nerf import DynNeRF, FieldState, flip_pair
from vidu4d_tpu.models.fields.embeddings import pos_embed
from vidu4d_tpu.models.fields.time_mlp import (
    CameraMLP,
    IntrinsicsMLP,
    camera_prior_loss,
    fit_to_prior,
    init_camera_base_params,
    init_intrinsics_base_params,
    intrinsics_prior_loss,
)
from vidu4d_tpu.models.fields.warping import SkinningWarp, warp_module
from vidu4d_tpu.ops.quaternion import quaternion_translation_to_se3
from vidu4d_tpu.ops import geometry as geom


FI = FrameInfo.single_video(16)


def test_pos_embed_shapes_and_annealing():
    x = jnp.ones((5, 3))
    out = pos_embed(x, 4)
    assert out.shape == (5, 3 * 9)
    # first channels are x itself
    np.testing.assert_allclose(np.asarray(out[:, :3]), 1.0)
    # alpha=0 kills all bands
    out0 = pos_embed(x, 4, alpha=jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out0[:, 3:]), 0.0, atol=1e-7)
    # alpha=1 equals no annealing
    out1 = pos_embed(x, 4, alpha=jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out), atol=1e-6)
    assert pos_embed(x, -1).shape == (5, 0)
    assert pos_embed(x, 0).shape == (5, 3)


def test_camera_mlp_fit_to_prior():
    rng = np.random.default_rng(0)
    # simple smooth camera trajectory prior
    angles = np.linspace(0, 0.5, 16)
    rt = np.tile(np.eye(4, dtype=np.float32), (16, 1, 1))
    for i, a in enumerate(angles):
        rt[i, :3, :3] = np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]]
        )
        rt[i, :3, 3] = [0.1 * a, 0.0, 3.0 + 0.2 * a]

    model = CameraMLP(frame_info=FI, width=64, depth=2)
    params = model.init(jax.random.PRNGKey(0), jnp.arange(16))
    params = init_camera_base_params(params, rt, FI)

    loss0 = float(camera_prior_loss(model, params, jnp.asarray(rt)))
    params, loss, steps = fit_to_prior(
        lambda p: camera_prior_loss(model, p, jnp.asarray(rt)),
        params, termination_loss=5e-4, max_steps=2000,
    )
    assert float(loss) < 5e-4 or float(loss) < loss0 * 0.01
    quat, trans = model.apply(params, jnp.arange(16))
    pred = quaternion_translation_to_se3(quat, trans)
    np.testing.assert_allclose(np.asarray(pred), rt, atol=0.15)


def test_intrinsics_mlp():
    k_prior = np.tile(np.array([[500.0, 500.0, 128.0, 96.0]], np.float32), (16, 1))
    model = IntrinsicsMLP(frame_info=FI, width=64, depth=2)
    params = model.init(jax.random.PRNGKey(0), jnp.arange(16))
    params = init_intrinsics_base_params(params, k_prior, FI)
    params, loss, _ = fit_to_prior(
        lambda p: intrinsics_prior_loss(model, p, jnp.asarray(k_prior)),
        params, termination_loss=1.0, max_steps=2000,
    )
    out = model.apply(params, jnp.arange(16))
    assert out.shape == (16, 4)
    # square pixels enforced
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]))
    np.testing.assert_allclose(np.asarray(out), k_prior, rtol=0.05)


def test_articulation_shapes():
    model = ArticulationFlatMLP(frame_info=FI, num_se3=5, width=32, depth=2)
    params = model.init(jax.random.PRNGKey(0), jnp.arange(4))
    dq = model.apply(params, jnp.arange(4))
    assert dq[0].shape == (4, 5, 4) and dq[1].shape == (4, 5, 4)
    t_art, rest = model.apply(params, jnp.arange(4), method=model.vals_and_mean)
    assert rest[0].shape == (4, 5, 4)
    # rest articulation is frame-independent
    np.testing.assert_allclose(np.asarray(rest[0][0]), np.asarray(rest[0][1]))


def test_skinning_warp_cycle():
    warp = SkinningWarp(frame_info=FI, num_se3=5)
    xyz = jnp.array(np.random.default_rng(1).normal(size=(2, 3, 4, 3)) * 0.1,
                    jnp.float32)
    frame_id = jnp.array([3, 7])
    inst_id = jnp.array([0, 0])
    params = warp.init(jax.random.PRNGKey(0), xyz, frame_id, inst_id)

    fwd, aux = warp.apply(params, xyz, frame_id, inst_id, backward=False)
    assert fwd.shape == xyz.shape
    assert "skin_entropy" in aux and "delta_skin" in aux
    back, _ = warp.apply(params, fwd, frame_id, inst_id, backward=True)
    # at init, articulations are near identity -> cycle should be tight
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyz), atol=0.02)

    (q, t), _ = warp.apply(params, xyz, frame_id, inst_id, return_qt=True)
    assert q.shape == xyz.shape[:-1] + (4,)
    assert t.shape == xyz.shape


def test_flip_pair():
    x = jnp.arange(8).reshape(4, 2)
    y = np.asarray(flip_pair(x))
    np.testing.assert_array_equal(y[0], [2, 3])
    np.testing.assert_array_equal(y[1], [0, 1])


@pytest.mark.slow
def test_dyn_nerf_query_field():
    model = DynNeRF(
        frame_info=FI, fg_motion="bob", width=32, depth=2,
        train_depth_samples=8, eval_depth_samples=8, feature_channels=4,
        appr_channels=8,
    )
    M, N = 2, 6
    state = FieldState.initial(FI.num_frames_raw)
    batch = {
        "frameid": jnp.array([0, 1]),
        "dataid": jnp.array([0, 0]),
        "hxy": jnp.array(
            np.concatenate(
                [np.random.default_rng(2).uniform(0, 64, (M, N, 2)),
                 np.ones((M, N, 1))], axis=-1
            ), jnp.float32),
        "feature": jnp.array(
            np.random.default_rng(3).normal(size=(M, N, 4)), jnp.float32),
    }
    Kinv = jnp.tile(
        geom.K2inv(jnp.array([[60.0, 60.0, 32.0, 32.0]])), (M, 1, 1)
    )

    def run(params, train):
        samples = model.apply(params, Kinv, batch, state, method=model.get_samples)
        return model.apply(
            params, samples, state, train=train, method=model.query_field
        )

    # one init covering both get_samples and query_field params
    params = model.init(
        jax.random.PRNGKey(0),
        method=lambda mdl: mdl.query_field(
            mdl.get_samples(Kinv, batch, state), state, train=True
        ),
    )

    feat_dict, deltas, aux_dict = jax.jit(run, static_argnums=1)(params, True)
    D = model.train_depth_samples
    assert feat_dict["rgb"].shape == (M, N, D, 3)
    assert feat_dict["density"].shape == (M, N, D, 1)
    assert feat_dict["flow"].shape == (M, N, D, 3)
    assert feat_dict["cyc_dist"].shape == (M, N, D, 1)
    assert feat_dict["eikonal"].shape == (M, N, D, 1)
    assert feat_dict["gauss_density"].shape == (M, N, D, 1)
    assert aux_dict["xy_reproj"].shape == (M, N, 2)
    for k, v in feat_dict.items():
        assert np.isfinite(np.asarray(v)).all(), k

    # eval path (importance sampling)
    feat_dict, deltas, _ = jax.jit(run, static_argnums=1)(params, False)
    assert feat_dict["rgb"].shape == (M, N, model.eval_depth_samples, 3)
    assert np.isfinite(np.asarray(feat_dict["rgb"])).all()
