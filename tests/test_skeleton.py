"""Skeleton articulation tests: FK correctness + skeleton warp integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.skeleton import (
    ArticulationSkelMLP,
    fk_se3,
    get_predefined_skeleton,
    rest_joints_to_local,
    shift_joints_to_bones,
)
from vidu4d_tpu.models.fields.warping import SkinningWarp
from vidu4d_tpu.ops.quaternion import dual_quaternion_to_quaternion_translation

FI = FrameInfo.single_video(6)


def test_predefined_skeletons():
    for skel, nbones in (("human", 18), ("quad", 25)):
        rest, edges, symm = get_predefined_skeleton(skel)
        assert rest.shape == (nbones, 3)
        assert len(symm) == nbones
        # symmetry is an involution
        assert all(symm[symm[i]] == i for i in range(nbones))
        # edges are topologically ordered (parents appear before children)
        seen = set()
        for child, parent in edges.items():
            if parent > 0:
                assert parent in seen, (child, parent)
            seen.add(child)


def test_fk_identity_recovers_rest_joints():
    rest, edges, _ = get_predefined_skeleton("quad")
    rest = jnp.asarray(rest)
    local = rest_joints_to_local(rest, edges)
    so3 = jnp.zeros((25, 3))
    rt = fk_se3(local, so3, edges, to_dq=False)
    np.testing.assert_allclose(np.asarray(rt[:, :3, 3]), np.asarray(rest), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rt[:, :3, :3]), np.tile(np.eye(3), (25, 1, 1)), atol=1e-6
    )


def test_fk_rotating_root_moves_children():
    rest, edges, _ = get_predefined_skeleton("human")
    rest = jnp.asarray(rest)
    local = rest_joints_to_local(rest, edges)
    so3 = jnp.zeros((18, 3)).at[0, 2].set(np.pi / 2)  # rotate spine-1 90° in z
    dq = fk_se3(local, so3, edges)
    _, joints = dual_quaternion_to_quaternion_translation(dq)
    joints = np.asarray(joints)
    # the head (joint 4, child chain of spine-1) moved; legs (13..) did not
    rest_np = np.asarray(rest)
    assert np.linalg.norm(joints[3] - rest_np[3]) > 1e-3
    np.testing.assert_allclose(joints[12], rest_np[12], atol=1e-5)


def test_shift_joints_to_bones():
    rest, edges, _ = get_predefined_skeleton("quad")
    out = shift_joints_to_bones(jnp.asarray(rest), edges)
    assert out.shape == rest.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_skeleton_articulation_and_warp():
    model = ArticulationSkelMLP(frame_info=FI, skel_type="quad", width=32, depth=2)
    params = model.init(jax.random.PRNGKey(0), jnp.arange(4))
    dq = model.apply(params, jnp.arange(4))
    assert dq[0].shape == (4, 25, 4)
    t_art, rest = model.apply(params, jnp.arange(4), method=model.vals_and_mean)
    assert rest[0].shape == (4, 25, 4)
    prior = model.apply(params, method=model.skel_prior_loss)
    assert np.isfinite(float(prior))

    # so3 override (reanimation path)
    so3 = jnp.zeros((4, 25, 3))
    dq2 = model.apply(params, jnp.arange(4), so3)
    assert np.isfinite(np.asarray(dq2[0])).all()

    # full skeleton warp cycles
    warp = SkinningWarp(frame_info=FI, skel_type="quad")
    xyz = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 2, 3)) * 0.05, jnp.float32
    )
    fid = jnp.array([0, 1])
    iid = jnp.array([0, 0])
    wparams = warp.init(jax.random.PRNGKey(0), xyz, fid, iid)
    fwd, aux = warp.apply(wparams, xyz, fid, iid, backward=False)
    assert fwd.shape == xyz.shape
    assert "skin_entropy" in aux
    back, _ = warp.apply(wparams, fwd, fid, iid, backward=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyz), atol=0.05)


def test_get_bone_coords_matches_dq_apply():
    """Einsum bone-coord form == per-point dual-quaternion apply (r2 perf
    rewrite; `transforms.py:9-25` semantics)."""
    import jax.numpy as jnp

    from vidu4d_tpu.models.fields.skinning import get_bone_coords
    from vidu4d_tpu.ops.quaternion import (
        dual_quaternion_apply,
        dual_quaternion_inverse,
        quaternion_translation_to_dual_quaternion,
    )

    rng = np.random.default_rng(5)
    m, n, d, b = 2, 17, 3, 6
    q = rng.normal(size=(m, 1, 1, b, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(m, 1, 1, b, 3)).astype(np.float32)
    bone2obj = quaternion_translation_to_dual_quaternion(
        jnp.asarray(q), jnp.asarray(t)
    )
    xyz = jnp.asarray(rng.normal(size=(m, n, d, 3)).astype(np.float32))

    got = get_bone_coords(xyz, bone2obj)

    obj2bone = dual_quaternion_inverse(bone2obj)
    xyz_e = jnp.broadcast_to(xyz[..., None, :], (m, n, d, b, 3))
    want = dual_quaternion_apply(obj2bone, xyz_e)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )
