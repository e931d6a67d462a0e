"""Core quaternion / dual-quaternion algebra tests.

Golden checks against scipy.spatial.transform.Rotation plus an independent
numpy re-implementation of the reference DQ-skinning semantics
(`lab4d/utils/geom_utils.py:48-92`).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from vidu4d_tpu.ops import quaternion as q


def rand_quat(rng, shape=()):
    v = rng.normal(size=shape + (4,))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quaternion_mul_matches_scipy(rng):
    a = rand_quat(rng, (32,))
    b = rand_quat(rng, (32,))
    got = np.asarray(q.quaternion_mul(jnp.array(a), jnp.array(b)))
    # scipy uses xyzw ordering
    ra = R.from_quat(a[:, [1, 2, 3, 0]])
    rb = R.from_quat(b[:, [1, 2, 3, 0]])
    want_xyzw = (ra * rb).as_quat()
    want = want_xyzw[:, [3, 0, 1, 2]]
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-6)


def test_quaternion_apply_matches_scipy(rng):
    quats = rand_quat(rng, (32,))
    pts = rng.normal(size=(32, 3))
    got = np.asarray(q.quaternion_apply(jnp.array(quats), jnp.array(pts)))
    want = R.from_quat(quats[:, [1, 2, 3, 0]]).apply(pts)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quaternion_matrix_roundtrip(rng):
    quats = rand_quat(rng, (64,))
    mats = np.asarray(q.quaternion_to_matrix(jnp.array(quats)))
    want = R.from_quat(quats[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(mats, want, atol=1e-6)
    back = np.asarray(q.matrix_to_quaternion(jnp.array(mats)))
    sign = np.sign(np.sum(back * quats, axis=-1, keepdims=True))
    np.testing.assert_allclose(back * sign, quats, atol=1e-5)


def test_axis_angle_roundtrip(rng):
    aa = rng.normal(size=(64, 3))
    aa[0] = 0.0  # degenerate: zero rotation
    aa[1] = 1e-8  # near-degenerate
    quats = np.asarray(q.axis_angle_to_quaternion(jnp.array(aa)))
    want = R.from_rotvec(aa).as_quat()[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(quats * want, axis=-1, keepdims=True))
    sign[sign == 0] = 1.0
    np.testing.assert_allclose(quats * sign, want, atol=1e-6)
    back = np.asarray(q.quaternion_to_axis_angle(jnp.array(quats)))
    np.testing.assert_allclose(back, aa, atol=1e-5)


def test_quaternion_translation_compose_inverse(rng):
    q1 = jnp.array(rand_quat(rng, (8,)))
    t1 = jnp.array(rng.normal(size=(8, 3)))
    pts = jnp.array(rng.normal(size=(8, 3)))
    # (q,t) then its inverse should be identity
    qi, ti = q.quaternion_translation_inverse(q1, t1)
    out = q.quaternion_translation_apply(
        qi, ti, q.quaternion_translation_apply(q1, t1, pts)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)
    # composition applies right-to-left
    q2 = jnp.array(rand_quat(rng, (8,)))
    t2 = jnp.array(rng.normal(size=(8, 3)))
    qc, tc = q.quaternion_translation_mul((q1, t1), (q2, t2))
    a = q.quaternion_translation_apply(qc, tc, pts)
    b = q.quaternion_translation_apply(q1, t1, q.quaternion_translation_apply(q2, t2, pts))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dual_quaternion_roundtrip_and_apply(rng):
    quats = jnp.array(rand_quat(rng, (16,)))
    trans = jnp.array(rng.normal(size=(16, 3)))
    dq = q.quaternion_translation_to_dual_quaternion(quats, trans)
    q2, t2 = q.dual_quaternion_to_quaternion_translation(dq)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(quats), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(trans), atol=1e-5)

    pts = jnp.array(rng.normal(size=(16, 3)))
    a = q.dual_quaternion_apply(dq, pts)
    b = q.quaternion_translation_apply(quats, trans, pts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # dq * dq^-1 == identity transform
    dq_inv = q.dual_quaternion_inverse(dq)
    ident = q.dual_quaternion_mul(dq, dq_inv)
    out = q.dual_quaternion_apply(ident, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_se3_roundtrip(rng):
    quats = jnp.array(rand_quat(rng, (8,)))
    trans = jnp.array(rng.normal(size=(8, 3)))
    se3 = q.quaternion_translation_to_se3(quats, trans)
    assert se3.shape == (8, 4, 4)
    np.testing.assert_allclose(np.asarray(se3[:, 3]), np.tile([0, 0, 0, 1.0], (8, 1)))
    q2, t2 = q.se3_to_quaternion_translation(se3)
    sign = jnp.sign(jnp.sum(q2 * quats, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2 * sign), np.asarray(quats), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(trans), atol=1e-5)


def _numpy_dq_skinning(qr_bones, qd_bones, pts, skin):
    """Independent numpy mirror of the reference DQ-skinning semantics."""
    M, B, _ = qr_bones.shape
    N = pts.shape[1]
    out = np.zeros_like(pts)
    for m in range(M):
        for n in range(N):
            anchor = np.argmax(skin[m, n])
            qa = qr_bones[m, anchor]
            qr_w = np.zeros(4)
            qd_w = np.zeros(4)
            for b in range(B):
                sign = 1.0 if np.dot(qa, qr_bones[m, b]) > 0 else -1.0
                qr_w += skin[m, n, b] * sign * qr_bones[m, b]
                qd_w += skin[m, n, b] * sign * qd_bones[m, b]
            mag = np.linalg.norm(qr_w)
            qr_w, qd_w = qr_w / mag, qd_w / mag
            # dq apply
            rot = R.from_quat(qr_w[[1, 2, 3, 0]])
            t_quat = _np_quat_mul(2 * qd_w, np.concatenate([qr_w[:1], -qr_w[1:]]))[1:]
            out[m, n] = rot.apply(pts[m, n]) + t_quat
    return out


def _np_quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def test_dual_quaternion_skinning_matches_reference_semantics(rng):
    M, B, N = 2, 5, 7
    qr = rand_quat(rng, (M, B))
    trans = rng.normal(size=(M, B, 3)) * 0.3
    qr_j = jnp.array(qr)
    dq = q.quaternion_translation_to_dual_quaternion(qr_j, jnp.array(trans))
    pts = rng.normal(size=(M, N, 3))
    skin_logits = rng.normal(size=(M, N, B))
    skin = np.exp(skin_logits) / np.exp(skin_logits).sum(-1, keepdims=True)

    got = np.asarray(
        q.dual_quaternion_skinning(dq, jnp.array(pts), jnp.array(skin))
    )
    want = _numpy_dq_skinning(np.asarray(dq[0]), np.asarray(dq[1]), pts, skin)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dual_quaternion_skinning_return_qt(rng):
    M, B, N = 2, 4, 6
    qr = jnp.array(rand_quat(rng, (M, B)))
    trans = jnp.array(rng.normal(size=(M, B, 3)) * 0.2)
    dq = q.quaternion_translation_to_dual_quaternion(qr, trans)
    pts = jnp.array(rng.normal(size=(M, N, 3)))
    skin_logits = rng.normal(size=(M, N, B))
    skin = jnp.array(np.exp(skin_logits) / np.exp(skin_logits).sum(-1, keepdims=True))

    warped = q.dual_quaternion_skinning(dq, pts, skin)
    qt_q, qt_t = q.dual_quaternion_skinning(dq, pts, skin, return_qt=True)
    via_qt = q.quaternion_translation_apply(qt_q, qt_t, pts)
    np.testing.assert_allclose(np.asarray(via_qt), np.asarray(warped), atol=1e-5)
