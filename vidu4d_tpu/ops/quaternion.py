"""Quaternion / dual-quaternion algebra (pure JAX, fully fused by XLA).

Convention: real part first, ``q = (w, x, y, z)``. A dual quaternion is a pair
``(q_r, q_d)`` of real/dual parts. Semantics match the reference library
(`lab4d/utils/quat_transform.py`, pytorch3d conventions) including its fused
CUDA quaternion extension (`lab4d/third_party/quaternion/`): on TPU a
quaternion product is a handful of VPU FMAs that XLA fuses into neighbouring
ops, so no custom kernel is needed — this module subsumes the CUDA extension.

All functions broadcast over leading dimensions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DualQuaternion = Tuple[jax.Array, jax.Array]
QuaternionTranslation = Tuple[jax.Array, jax.Array]


def quaternion_conjugate(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions)."""
    return jnp.concatenate([q[..., 0:1], -q[..., 1:]], axis=-1)


def standardize_quaternion(q: jax.Array) -> jax.Array:
    """Flip sign so the real part is non-negative."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quaternion_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of two (w, x, y, z) quaternions, broadcasting."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_apply(q: jax.Array, point: jax.Array) -> jax.Array:
    """Rotate 3D points by unit quaternions: ``q * p * q^-1``.

    Uses the expanded 15-mul form rather than two full quaternion products
    (cheaper, and exactly what the reference computes up to fp rounding).
    """
    qw = q[..., 0:1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, point)
    uuv = jnp.cross(qv, uv)
    return point + 2.0 * (qw * uv + uuv)


def quaternion_translation_apply(q: jax.Array, t: jax.Array, point: jax.Array) -> jax.Array:
    return quaternion_apply(q, point) + t


def quaternion_translation_inverse(q: jax.Array, t: jax.Array) -> QuaternionTranslation:
    q_inv = quaternion_conjugate(q)
    return q_inv, quaternion_apply(q_inv, -t)


def quaternion_translation_mul(
    qt1: QuaternionTranslation, qt2: QuaternionTranslation
) -> QuaternionTranslation:
    """Compose SE(3) transforms in (quaternion, translation) form: qt1 ∘ qt2."""
    q1, t1 = qt1
    q2, t2 = qt2
    return quaternion_mul(q1, q2), quaternion_apply(q1, t2) + t1


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle (3,) vectors to quaternions, safe at zero angle."""
    angle_sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle_sq, 1e-24))
    half = 0.5 * angle
    small = angle < 1e-6
    # sin(x/2)/x ≈ 1/2 − x²/48 for small x
    sin_half_over_angle = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / angle)
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    q = standardize_quaternion(q)
    sq_v = jnp.sum(q[..., 1:] ** 2, axis=-1, keepdims=True)
    norm_v = jnp.sqrt(jnp.maximum(sq_v, 1e-24))
    half = jnp.arctan2(norm_v, q[..., 0:1])
    angle = 2.0 * half
    scale = jnp.where(norm_v < 1e-9, 2.0, angle / jnp.maximum(norm_v, 1e-24))
    return q[..., 1:] * scale


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit-ish quaternions to (..., 3, 3) rotation matrices."""
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    # zero subgradient at x<=0 (matches reference _sqrt_positive_part)
    return jnp.where(x > 0, jnp.sqrt(jnp.maximum(x, 1e-24)), jnp.zeros_like(x))


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrices to (w, x, y, z) quaternions.

    Branch-free version of the pytorch3d best-conditioned-candidate algorithm.
    """
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], 0.1))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)
    return jnp.sum(quat_candidates * onehot[..., None], axis=-2)


# ---------------------------------------------------------------------------
# SE(3) <-> (q, t) <-> dual quaternion
# ---------------------------------------------------------------------------


def quaternion_translation_to_se3(q: jax.Array, t: jax.Array) -> jax.Array:
    rmat = quaternion_to_matrix(q)
    top = jnp.concatenate([rmat, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_to_quaternion_translation(se3: jax.Array) -> QuaternionTranslation:
    return matrix_to_quaternion(se3[..., :3, :3]), se3[..., :3, 3]


def quaternion_translation_to_dual_quaternion(q: jax.Array, t: jax.Array) -> DualQuaternion:
    t_quat = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    return q, 0.5 * quaternion_mul(t_quat, q)


def dual_quaternion_to_quaternion_translation(dq: DualQuaternion) -> QuaternionTranslation:
    q_r, q_d = dq
    t = 2.0 * quaternion_mul(q_d, quaternion_conjugate(q_r))[..., 1:]
    return q_r, t


def dual_quaternion_to_se3(dq: DualQuaternion) -> jax.Array:
    q, t = dual_quaternion_to_quaternion_translation(dq)
    return quaternion_translation_to_se3(q, t)


def se3_to_dual_quaternion(se3: jax.Array) -> DualQuaternion:
    q, t = se3_to_quaternion_translation(se3)
    return quaternion_translation_to_dual_quaternion(q, t)


def dual_quaternion_mul(dq1: DualQuaternion, dq2: DualQuaternion) -> DualQuaternion:
    q_r1, q_d1 = dq1
    q_r2, q_d2 = dq2
    r = quaternion_mul(q_r1, q_r2)
    d = quaternion_mul(q_r1, q_d2) + quaternion_mul(q_d1, q_r2)
    return r, d


def dual_quaternion_inverse(dq: DualQuaternion) -> DualQuaternion:
    """Inverse of a *unit* dual quaternion = quaternion conjugate of both parts."""
    return quaternion_conjugate(dq[0]), quaternion_conjugate(dq[1])


def dual_quaternion_apply(dq: DualQuaternion, point: jax.Array) -> jax.Array:
    q, t = dual_quaternion_to_quaternion_translation(dq)
    return quaternion_translation_apply(q, t, point)


def dual_quaternion_normalize(dq: DualQuaternion) -> DualQuaternion:
    q_r, q_d = dq
    inv_mag = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(q_r * q_r, axis=-1, keepdims=True), 1e-24))
    return q_r * inv_mag, q_d * inv_mag


def dual_quaternion_linear_blend(w: jax.Array, dq_basis: DualQuaternion) -> DualQuaternion:
    """Blend per-bone dual quaternions with weights ``w``: (..., N, K) × (..., K, 4)."""
    r = jnp.einsum("...nk,...kd->...nd", w, dq_basis[0])
    d = jnp.einsum("...nk,...kd->...nd", w, dq_basis[1])
    return dual_quaternion_normalize((r, d))


def dual_quaternion_skinning(
    dual_quat: DualQuaternion,
    pts: jax.Array,
    skin: jax.Array,
    return_qt: bool = False,
):
    """Dual-quaternion blend skinning with hemisphere alignment.

    Matches `lab4d/utils/geom_utils.py:48-92`: per point, all bone quaternions
    are sign-aligned to the max-weight bone's hemisphere before blending.

    Args:
        dual_quat: ``((M, B, 4), (M, B, 4))`` per-bone SE(3) as dual quats.
        pts: ``(M, ..., 3)`` canonical points.
        skin: ``(M, ..., B)`` skinning weights.
        return_qt: if True return the blended ``(q, t)`` instead of warped pts.
    """
    shape = pts.shape
    qr_bones, qd_bones = dual_quat
    M, B, _ = qr_bones.shape
    pts_flat = pts.reshape(M, -1, 3)
    skin_flat = skin.reshape(M, -1, B)

    # hemisphere alignment against the anchor (argmax-weight) bone. The
    # sign is piecewise-constant (zero gradient a.e.), so the whole branch
    # is stop_gradient'ed: without it, autodiff materializes the anchor
    # gather's VJP — a scatter-add of N per-point cotangents into the tiny
    # (B, 4) bone array, which TPU serializes on index collisions (measured
    # 900 ms of the 930 ms warp backward at 200k points). The gather itself
    # is a one-hot matmul so the forward rides the MXU too.
    def _sign(skin_flat, qr_bones):
        anchor = jnp.argmax(skin_flat, axis=-1)  # (M, N)
        onehot = jax.nn.one_hot(anchor, B, dtype=qr_bones.dtype)
        qr_anchor = jnp.einsum("mnb,mbd->mnd", onehot, qr_bones)  # (M, N, 4)
        return jnp.where(
            jnp.einsum("mnd,mbd->mnb", qr_anchor, qr_bones) > 0, 1.0, -1.0
        )  # (M, N, B)

    sign = _sign(
        jax.lax.stop_gradient(skin_flat), jax.lax.stop_gradient(qr_bones)
    )

    # blended = einsum(skin, sign * q); fold the sign into the weights so the
    # whole blend is two (N, B) x (B, 4) matmuls that XLA maps onto the MXU.
    w_signed = skin_flat * sign
    qr_w = jnp.einsum("mnb,mbd->mnd", w_signed, qr_bones)
    qd_w = jnp.einsum("mnb,mbd->mnd", w_signed, qd_bones)
    qr_w, qd_w = dual_quaternion_normalize((qr_w, qd_w))

    if return_qt:
        q, t = dual_quaternion_to_quaternion_translation((qr_w, qd_w))
        return q.reshape(shape[:-1] + (4,)), t.reshape(shape)
    out = dual_quaternion_apply((qr_w, qd_w), pts_flat)
    return out.reshape(shape)
