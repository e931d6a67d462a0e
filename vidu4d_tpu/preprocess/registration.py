"""Rough camera registration from flow + depth (batched JAX).

Replaces `preprocess/libs/geometry.py:21-150` +
`preprocess/scripts/camera_registration.py`: per-pair rigid camera motion by
(weighted) Procrustes on flow correspondences lifted with depth, chained to
scene-to-camera world poses. The RANSAC of `compute_procrustes_robust`
becomes a fixed-shape vmapped hypothesis sweep (TPU-friendly: no dynamic
inlier gathering — weights instead of index selection).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vidu4d_tpu.preprocess.ops import warp_by_flow


def weighted_procrustes(pts0: jax.Array, pts1: jax.Array,
                        weights: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Analytic R, t minimizing sum w ||R p0 + t - p1||^2 (Kabsch/SVD,
    `geometry.py:52-76` with weights instead of boolean masking)."""
    w = weights / jnp.maximum(jnp.sum(weights), 1e-8)
    m0 = jnp.sum(pts0 * w[:, None], axis=0)
    m1 = jnp.sum(pts1 * w[:, None], axis=0)
    c0 = pts0 - m0
    c1 = pts1 - m1
    # HIGHEST: the TPU MXU's default bf16 passes flatten the small
    # antisymmetric part of H that encodes the rotation (measured: ~0 deg
    # estimates on TPU vs correct ones on CPU for a 4.6 deg GT motion)
    h = jnp.matmul(
        (c0 * w[:, None]).T, c1, precision=jax.lax.Precision.HIGHEST
    )
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(vt.T @ u.T)
    d = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
    r = vt.T @ d @ u.T
    t = m1 - r @ m0
    return r, t


def robust_procrustes(pts0, pts1, weights, key, num_hypotheses: int = 64,
                      min_samples: int = 10, inlier_frac: float = 0.05):
    """Fixed-shape RANSAC (`geometry.py:21-50`): sample K hypotheses (vmapped),
    score weighted inliers, refit on the best hypothesis' inliers (as weights)."""
    n = pts0.shape[0]
    extent = jnp.mean(jnp.max(pts0, axis=0) - jnp.min(pts0, axis=0))
    threshold = extent * inlier_frac

    keys = jax.random.split(key, num_hypotheses)

    def hypothesis(k):
        # weighted sampling without replacement via gumbel top-k
        g = jax.random.gumbel(k, (n,)) + jnp.log(jnp.maximum(weights, 1e-12))
        _, idx = jax.lax.top_k(g, min_samples)
        r, t = weighted_procrustes(pts0[idx], pts1[idx], jnp.ones(min_samples))
        resid = jnp.sqrt(jnp.maximum(
            jnp.sum((pts0 @ r.T + t - pts1) ** 2, axis=-1), 1e-24))
        inliers = (resid < threshold).astype(jnp.float32) * weights
        return jnp.sum(inliers), inliers

    scores, inlier_sets = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    return weighted_procrustes(pts0, pts1, inlier_sets[best])


def two_frame_registration(
    depth0: jax.Array,  # (H, W)
    depth1: jax.Array,  # (H, W)
    flow: jax.Array,  # (H, W, 2) frame0 -> frame1, crop coords
    kinv0: jax.Array,  # (3, 3)
    kinv1: jax.Array,  # (3, 3)
    mask: jax.Array,  # (H, W) weights in [0, 1]
    key=None,
    robust: bool = False,
):
    """Rigid cam0->cam1 SE(3) from correspondences (`geometry.py:78-150`)."""
    h, w = depth0.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    hp0 = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(-1, 3)
    hp1 = jnp.stack(
        [gx + flow[..., 0], gy + flow[..., 1], jnp.ones_like(gx)], axis=-1
    ).reshape(-1, 3)

    depth1_warped = warp_by_flow(depth1[..., None], flow)[..., 0].reshape(-1)
    pts0 = (hp0 @ kinv0.T) * depth0.reshape(-1, 1)
    pts1 = (hp1 @ kinv1.T) * depth1_warped[:, None]

    weights = mask.reshape(-1).astype(jnp.float32) * (depth1_warped > 0)
    if robust:
        assert key is not None
        r, t = robust_procrustes(pts0, pts1, weights, key)
    else:
        r, t = weighted_procrustes(pts0, pts1, weights)
    rt = jnp.eye(4).at[:3, :3].set(r).at[:3, 3].set(t)
    return rt


def chain_poses(pairwise: jax.Array) -> jax.Array:
    """Chain per-pair cam motions to scene-to-camera poses
    (`camera_registration.py:43-79`): cams = [I, R01, R12 R01, ...],
    as an associative scan (log-depth on device)."""
    def compose(a, b):
        # HIGHEST: bf16 composition drifts over long chains (see
        # weighted_procrustes note)
        return jnp.einsum("...ij,...jk->...ik", b, a,
                          precision=jax.lax.Precision.HIGHEST)

    eye = jnp.broadcast_to(jnp.eye(4), pairwise.shape)
    chained = jax.lax.associative_scan(compose, pairwise)
    return jnp.concatenate([eye[:1], chained], axis=0)


def two_frame_registration_np(depth0, depth1, flow, kinv0, kinv1, mask,
                              irls_iters: int = 5,
                              grad_weighting: bool = True):
    """Host float64 variant for the Stage-1 pair loop.

    The pair loop is host-side (one small SVD per pair, like the reference's
    CPU Procrustes `geometry.py:52-76`); doing the lift + Kabsch in numpy
    f64 sidesteps TPU matmul-precision pitfalls entirely.

    IRLS with a Tukey biweight replaces the reference's RANSAC
    (`geometry.py:21-50` compute_procrustes_robust): the dominant error
    source is flow-warped depth near silhouettes (bilinear samples that mix
    foreground and background depth), whose outlier residuals otherwise
    swamp the small rigid-motion signal. Deterministic, same robustness
    role; on the rigid-blob eval (scripts/eval_depth_registration.py,
    GT flow + GT depth, 4.58 deg/pair motion) it cuts rotation error from
    4.3 deg (a blind estimate) to 1.6 deg, the remainder being the surfel
    render's own depth-mixture noise. Depth-gradient down-weighting of the
    lift (silhouettes/creases, where bilinear depth sampling is unreliable)
    contributes the last ~0.1 deg.
    """
    import numpy as np

    depth0 = np.asarray(depth0, np.float64)
    depth1 = np.asarray(depth1, np.float64)
    flow = np.asarray(flow, np.float64)
    mask = np.asarray(mask, np.float64)
    h, w = depth0.shape
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64), indexing="xy")
    hp0 = np.stack([gx, gy, np.ones_like(gx)], -1).reshape(-1, 3)
    hp1 = np.stack([gx + flow[..., 0], gy + flow[..., 1],
                    np.ones_like(gx)], -1).reshape(-1, 3)
    d1w = np.asarray(
        warp_by_flow(jnp.asarray(depth1[..., None], jnp.float32),
                     jnp.asarray(flow, jnp.float32))
    )[..., 0].reshape(-1).astype(np.float64)
    pts0 = (hp0 @ np.asarray(kinv0, np.float64).T) * depth0.reshape(-1, 1)
    pts1 = (hp1 @ np.asarray(kinv1, np.float64).T) * d1w[:, None]
    # lift reliability: bilinear depth sampling errs proportionally to the
    # local depth gradient (silhouettes, creases), so down-weight there
    rel = 1.0
    if grad_weighting:
        g0y, g0x = np.gradient(depth0)
        g1y, g1x = np.gradient(depth1)
        g0 = np.hypot(g0x, g0y).reshape(-1)
        g1w = np.asarray(
            warp_by_flow(
                jnp.asarray(np.hypot(g1x, g1y)[..., None], jnp.float32),
                jnp.asarray(flow, jnp.float32))
        )[..., 0].reshape(-1).astype(np.float64)
        grad = np.maximum(g0, g1w)
        sel = mask.reshape(-1) > 0
        gscale = max(np.median(grad[sel]) if sel.any() else 0.0, 1e-9)
        rel = 1.0 / (1.0 + (grad / (3.0 * gscale)) ** 2)
    base_w = mask.reshape(-1) * (d1w > 0) * rel

    def kabsch(weights):
        wn = weights / max(weights.sum(), 1e-8)
        m0 = (pts0 * wn[:, None]).sum(0)
        m1 = (pts1 * wn[:, None]).sum(0)
        hmat = ((pts0 - m0) * wn[:, None]).T @ (pts1 - m1)
        u, _, vt = np.linalg.svd(hmat)
        d = np.diag([1.0, 1.0, np.linalg.det(vt.T @ u.T)])
        r = vt.T @ d @ u.T
        return r, m1 - r @ m0

    weights = base_w
    r, t = kabsch(weights)
    for _ in range(irls_iters):
        resid = np.linalg.norm(pts0 @ r.T + t - pts1, axis=-1)
        med = np.median(resid[base_w > 0]) if (base_w > 0).any() else 0.0
        mad = (np.median(np.abs(resid[base_w > 0] - med))
               if (base_w > 0).any() else 0.0)
        c = 4.685 * max(1.4826 * mad, 1e-9)  # Tukey cutoff from MAD sigma
        u2 = np.clip(resid / c, 0.0, 1.0) ** 2
        weights = base_w * (1.0 - u2) ** 2
        if weights.sum() < 16:  # degenerate: fall back to the plain fit
            weights = base_w
            break
        r, t = kabsch(weights)
    rt = np.eye(4)
    rt[:3, :3] = r
    rt[:3, 3] = t
    return rt.astype(np.float32)
