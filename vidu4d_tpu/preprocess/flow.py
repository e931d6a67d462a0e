"""Dense optical flow: coarse-to-fine pyramidal Lucas-Kanade (pure JAX).

The reference runs the vendored VCN+ CNN (+ DCNv2 CUDA ops,
`preprocess/third_party/vcnplus/compute_flow.py:36-169`) whose weights are
not redistributable here. The TPU-native replacement is a classical
batched pyramidal LK: iterative per-pixel least squares over image-gradient
structure tensors at each pyramid level, fully jittable and vmapped over
frame pairs. The output contract matches the reference: (H, W, 3) float16
npys named `FlowFW_d/.../{prefix}.npy` holding [flow_x, flow_y, occlusion],
with occlusion from the forward-backward cycle check.

A learned RAFT-style network can be slotted in via the same interface when
weights are available (`compute_flow_pairs` is the only entry point).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vidu4d_tpu.preprocess.ops import warp_by_flow


def _to_gray(img: jax.Array) -> jax.Array:
    if img.ndim == 3 and img.shape[-1] == 3:
        return img @ jnp.array([0.299, 0.587, 0.114])
    return img[..., 0] if img.ndim == 3 else img


def _blur(img: jax.Array) -> jax.Array:
    """Separable 5-tap binomial blur (two 1D convs)."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    x = img[None, None]
    kx = k.reshape(1, 1, 1, 5)
    ky = k.reshape(1, 1, 5, 1)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), "SAME")
    return x[0, 0]


def _downsample(img: jax.Array) -> jax.Array:
    return _blur(img)[::2, ::2]


def _gradients(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    gx = jnp.gradient(img, axis=1)
    gy = jnp.gradient(img, axis=0)
    return gx, gy


def _box_filter(x: jax.Array, radius: int) -> jax.Array:
    """Local sum over a (2r+1)^2 window via two cumsum passes."""
    k = 2 * radius + 1
    pad = [(radius + 1, radius), (radius + 1, radius)]
    xp = jnp.pad(x, pad)
    c = jnp.cumsum(jnp.cumsum(xp, axis=0), axis=1)
    return (
        c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]
    )


def _lk_refine(i0: jax.Array, i1: jax.Array, flow: jax.Array,
               radius: int = 4, iters: int = 3, eps: float = 1e-3) -> jax.Array:
    """Iterative LK update at one pyramid level."""
    gx, gy = _gradients(i0)
    ixx = _box_filter(gx * gx, radius)
    ixy = _box_filter(gx * gy, radius)
    iyy = _box_filter(gy * gy, radius)
    det = ixx * iyy - ixy * ixy
    det_safe = jnp.where(jnp.abs(det) < eps, eps, det)

    def body(_, flow):
        i1w = warp_by_flow(i1[..., None], flow)[..., 0]
        it = i1w - i0
        bx = _box_filter(gx * it, radius)
        by = _box_filter(gy * it, radius)
        du = -(iyy * bx - ixy * by) / det_safe
        dv = -(-ixy * bx + ixx * by) / det_safe
        good = (jnp.abs(det) > eps)[..., None]
        delta = jnp.stack([du, dv], axis=-1)
        delta = jnp.clip(delta, -radius, radius)
        return flow + jnp.where(good, delta, 0.0)

    return jax.lax.fori_loop(0, iters, body, flow)


@functools.partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def lk_flow(img0: jax.Array, img1: jax.Array, levels: int = 4,
            radius: int = 4, iters: int = 3) -> jax.Array:
    """Dense flow img0 -> img1, (H, W, 2). H, W must be divisible by 2^levels."""
    i0 = _to_gray(img0.astype(jnp.float32))
    i1 = _to_gray(img1.astype(jnp.float32))
    pyr0, pyr1 = [i0], [i1]
    for _ in range(levels - 1):
        pyr0.append(_downsample(pyr0[-1]))
        pyr1.append(_downsample(pyr1[-1]))

    flow = jnp.zeros(pyr0[-1].shape + (2,))
    for lvl in reversed(range(levels)):
        if lvl < levels - 1:
            h, w = pyr0[lvl].shape
            flow = (
                jax.image.resize(flow, (h, w, 2), method="bilinear") * 2.0
            )
        flow = _lk_refine(pyr0[lvl], pyr1[lvl], flow, radius=radius, iters=iters)
    return flow


def occlusion_from_cycle(flow_fw: jax.Array, flow_bw: jax.Array,
                         thresh_px: float = 1.5) -> jax.Array:
    """Occlusion indicator from forward-backward inconsistency."""
    bw_at_fw = warp_by_flow(flow_bw, flow_fw)
    cyc = flow_fw + bw_at_fw
    dis = jnp.sqrt(jnp.maximum(jnp.sum(cyc * cyc, axis=-1), 1e-24))
    return (dis > thresh_px).astype(jnp.float32)


_RAFT_STATE = {"tried": False, "model": None, "params": None}


def _raft_backend():
    """The learned RAFT-small backend when trained weights exist
    (`vidu4d_tpu/weights/raft_small_synthetic.npz` or $VIDU4D_RAFT_NPZ),
    else None. Disable explicitly with VIDU4D_FLOW_BACKEND=lk."""
    import os

    if os.environ.get("VIDU4D_FLOW_BACKEND", "") == "lk":
        return None
    if not _RAFT_STATE["tried"]:
        _RAFT_STATE["tried"] = True
        try:
            from vidu4d_tpu.preprocess.raft import RaftSmall, load_weights

            params = load_weights()
            if params is not None:
                _RAFT_STATE["model"] = RaftSmall()
                _RAFT_STATE["params"] = params
        except Exception:
            pass
    if _RAFT_STATE["model"] is None:
        return None
    return _RAFT_STATE["model"], _RAFT_STATE["params"]


def compute_flow_pairs(frames: jax.Array, delta: int, levels: int = 4):
    """Flow for all (t, t+delta) pairs of a video.

    Uses the in-repo-trained RAFT-small when its weights are present (the
    learned replacement for the reference's VCN+, `compute_flow.py:36-169`),
    else the pyramidal-LK fallback.

    Args:
        frames: (T, H, W, 3) in [0, 1].
    Returns:
        flow_fw, flow_bw: (N, H, W, 3) [fx, fy, occ] matching the reference's
        on-disk contract (`compute_flow.py:120-169`).
    """
    t = frames.shape[0]
    n = t - delta
    f0 = frames[:n]
    f1 = frames[delta : delta + n]

    raft = _raft_backend()
    if raft is not None and frames.shape[1] % 8 == 0 and frames.shape[2] % 8 == 0:
        model, params = raft
        fw = model.apply(params, f0, f1)
        bw = model.apply(params, f1, f0)
    else:
        fw = jax.vmap(lambda a, b: lk_flow(a, b, levels=levels))(f0, f1)
        bw = jax.vmap(lambda a, b: lk_flow(a, b, levels=levels))(f1, f0)
    occ_fw = jax.vmap(occlusion_from_cycle)(fw, bw)
    occ_bw = jax.vmap(occlusion_from_cycle)(bw, fw)
    flow_fw = jnp.concatenate([fw, occ_fw[..., None]], axis=-1)
    flow_bw = jnp.concatenate([bw, occ_bw[..., None]], axis=-1)
    return flow_fw, flow_bw
