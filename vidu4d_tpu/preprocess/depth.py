"""Monocular depth priors.

The reference pulls ZoeDepth ZoeD_NK through torch.hub
(`preprocess/scripts/depth.py:37-58`) — a network download that zero-egress
environments cannot make. Interface-compatible backends:

* `external`: use precomputed Depth/.../*.npy maps (the on-disk contract is
  an *input* here, exactly like segmentation masks).
* `flow_parallax` (default fallback): depth from translational flow
  magnitude between adjacent frames — coarse (scale/shift-ambiguous, like
  any monocular prior), but enough to drive the robust-Procrustes camera
  initialization and the weak (1e-4) depth loss.
* a local ZoeDepth/DPT checkpoint can be slotted into `estimate_depth`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.preprocess.flow import lk_flow
from vidu4d_tpu.preprocess.ops import warp_by_flow


def depth_from_flow_parallax(frames: jax.Array, base_depth: float = 2.0,
                             levels: int = 4) -> jax.Array:
    """(T, H, W) pseudo-depth: inverse-proportional to median-normalized
    flow magnitude of adjacent pairs (near objects move more)."""
    t = frames.shape[0]
    f0 = frames[:-1]
    f1 = frames[1:]
    flow = jax.vmap(lambda a, b: lk_flow(a, b, levels=levels))(f0, f1)
    mag = jnp.sqrt(jnp.sum(flow * flow, axis=-1) + 1e-12)  # (T-1, H, W)
    mag = jnp.concatenate([mag, mag[-1:]], axis=0)
    med = jnp.median(mag.reshape(t, -1), axis=-1)[:, None, None]
    rel = mag / jnp.maximum(med, 1e-6)
    depth = base_depth / jnp.clip(rel, 0.3, 3.0)
    return depth


def _depthnet_backend():
    """The learned monodepth backend when trained weights exist
    (`vidu4d_tpu/weights/depthnet_synthetic.npz` or $VIDU4D_DEPTHNET_NPZ);
    None otherwise. Set VIDU4D_DEPTH_BACKEND=flow_parallax to opt out."""
    import os

    if os.environ.get("VIDU4D_DEPTH_BACKEND", "") == "flow_parallax":
        return None
    path = os.environ.get("VIDU4D_DEPTHNET_NPZ", "")
    if not path:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(here, "weights", "depthnet_synthetic.npz")
    if not os.path.exists(path):
        return None
    from vidu4d_tpu.preprocess.depthnet import DepthNet, load_weights

    return DepthNet(), load_weights(path)


# jitted-apply cache keyed by model config so repeated estimate_depth calls
# (one per video) reuse the compiled U-Net instead of re-tracing through a
# fresh jax.jit each time (ADVICE r2)
_apply_cache: dict = {}


def _depthnet_apply(model, params, x):
    key = (type(model).__name__, getattr(model, "width", None))
    fn = _apply_cache.get(key)
    if fn is None:
        fn = jax.jit(model.apply)
        _apply_cache[key] = fn
    return fn(params, x)


def depth_from_net(frames: jax.Array, model, params) -> jax.Array:
    """(T, H, W[, 3]) frames -> (T, H, W) depth via the learned U-Net.
    Pads to a multiple of 16 (4 stride-2 stages), maps relative disparity
    into the same [0.5, 4] range the flow-parallax prior uses."""
    from vidu4d_tpu.preprocess.depthnet import disparity_to_depth

    if frames.ndim == 3:
        frames = jnp.repeat(frames[..., None], 3, axis=-1)
    t, h, w = frames.shape[:3]
    ph = (-h) % 16
    pw = (-w) % 16
    x = jnp.pad(frames, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    disp = _depthnet_apply(model, params, x)[:, :h, :w]
    return disparity_to_depth(disp)


def estimate_depth(frames: np.ndarray, backend: str = "auto") -> np.ndarray:
    """(T, H, W) float16 depth maps in the reference contract
    (`preprocess/scripts/depth.py` writes per-video stacked fp16 npy).

    ``auto`` uses the in-repo-trained monodepth U-Net when its weights
    exist (the ZoeDepth analog), else flow-parallax."""
    if backend == "auto":
        net = _depthnet_backend()
        if net is not None:
            model, params = net
            return np.asarray(
                depth_from_net(jnp.asarray(frames, jnp.float32), model, params)
            ).astype(np.float16)
        backend = "flow_parallax"
    if backend == "flow_parallax":
        return np.asarray(
            depth_from_flow_parallax(jnp.asarray(frames, jnp.float32))
        ).astype(np.float16)
    raise NotImplementedError(f"depth backend {backend!r} needs local weights")
