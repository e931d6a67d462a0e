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


def estimate_depth(frames: np.ndarray, backend: str = "flow_parallax") -> np.ndarray:
    """(T, H, W) float16 depth maps in the reference contract
    (`preprocess/scripts/depth.py` writes per-video stacked fp16 npy)."""
    if backend == "flow_parallax":
        return np.asarray(
            depth_from_flow_parallax(jnp.asarray(frames, jnp.float32))
        ).astype(np.float16)
    raise NotImplementedError(f"depth backend {backend!r} needs local weights")
