"""Learned dense registration descriptors — the DINOv2 slot.

The reference extracts dinov2_vits14 patch tokens
(`preprocess/scripts/extract_dinov2.py:30-167`) to drive the Stage-2/3
feature-matching losses (`global_match` softmax matching + reprojection).
Zero-egress TPU replacement, following the same in-repo recipe that
produced the shipped RAFT flow weights: a small conv encoder trained
self-supervised on procedural-warp pairs with a dense InfoNCE objective —
corresponding pixels (known synthetic flow) must embed nearby, all other
pixels far. The public-contract post-processing (PCA-16, L2 norm, masking,
fp16) is unchanged (`features.extract_video_features`).

Design: all compute is conv/matmul (MXU); the InfoNCE loss is one
(N, D) x (D, N) logits matmul per pair. No torch, no hub downloads.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FeatNet(nn.Module):
    """Small dense-descriptor conv net: (B, H, W, 3) -> (B, H/2, W/2, dim),
    L2-normalized per pixel."""

    width: int = 48
    dim: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.width
        x = x * 2.0 - 1.0
        x = nn.Conv(w, (5, 5), strides=(2, 2))(x)
        x = nn.relu(x)
        x = nn.Conv(w * 2, (3, 3))(x)
        x = nn.relu(x)
        r = x
        x = nn.Conv(w * 2, (3, 3))(x)
        x = nn.relu(x)
        x = nn.Conv(w * 2, (3, 3))(x) + r  # residual block
        x = nn.relu(x)
        x = nn.Conv(self.dim, (1, 1))(x)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6
        )


def sample_features(feat: jax.Array, xy: jax.Array) -> jax.Array:
    """Bilinear sample (H, W, D) features at (N, 2) full-res pixel coords
    (the net runs at half res)."""
    h, w = feat.shape[:2]
    x = jnp.clip(xy[:, 0] / 2.0, 0.0, w - 1.001)
    y = jnp.clip(xy[:, 1] / 2.0, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    f00 = feat[y0, x0]
    f01 = feat[y0, x0 + 1]
    f10 = feat[y0 + 1, x0]
    f11 = feat[y0 + 1, x0 + 1]
    return (
        f00 * (1 - wx) * (1 - wy) + f01 * wx * (1 - wy)
        + f10 * (1 - wx) * wy + f11 * wx * wy
    )


def info_nce_pair(
    feat1: jax.Array,  # (H/2, W/2, D) from img1
    feat2: jax.Array,  # from img2
    xy1: jax.Array,    # (N, 2) pixel coords in img1
    xy2: jax.Array,    # (N, 2) corresponding coords in img2
    temp: float = 0.07,
) -> jax.Array:
    """Symmetric dense InfoNCE: xy1[i] must match xy2[i] against all other
    sampled locations (in-batch negatives)."""
    f1 = sample_features(feat1, xy1)
    f1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-6)
    f2 = sample_features(feat2, xy2)
    f2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True), 1e-6)
    logits = (f1 @ f2.T) / temp  # (N, N)
    labels = jnp.arange(f1.shape[0])
    return 0.5 * (
        jnp.mean(
            -jax.nn.log_softmax(logits, axis=1)[labels, labels]
        )
        + jnp.mean(
            -jax.nn.log_softmax(logits, axis=0)[labels, labels]
        )
    )


def match_accuracy(feat1, feat2, xy1, xy2, radius_px: float = 4.0) -> float:
    """Fraction of xy1 points whose argmax-similarity location among the
    sampled xy2 set lies within radius_px of the true correspondence."""
    f1 = np.array(sample_features(feat1, jnp.asarray(xy1)))
    f2 = np.array(sample_features(feat2, jnp.asarray(xy2)))
    f1 /= np.maximum(np.linalg.norm(f1, axis=-1, keepdims=True), 1e-6)
    f2 /= np.maximum(np.linalg.norm(f2, axis=-1, keepdims=True), 1e-6)
    sim = f1 @ f2.T
    best = np.argmax(sim, axis=1)
    d = np.linalg.norm(np.asarray(xy2)[best] - np.asarray(xy2), axis=-1)
    return float((d <= radius_px).mean())


def save_weights(path: str, params: Dict) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(path, **{
        "/".join(str(k.key) for k in kp): np.asarray(v) for kp, v in flat
    })


def load_weights(path: Optional[str] = None) -> Optional[Dict]:
    import os

    if path is None:
        path = os.environ.get("VIDU4D_FEATNET_NPZ", "")
        if not path:
            here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            path = os.path.join(here, "weights", "featnet_synthetic.npz")
    if not os.path.exists(path):
        return None
    data = np.load(path)
    params: Dict = {}
    for key in data.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return params
