"""LPIPS perceptual distance in pure JAX (reference: `gs/lpipsPyTorch/`).

The reference computes LPIPS(vgg): VGG16 conv features at 5 taps
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), channel-unit-normalized,
squared differences, learned 1x1 "lin" weights, spatial + layer average
(`gs/lpipsPyTorch/modules/lpips.py`).

This implementation reproduces that computation graph exactly. Weights come
from, in order of preference:

1. an .npz at ``weights_path`` / $VIDU4D_LPIPS_NPZ with arrays
   ``conv{i}_{j}_w`` ((kh, kw, cin, cout) float32), ``conv{i}_{j}_b`` and
   optional ``lin{k}_w`` ((C_k,) nonneg) — convert torchvision VGG16 +
   LPIPS lin weights offline to this schema;
2. otherwise a PINNED deterministic fallback: He-init from PRNGKey(0) with
   uniform lin weights. Random-filter VGG distances still correlate with
   human perceptual judgements far better than pixel metrics (Zhang et al.
   2018, Sec. 5.4 "random networks"), but absolute values are NOT
   comparable to published LPIPS(vgg) numbers — every report tags which
   variant produced it (`kind` field).

Zero-egress environments (this one) always use the fallback.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (name, out_channels); 'M' = 2x2 max pool
_VGG16 = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]
_TAPS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3")

# input scaling of the official LPIPS implementation (images in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_params(weights_path: Optional[str] = None) -> Tuple[Dict, str]:
    """Load or synthesize VGG16+lin weights. Returns (params, kind)."""
    weights_path = weights_path or os.environ.get("VIDU4D_LPIPS_NPZ", "")
    if weights_path and os.path.exists(weights_path):
        data = np.load(weights_path)
        params = {k: jnp.asarray(data[k]) for k in data.files}
        return params, "vgg16-pretrained"

    key = jax.random.PRNGKey(0)  # pinned: same metric across runs/machines
    params = {}
    cin = 3
    for item in _VGG16:
        if item == "M":
            continue
        name, cout = item
        key, k1 = jax.random.split(key)
        fan_in = 3 * 3 * cin
        params[f"{name}_w"] = jax.random.normal(
            k1, (3, 3, cin, cout), jnp.float32
        ) * np.sqrt(2.0 / fan_in)
        params[f"{name}_b"] = jnp.zeros((cout,), jnp.float32)
        cin = cout
    return params, "vgg16-random-pinned"


def _features(params: Dict, x: jax.Array):
    """x: (N, H, W, 3) in [-1, 1] -> list of tap activations."""
    x = (x - _SHIFT) / _SCALE
    taps = []
    for item in _VGG16:
        if item == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        name, _ = item
        x = jax.lax.conv_general_dilated(
            x, params[f"{name}_w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"{name}_b"]
        x = jax.nn.relu(x)
        if name in _TAPS:
            taps.append(x)
            if name == _TAPS[-1]:
                break
    return taps


@functools.partial(jax.jit, static_argnames=())
def _lpips_impl(params: Dict, img0: jax.Array, img1: jax.Array) -> jax.Array:
    f0 = _features(params, img0)
    f1 = _features(params, img1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2  # (N, H, W, C)
        lin = params.get(f"lin{i}_w")
        if lin is None:  # fallback: uniform lin weights 1/C
            lin = jnp.full((d.shape[-1],), 1.0 / d.shape[-1], jnp.float32)
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return total


class LPIPS:
    """Callable LPIPS metric. Images (H, W, 3) or (N, H, W, 3) in [0, 1]."""

    def __init__(self, weights_path: Optional[str] = None):
        self.params, self.kind = init_params(weights_path)

    def __call__(self, img0, img1) -> float:
        img0 = jnp.asarray(img0, jnp.float32)
        img1 = jnp.asarray(img1, jnp.float32)
        if img0.ndim == 3:
            img0, img1 = img0[None], img1[None]
        # [0,1] -> [-1,1] (lpips.py normalize=True path)
        return float(_lpips_impl(self.params, img0 * 2 - 1, img1 * 2 - 1))


_default: Optional[LPIPS] = None


def lpips(img0, img1) -> float:
    """Module-level convenience with a cached default-weights instance."""
    global _default
    if _default is None:
        _default = LPIPS()
    return _default(img0, img1)


def lpips_kind() -> str:
    global _default
    if _default is None:
        _default = LPIPS()
    return _default.kind
