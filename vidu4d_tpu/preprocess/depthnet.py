"""Learned monocular depth: a small U-Net trained in-repo on synthetic
renders (the ZoeDepth slot, `preprocess/scripts/depth.py:37-58`).

The reference downloads ZoeD_NK through torch.hub; zero-egress environments
cannot. Instead we train a compact affine-invariant disparity network from
scratch on scenes rendered by our own rasterizer (GT depth is free), the
same recipe as the RAFT-small flow backend (`preprocess/raft.py`).

TPU notes: all convs are 3x3 stride-1/2 NHWC — XLA maps them onto the MXU;
GroupNorm + GELU fuse into the conv epilogues. The network is fully static
in shape so one compile serves the whole video (vmapped over frames).

Output convention (MiDaS): per-pixel *disparity* (inverse depth) up to an
affine transform. `disparity_to_depth` aligns it to a metric range for the
pipeline's on-disk contract.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_ENV = "VIDU4D_DEPTHNET_NPZ"
WEIGHTS_DEFAULT = "weights/depthnet_synthetic.npz"


class ConvBlock(nn.Module):
    feats: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.feats, (3, 3), strides=(self.stride, self.stride))(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.gelu(x)
        x = nn.Conv(self.feats, (3, 3))(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return nn.gelu(x)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")


class DepthNet(nn.Module):
    """U-Net: 4 stride-2 encoder stages (H/16 bottleneck), skip-connected
    decoder, 1-channel softplus disparity head."""

    width: int = 32

    @nn.compact
    def __call__(self, rgb):
        """(B, H, W, 3) in [0,1] -> (B, H, W) nonnegative disparity."""
        w = self.width
        e1 = ConvBlock(w)(rgb)                 # H
        e2 = ConvBlock(2 * w, stride=2)(e1)    # H/2
        e3 = ConvBlock(3 * w, stride=2)(e2)    # H/4
        e4 = ConvBlock(4 * w, stride=2)(e3)    # H/8
        mid = ConvBlock(4 * w, stride=2)(e4)   # H/16

        d4 = ConvBlock(4 * w)(jnp.concatenate([_up2(mid), e4], -1))
        d3 = ConvBlock(3 * w)(jnp.concatenate([_up2(d4), e3], -1))
        d2 = ConvBlock(2 * w)(jnp.concatenate([_up2(d3), e2], -1))
        d1 = ConvBlock(w)(jnp.concatenate([_up2(d2), e1], -1))
        disp = nn.Conv(1, (3, 3))(d1)[..., 0]
        return jax.nn.softplus(disp)


# ----------------------------------------------------------------------
# affine-invariant losses (MiDaS SSI-MAE + multi-scale gradient matching)
# ----------------------------------------------------------------------


def align_affine(pred: jax.Array, gt: jax.Array,
                 mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-image least-squares (s, t) aligning pred to gt over mask.

    Closed form of argmin_{s,t} sum mask*(s*pred + t - gt)^2; batched over
    leading axes (pred/gt/mask flattened per image).
    """
    m = mask.reshape(mask.shape[0], -1)
    p = pred.reshape(pred.shape[0], -1) * m
    g = gt.reshape(gt.shape[0], -1) * m
    n = jnp.maximum(m.sum(-1), 1.0)
    sp, sg = p.sum(-1), g.sum(-1)
    spp = (p * p).sum(-1)
    spg = (p * g).sum(-1)
    det = n * spp - sp * sp
    s = jnp.where(jnp.abs(det) > 1e-8, (n * spg - sp * sg) / det, 1.0)
    t = (sg - s * sp) / n
    return s, t


def ssi_mae(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Scale-shift-invariant MAE over valid pixels (per-image alignment)."""
    s, t = align_affine(pred, gt, mask)
    aligned = s[:, None, None] * pred + t[:, None, None]
    err = jnp.abs(aligned - gt) * mask
    return err.sum() / jnp.maximum(mask.sum(), 1.0)


def gradient_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array,
                  scales: int = 3) -> jax.Array:
    """Multi-scale disparity-gradient matching (MiDaS eq. 11) on the
    affine-aligned prediction."""
    s, t = align_affine(pred, gt, mask)
    d = s[:, None, None] * pred + t[:, None, None] - gt
    total = 0.0
    for k in range(scales):
        step = 2 ** k
        dk = d[:, ::step, ::step]
        mk = mask[:, ::step, ::step]
        gx = jnp.abs(jnp.diff(dk, axis=2)) * mk[:, :, 1:] * mk[:, :, :-1]
        gy = jnp.abs(jnp.diff(dk, axis=1)) * mk[:, 1:] * mk[:, :-1]
        total = total + (gx.sum() + gy.sum()) / jnp.maximum(mk.sum(), 1.0)
    return total / scales


def depth_loss(pred_disp: jax.Array, gt_depth: jax.Array,
               mask: jax.Array, grad_wt: float = 0.5) -> jax.Array:
    gt_disp = jnp.where(mask > 0, 1.0 / jnp.maximum(gt_depth, 1e-3), 0.0)
    return (ssi_mae(pred_disp, gt_disp, mask)
            + grad_wt * gradient_loss(pred_disp, gt_disp, mask))


def ranking_loss(pred_disp: jax.Array, gt_depth: jax.Array, mask: jax.Array,
                 key: jax.Array, n_pairs: int = 768, margin: float = 0.05,
                 rel_tau: float = 0.03) -> jax.Array:
    """Pairwise ordinal hinge (DIW-style): directly optimizes depth ORDER.

    Samples random pixel pairs per image; pairs whose GT depths differ by
    more than ``rel_tau`` relatively must have disparities ordered the
    right way by at least ``margin`` of the per-image disparity spread.
    Alignment-free, so it complements the affine-invariant SSI terms and
    targets exactly the depth-order metric the downstream camera
    registration consumes.
    """
    b = pred_disp.shape[0]
    hw = pred_disp.shape[1] * pred_disp.shape[2]
    k1, k2 = jax.random.split(key)
    ii = jax.random.randint(k1, (b, n_pairs), 0, hw)
    jj = jax.random.randint(k2, (b, n_pairs), 0, hw)
    pd = pred_disp.reshape(b, -1)
    gd = gt_depth.reshape(b, -1)
    mm = mask.reshape(b, -1)
    take = jnp.take_along_axis
    pi, pj = take(pd, ii, 1), take(pd, jj, 1)
    gi, gj = take(gd, ii, 1), take(gd, jj, 1)
    valid = take(mm, ii, 1) * take(mm, jj, 1)
    rel = (gj - gi) / jnp.maximum(jnp.minimum(gi, gj), 1e-3)
    informative = (jnp.abs(rel) > rel_tau) * valid
    sgn = jnp.sign(rel)  # +1: i nearer -> disparity_i should exceed j's
    spread = jnp.maximum(pd.max(1) - pd.min(1), 1e-3)[:, None]
    viol = jax.nn.relu(margin - sgn * (pi - pj) / spread)
    return (viol * informative).sum() / jnp.maximum(informative.sum(), 1.0)


def disparity_to_depth(disp: jax.Array, lo: float = 0.5,
                       hi: float = 4.0) -> jax.Array:
    """Map relative disparity to depth in [lo, hi] per image (the affine
    ambiguity is resolved downstream by the robust-Procrustes scale fit,
    like any monocular prior)."""
    d = disp - disp.min(axis=(-2, -1), keepdims=True)
    d = d / jnp.maximum(d.max(axis=(-2, -1), keepdims=True), 1e-6)
    inv_lo, inv_hi = 1.0 / hi, 1.0 / lo
    return 1.0 / (inv_lo + d * (inv_hi - inv_lo))


# ----------------------------------------------------------------------
# weights io (same npz contract as preprocess/raft.py)
# ----------------------------------------------------------------------


def save_weights(path: str, params: Dict[str, Any]) -> None:
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_weights(path: str) -> Dict[str, Any]:
    from flax import traverse_util

    raw = np.load(path)
    flat = {k: jnp.asarray(raw[k]) for k in raw.files}
    return traverse_util.unflatten_dict(flat, sep="/")
