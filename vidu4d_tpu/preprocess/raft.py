"""RAFT-small optical flow in flax (learned replacement for the pyramidal
LK fallback; reference uses VCN+ — `preprocess/third_party/vcnplus/
compute_flow.py:36-169`).

Clean-room implementation of the *small* RAFT architecture (Teed & Deng,
ECCV 2020): feature/context encoders at 1/8 resolution, a 4-level all-pairs
correlation pyramid with radius-3 lookup, and a ConvGRU update operator
iterated a fixed number of times (lax.scan — fixed trip count keeps the
whole net one XLA program; the MXU does the all-pairs correlation as a
single batched matmul).

Weights: trained in-repo on procedurally generated warps (no external data
or downloads; see `scripts/train_raft.py`) and loaded from an .npz. The
Stage-1 contract (`compute_flow`-shaped fwd/bwd flow + occlusion channel)
is produced by `raft_flow_pair`.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

HDIM = 96  # GRU hidden
CDIM = 64  # context
FDIM = 128  # matching feature dim
CORR_LEVELS = 4
CORR_RADIUS = 3
ITERS = 12


class ResBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.ch, (3, 3), strides=self.stride)(x)
        y = nn.relu(nn.GroupNorm(num_groups=8)(y))
        y = nn.Conv(self.ch, (3, 3))(y)
        y = nn.GroupNorm(num_groups=8)(y)
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=self.stride)(x)
        return nn.relu(x + y)


class Encoder(nn.Module):
    """1/8-resolution encoder (fnet/cnet share this trunk shape)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (7, 7), strides=2)(x)  # 1/2
        x = nn.relu(nn.GroupNorm(num_groups=8)(x))
        x = ResBlock(32)(x)
        x = ResBlock(64, stride=2)(x)  # 1/4
        x = ResBlock(96, stride=2)(x)  # 1/8
        return nn.Conv(self.out_dim, (1, 1))(x)


def _pool2(x):
    """(N, P, H, W) -> (N, P, H/2, W/2) average pool."""
    n, p, h, w = x.shape
    x = x.reshape(n * p, h, w, 1)
    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
    return x.reshape(n, p, h // 2, w // 2)


def build_corr_pyramid(f1, f2):
    n, h, w, c = f1.shape
    a = f1.reshape(n, h * w, c)
    b = f2.reshape(n, h * w, c)
    corr = jnp.einsum("npc,nqc->npq", a, b, preferred_element_type=jnp.float32)
    corr = (corr / jnp.sqrt(jnp.float32(c))).reshape(n, h * w, h, w)
    pyr = [corr]
    for _ in range(CORR_LEVELS - 1):
        pyr.append(_pool2(pyr[-1]))
    return pyr


def lookup_corr(pyr, coords):
    """Sample each pyramid level in a (2r+1)^2 window around coords.

    coords: (N, H, W, 2) current correspondence estimate (x, y) at 1/8 res.
    Returns (N, H, W, CORR_LEVELS*(2r+1)^2).
    """
    n, h, w, _ = coords.shape
    r = CORR_RADIUS
    out = []
    dx, dy = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        indexing="xy",
    )
    delta = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)  # (K, 2)
    for lvl, corr in enumerate(pyr):
        scale = 2.0 ** lvl
        c = coords.reshape(n, h * w, 1, 2) / scale + delta[None, None]
        hl, wl = corr.shape[2], corr.shape[3]
        x = jnp.clip(c[..., 0], 0.0, wl - 1.0)
        y = jnp.clip(c[..., 1], 0.0, hl - 1.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        x1 = jnp.minimum(x0 + 1, wl - 1.0)
        y1 = jnp.minimum(y0 + 1, hl - 1.0)
        wx = x - x0
        wy = y - y0

        flat = corr.reshape(n, h * w, hl * wl)

        def tap(xi, yi):
            idx = (yi * wl + xi).astype(jnp.int32)  # (N, HW, K)
            return jnp.take_along_axis(flat, idx, axis=-1)

        v = (
            tap(x0, y0) * (1 - wx) * (1 - wy)
            + tap(x1, y0) * wx * (1 - wy)
            + tap(x0, y1) * (1 - wx) * wy
            + tap(x1, y1) * wx * wy
        )  # (N, HW, K)
        out.append(v)
    return jnp.concatenate(out, axis=-1).reshape(n, h, w, -1)


class ConvGRU(nn.Module):
    hidden: int = HDIM

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden, (3, 3))(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden, (3, 3))(hx))
        q = jnp.tanh(
            nn.Conv(self.hidden, (3, 3))(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class MotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(96, (1, 1))(corr))
        c = nn.relu(nn.Conv(64, (3, 3))(c))
        f = nn.relu(nn.Conv(64, (7, 7))(flow))
        f = nn.relu(nn.Conv(32, (3, 3))(f))
        out = nn.relu(nn.Conv(80, (3, 3))(jnp.concatenate([c, f], -1)))
        return jnp.concatenate([out, flow], axis=-1)


class UpdateBlock(nn.Module):
    @nn.compact
    def __call__(self, h, ctx, corr, flow):
        m = MotionEncoder()(flow, corr)
        h = ConvGRU()(h, jnp.concatenate([ctx, m], axis=-1))
        d = nn.relu(nn.Conv(128, (3, 3))(h))
        delta = nn.Conv(2, (3, 3))(d)
        return h, delta


class RaftSmall(nn.Module):
    iters: int = ITERS

    @nn.compact
    def __call__(self, img1, img2, all_iters: bool = False):
        """img1/img2: (N, H, W, 3) in [0, 1], H/W multiples of 8.

        Returns full-res flow (N, H, W, 2) in pixels; with all_iters=True a
        list of per-iteration predictions (for the gamma-weighted loss)."""
        x = jnp.concatenate([img1, img2], axis=0) * 2 - 1
        feats = Encoder(out_dim=FDIM, name="fnet")(x)
        f1, f2 = jnp.split(feats, 2, axis=0)
        cnet = Encoder(out_dim=HDIM + CDIM, name="cnet")(img1 * 2 - 1)
        h = jnp.tanh(cnet[..., :HDIM])
        ctx = nn.relu(cnet[..., HDIM:])

        pyr = build_corr_pyramid(f1, f2)
        n, hh, ww, _ = f1.shape
        gx, gy = jnp.meshgrid(
            jnp.arange(ww, dtype=jnp.float32),
            jnp.arange(hh, dtype=jnp.float32),
            indexing="xy",
        )
        grid = jnp.stack([gx, gy], axis=-1)[None].repeat(n, axis=0)

        update = UpdateBlock()
        flow = jnp.zeros((n, hh, ww, 2), jnp.float32)
        preds = []
        for _ in range(self.iters):  # unrolled; params shared (same submodule)
            flow = jax.lax.stop_gradient(flow)  # per-iter detach, as in RAFT
            corr_feat = lookup_corr(pyr, grid + flow)
            h, delta = update(h, ctx, corr_feat, flow)
            flow = flow + delta
            if all_iters:
                preds.append(self._upsample(flow, hh, ww))

        if all_iters:
            return preds
        return self._upsample(flow, hh, ww)

    @staticmethod
    def _upsample(flow, hh, ww):
        # 8x bilinear upsample (small variant; no convex upsampling)
        n = flow.shape[0]
        return jax.image.resize(
            flow * 8.0, (n, hh * 8, ww * 8, 2), method="bilinear"
        )


def load_weights(path: Optional[str] = None):
    """Load trained params from .npz (flat {path: array} dict)."""
    path = path or os.environ.get(
        "VIDU4D_RAFT_NPZ",
        os.path.join(os.path.dirname(__file__), "..", "weights",
                     "raft_small_synthetic.npz"),
    )
    if not os.path.exists(path):
        return None
    data = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(data[k]) for k in data.files}
    import flax.traverse_util as tu

    return {"params": tu.unflatten_dict(flat)}


def save_weights(params, path: str):
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params["params"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path, **{"/".join(k): np.asarray(v) for k, v in flat.items()}
    )
