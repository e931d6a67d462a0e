"""Invertible dense warp (RealNVP couplings) — the NVPWarp family.

Re-design of `lab4d/nnutils/warping.py:269-323` + `lab4d/third_party/nvp`
(CaDeX-style invertible MLP): a stack of affine coupling layers over the 3
coordinates, conditioned on the time embedding. Exactly invertible, so
forward and backward warps share one set of parameters (unlike DenseWarp's
two independent MLPs that are only approximately inverse).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.embeddings import TimeEmbedding


class _Coupling(nn.Module):
    """Affine coupling: transforms one coordinate from the other two + code."""

    active_dim: int
    hidden: int = 32

    @nn.compact
    def __call__(self, xyz, code, inverse: bool = False):
        passive = jnp.concatenate(
            [xyz[..., : self.active_dim], xyz[..., self.active_dim + 1 :]], axis=-1
        )
        h = jnp.concatenate([passive, code], axis=-1)
        h = nn.relu(nn.Dense(self.hidden)(h))
        h = nn.relu(nn.Dense(self.hidden)(h))
        out = nn.Dense(2, kernel_init=nn.initializers.zeros)(h)
        log_s = jnp.tanh(out[..., 0:1]) * 0.5  # bounded scale for stability
        t = out[..., 1:2] * 0.1
        a = xyz[..., self.active_dim : self.active_dim + 1]
        if inverse:
            a = (a - t) * jnp.exp(-log_s)
        else:
            a = a * jnp.exp(log_s) + t
        return jnp.concatenate(
            [xyz[..., : self.active_dim], a, xyz[..., self.active_dim + 1 :]],
            axis=-1,
        )


class NVPWarp(nn.Module):
    """Invertible time-conditioned warp (`warping.py:269-323`)."""

    frame_info: FrameInfo
    num_freq_t: int = 6
    depth: int = 2  # coupling blocks (each hits all 3 dims)
    hidden: int = 32

    def setup(self):
        self.time_embedding = TimeEmbedding(
            num_freq_t=self.num_freq_t, frame_info=self.frame_info, out_channels=32
        )
        self.couplings = [
            _Coupling(active_dim=d % 3, hidden=self.hidden)
            for d in range(3 * self.depth)
        ]

    def __call__(self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
                 return_qt=False, rng=None):
        del samples_dict, inst_id, rng
        if return_qt:
            raise NotImplementedError("NVPWarp has no SE(3) form")
        code = self.time_embedding(frame_id)
        code = code.reshape((-1,) + (1,) * (xyz.ndim - 2) + (code.shape[-1],))
        code = jnp.broadcast_to(code, xyz.shape[:-1] + (code.shape[-1],))
        layers = self.couplings if not backward else self.couplings[::-1]
        out = xyz
        for layer in layers:
            out = layer(out, code, inverse=backward)
        return out, {}
