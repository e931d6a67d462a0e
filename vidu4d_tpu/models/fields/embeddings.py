"""Fourier / time / instance embeddings (flax.linen).

Functional re-design of `lab4d/nnutils/embedding.py`: the coarse-to-fine
annealing alpha and the instance-swap probability beta are *call arguments*
(schedule state lives in the train loop), not mutable module attributes —
so the whole model stays a pure function under jit.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.data.frame_info import FrameInfo


def fourier_embed_dim(in_channels: int, n_freqs: int) -> int:
    if n_freqs == -1:
        return 0
    return in_channels * (2 * n_freqs + 1)


def pos_embed(x: jax.Array, n_freqs: int, alpha: Optional[jax.Array] = None) -> jax.Array:
    """Fourier embedding (x, sin(2^k x), cos(2^k x), ...) with optional
    coarse-to-fine annealing window w_j = 0.5(1 + cos(pi + pi clip(aN - j))).

    Args:
        x: (..., C) inputs.
        n_freqs: number of log-spaced frequency bands (static). -1 disables
            (returns 0 channels), 0 returns x unchanged.
        alpha: optional scalar in [0, 1] controlling the annealing window.
    Returns:
        (..., C * (2*n_freqs + 1)) embedding; band layout matches the
        reference: [x, sin(f0 x), cos(f0 x), sin(f1 x), ...] grouped as
        (freq, func, channel).
    """
    if n_freqs == -1:
        return x[..., :0]
    if n_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)  # (F,)
    xf = x[..., None, None, :] * freqs[:, None, None]  # (..., F, 1, C)
    bands = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-2)  # (..., F, 2, C)
    if alpha is not None:
        window = jnp.clip(alpha * n_freqs - jnp.arange(n_freqs, dtype=x.dtype), 0.0, 1.0)
        window = 0.5 * (1.0 + jnp.cos(jnp.pi * window + jnp.pi))
        bands = bands * window[:, None, None]
    out_shape = x.shape[:-1] + (x.shape[-1] * 2 * n_freqs,)
    return jnp.concatenate([x, bands.reshape(out_shape)], axis=-1)


class InstEmbedding(nn.Module):
    """Learnable per-instance code with optional swap regularization
    (`embedding.py:230-289`)."""

    num_inst: int
    inst_channels: int

    def setup(self):
        if self.inst_channels > 0:
            self.mapping = self.param(
                "mapping",
                nn.initializers.normal(1.0),
                (self.num_inst, self.inst_channels),
            )

    def __call__(self, inst_id, beta_prob: float = 0.0, rng: Optional[jax.Array] = None):
        if self.inst_channels == 0:
            return jnp.zeros(inst_id.shape + (0,))
        if self.num_inst == 1:
            inst_id = jnp.zeros_like(inst_id)
        elif beta_prob > 0.0 and rng is not None:
            k1, k2 = jax.random.split(rng)
            rand_id = jax.random.randint(k1, inst_id.shape, 0, self.num_inst)
            swap = jax.random.uniform(k2, inst_id.shape) < beta_prob
            inst_id = jnp.where(swap, rand_id, inst_id)
        return self.mapping[inst_id]

    def mean_embedding(self):
        return self.mapping.mean(axis=0)


class TimeEmbedding(nn.Module):
    """Per-frame embedding: normalized in-video time -> Fourier -> linear,
    concat per-video code -> linear (`embedding.py:137-227`)."""

    num_freq_t: int
    frame_info: FrameInfo
    out_channels: int = 128
    time_scale: float = 1.0

    def setup(self):
        self.inst_embedding = InstEmbedding(
            num_inst=self.frame_info.num_vids, inst_channels=self.out_channels
        )
        self.mapping1 = nn.Dense(self.out_channels)
        self.mapping2 = nn.Dense(self.out_channels)

        off_raw = np.asarray(self.frame_info.frame_offset_raw)
        raw_fid_to_vid = self.frame_info.raw_fid_to_vid()
        self._raw_fid_to_vid = jnp.asarray(raw_fid_to_vid)
        self._raw_fid_to_vstart = jnp.asarray(off_raw[raw_fid_to_vid])
        self._raw_fid_to_vidlen = jnp.asarray(
            off_raw[raw_fid_to_vid + 1] - off_raw[raw_fid_to_vid]
        )
        self._max_ts = float((off_raw[1:] - off_raw[:-1]).max())
        self._frame_mapping = jnp.asarray(self.frame_info.frame_mapping)

    def frame_to_tid(self, frame_id):
        frame_id = frame_id.astype(jnp.int32)
        vid_len = self._raw_fid_to_vidlen[frame_id]
        tid_sub = frame_id.astype(jnp.float32) - self._raw_fid_to_vstart[frame_id]
        tid = (tid_sub - vid_len / 2.0) / self._max_ts * 2.0
        return tid * self.time_scale

    def __call__(self, frame_id=None):
        """frame_id: (...,) raw ids, or None for all mapped frames.
        Returns (..., out_channels)."""
        if frame_id is None:
            frame_id = self._frame_mapping
        inst_id = self._raw_fid_to_vid[frame_id.astype(jnp.int32)]
        t_sample = self.frame_to_tid(frame_id)[..., None]  # (..., 1)

        coeff = pos_embed(t_sample, self.num_freq_t)
        inst_code = self.inst_embedding(inst_id)
        t_embed = jnp.concatenate([self.mapping1(coeff), inst_code], axis=-1)
        return self.mapping2(t_embed)

    def mean_embedding(self):
        """Mean time embedding over all mapped frames (`embedding.py:221-227`)."""
        return self(self._frame_mapping).mean(axis=0, keepdims=True)


def adjusted_num_freq_t(frame_info: FrameInfo, num_freq_t: int) -> int:
    """TimeMLP's video-length-aware frequency count
    (`lab4d/nnutils/time.py:36-43`): num_frames=64 -> num_freq_t."""
    if num_freq_t <= 0:
        return num_freq_t
    max_ts = frame_info.max_vid_len
    return int(np.rint(math.log2(max(max_ts, 1) / 64) + num_freq_t))
