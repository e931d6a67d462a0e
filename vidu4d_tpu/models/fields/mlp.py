"""Skip-connected MLP backbones (flax.linen).

Same topology as the reference `lab4d/nnutils/base.py` BaseMLP/CondMLP:
D hidden layers of width W with input skip connections, optional instance
conditioning code concatenated to the input.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidu4d_tpu.models.fields.embeddings import InstEmbedding


class BaseMLP(nn.Module):
    depth: int = 8
    width: int = 256
    out_channels: int = 3
    skips: Sequence[int] = (4,)
    final_act: bool = False

    @nn.compact
    def __call__(self, x):
        out = x
        for i in range(self.depth):
            if i in self.skips:
                out = jnp.concatenate([x, out], axis=-1)
            out = nn.relu(nn.Dense(self.width, name=f"linear_{i + 1}")(out))
        out = nn.Dense(self.out_channels, name="linear_final")(out)
        if self.final_act:
            out = nn.relu(out)
        return out


class CondMLP(nn.Module):
    """BaseMLP with an instance-conditioning code appended to the input."""

    num_inst: int
    depth: int = 8
    width: int = 256
    inst_channels: int = 32
    out_channels: int = 3
    skips: Sequence[int] = (4,)
    final_act: bool = False

    def setup(self):
        # single-instance models drop the code entirely (base.py:150-155)
        self._inst_ch = self.inst_channels if self.num_inst > 1 else 0
        if self._inst_ch > 0:
            self.inst_embedding = InstEmbedding(
                num_inst=self.num_inst, inst_channels=self._inst_ch
            )
        self.mlp = BaseMLP(
            depth=self.depth,
            width=self.width,
            out_channels=self.out_channels,
            skips=self.skips,
            final_act=self.final_act,
        )

    def __call__(
        self,
        feat: jax.Array,
        inst_id: Optional[jax.Array] = None,
        beta_prob: float = 0.0,
        rng: Optional[jax.Array] = None,
    ):
        """feat: (M, ..., C); inst_id: (M,) or None for the mean instance."""
        if self._inst_ch > 0:
            if inst_id is None:
                code = self.inst_embedding.mean_embedding()
                code = jnp.broadcast_to(code, feat.shape[:-1] + (self._inst_ch,))
            else:
                code = self.inst_embedding(inst_id, beta_prob=beta_prob, rng=rng)
                code = code.reshape(code.shape[:1] + (1,) * (feat.ndim - 2) + (-1,))
                code = jnp.broadcast_to(code, feat.shape[:-1] + (self._inst_ch,))
            feat = jnp.concatenate([feat, code], axis=-1)
        return self.mlp(feat)
