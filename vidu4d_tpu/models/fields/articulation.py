"""Bone articulation over time (bag-of-bones).

Re-design of `lab4d/nnutils/pose.py:152-324` (ArticulationBaseMLP /
ArticulationFlatMLP): a time MLP with per-bone so3/translation heads,
converted to bone-to-object dual quaternions. The skeleton variant
(`ArticulationSkelMLP`, `pose.py:326-568`) adds FK over a predefined
skeleton; the flat variant is what the published Vidu4D recipe uses
(`--fg_motion bob`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.time_mlp import Head, TimeMLPTrunk
from vidu4d_tpu.ops.quaternion import (
    DualQuaternion,
    axis_angle_to_quaternion,
    quaternion_translation_to_dual_quaternion,
)


class ArticulationFlatMLP(nn.Module):
    """Free per-bone SE(3) over time ("bag of bones")."""

    frame_info: FrameInfo
    num_se3: int = 25
    depth: int = 5
    width: int = 256
    num_freq_t: int = 6

    def setup(self):
        # the reference shrinks the MLP for >=50 bones (warping.py:357-360)
        d, w = (self.depth, self.width) if self.num_se3 < 50 else (2, 32)
        self.time_mlp = TimeMLPTrunk(
            frame_info=self.frame_info, depth=d, width=w,
            num_freq_t=self.num_freq_t,
        )
        self.trans_head = Head(3 * self.num_se3, hidden=w // 2)
        self.so3_head = Head(3 * self.num_se3, hidden=w // 2)

    def _heads_to_dq(self, t_feat) -> DualQuaternion:
        trans = 0.1 * self.trans_head(t_feat)  # ScaleLayer(0.1), pose.py:283
        so3 = self.so3_head(t_feat)
        shape = t_feat.shape[:-1] + (self.num_se3, 3)
        qr = axis_angle_to_quaternion(so3.reshape(shape))
        return quaternion_translation_to_dual_quaternion(qr, trans.reshape(shape))

    def __call__(self, frame_id=None) -> DualQuaternion:
        """Bone-to-object transforms at given frames: ((..., B, 4), (..., B, 4))."""
        if frame_id is None:
            frame_id = jnp.asarray(self.frame_info.frame_mapping)
        return self._heads_to_dq(self.time_mlp(frame_id))

    def mean_vals(self) -> DualQuaternion:
        """Rest-shape bone-to-object transforms ((1, B, 4), (1, B, 4))."""
        return self._heads_to_dq(self.time_mlp.mean_feat())

    def vals_and_mean(self, frame_id=None):
        """(t_articulation, rest_articulation broadcast to match)."""
        pred_t = self(frame_id)
        pred_mean = self.mean_vals()
        pred_mean = (
            jnp.broadcast_to(pred_mean[0], pred_t[0].shape),
            jnp.broadcast_to(pred_mean[1], pred_t[1].shape),
        )
        return pred_t, pred_mean
