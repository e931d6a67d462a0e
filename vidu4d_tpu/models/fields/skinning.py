"""Gaussian-bone skinning field.

Re-design of `lab4d/nnutils/skinning.py` + the bone-coordinate transforms of
`lab4d/utils/transforms.py`: per-bone anisotropic Gaussian scales plus an
optional time/instance-conditioned delta-skin MLP.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.embeddings import TimeEmbedding, pos_embed
from vidu4d_tpu.models.fields.mlp import CondMLP
from vidu4d_tpu.ops.quaternion import (
    DualQuaternion,
    dual_quaternion_apply,
    dual_quaternion_inverse,
    dual_quaternion_to_quaternion_translation,
)


def get_bone_coords(xyz: jax.Array, bone2obj: DualQuaternion) -> jax.Array:
    """Object-space points -> per-bone coordinates (`transforms.py:9-25`).

    The whole DQ-inverse/apply chain is evaluated on the TINY per-bone
    arrays (B rotations), then applied to the N points as ONE einsum:
    x_bone = R_b x + t_b. Running the quaternion algebra per point-per-bone
    instead (the naive port) builds ~60 elementwise ops over
    (M, N, 1, B, ·) arrays whose autodiff dominated the whole Stage-3 step
    (~300 ms at 2x200k points; the einsum form is MXU work and its VJP is
    two more einsums).

    Args:
        xyz: (..., 3); bone2obj: ((..., B, 4), (..., B, 4)) — leading dims
            broadcastable against xyz's.
    Returns:
        (..., B, 3)
    """
    from vidu4d_tpu.ops.quaternion import quaternion_to_matrix

    obj2bone = dual_quaternion_inverse(bone2obj)
    q, t = dual_quaternion_to_quaternion_translation(obj2bone)  # (..., B, 4/3)
    b = q.shape[-2]
    lead_b = q.shape[:-2]
    lead_x = xyz.shape[:-1]
    if (
        len(lead_b) >= 1
        and lead_b[0] == lead_x[0]
        and all(d == 1 for d in lead_b[1:])
    ):
        # bones are per-frame only (the skinning hot path): squeeze the
        # broadcast dims so the einsum lowers to one thin (N,3)x(3,B*3)
        # matmul per frame — ellipsis-broadcast einsums materialize the
        # rotation matrices per POINT instead
        m = lead_x[0]
        rmat = quaternion_to_matrix(q.reshape(m, b, 4))  # (M, B, 3, 3)
        xb = jnp.einsum(
            "mbij,mnj->mnbi", rmat, xyz.reshape(m, -1, 3),
            preferred_element_type=xyz.dtype,
        ).reshape(lead_x + (b, 3))
        return xb + t.reshape((m,) + (1,) * (len(lead_x) - 1) + (b, 3))
    # general case (per-point bone transforms): quaternion apply
    xyz_e = jnp.broadcast_to(xyz[..., None, :], lead_x + (b, 3))
    return dual_quaternion_apply(obj2bone, xyz_e)


def get_xyz_bone_distance(xyz: jax.Array, bone2obj: DualQuaternion) -> jax.Array:
    """Squared distance to bone centers (`transforms.py:28-40`)."""
    _, center = dual_quaternion_to_quaternion_translation(bone2obj)
    return jnp.sum((xyz[..., None, :] - center) ** 2, axis=-1)


def cross_entropy_skin_loss(skin: jax.Array) -> jax.Array:
    """CE between unnormalized skin logits and their one-hot argmax
    (`lab4d/utils/loss_utils.py:21-42`): encourages peaky assignments."""
    log_prob = jax.nn.log_softmax(skin, axis=-1)
    return -jnp.take_along_axis(
        log_prob, jnp.argmax(skin, axis=-1, keepdims=True), axis=-1
    )[..., 0]


def entropy_loss(prob: jax.Array, axis: int = -1) -> jax.Array:
    """Entropy of a probability distribution (`loss_utils.py:7-18`)."""
    return -jnp.sum(prob * jnp.log(prob + 1e-9), axis=axis)


def arap_bone_loss(bones_t1: jax.Array, bones_t2: jax.Array, k: int = 10) -> jax.Array:
    """As-rigid-as-possible rigidity on bone centers between two frames.

    Simplified equivalent of the reference's ARAP term on articulation
    translations (`lab4d/nnutils/util.py:4-13`, default-off via arap_wt=0):
    preserve pairwise distances to the K nearest bones.

    Args:
        bones_t1, bones_t2: (B, 3) bone centers at two frames.
    """
    d1 = jnp.sum((bones_t1[:, None] - bones_t1[None]) ** 2, axis=-1)
    d2 = jnp.sum((bones_t2[:, None] - bones_t2[None]) ** 2, axis=-1)
    b = bones_t1.shape[0]
    k = min(k, b - 1)
    big = jnp.max(d1) + 1.0
    d1_self = d1 + jnp.eye(b) * big
    _, idx = jax.lax.top_k(-d1_self, k)  # (B, K) nearest neighbors at t1
    l1 = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d1, idx, axis=1), 1e-12))
    l2 = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d2, idx, axis=1), 1e-12))
    return jnp.mean((l1 - l2) ** 2)


class SkinningField(nn.Module):
    """Per-bone 3D Gaussian skinning weights + optional delta-skin MLP."""

    num_coords: int
    frame_info: FrameInfo
    num_inst: int
    delta_skin: bool = True
    depth: int = 2
    width: int = 64
    num_freq_xyz: int = 0
    num_freq_t: int = 6
    inst_channels: int = 32
    init_scale: float = 0.03
    symm_idx: Optional[tuple] = None  # left/right bone symmetry averaging

    def setup(self):
        self.log_gauss = self.param(
            "log_gauss",
            lambda key, shape: jnp.full(shape, jnp.log(self.init_scale)),
            (self.num_coords, 3),
        )
        if self.delta_skin:
            self.time_embedding = TimeEmbedding(
                num_freq_t=self.num_freq_t, frame_info=self.frame_info
            )
            self.delta_field = CondMLP(
                num_inst=self.num_inst,
                depth=self.depth,
                width=self.width,
                out_channels=self.num_coords,
                inst_channels=self.inst_channels,
                skips=(4,),
            )

    def get_gauss(self) -> jax.Array:
        """(B, 3) per-bone Gaussian scales, symmetry-averaged for skeletons
        (`skinning.py:143-151`)."""
        log_gauss = self.log_gauss
        if self.symm_idx is not None:
            log_gauss = (log_gauss[jnp.asarray(self.symm_idx)] + log_gauss) / 2.0
        return jnp.exp(log_gauss)

    def __call__(
        self,
        xyz: jax.Array,  # (M, N, D, 3) canonical points
        bone2obj: DualQuaternion,  # ((M, N, D, B, 4), (M, N, D, B, 4))
        frame_id: Optional[jax.Array],  # (M,) or None
        inst_id: Optional[jax.Array],  # (M,) or None
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Returns (skin logits (M, N, D, B), delta or None)."""
        xyz_bone = get_bone_coords(xyz, bone2obj) / self.get_gauss()
        # materialization boundary: without it XLA's fusion pass duplicates
        # the whole per-point chain into EVERY parameter-cotangent reduce of
        # the backward (measured: each param subtree's grad costs <=22 ms
        # but the combined grad 290 ms with a ~9-minute compile; barriers
        # make the chain compute once and cut the fusion search space)
        xyz_bone = jax.lax.optimization_barrier(xyz_bone)
        dist2 = jnp.sum(xyz_bone**2, axis=-1)  # (M, N, D, B)

        if self.delta_skin:
            xyz_embed = pos_embed(
                xyz_bone.reshape(xyz.shape[:-1] + (-1,)), self.num_freq_xyz
            )
            if frame_id is None:
                t_embed = self.time_embedding.mean_embedding()
            else:
                t_embed = self.time_embedding(frame_id)
            t_embed = t_embed.reshape((-1,) + (1,) * (xyz.ndim - 2) + (t_embed.shape[-1],))
            t_embed = jnp.broadcast_to(t_embed, xyz.shape[:-1] + (t_embed.shape[-1],))
            embed = jnp.concatenate([xyz_embed, t_embed], axis=-1)
            delta = nn.relu(self.delta_field(embed, inst_id)) * 0.1
            return -(dist2 + delta), delta
        return -dist2, None
