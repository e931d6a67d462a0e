"""Warping fields: identity / dense / dense-SE3 / neural blend skinning.

Re-design of `lab4d/nnutils/warping.py`. All warps share one functional
interface:

    warp(xyz, frame_id, inst_id, backward=..., samples_dict=...) ->
        (warped_xyz or (q, t), aux dict)

where samples_dict may carry cached articulations ("t_articulation",
"rest_articulation") to avoid recomputation, exactly like the reference. The
hot path — DQ skinning of (M, N, D) points against B bones — is two MXU
matmuls inside `dual_quaternion_skinning`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.articulation import ArticulationFlatMLP
from vidu4d_tpu.models.fields.embeddings import TimeEmbedding, pos_embed
from vidu4d_tpu.models.fields.mlp import CondMLP
from vidu4d_tpu.models.fields.skinning import (
    SkinningField,
    cross_entropy_skin_loss,
    get_xyz_bone_distance,
)
from vidu4d_tpu.ops.quaternion import (
    axis_angle_to_quaternion,
    dual_quaternion_inverse,
    dual_quaternion_mul,
    dual_quaternion_skinning,
    quaternion_translation_inverse,
)


class IdentityWarp(nn.Module):
    """Rigid warp: no deformation (`warping.py:73-104`)."""

    frame_info: FrameInfo

    @property
    def num_inst(self):
        return self.frame_info.num_vids

    def __call__(self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
                 return_qt=False, rng=None):
        del backward, samples_dict, rng
        if return_qt:
            q = jnp.zeros(xyz.shape[:-1] + (4,), xyz.dtype).at[..., 0].set(1.0)
            t = jnp.zeros_like(xyz)
            return (q, t), {}
        return xyz, {}


class DenseWarp(nn.Module):
    """D-NeRF-style dense translation fields, separate forward/backward MLPs
    (`warping.py:119-185`)."""

    frame_info: FrameInfo
    num_freq_xyz: int = 6
    num_freq_t: int = 6
    depth: int = 6
    width: int = 256

    def setup(self):
        num_inst = self.frame_info.num_vids
        self.pos_dim = 3 * (2 * self.num_freq_xyz + 1)
        self.time_embedding = TimeEmbedding(
            num_freq_t=self.num_freq_t, frame_info=self.frame_info
        )
        self.forward_map = CondMLP(
            num_inst=num_inst, depth=self.depth, width=self.width, out_channels=3
        )
        self.backward_map = CondMLP(
            num_inst=num_inst, depth=self.depth, width=self.width, out_channels=3
        )

    def _embed(self, xyz, frame_id):
        xyz_embed = pos_embed(xyz, self.num_freq_xyz)
        t_embed = self.time_embedding(frame_id)
        t_embed = t_embed.reshape((-1,) + (1,) * (xyz.ndim - 2) + (t_embed.shape[-1],))
        t_embed = jnp.broadcast_to(t_embed, xyz.shape[:-1] + (t_embed.shape[-1],))
        return jnp.concatenate([xyz_embed, t_embed], axis=-1)

    def __call__(self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
                 return_qt=False, rng=None):
        del samples_dict, rng
        if return_qt:
            raise NotImplementedError("DenseWarp has no SE(3) form")
        embed = self._embed(xyz, frame_id)
        motion = (
            self.backward_map(embed, inst_id)
            if backward
            else self.forward_map(embed, inst_id)
        )
        return xyz + motion * 0.1, {}


class DenseWarpSE3(nn.Module):
    """Per-point quat+trans dense warp for 4DGS (`warping.py:186-267`)."""

    frame_info: FrameInfo
    num_freq_xyz: int = 6
    num_freq_t: int = 6
    depth: int = 6
    width: int = 256

    def setup(self):
        num_inst = self.frame_info.num_vids
        self.time_embedding = TimeEmbedding(
            num_freq_t=self.num_freq_t, frame_info=self.frame_info
        )
        self.trans_scaling = self.param(
            "trans_scaling", lambda k, s: jnp.full(s, 0.1), (1,)
        )
        self.forward_map_trans = CondMLP(
            num_inst=num_inst, depth=self.depth, width=self.width // 2, out_channels=3
        )
        self.forward_map_rot = CondMLP(
            num_inst=num_inst, depth=self.depth, width=self.width // 2, out_channels=3
        )

    def __call__(self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
                 return_qt=False, rng=None):
        del samples_dict, rng
        xyz_embed = pos_embed(xyz, self.num_freq_xyz)
        t_embed = self.time_embedding(frame_id)
        t_embed = t_embed.reshape((-1,) + (1,) * (xyz.ndim - 2) + (t_embed.shape[-1],))
        t_embed = jnp.broadcast_to(t_embed, xyz.shape[:-1] + (t_embed.shape[-1],))
        embed = jnp.concatenate([xyz_embed, t_embed], axis=-1)

        trans = self.forward_map_trans(embed, inst_id) * self.trans_scaling
        qr = axis_angle_to_quaternion(self.forward_map_rot(embed, inst_id))
        if backward:
            qr, trans = quaternion_translation_inverse(qr, trans)
        if return_qt:
            return (qr, trans), {}
        return xyz + trans, {}


class SkinningWarp(nn.Module):
    """Neural dual-quaternion blend-skinning warp (`warping.py:325-514`).
    skel_type "flat" = bag of bones; "human"/"quad" = predefined skeleton."""

    frame_info: FrameInfo
    num_se3: int = 25
    skel_type: str = "flat"
    num_freq_xyz: int = 10
    num_freq_t: int = 6
    init_gauss_scale: float = 0.03
    init_beta: float = 0.01
    delta_skin: bool = True

    def setup(self):
        num_inst = self.frame_info.num_vids
        if self.skel_type == "flat":
            self.articulation = ArticulationFlatMLP(
                frame_info=self.frame_info, num_se3=self.num_se3
            )
            num_se3 = self.num_se3
            symm_idx = None
        else:
            from vidu4d_tpu.models.fields.skeleton import (
                ArticulationSkelMLP,
                get_predefined_skeleton,
            )

            self.articulation = ArticulationSkelMLP(
                frame_info=self.frame_info, skel_type=self.skel_type
            )
            _, _, symm_idx = get_predefined_skeleton(self.skel_type)
            num_se3 = len(symm_idx)
        self.skinning_model = SkinningField(
            num_coords=num_se3,
            frame_info=self.frame_info,
            num_inst=num_inst,
            init_scale=self.init_gauss_scale,
            delta_skin=self.delta_skin,
            symm_idx=tuple(symm_idx) if symm_idx is not None else None,
        )
        self.logibeta = self.param(
            "logibeta",
            lambda k, s: -jnp.log(jnp.full(s, self.init_beta)),
            (1,),
        )

    def _articulations(self, frame_id, samples_dict):
        if samples_dict and "rest_articulation" in samples_dict and "t_articulation" in samples_dict:
            return samples_dict["t_articulation"], samples_dict["rest_articulation"]
        return self.articulation.vals_and_mean(frame_id)

    def __call__(self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
                 return_qt=False, rng=None):
        """xyz: (M, N, D, 3). Returns (warped (or (q, t)), aux dict with
        'skin_entropy' and 'delta_skin' (M, N, D, 1))."""
        t_articulation, rest_articulation = self._articulations(frame_id, samples_dict)

        if backward:
            se3 = dual_quaternion_mul(
                rest_articulation, dual_quaternion_inverse(t_articulation)
            )
            articulation = t_articulation
            skin_frame_id = frame_id
        else:
            se3 = dual_quaternion_mul(
                t_articulation, dual_quaternion_inverse(rest_articulation)
            )
            articulation = rest_articulation
            skin_frame_id = None  # rest pose -> mean time embedding

        # keep the articulation at (M, 1, 1, B, 4) and let broadcasting do
        # the rest: the DQ inverse inside get_bone_coords then runs on B
        # bones instead of N*B broadcast copies (autodiff otherwise drags
        # N-sized intermediates through the whole inverse chain)
        articulation = (
            articulation[0][:, None, None],
            articulation[1][:, None, None],
        )
        skin, delta_skin = self.skinning_model(
            xyz, articulation, skin_frame_id, inst_id
        )
        # fusion boundary (see skinning.py): keep the logits materialized so
        # the softmax/blend backward doesn't re-derive the skinning chain
        skin = jax.lax.optimization_barrier(skin)
        skin_prob = jax.nn.softmax(skin, axis=-1)

        out = dual_quaternion_skinning(se3, xyz, skin_prob, return_qt=return_qt)

        aux = {"skin_entropy": cross_entropy_skin_loss(skin)[..., None]}
        if delta_skin is not None:
            aux["delta_skin"] = jnp.mean(delta_skin**2, axis=-1, keepdims=True)
        return out, aux

    def get_gauss_density(self, xyz, bone2obj=None):
        """Bone-proxy density at points (`warping.py:475-505`): hard max over
        per-bone spherical Gaussians of radius 0.01."""
        if bone2obj is None:
            bone2obj = self.articulation.mean_vals()
        dist2 = get_xyz_bone_distance(xyz, bone2obj) / (0.01**2)
        return jnp.max(jnp.exp(-0.5 * dist2), axis=-1)[..., None]

    def get_gauss_sdf(self, xyz, bias=0.0):
        density = jnp.clip(self.get_gauss_density(xyz), 1e-6, 1 - 1e-6)
        return -jax.scipy.special.logit(density) + bias


class ComposedWarp(nn.Module):
    """Skeleton/bones warp composed with a soft DenseWarp post-warp
    (`warping.py:517-611`)."""

    frame_info: FrameInfo
    num_se3: int = 25
    skel_type: str = "flat"

    def setup(self):
        self.skin_warp = SkinningWarp(
            frame_info=self.frame_info, num_se3=self.num_se3,
            skel_type=self.skel_type,
        )
        self.post_warp = DenseWarp(frame_info=self.frame_info, depth=2, width=256)

    def __call__(self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
                 return_qt=False, rng=None):
        if return_qt:
            raise NotImplementedError("ComposedWarp has no SE(3) form")
        if not backward and frame_id is not None:
            xyz, _ = self.post_warp(xyz, frame_id, inst_id, backward=False)
        out, aux = self.skin_warp(
            xyz, frame_id, inst_id, backward=backward, samples_dict=samples_dict
        )
        if backward and frame_id is not None:
            out, _ = self.post_warp(out, frame_id, inst_id, backward=True)
        return out, aux

    def compute_post_warp_dist2(self, xyz, frame_id, inst_id):
        xyz_t, _ = self.post_warp(xyz, frame_id, inst_id, backward=False)
        dist2 = jnp.sum((xyz_t - xyz) ** 2, axis=-1)
        xyz_back, _ = self.post_warp(xyz_t, frame_id, inst_id, backward=True)
        return (dist2 + jnp.sum((xyz_t - xyz_back) ** 2, axis=-1)) * 0.5


def warp_module(fg_motion: str, frame_info: FrameInfo) -> nn.Module:
    """Factory matching `warping.py:24-70` create_warp strings."""
    if fg_motion == "rigid":
        return IdentityWarp(frame_info=frame_info)
    if fg_motion == "dense":
        return DenseWarp(frame_info=frame_info)
    if fg_motion == "denseSE3":
        return DenseWarpSE3(frame_info=frame_info)
    if fg_motion == "bob":
        return SkinningWarp(frame_info=frame_info)
    if fg_motion == "bob-nosoft":
        return SkinningWarp(frame_info=frame_info, delta_skin=False)
    if fg_motion == "bob-sc":
        return SkinningWarp(frame_info=frame_info, delta_skin=False, num_se3=100)
    if fg_motion == "nvp":
        from vidu4d_tpu.models.fields.nvp import NVPWarp

        return NVPWarp(frame_info=frame_info)
    if fg_motion.startswith("skel-"):
        return SkinningWarp(frame_info=frame_info, skel_type=fg_motion.split("-")[1])
    if fg_motion.startswith("comp"):
        # "comp_skel-{human,quad}_{bob,dense}" (`warping.py:58-66`)
        parts = fg_motion.split("_")
        skel = parts[1].split("-")[1] if len(parts) > 1 and "skel" in parts[1] else "flat"
        return ComposedWarp(frame_info=frame_info, skel_type=skel)
    raise NotImplementedError(f"fg_motion {fg_motion!r}")
