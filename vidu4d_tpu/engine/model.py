"""Composed Stage-2 model: neural fields + intrinsics + loss assembly.

TPU re-design of `lab4d/engine/model.py` dvr_model + `multifields.py`
MultiFields for the NeRF path (`fg_motion` without "gs-"): a single linen
module owning the per-category DynNeRF fields and the IntrinsicsMLP, whose
`loss` method is a pure function jitted inside the train step. The
reference's 8192-pixel python chunking (`model.py:432-498`) is unnecessary
under jit — the pixel dimension is sized by the batch and can further be
sharded across devices (see vidu4d_tpu.parallel).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.engine import losses as losses_mod
from vidu4d_tpu.models.fields.dyn_nerf import DynNeRF, FieldState
from vidu4d_tpu.models.fields.time_mlp import IntrinsicsMLP
from vidu4d_tpu.models.fields.warping import ComposedWarp, SkinningWarp
from vidu4d_tpu.ops import geometry as geom
from vidu4d_tpu.ops.quaternion import quaternion_translation_to_se3
from vidu4d_tpu.ops.volume import render_pixel


class DvrModel(nn.Module):
    """Stage-2 composed model (volumetric path)."""

    frame_info: FrameInfo
    field_type: str = "fg"  # {fg, bg, comp}
    fg_motion: str = "bob"
    num_inst: int = 1
    intrinsics_prior: tuple = ()  # ((fx,fy,cx,cy) per raw frame), tuple of tuples
    rtmat_prior: tuple = ()  # flattened (N,4,4) prior cams, tuple of tuples
    rgb_timefree: bool = False
    rgb_dirfree: bool = False
    use_wide_near_far: bool = False
    train_res: int = 256
    train_depth_samples: int = 64
    field_depth: int = 8
    field_width: int = 256

    def setup(self):
        fields = {}
        if self.field_type in ("fg", "comp"):
            fields["fg"] = DynNeRF(
                frame_info=self.frame_info,
                category="fg",
                fg_motion=self.fg_motion,
                num_inst=self.num_inst,
                rgb_timefree=self.rgb_timefree,
                rgb_dirfree=self.rgb_dirfree,
                train_depth_samples=self.train_depth_samples,
                depth=self.field_depth,
                width=self.field_width,
            )
        if self.field_type in ("bg", "comp"):
            fields["bg"] = DynNeRF(
                frame_info=self.frame_info,
                category="bg",
                fg_motion="rigid",
                num_inst=self.num_inst,
                rgb_timefree=self.rgb_timefree,
                rgb_dirfree=self.rgb_dirfree,
                train_depth_samples=self.train_depth_samples,
                depth=self.field_depth,
                width=self.field_width,
            )
        self.fields = fields
        self.intrinsics = IntrinsicsMLP(frame_info=self.frame_info)
        self._intrinsics_prior = (
            jnp.asarray(np.asarray(self.intrinsics_prior, np.float32))
            if len(self.intrinsics_prior) else None
        )
        self._rtmat_prior = (
            jnp.asarray(np.asarray(self.rtmat_prior, np.float32).reshape(-1, 4, 4))
            if len(self.rtmat_prior) else None
        )

    # ------------------------------------------------------------------

    def compute_kinv(self, batch):
        """Kinv = K2inv(intrinsics(t)) @ K2mat(crop2raw) (`model.py:416-429`)."""
        if "Kinv" in batch:
            return batch["Kinv"]
        kmat = self.intrinsics(batch["frameid"])
        return geom.K2inv(kmat) @ geom.K2mat(batch["crop2raw"])

    def render(self, batch, states: Dict[str, FieldState], train: bool = True,
               alpha=None, flow_thresh=None, no_warp: bool = False):
        """Render all fields and compose (`model.py:300-547`).

        Returns (rendered, aux_dict): rendered has composed (M,N,x) maps; aux
        has per-category rendered maps + matching outputs.
        """
        kinv = self.compute_kinv(batch)
        multifields, deltas_dict, aux_dict = {}, {}, {}
        for cate, field in self.fields.items():
            batch_sub = dict(batch)
            if "field2cam" in batch and isinstance(batch["field2cam"], dict):
                batch_sub["field2cam"] = batch["field2cam"][cate]
            samples = field.get_samples(
                kinv, batch_sub, states[cate], use_wide_near_far=self.use_wide_near_far
            )
            if no_warp:
                feat, deltas, aux = field.query_field(
                    samples, states[cate], train=train, alpha=alpha,
                    flow_thresh=flow_thresh, no_warp=True,
                )
            else:
                feat, deltas, aux = field.query_field(
                    samples, states[cate], train=train, alpha=alpha,
                    flow_thresh=flow_thresh,
                )
            multifields[cate] = feat
            deltas_dict[cate] = deltas
            aux_dict[cate] = aux

        field_dict, deltas = self.compose_fields(multifields, deltas_dict)
        rendered = render_pixel(field_dict, deltas)
        for cate in multifields:
            rendered_cate = render_pixel(multifields[cate], deltas_dict[cate])
            aux_dict[cate].update(rendered_cate)
        return rendered, aux_dict

    @staticmethod
    def compose_fields(multifields: Dict, deltas_dict: Dict):
        """Depth-sorted composition along rays (`multifields.py:444-503`)."""
        cates = list(multifields.keys())
        all_keys = sorted({k for f in multifields.values() for k in f})
        field_dict = {}
        for k in all_keys:
            vals = []
            template = next(f[k] for f in multifields.values() if k in f)
            for cate in cates:
                vals.append(multifields[cate].get(k, jnp.zeros_like(template)))
            field_dict[k] = jnp.concatenate(vals, axis=2)
        deltas = jnp.concatenate([deltas_dict[c] for c in cates], axis=2)

        if len(cates) > 1:
            z_idx = jnp.argsort(field_dict["depth"], axis=2)
            for k, v in field_dict.items():
                idx = jnp.broadcast_to(z_idx[..., :1], v.shape)
                field_dict[k] = jnp.take_along_axis(v, idx, axis=2)
            deltas = jnp.take_along_axis(
                deltas, jnp.broadcast_to(z_idx[..., :1], deltas.shape), axis=2
            )
        return field_dict, deltas

    # ------------------------------------------------------------------
    # regularizers needing random samples (`multifields.py:305-387`)
    # ------------------------------------------------------------------

    def _sample_aabb(self, rng, state: FieldState, nsample, extend_factor=1.0):
        aabb = geom.extend_aabb(state.aabb, factor=extend_factor)
        u = jax.random.uniform(rng, (nsample, 3))
        return aabb[0] + u * (aabb[1] - aabb[0])

    def reg_losses(self, states, rng, alpha=None):
        """Sampled regularizers: visibility decay, gauss-skin consistency,
        soft deform, camera prior (`nerf.py:466-480`, `deformable.py:234-283`,
        `pose.py:569+` via fields)."""
        out = {}
        k_vis, k_gauss, k_soft, k_inst = jax.random.split(rng, 4)

        vis_losses = []
        for cate, field in self.fields.items():
            pts = self._sample_aabb(k_vis, states[cate], 512)
            inst_id = jax.random.randint(k_inst, (512,), 0, max(self.num_inst, 1))
            vis = field.visibility(pts, inst_id)
            vis_losses.append(-jnp.mean(jax.nn.log_sigmoid(-vis)))
        out["reg_visibility"] = sum(vis_losses) / len(vis_losses)

        if "fg" in self.fields:
            field = self.fields["fg"]
            if isinstance(field.warp, SkinningWarp):
                pts = self._sample_aabb(k_gauss, states["fg"], 2048, extend_factor=0.25)
                density_gauss, density = field.gauss_skin_consistency_density(
                    pts, alpha=alpha
                )
                # balanced BCE (`deformable.py:252-268`)
                wp = 0.5 / (1e-6 + jnp.mean(density))
                wn = 0.5 / (1e-6 + jnp.mean(1 - density))
                weight = jax.lax.stop_gradient(density * wp + (1 - density) * wn)
                dg = jnp.clip(density_gauss, 1e-7, 1 - 1e-7)
                bce = -(density * jnp.log(dg) + (1 - density) * jnp.log(1 - dg))
                out["reg_gauss_skin"] = jnp.mean(bce * weight)
            if isinstance(field.warp, ComposedWarp):
                pts = self._sample_aabb(k_soft, states["fg"], 1024)
                fid = jax.random.randint(
                    k_soft, (1024,), 0, self.frame_info.num_frames_raw
                )
                iid = jnp.zeros((1024,), jnp.int32)
                out["reg_soft_deform"] = jnp.mean(
                    field.warp.compute_post_warp_dist2(pts[:, None, None], fid, iid)
                )

        # skeleton prior (`pose.py:569-600` via multifields.skel_prior_loss)
        if "fg" in self.fields:
            warp = self.fields["fg"].warp
            if isinstance(warp, SkinningWarp) and hasattr(
                warp.articulation, "skel_prior_loss"
            ):
                out["reg_skel_prior"] = warp.articulation.skel_prior_loss()

        # camera prior loss (`nerf.py:1085-1092`)
        if self._rtmat_prior is not None:
            cam_losses = []
            for cate, field in self.fields.items():
                quat, trans = field.camera_vals()
                pred = quaternion_translation_to_se3(quat, trans)
                prior = self._rtmat_prior
                prior = prior.at[:, :3, 3].multiply(jnp.exp(field.logscale))
                frame_map = jnp.asarray(self.frame_info.frame_mapping)
                cam_losses.append(jnp.mean((pred - prior[frame_map]) ** 2))
            out["reg_cam_prior"] = sum(cam_losses) / len(cam_losses)
        return out

    # ------------------------------------------------------------------

    def loss(self, batch, states, config: Dict, weights: Dict, rng,
             train: bool = True):
        """Full forward + loss assembly (`model.py:67-92, 549-1012`).

        Args:
            batch: flattened (M, N, ...) pixel batch (pairs merged).
            config: static config dict (loss weights etc.).
            weights: step-annealed overrides from `schedules.progress_schedule`.
        """
        alpha = weights.get("alpha", None)
        rendered, aux_dict = self.render(
            batch, states, train=train, alpha=alpha,
            flow_thresh=config.get("train_res", None),
        )
        loss_dict = losses_mod.compute_recon_loss(rendered, aux_dict, batch, config)
        loss_dict = losses_mod.mask_losses(loss_dict, batch, config)

        # per-ray regularizers already rendered (`model.py:856-866`)
        loss_dict["reg_eikonal"] = rendered["eikonal"]
        if "fg" in aux_dict:
            fg = aux_dict["fg"]
            if "cyc_dist" in fg:
                loss_dict["reg_deform_cyc"] = fg["cyc_dist"]
            if "delta_skin" in fg:
                loss_dict["reg_delta_skin"] = fg["delta_skin"]
            if "skin_entropy" in fg:
                loss_dict["reg_skin_entropy"] = fg["skin_entropy"]
        loss_dict.update(self.reg_losses(states, rng, alpha=alpha))

        loss_dict = losses_mod.apply_loss_weights(loss_dict, config, weights)
        return loss_dict, (rendered, aux_dict)
