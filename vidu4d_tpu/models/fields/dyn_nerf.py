"""Dynamic neural SDF field (VolSDF + neural blend skinning + feature head).

One configurable module replacing the reference's NeRF -> FeatureNeRF ->
Deformable inheritance chain (`lab4d/nnutils/nerf.py`, `feature.py`,
`deformable.py`): `fg_motion="rigid"` gives the static field (bg), any warp
type gives the deformable field (fg). Everything is a pure function of
(params, inputs, FieldState), so the whole ray query jits end-to-end:

* backward warp: camera rays -> time-t object space -> canonical (DQ skinning)
* VolSDF density: Laplace-CDF of the learned SDF
* color MLP with optional view direction / appearance conditioning
* canonical feature head + softmax global matching + reprojection
* flow by forward-warping to the paired frame's camera
* cycle consistency, eikonal (via jax.grad), gauss-bone density

Dynamic-shape tricks in the reference (valid_idx compaction at eval,
`nerf.py:656-781`) become masking; the eval-time importance sampling
(`nerf.py:683-731`) is reproduced with stop-gradient + deterministic CDF
sampling.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.numerics import safe_norm, safe_normalize

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.embeddings import pos_embed
from vidu4d_tpu.models.fields.mlp import BaseMLP, CondMLP
from vidu4d_tpu.models.fields.time_mlp import AppearanceEmbedding, CameraMLP
from vidu4d_tpu.models.fields.warping import SkinningWarp, warp_module
from vidu4d_tpu.ops import geometry as geom
from vidu4d_tpu.ops.quaternion import (
    quaternion_translation_apply,
    quaternion_translation_inverse,
    quaternion_translation_to_se3,
)
from vidu4d_tpu.ops.volume import sample_cam_rays, compute_weights, sample_pdf


class FieldState(NamedTuple):
    """Non-parameter field state, updated between rounds (host-side):
    mirrors the reference's buffers (`nerf.py:160-167`)."""

    aabb: jax.Array  # (2, 3) canonical-space bounds
    near_far: jax.Array  # (N_raw, 2) per-frame near/far
    proxy_pts: jax.Array  # (P, 3) points on the proxy geometry (for near-far)

    @staticmethod
    def initial(num_frames_raw: int, radius: float = 0.12, n_proxy: int = 64):
        # initial proxy: points on a sphere of `radius` (deformable.py:107)
        u = jnp.linspace(0, jnp.pi, 8)
        v = jnp.linspace(0, 2 * jnp.pi, 8)
        uu, vv = jnp.meshgrid(u, v)
        sphere = radius * jnp.stack(
            [jnp.sin(uu) * jnp.cos(vv), jnp.sin(uu) * jnp.sin(vv), jnp.cos(uu)],
            axis=-1,
        ).reshape(-1, 3)
        return FieldState(
            aabb=jnp.stack([-radius * jnp.ones(3), radius * jnp.ones(3)]),
            near_far=jnp.tile(jnp.array([[0.1, 10.0]]), (num_frames_raw, 1)),
            proxy_pts=sphere[:n_proxy],
        )


def flip_pair(x):
    """Swap consecutive frame pairs along the leading axis (`nerf.py:1016-1031`)."""
    if isinstance(x, tuple):
        return tuple(flip_pair(t) for t in x)
    if isinstance(x, dict):
        return {k: flip_pair(v) for k, v in x.items()}
    if x.shape[0] < 2:
        return x
    y = x.reshape((x.shape[0] // 2, 2) + x.shape[1:])
    return y[:, ::-1].reshape(x.shape)


class DynNeRF(nn.Module):
    """Deformable VolSDF field with feature/flow/cycle outputs."""

    frame_info: FrameInfo
    category: str = "fg"
    fg_motion: str = "bob"
    num_inst: int = 1
    depth: int = 8
    width: int = 256
    num_freq_xyz: int = 10
    num_freq_dir: int = 4
    appr_channels: int = 32
    inst_channels: int = 32
    init_beta: float = 0.1
    init_scale: float = 0.1
    color_act: bool = True
    feature_channels: int = 16
    rgb_timefree: bool = False  # drop appearance code (config.py rgb_timefree)
    rgb_dirfree: bool = False  # drop view direction  (config.py rgb_dirfree)
    train_depth_samples: int = 64
    eval_depth_samples: int = 128

    def setup(self):
        self.basefield = CondMLP(
            num_inst=self.num_inst, depth=self.depth, width=self.width,
            inst_channels=self.inst_channels, out_channels=self.width,
            skips=(4,), final_act=True,
        )
        self.colorfield = CondMLP(
            num_inst=self.num_inst, depth=2, width=self.width,
            inst_channels=self.inst_channels, out_channels=self.width,
            skips=(4,), final_act=True,
        )
        self.sdf_head = nn.Dense(1)
        self.rgb_hidden = nn.Dense(self.width // 2)
        self.rgb_out = nn.Dense(3)

        self._appr_channels = 0 if self.rgb_timefree else self.appr_channels
        if self._appr_channels > 0:
            self.appr_embedding = AppearanceEmbedding(
                frame_info=self.frame_info, appr_channels=self._appr_channels
            )
        self._num_freq_dir = -1 if self.rgb_dirfree else self.num_freq_dir

        self.logibeta = self.param(
            "logibeta", lambda k, s: -jnp.log(jnp.full(s, self.init_beta)), (1,)
        )
        self.logscale = self.param(
            "logscale", lambda k, s: jnp.log(jnp.full(s, self.init_scale)), (1,)
        )

        self.camera_mlp = CameraMLP(frame_info=self.frame_info)

        # visibility field (visibility.py:9-63)
        self.vis_field = CondMLP(
            num_inst=self.num_inst, depth=2, width=64,
            inst_channels=self.inst_channels, out_channels=1, skips=(4,),
        )

        # canonical feature field (feature.py:79-92)
        self.feature_field = BaseMLP(
            depth=5, width=128, out_channels=self.feature_channels, skips=(4,),
        )
        self.logsigma = self.param("logsigma", nn.initializers.zeros, (1,))

        self.warp = warp_module(self.fg_motion, self.frame_info)

    # ------------------------------------------------------------------
    # core field queries
    # ------------------------------------------------------------------

    def sdf(self, xyz, inst_id=None, alpha=None):
        """Signed distance (negative inside). xyz: (..., 3)."""
        xyz_embed = pos_embed(xyz, self.num_freq_xyz, alpha=alpha)
        feat = self.basefield(xyz_embed, inst_id)
        return self.sdf_head(feat), feat

    def density_from_sdf(self, sdf):
        """VolSDF Laplace-CDF density (`nerf.py:196-202`)."""
        ibeta = jnp.exp(self.logibeta)
        return (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) * ibeta)) * ibeta

    def query(self, xyz, direction=None, frame_id=None, inst_id=None,
              get_density=True, alpha=None):
        """Field forward (`nerf.py:169-216`): returns density (or sdf), and
        optionally rgb when a direction is given."""
        sdf, xyz_feat = self.sdf(xyz, inst_id=inst_id, alpha=alpha)
        out = self.density_from_sdf(sdf) if get_density else sdf
        if direction is None:
            return out

        if self._num_freq_dir >= 0:
            dir_embed = pos_embed(direction, self._num_freq_dir)
        else:
            dir_embed = direction[..., :0]
        if self._appr_channels > 0:
            appr = self.appr_embedding(frame_id)
            appr = jnp.broadcast_to(
                appr[:, None, None, :], dir_embed.shape[:-1] + (appr.shape[-1],)
            )
            appr_embed = jnp.concatenate([dir_embed, appr], axis=-1)
        else:
            appr_embed = dir_embed

        xyz_embed_c = pos_embed(xyz, self.num_freq_xyz + 2, alpha=None)
        xyz_feat = xyz_feat + self.colorfield(xyz_embed_c, inst_id)
        rgb = self.rgb_out(nn.relu(self.rgb_hidden(
            jnp.concatenate([xyz_feat, appr_embed], axis=-1)
        )))
        if self.color_act:
            rgb = jax.nn.sigmoid(rgb)
        return rgb, out

    def visibility(self, xyz, inst_id=None):
        return self.vis_field(pos_embed(xyz, 10), inst_id)

    def features(self, xyz):
        """Canonical feature head, L2-normalized (`feature.py:142-156`)."""
        feat = self.feature_field(pos_embed(xyz, 6))
        return safe_normalize(feat)

    # ------------------------------------------------------------------
    # camera / warps
    # ------------------------------------------------------------------

    def camera_vals(self, frame_id=None):
        return self.camera_mlp(frame_id)

    @staticmethod
    def cam_to_field(xyz_cam, dir_cam, field2cam):
        """(`nerf.py:926-948`)."""
        q, t = quaternion_translation_inverse(field2cam[0], field2cam[1])
        q = q[:, None, None]
        t = t[:, None, None]
        xyz = quaternion_translation_apply(q, t, xyz_cam)
        direction = quaternion_translation_apply(q, jnp.zeros_like(t), dir_cam)
        return xyz, direction

    @staticmethod
    def field_to_cam(xyz, field2cam):
        q = field2cam[0][:, None, None]
        t = field2cam[1][:, None, None]
        return quaternion_translation_apply(q, t, xyz)

    def backward_warp(self, xyz_cam, dir_cam, field2cam, frame_id, inst_id,
                      samples_dict=None):
        xyz_t, direction = self.cam_to_field(xyz_cam, dir_cam, field2cam)
        xyz, aux = self.warp(
            xyz_t, frame_id, inst_id, backward=True, samples_dict=samples_dict
        )
        out = {"xyz": xyz, "dir": direction, "xyz_t": xyz_t}
        out.update(aux)
        return out

    def forward_warp(self, xyz, field2cam, frame_id, inst_id, samples_dict=None):
        xyz_next, _ = self.warp(
            xyz, frame_id, inst_id, backward=False, samples_dict=samples_dict
        )
        return self.field_to_cam(xyz_next, field2cam)

    # ------------------------------------------------------------------
    # sample preparation (get_samples)
    # ------------------------------------------------------------------

    def get_samples(self, Kinv, batch, state: FieldState, use_wide_near_far=False):
        """Time-dependent camera/articulation cache (`nerf.py:594-654`,
        `deformable.py:285-324`)."""
        frame_id = batch["frameid"]
        inst_id = batch["dataid"]
        if "field2cam" in batch:
            field2cam = (batch["field2cam"][..., :4],
                         batch["field2cam"][..., 4:] * jnp.exp(self.logscale))
        else:
            field2cam = self.camera_vals(frame_id)

        if use_wide_near_far:
            rtmat = quaternion_translation_to_se3(field2cam[0], field2cam[1])
            near_far = geom.get_near_far(state.proxy_pts, rtmat, tol_fac=1.5)
        else:
            near_far = state.near_far[frame_id]

        samples_dict = {
            "Kinv": Kinv,
            "field2cam": field2cam,
            "frame_id": frame_id,
            "inst_id": inst_id,
            "near_far": near_far,
            "hxy": batch["hxy"],
        }
        if "feature" in batch:
            samples_dict["feature"] = batch["feature"]
        if isinstance(self.warp, SkinningWarp):
            t_art, rest_art = self.warp.articulation.vals_and_mean(frame_id)
            samples_dict["t_articulation"] = t_art
            samples_dict["rest_articulation"] = rest_art
        return samples_dict

    # ------------------------------------------------------------------
    # full ray query
    # ------------------------------------------------------------------

    def query_field(self, samples_dict, state: FieldState, train: bool = True,
                    alpha=None, flow_thresh=None, no_warp: bool = False):
        """Query the field along rays (`nerf.py:656-781`).

        Returns (feat_dict, deltas, aux_dict); all leaves (M, N, D, ...) or
        (M, N, ...) for aux.
        """
        Kinv = samples_dict["Kinv"]
        field2cam = samples_dict["field2cam"]
        frame_id = samples_dict["frame_id"]
        inst_id = samples_dict["inst_id"]
        near_far = samples_dict["near_far"]
        hxy = samples_dict["hxy"]

        if train:
            xyz_cam, dir_cam, deltas, depth = sample_cam_rays(
                hxy, Kinv, near_far, n_depth=self.train_depth_samples, perturb=False
            )
        else:
            xyz_cam, dir_cam, deltas, depth = self._importance_sampling(
                hxy, Kinv, near_far, field2cam, frame_id, inst_id, samples_dict,
                alpha=alpha,
            )

        if no_warp:
            xyz, direction = self.cam_to_field(xyz_cam, dir_cam, field2cam)
            backwarp = {"xyz": xyz, "dir": direction, "xyz_t": xyz}
        else:
            backwarp = self.backward_warp(
                xyz_cam, dir_cam, field2cam, frame_id, inst_id,
                samples_dict=samples_dict,
            )
        xyz = backwarp["xyz"]
        direction = backwarp["dir"]
        xyz_t = backwarp["xyz_t"]

        vis_score = self.visibility(xyz, inst_id)

        rgb, density = self.query(
            xyz, direction=direction, frame_id=frame_id, inst_id=inst_id,
            get_density=True, alpha=alpha,
        )
        if not train:
            # eval-time aabb masking replaces the reference's valid_idx
            # compaction (`nerf.py:561-592`)
            inside = geom.check_inside_aabb(xyz, geom.extend_aabb(state.aabb))
            density = jnp.where(inside[..., None], density, 0.0)

        feat_dict = {
            "rgb": rgb,
            "density": density,
            f"density_{self.category}": density,
            "vis": vis_score,
        }

        aux_dict = {}
        if train:
            # flow towards the paired frame (`nerf.py:1033-1083`)
            feat_dict["flow"] = self._compute_flow(
                hxy, xyz, frame_id, inst_id, field2cam, Kinv, samples_dict,
                flow_thresh=flow_thresh,
            )
            # cycle consistency (`deformable.py:203-232`)
            xyz_cycled, cyc_aux = self.warp(
                xyz, frame_id, inst_id, backward=False, samples_dict=samples_dict
            )
            cyc_dist = safe_norm(xyz_cycled - xyz_t, axis=-1, keepdims=True)
            feat_dict["cyc_dist"] = cyc_dist
            for k in ("skin_entropy", "delta_skin"):
                if k in cyc_aux and k in backwarp:
                    feat_dict[k] = (cyc_aux[k] + backwarp[k]) / 2.0
                elif k in cyc_aux:
                    feat_dict[k] = cyc_aux[k]
            # subsampled canonical eikonal (`nerf.py:482-518`)
            feat_dict["eikonal"] = self._eikonal(xyz, inst_id, alpha=alpha)
            # canonical feature + global matching (`feature.py:91-140`)
            feature = self.features(xyz)
            feat_dict["feature"] = feature
            if "feature" in samples_dict:
                xyz_matches = self.global_match(samples_dict["feature"], feature, xyz)
                xy_reproj, xyz_reproj = self._forward_project(
                    xyz_matches, field2cam, Kinv, frame_id, inst_id, samples_dict
                )
                aux_dict["xyz_matches"] = xyz_matches
                aux_dict["xyz_reproj"] = xyz_reproj
                aux_dict["xy_reproj"] = xy_reproj

        # gauss-bone density (`deformable.py:351-382`)
        if isinstance(self.warp, SkinningWarp) and "rest_articulation" in samples_dict:
            rest_art = (samples_dict["rest_articulation"][0][:1],
                        samples_dict["rest_articulation"][1][:1])
            shape = xyz.shape[:-1]
            gauss_density = self.warp.get_gauss_density(
                xyz.reshape(-1, 3), bone2obj=rest_art
            )
            gauss_density = gauss_density * jnp.exp(self.warp.logibeta)
            feat_dict["gauss_density"] = gauss_density.reshape(shape + (1,))

        feat_dict["xyz"] = xyz
        feat_dict["xyz_cam"] = xyz_cam
        feat_dict["depth"] = depth / jnp.exp(self.logscale)
        return feat_dict, deltas, aux_dict

    def _importance_sampling(self, hxy, Kinv, near_far, field2cam, frame_id,
                             inst_id, samples_dict, alpha=None):
        """Eval-time two-pass CDF sampling (`nerf.py:683-731`)."""
        n_half = self.eval_depth_samples // 2
        xyz_cam, dir_cam, deltas, depth = sample_cam_rays(
            hxy, Kinv, near_far, n_depth=n_half, perturb=False
        )
        xyz = self.backward_warp(
            xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict
        )["xyz"]
        density = self.query(xyz, frame_id=frame_id, inst_id=inst_id, alpha=alpha)
        weights, _ = compute_weights(density, deltas)

        depth_mid = 0.5 * (depth[:, :, :-1, 0] + depth[:, :, 1:, 0])
        m, n = depth.shape[:2]
        depth_new = sample_pdf(
            depth_mid.reshape(m * n, -1),
            weights.reshape(m * n, -1)[:, 1:-1],
            n_half,
            det=True,
        )
        depth_new = jax.lax.stop_gradient(depth_new).reshape(m, n, n_half, 1)
        depth_all = jnp.sort(
            jnp.concatenate([depth, depth_new], axis=-2), axis=-2
        )
        return sample_cam_rays(hxy, Kinv, near_far, depth=depth_all, perturb=False)

    def _eikonal(self, xyz, inst_id, alpha=None, sample_ratio=16):
        """Subsampled eikonal loss in canonical space (`nerf.py:482-518`).
        Deterministic stride subsampling replaces multinomial (same purpose:
        decorrelate samples; stride over the ray dim is uniform coverage)."""
        m, n, d, _ = xyz.shape
        stride = max(1, int(sample_ratio))
        xyz_sub = xyz[:, ::stride]
        xyz_sub = jax.lax.stop_gradient(xyz_sub)

        def sdf_sum(pts):
            sdf, _ = self.sdf(pts, inst_id=inst_id, alpha=alpha)
            return jnp.sum(sdf)

        g = jax.grad(sdf_sum)(xyz_sub)
        eik = (safe_norm(g, axis=-1, keepdims=True) - 1.0) ** 2
        out = jnp.zeros((m, n, d, 1), xyz.dtype)
        return out.at[:, ::stride].set(eik)

    def compute_normal(self, xyz_cam, dir_cam, field2cam, frame_id, inst_id,
                       samples_dict, alpha=None):
        """Eikonal + camera-space normals for rendering (`nerf.py:520-559`)."""
        def sdf_fn(pts_cam):
            xyz = self.backward_warp(
                pts_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict
            )["xyz"]
            sdf, _ = self.sdf(xyz, inst_id=inst_id, alpha=alpha)
            return jnp.sum(sdf)

        g = jax.grad(sdf_fn)(xyz_cam)
        eikonal = (safe_norm(g, axis=-1, keepdims=True) - 1.0) ** 2
        normal = safe_normalize(g)
        normal = normal * jnp.array([1.0, -1.0, -1.0], dtype=normal.dtype)
        return eikonal, normal

    def global_match(self, feat_px, feat_canonical, xyz_canonical,
                     num_candidates=1024):
        """Softmax feature matching against canonical samples
        (`feature.py:158-206`). Uses a deterministic stride subsample of the
        MND candidate pool instead of randperm (static shapes under jit)."""
        shape = feat_px.shape
        fc = feat_canonical.reshape(-1, shape[-1])
        xc = xyz_canonical.reshape(-1, 3)
        total = fc.shape[0]
        k = min(num_candidates, total)
        stride = max(1, total // k)
        fc = fc[::stride][:k]
        xc = xc[::stride][:k]

        fp = feat_px.reshape(-1, shape[-1])
        score = jnp.dot(fp, fc.T, preferred_element_type=jnp.float32)
        score = score * jnp.exp(self.logsigma)
        prob = jax.nn.softmax(score, axis=-1)
        xyz_matched = prob @ xc
        return xyz_matched.reshape(shape[:-1] + (3,))

    def _forward_project(self, xyz, field2cam, Kinv, frame_id, inst_id,
                         samples_dict):
        """Project matched canonical points to the image (`feature.py:208-233`)."""
        xyz_cam = self.forward_warp(
            xyz[:, :, None], field2cam, frame_id, inst_id, samples_dict
        )[:, :, 0]
        Kmat = geom.Kmatinv(Kinv)
        hxy = geom.pinhole_projection(Kmat, xyz_cam)
        return hxy[..., :2], xyz_cam

    def _compute_flow(self, hxy, xyz, frame_id, inst_id, field2cam, Kinv,
                      samples_dict, flow_thresh=None):
        """(`nerf.py:1033-1083`)."""
        field2cam_next = flip_pair(field2cam)
        Kinv_next = flip_pair(Kinv)
        samples_next = dict(samples_dict)
        for k in ("t_articulation", "rest_articulation"):
            if k in samples_next:
                samples_next[k] = flip_pair(samples_next[k])
        frame_id_next = flip_pair(frame_id)

        xyz_cam_next = self.forward_warp(
            xyz, field2cam_next, frame_id_next, inst_id, samples_dict=samples_next
        )
        Kmat_next = geom.Kmatinv(Kinv_next)
        hxy_next = geom.pinhole_projection(Kmat_next, xyz_cam_next)
        flow = (hxy_next - hxy[:, :, None])[..., :2]
        valid = xyz_cam_next[..., -1:] > 1e-6
        if flow_thresh is not None:
            valid = valid & (
                safe_norm(flow, axis=-1, keepdims=True) < float(flow_thresh)
            )
        return jnp.concatenate([flow, valid.astype(flow.dtype)], axis=-1)

    def gauss_skin_consistency_density(self, pts, inst_id=None, alpha=None):
        """Densities needed by the gauss-skin BCE loss (`deformable.py:234-273`).
        Returns (gauss_density, field_density in [0, 1])."""
        density_gauss = self.warp.get_gauss_density(pts)
        density = self.query(pts, inst_id=inst_id, alpha=alpha)
        density = jax.lax.stop_gradient(density / jnp.exp(self.logibeta))
        return density_gauss, density
