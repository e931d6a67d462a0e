"""Stage-3 trainer: dynamic Gaussian surfels on a frozen-or-refined warp.

TPU re-design of the reference Stage-3 loop (`lab4d/engine/trainer.py`
with `--fg_motion gs-*`): full-image pair batches, the jitted step computes

  warp surfels -> rasterize every batch frame (vmap) -> losses
  (L1 rgb (+DSSIM), balanced mask, feature reprojection, cycle/skin
  regularizers, 2DGS normal+distortion after 8k steps, volume reg)

and updates two optimizers: the per-field Adam over the fixed-capacity
surfel store and AdamW over the warp/camera/intrinsics flax params (only
when `gs_optim_warp`). Densify/prune/opacity-reset/radius-outlier-prune run
at the reference cadence (`trainer.py:549-598`) entirely on device.
"""

from __future__ import annotations

import math
import os
import pickle
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.numerics import safe_norm, safe_normalize
import numpy as np
import optax

from vidu4d_tpu.data import data_utils
from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.engine import losses as losses_mod
from vidu4d_tpu.engine.schedules import progress_schedule
from vidu4d_tpu.models.gaussian import densify as densify_mod
from vidu4d_tpu.models.gaussian import surfels as sf
from vidu4d_tpu.models.gaussian.deformable import (
    GaussianDeformer,
    render_surfels_batch,
)
from vidu4d_tpu.models.gaussian.optimizer import (
    GsLearningRates,
    gs_adam_init,
    gs_adam_update,
)
from vidu4d_tpu.models.gaussian.ply_io import save_ply
from vidu4d_tpu.ops import geometry as geom
from vidu4d_tpu.ops.depth_normal import surf_depth_and_normal
from vidu4d_tpu.ops.image_losses import ssim
from vidu4d_tpu.ops.marching import load_obj, sample_mesh_surface
from vidu4d_tpu.ops.rasterize import RasterizeConfig
from vidu4d_tpu.ops.rasterize.common import compute_tile_rects, project_splats
from vidu4d_tpu.utils.logging import dump_opts_json


def _uniform_pixel_subsample(n_total: int, n_px: int, train_res: int):
    """Pick n_px of n_total raster-order pixels with uniform 2D coverage.

    The flat strided slice ``x[:, ::st][:, :n_px]`` is free on TPU but only
    spatially uniform when st = n_total // n_px divides the image width
    evenly and trims nothing; degenerate knob values (st a multiple of
    train_res -> every sample in column 0; n_px just under n_total -> only
    the top rows survive) silently break coverage. Keep the slice on the
    clean path and fall back to a static 2D-grid jnp.take otherwise."""
    h = w = train_res
    st = n_total // n_px
    if (
        n_total == h * w
        and n_total % n_px == 0
        and 0 < st < w
        and w % st == 0
    ):
        return lambda x: x[:, ::st][:, :n_px]
    nc = min(w, int(math.ceil(math.sqrt(n_px))))
    nr = min(h, -(-n_px // nc))
    rows = np.round(np.linspace(0, h - 1, nr)).astype(np.int64)
    cols = np.round(np.linspace(0, w - 1, nc)).astype(np.int64)
    idx = (rows[:, None] * w + cols[None, :]).reshape(-1)[:n_px]
    idx = jnp.asarray(np.clip(idx, 0, n_total - 1), jnp.int32)
    return lambda x: jnp.take(x, idx, axis=1)


def init_surfels_from_mesh(
    mesh_path: str,
    feat_path: Optional[str],
    capacity: int,
    n_samples: int = 200_000,
    sh_degree: int = 3,
    seed: int = 0,
) -> sf.SurfelState:
    """Initialize surfels on the Stage-2 mesh with barycentric color/feature
    transfer (replaces the KD-tree transfer, `deformable_gaussian.py:366-408`)."""
    verts, faces = load_obj(mesh_path)
    rng = np.random.default_rng(seed)
    pts, fid, bary = sample_mesh_surface(verts, faces, n_samples, rng=rng)

    colors_path = mesh_path.replace(".obj", "-colors.npy")
    if os.path.exists(colors_path):
        vcolors = np.load(colors_path)
        colors = np.einsum(
            "nk,nkc->nc", bary, vcolors[faces[fid]]
        ).astype(np.float32)
    else:
        colors = np.full((n_samples, 3), 0.5, np.float32)

    regist_feat = None
    if feat_path and os.path.exists(feat_path):
        vfeat = np.load(feat_path)
        regist_feat = np.einsum("nk,nkc->nc", bary, vfeat[faces[fid]])
        regist_feat /= np.maximum(
            np.linalg.norm(regist_feat, axis=-1, keepdims=True), 1e-12
        )
        regist_feat = jnp.asarray(regist_feat, jnp.float32)

    return sf.init_from_points(
        jnp.asarray(pts), jnp.asarray(colors), capacity, sh_degree=sh_degree,
        key=jax.random.PRNGKey(seed), regist_feat=regist_feat,
    )


def transfer_stage2_params(stage2_params: Dict, deformer_params: Dict) -> Dict:
    """Copy warp/camera/intrinsics/logscale from a Stage-2 checkpoint into the
    Stage-3 deformer (the Stage-2 -> Stage-3 transition, `trainer.py:371-422`)."""
    src = stage2_params["params"]
    dst = dict(deformer_params["params"])
    fg = src.get("fields_fg", {})
    for key_src, key_dst in (
        ("warp", "warp"), ("camera_mlp", "camera_mlp"), ("logscale", "logscale"),
    ):
        if key_src in fg:
            dst[key_dst] = fg[key_src]
    if "intrinsics" in src:
        dst["intrinsics"] = src["intrinsics"]
    return {**deformer_params, "params": dst}


def cadence_due(it: int, span: int, interval: int) -> Optional[int]:
    """Largest positive multiple of `interval` inside the just-executed step
    window (it - span, it], or None. Used by the densify/reset/prune hooks so
    iters_per_dispatch chunks (including short final chunks that shift steps
    off the k-grid) can never skip a cadence point."""
    m = (it // interval) * interval
    return m if m > it - span and m > 0 else None


class Stage3Trainer:
    def __init__(self, opts: Dict, datasets=None, data_info=None):
        self.opts = dict(opts)
        opts = self.opts
        opts.setdefault("pixels_per_image", -1)  # full images (trainer.py:87-88)
        if datasets is None:
            datasets = data_utils.build_datasets(opts)
        self.datasets = datasets
        if data_info is None:
            data_info = data_utils.get_data_info(datasets)
        self.data_info = data_info
        self.frame_info: FrameInfo = data_info["frame_info"]
        self.res = opts.get("train_res", 256)

        self.save_dir = os.path.join(
            opts.get("logroot", "logdir"), f"{opts['seqname']}-{opts['logname']}"
        )
        os.makedirs(self.save_dir, exist_ok=True)
        dump_opts_json(self.save_dir, opts)

        motion = opts.get("fg_motion", "gs-bob")
        assert motion.startswith("gs-")
        self.deformer = GaussianDeformer(
            frame_info=self.frame_info,
            fg_motion=motion[3:],
            num_inst=1 if opts.get("single_inst", True) else self.frame_info.num_vids,
            learnable_bg=opts.get("gs_learnable_bg", True),
        )

        # surfel init: from Stage-2 mesh if given, else random cloud
        cap = opts.get("gs_capacity", 400_000)
        mesh = opts.get("gs_init_mesh", "")
        if mesh and os.path.exists(mesh):
            feat_path = mesh.replace("-geo.obj", "-feat.npy")
            self.surfels = init_surfels_from_mesh(
                mesh, feat_path, cap, n_samples=opts.get("gs_init_samples", 200_000),
                sh_degree=opts.get("sh_degree", 3),
            )
        else:
            rng = np.random.default_rng(0)
            n = opts.get("gs_init_samples", 100_000)
            pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
            cols = rng.uniform(size=(n, 3)).astype(np.float32)
            self.surfels = sf.init_from_points(
                jnp.asarray(pts), jnp.asarray(cols), cap,
                sh_degree=opts.get("sh_degree", 3),
            )

        self.batcher = data_utils.PairBatcher(
            datasets, imgs_per_batch=opts.get("imgs_per_gpu", 1),
            seed=max(opts.get("seed", 0), 0),
        )

        self._init_params()
        self.gs_lrs = GsLearningRates(
            xyz_init=opts.get("position_lr_init", 5e-5),
            xyz_final=opts.get("position_lr_final", 1.6e-6),
            xyz_delay_mult=opts.get("position_lr_delay_mult", 0.01),
            xyz_max_steps=opts.get("position_lr_max_steps", 30_000),
            features_dc=opts.get("feature_lr", 2.5e-3),
            features_rest=opts.get("feature_lr", 2.5e-3) / 20.0,
            opacity=opts.get("opacity_lr", 0.05),
            scaling=opts.get("scaling_lr", 5e-3),
            rotation=opts.get("rotation_lr", 1e-3),
            regist_feat=opts.get("regist_feat_lr", 2.5e-3),
        )
        self.gs_adam = gs_adam_init(self.surfels.params)
        # warp/camera AdamW uses the SAME schedule as the reference
        # (`trainer.py:258-286`): OneCycle warm-up from lr/25 over 2 rounds +
        # the 10x explicit-param table. A constant peak LR destroys the
        # transferred cameras within ~100 steps (observed: focal/quat drift
        # until every splat is behind the near plane).
        from vidu4d_tpu.engine.optim import make_stage2_optimizer

        total_steps = opts.get("num_rounds", 60) * opts.get(
            "iters_per_round", 200
        )
        self.warp_opt = make_stage2_optimizer(
            self.params,
            learning_rate=opts.get("learning_rate", 5e-4),
            total_steps=total_steps,
            num_rounds=opts.get("num_rounds", 60),
            intrinsics_lr_mult=opts.get("intrinsics_lr_mult", 1.0),
        )
        self.warp_opt_state = self.warp_opt.init(self.params)

        self.current_steps = 0
        self.current_round = 0
        self._rollback_cache = [None, None]
        # multi-chip: a (data, surfel) mesh over the first --ngpu devices
        # (DDP analog, `lab4d/train.py:20-42`); the production step is
        # sharded with GSPMD constraints so reduction semantics match the
        # single-device step exactly.
        ngpu = opts.get("ngpu", 1) or 1
        self.mesh = None
        if ngpu > 1:
            from vidu4d_tpu.parallel.sharding import make_mesh

            self.mesh = make_mesh(ngpu)

        # default backend: the fused Pallas fwd+bwd kernels on TPU (measured
        # 3.5x faster than the XLA tiles path at 200k/256^2, scripts/
        # bench_raster.py r2), the budget-capped XLA path on CPU (the
        # compiled Pallas kernel is TPU-only; interpret mode is test-speed).
        # Under a mesh the Pallas kernels run via shard_map — the (frame,
        # tile) grid partitions over the devices (VERDICT r2 #4); explicit
        # raster_impl (incl. "pallas_grad_interpret" for CPU-mesh dryruns)
        # always wins.
        if jax.default_backend() == "cpu":
            default_impl = "tiles"
        else:
            default_impl = "pallas_grad"
        impl = opts.get("raster_impl") or default_impl
        # entry_cap (pallas paths): static prefix cap on sorted entries per
        # frame. 2^19 ≈ 1.4x the densest converged 200k/256^2 scene measured
        # (386k entries) — exact there, and shrinks the pack/backward-scatter
        # work ~6x vs the full P*span^2 duplication. truncated_entries
        # telemetry reports any overflow per round.
        default_cap = 2 ** 19 if impl.startswith("pallas") else 0
        self.raster_cfg = RasterizeConfig(
            tile=opts.get("raster_tile", 16),
            span_cap=opts.get("raster_span_cap", 4),
            budget=opts.get("raster_budget", 1024),
            tile_chunk=opts.get("raster_tile_chunk", 16),
            impl=impl,
            entry_cap=int(opts.get("raster_entry_cap", default_cap) or 0),
        )
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------

    def _init_params(self):
        batch = self._next_batch()
        self.params = self.deformer.init(
            jax.random.PRNGKey(0),
            method=lambda mdl: self._model_forward_for_init(mdl, batch),
        )

    def _model_forward_for_init(self, mdl, batch):
        samples = mdl.get_samples(batch)
        xyz = self.surfels.params.xyz
        rot = sf.get_rotation(self.surfels.params)
        xyz_cam, rot_cam, _ = mdl.warp_surfels(xyz, rot, samples)
        mdl.cycle_loss(xyz_cam, xyz, samples)
        if "feature" in samples and self.surfels.params.regist_feat.shape[-1] > 0:
            matches = mdl.global_match(
                samples["feature"], self.surfels.params.regist_feat, xyz
            )
            mdl.forward_project(matches, samples)
        mdl.background()
        return xyz_cam

    def _next_batch(self):
        batch = self.batcher.next_batch()
        batch = data_utils.flatten_pairs(batch)
        batch = data_utils.compute_frameid(batch, self.frame_info)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _loss_config(self):
        o = self.opts
        return {
            "field_type": "fg",
            "arap_wt": o.get("arap_wt", 0.0),
            "train_res": self.res,
            "mask_wt": o.get("mask_wt", 0.1),
            "rgb_wt": o.get("rgb_wt", 0.1),
            "depth_wt": o.get("depth_wt", 1e-4),
            "flow_wt": o.get("flow_wt", 0.5),
            # flow-SNR floor in px: GT-flow magnitudes below this are inside
            # the flow estimator's noise band (shipped RAFT: 1.66px EPE) and
            # are not supervised; 0 disables the gate
            "flow_noise_px": o.get("flow_noise_px", 2.5),
            "feat_reproj_wt": o.get("feat_reproj_wt", 5e-2),
            # pixels per frame for the feature-matching loss (strided
            # subgrid of the full image; 0 = all pixels). The reference
            # only ever matches its sampled ray batch, never full frames.
            "feat_reproj_px": o.get("feat_reproj_px", 8192),
            "reg_deform_cyc_wt": o.get("reg_deform_cyc_wt", 0.01),
            # strided surfel subset for the cycle/skin warp regularizers
            # (1 = full); the subset estimator is the same objective
            "cycle_subsample": o.get("cycle_subsample", 4),
            "reg_delta_skin_wt": o.get("reg_delta_skin_wt", 5e-3),
            "reg_skin_entropy_wt": o.get("reg_skin_entropy_wt", 5e-4),
            "reg_gauss_skin_wt": o.get("reg_gauss_skin_wt", 1e-3),
            "reg_cam_prior_wt": o.get("reg_cam_prior_wt", 0.1),
            "reg_skel_prior_wt": o.get("reg_skel_prior_wt", 0.1),
            "reg_gauss_mask_wt": o.get("reg_gauss_mask_wt", 0.01),
            "lambda_dssim": o.get("lambda_dssim", 0.0),
            "lambda_normal": o.get("lambda_normal", 0.05),
            "lambda_dist": o.get("lambda_dist", 0.0),
            "reg_volume_loss_wt": o.get("reg_volume_loss_wt", 0.0),
            "rgb_loss_only": o.get("rgb_loss_only", False),
        }

    # ------------------------------------------------------------------

    def _build_train_step(self):
        deformer = self.deformer
        cfg = self._loss_config()
        res = self.res
        sh_degree = self.opts.get("sh_degree", 3)
        raster_cfg = self.raster_cfg
        gs_lrs = self.gs_lrs
        warp_opt = self.warp_opt
        optim_warp = self.opts.get("gs_optim_warp", True)
        mesh = self.mesh

        # GSPMD shardings for the full production loss: frames ride the
        # "data" axis (the DDP axis — gradients psum automatically), the
        # surfel capacity dim rides "surfel" for warp/skinning compute and
        # the surfel Adam, with XLA inserting the all-gather before
        # rasterization. No-ops on a single device.
        def shard(x, *axes):
            if mesh is None or not hasattr(x, "ndim") or x.ndim < len(axes):
                return x
            from jax.sharding import NamedSharding, PartitionSpec

            for ax, name in enumerate(axes):
                if name is not None and x.shape[ax] % mesh.shape[name]:
                    return x
            spec = PartitionSpec(*axes)
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        def shard_batch(batch):
            return {k: shard(v, "data") for k, v in batch.items()}

        def shard_surfel_tree(tree):
            return jax.tree.map(lambda x: shard(x, "surfel"), tree)

        def make_loss_fn(use_2dgs_reg):
            return lambda *a: loss_fn(*a, use_2dgs_reg=use_2dgs_reg)

        def loss_fn(dparams, sparams, dummy, state_alive, batch, weights,
                    use_2dgs_reg=False):
            batch = shard_batch(batch)
            sparams = shard_surfel_tree(sparams)
            state_alive = shard(state_alive, "surfel")
            dummy = shard(dummy, "data", "surfel")
            samples = deformer.apply(dparams, batch, method=deformer.get_samples)
            xyz = sparams.xyz
            rot = sf.get_rotation(sparams)
            xyz_cam, rot_cam, warp_aux = deformer.apply(
                dparams, xyz, rot, samples, method=deformer.warp_surfels
            )
            # warp output sharded both ways; the rasterizer needs every
            # surfel per frame -> XLA all-gathers over "surfel"
            xyz_cam = shard(xyz_cam, "data", "surfel")
            rot_cam = shard(rot_cam, "data", "surfel")
            intrins = geom.mat2K(geom.Kmatinv(samples["Kinv"]))
            bg = deformer.apply(dparams, method=deformer.background)

            # cycle consistency is a REGULARIZER on the warp MLPs — its
            # expectation over a strided 1/cycle_subsample surfel subset is
            # the same objective at 1/k the cost (the full-P backward warp
            # fwd+grad measured 13-17 ms of a 135 ms step; the reference
            # computes it on its sampled ray batch, far fewer than P,
            # `lab4d/engine/model.py:856-866`)
            cyc = None
            use_flow = cfg["flow_wt"] > 0 and "flow" in batch
            cyc_sub = max(int(cfg.get("cycle_subsample", 4) or 1), 1)
            if use_flow or not cfg["rgb_loss_only"]:
                cyc = deformer.apply(
                    dparams, xyz_cam[:, ::cyc_sub], xyz[::cyc_sub], samples,
                    method=deformer.cycle_loss
                )

            # per-surfel pair flow composited as 2 extra channels
            # (`deformable_gaussian.py:817-899`; the reference sets
            # concated_feat=None at :1183 so its flow channels render empty
            # and the loss dies in a silent try/except at `model.py:697-702`
            # — here the supervision is actually wired up).
            extra = None
            flow_scale = 1.0
            if use_flow:
                # the via-canonical forward warp starts from the STORE's
                # canonical xyz directly (the surfels ARE canonical points)
                # instead of round-tripping through the cycle's backward
                # warp — one full-P warp fwd+grad saved, and the flow
                # channels supervise the warp against the exact canonical
                # rather than its cycle approximation
                # (`deformable_gaussian.py:817-899` also flows canonical
                # gaussians warped to both frames)
                flow_pw = deformer.apply(
                    dparams, xyz_cam, samples,
                    jnp.broadcast_to(xyz[None], xyz_cam.shape),
                    method=deformer.flow_surfels,
                )  # (M, P, 2)
                # normalize to ~[-1,1] before alpha compositing
                # (`deformable_gaussian.py:1177-1179`); the scale is data, not
                # a function to differentiate through. Dead/pruned surfels
                # still go through the warp and can project degenerate flows
                # — mask them so one dead slot can't shrink every live
                # surfel's composited channels (costing f32 precision)
                flow_alive = jnp.where(
                    state_alive[None, :, None], flow_pw, 0.0
                )
                flow_scale = jax.lax.stop_gradient(
                    jnp.max(jnp.abs(flow_alive)) + 1e-6
                )
                extra = flow_pw / flow_scale

            out = render_surfels_batch(
                sparams, state_alive,
                shard(xyz_cam, "data", None), shard(rot_cam, "data", None),
                intrins, res, res, sh_degree, bg, raster_cfg,
                densify_dummy=dummy, extra_colors=extra, mesh=mesh,
            )
            # image-space tensors (M, H, W, c)
            m = xyz_cam.shape[0]
            img = lambda x: x.reshape((m, res, res, -1))
            gt_rgb = img(batch["rgb"])
            gt_mask = img(batch["mask"])
            vis2d = img(batch["vis2d"])
            rgb_out = out.color[..., :3]

            loss_dict = {}
            # rgb: L1 on vis2d pixels (`model.py:676-696`) + optional DSSIM
            l1 = jnp.abs(rgb_out - gt_rgb) * vis2d
            loss_dict["rgb"] = (1.0 - cfg["lambda_dssim"]) * jnp.mean(l1)
            if cfg["lambda_dssim"] > 0:
                ssim_val = jax.vmap(
                    lambda a, b: ssim(
                        jnp.transpose(a, (2, 0, 1)), jnp.transpose(b, (2, 0, 1))
                    )
                )(rgb_out, gt_rgb * gt_mask * vis2d)
                loss_dict["rgb_ssim"] = cfg["lambda_dssim"] * jnp.mean(1 - ssim_val)

            maskfg_vis = gt_mask * vis2d
            # flow: composited surfel flow vs GT, gated by the fwd-bwd cycle
            # uncertainty, fg-masked, px-unit normalized
            # (`model.py:701-702` + masking rules `model.py:910-977`)
            if use_flow:
                flow_img = img(out.color[..., 3:5]) * flow_scale
                gt_flow = img(batch["flow"])
                uct_ok = (img(batch["flow_uct"]) > 0).astype(flow_img.dtype)
                # SNR gate: a pixel whose GT flow magnitude is below the
                # flow estimator's noise floor carries no signal — at toy
                # scales (~1px motion vs the shipped RAFT's 1.66px EPE)
                # supervising it is pure noise and measurably degrades
                # PSNR/SSIM/depth (matched-schedule ablation: 26.3 vs 21.1
                # dB). Ramps in over [floor, 2*floor] px; real-scale motion
                # (5-20px) passes untouched. The reference's stage-3 flow
                # loss is silently dead (`deformable_gaussian.py:1183`), so
                # any gating here is strictly more supervision than parity.
                noise_px = cfg.get("flow_noise_px", 2.5)
                if noise_px > 0:
                    snr_w = jnp.clip(
                        safe_norm(gt_flow, axis=-1, keepdims=True) / noise_px
                        - 1.0, 0.0, 1.0,
                    )
                else:
                    snr_w = 1.0
                flow_l = safe_norm(flow_img - gt_flow, axis=-1, keepdims=True)
                loss_dict["flow"] = (
                    losses_mod.nonzero_mean(flow_l * snr_w * uct_ok * maskfg_vis)
                    / cfg["train_res"]
                ) * cfg["flow_wt"]

            # depth: alpha-normalized expected depth vs GT (`model.py:697-700`;
            # the renderer wrapper divides by alpha,
            # `gs/gaussian_renderer/__init__.py:135-137`)
            if cfg["depth_wt"] > 0 and "depth" in batch:
                depth_img = (out.depth / jnp.maximum(out.alpha, 1e-6))[..., None]
                depth_l = jnp.abs(depth_img - img(batch["depth"]))
                loss_dict["depth"] = (
                    losses_mod.nonzero_mean(depth_l * maskfg_vis)
                    * cfg["depth_wt"]
                )

            # mask: balanced MSE (`model.py:646-652` fg branch)
            balance = losses_mod.get_mask_balance_wt(
                gt_mask, vis2d, batch["is_detected"]
            )
            mask_loss = ((out.alpha[..., None] - gt_mask) ** 2) * balance * vis2d
            is_det = batch["is_detected"].reshape(-1, 1, 1, 1)
            loss_dict["mask"] = losses_mod.nonzero_mean(mask_loss * is_det)

            if not cfg["rgb_loss_only"]:
                # feature reprojection (`model.py:663-675`). The reference
                # matches only its sampled ray batch (`samples_dict
                # ["feature"]` is (M,N,16) with N = pixels_per_image,
                # `deformable_gaussian.py:1436-1487`); matching every
                # train-res pixel here would softmax a (M*HW, 2048) score
                # matrix and DQ-skin-warp M*HW matched points fwd+bwd —
                # ~1/3 of the whole step at 256^2. A strided slice (free on
                # TPU, no gather) keeps a uniform spatial subgrid of
                # feat_reproj_px pixels per frame; the loss is a mean over
                # pixels, so the subgrid estimator is the same objective.
                if "feature" in samples and sparams.regist_feat.shape[-1] > 0:
                    feat_px = samples["feature"]
                    hxy_px = batch["hxy"][..., :2]
                    maskfg_px = batch["mask"]
                    n_px = int(cfg.get("feat_reproj_px", 8192) or 0)
                    if 0 < n_px < feat_px.shape[1]:
                        sub = _uniform_pixel_subsample(
                            feat_px.shape[1], n_px, int(cfg["train_res"])
                        )
                        feat_px = sub(feat_px)
                        hxy_px = sub(hxy_px)
                        maskfg_px = sub(maskfg_px)
                    matches = deformer.apply(
                        dparams, feat_px, sparams.regist_feat, xyz,
                        method=deformer.global_match,
                    )
                    xy_reproj, _ = deformer.apply(
                        dparams, matches, samples, method=deformer.forward_project
                    )
                    reproj = safe_norm(
                        xy_reproj - hxy_px, axis=-1, keepdims=True
                    )
                    maskfg = maskfg_px.astype(reproj.dtype)
                    loss_dict["feat_reproj"] = (
                        losses_mod.nonzero_mean(reproj * maskfg) / cfg["train_res"]
                    )

                # cycle + skin regs (`compute_reg_loss`, model.py:856-866);
                # cyc computed above (shared with the flow path)
                loss_dict["reg_deform_cyc"] = losses_mod.nonzero_mean(cyc["cyc_dist"])
                if "delta_skin" in cyc:
                    loss_dict["reg_delta_skin"] = losses_mod.nonzero_mean(cyc["delta_skin"])
                if "skin_entropy" in cyc:
                    loss_dict["reg_skin_entropy"] = losses_mod.nonzero_mean(cyc["skin_entropy"])

                # 2DGS normal/distortion regs, on after 8k steps
                if use_2dgs_reg and cfg["lambda_normal"] > 0:
                    surf_norm = jax.vmap(
                        lambda de, dm, a, k: surf_depth_and_normal(de, dm, a, k)[1]
                    )(
                        out.depth / jnp.maximum(out.alpha, 1e-6),
                        out.median_depth, out.alpha, intrins,
                    )
                    n_err = 1.0 - jnp.sum(out.normal * surf_norm, axis=-1)
                    loss_dict["normal_loss"] = cfg["lambda_normal"] * jnp.mean(n_err)
                if use_2dgs_reg and cfg["lambda_dist"] > 0:
                    loss_dict["dist_loss"] = cfg["lambda_dist"] * jnp.mean(out.distortion)

                if cfg["reg_volume_loss_wt"] > 0:
                    scaling = sf.get_scaling(sparams)
                    loss_dict["reg_volume_loss"] = (
                        cfg["reg_volume_loss_wt"]
                        * jnp.mean(jnp.prod(scaling, axis=1) * state_alive)
                    )

                # ARAP rigidity on bone centers between the pair frames
                # (`model.py:868-878`, default off)
                if cfg.get("arap_wt", 0.0) > 0 and "t_articulation" in samples:
                    from vidu4d_tpu.models.fields.skinning import arap_bone_loss
                    from vidu4d_tpu.ops.quaternion import (
                        dual_quaternion_to_quaternion_translation,
                    )

                    _, bones = dual_quaternion_to_quaternion_translation(
                        samples["t_articulation"]
                    )
                    loss_dict["arap"] = cfg["arap_wt"] * arap_bone_loss(
                        bones[0], bones[1 % bones.shape[0]]
                    )

            # apply weights for the dense keys
            for k, wt_key in (("rgb", "rgb_wt"), ("mask", "mask_wt"),
                              ("rgb_ssim", "rgb_wt"),
                              ("feat_reproj", "feat_reproj_wt"),
                              ("reg_deform_cyc", "reg_deform_cyc_wt"),
                              ("reg_delta_skin", "reg_delta_skin_wt"),
                              ("reg_skin_entropy", "reg_skin_entropy_wt")):
                if k in loss_dict:
                    loss_dict[k] = loss_dict[k] * cfg.get(wt_key, 1.0)

            total = sum(jax.tree.leaves(loss_dict))
            # warp outputs reused by the densify-stat pass (saves a re-warp)
            warped = jax.lax.stop_gradient((xyz_cam, rot_cam, intrins))
            return total, (loss_dict, out, warped)

        import functools

        @functools.partial(jax.jit, static_argnames=("use_2dgs_reg",))
        def step(dparams, surfels: sf.SurfelState, gs_adam, warp_opt_state,
                 batch, weights, use_2dgs_reg=False):
            surfels = shard_surfel_tree(surfels)
            gs_adam = shard_surfel_tree(gs_adam)
            dummy = jnp.zeros(
                (batch["frameid"].shape[0], surfels.capacity, 2), jnp.float32
            )
            (total, (loss_dict, out, warped)), grads = jax.value_and_grad(
                make_loss_fn(use_2dgs_reg), argnums=(0, 1, 2), has_aux=True
            )(dparams, surfels.params, dummy, surfels.alive, batch, weights)
            dgrads, sgrads, dummy_grad = grads

            # densification stats from PRE-update params (`trainer.py:554-560`)
            # — the warp outputs come from the loss forward (no re-warp)
            xyz_cam, rot_cam, intrins = warped
            scaling = sf.get_scaling(surfels.params)
            eye = jnp.eye(4)

            def view_stats(xc, rc, intr, dgrad):
                proj = project_splats(xc, rc, scaling, eye, intr, mask=surfels.alive)
                rects = compute_tile_rects(proj, res, res, raster_cfg.tile,
                                           raster_cfg.span_cap)
                # NDC-scaled mean2D gradient norm (`backward.cu:647-649`)
                vs = dgrad * proj.depth[:, None] * jnp.array([[res, res]], jnp.float32)
                # coverage telemetry (SURVEY §7 hard-part 3): splats whose
                # tile span was clamped to span_cap, and (tiles impl only)
                # entries the per-tile budget drops from the back
                overflow = jnp.sum((rects.overflow & rects.valid).astype(jnp.int32))
                if raster_cfg.impl in ("tiles", "naive"):
                    tiles = -(-res // raster_cfg.tile)
                    # per-tile entry histogram from the static duplication
                    j = jnp.arange(raster_cfg.span_cap ** 2, dtype=jnp.int32)
                    dx = j[None, :] % jnp.maximum(rects.span_x, 1)[:, None]
                    dy = j[None, :] // jnp.maximum(rects.span_x, 1)[:, None]
                    in_rect = (dy < rects.span_y[:, None]) & rects.valid[:, None]
                    tile_id = (rects.min_y[:, None] + dy) * tiles + (
                        rects.min_x[:, None] + dx
                    )
                    hist = jnp.zeros((tiles * tiles,), jnp.int32).at[
                        jnp.where(in_rect, tile_id, 0).reshape(-1)
                    ].add(in_rect.reshape(-1).astype(jnp.int32), mode="drop")
                    truncated = jnp.sum(
                        jnp.maximum(hist - raster_cfg.budget, 0)
                    )
                elif raster_cfg.entry_cap:
                    # pallas: entries past the static entry_cap drop from the
                    # sorted tail (exact when the frame fits under the cap)
                    entries = jnp.sum(
                        jnp.where(rects.valid, rects.span_x * rects.span_y, 0)
                    )
                    truncated = jnp.maximum(entries - raster_cfg.entry_cap, 0)
                else:
                    truncated = jnp.int32(0)
                return safe_norm(vs, axis=-1), rects.valid, proj.radius, overflow, truncated

            norms, vis, radii, overflow, truncated = jax.vmap(view_stats)(
                xyz_cam, rot_cam, intrins, dummy_grad
            )
            ga = surfels.grad_accum + jnp.sum(jnp.where(vis, norms, 0.0), axis=0)
            dn = surfels.denom + jnp.sum(vis.astype(surfels.denom.dtype), axis=0)
            mr = jnp.maximum(
                surfels.max_radii2d, jnp.max(jnp.where(vis, radii, 0.0), axis=0)
            )

            # surfel Adam step
            new_params, gs_adam = gs_adam_update(
                sgrads, gs_adam, surfels.params, gs_lrs
            )
            surfels = surfels._replace(
                params=new_params, grad_accum=ga, denom=dn, max_radii2d=mr
            )

            # warp/camera AdamW step
            if optim_warp:
                updates, warp_opt_state = warp_opt.update(
                    dgrads, warp_opt_state, dparams
                )
                dparams = optax.apply_updates(dparams, updates)

            metrics = {"total": total, **loss_dict,
                       "alive": surfels.num_alive(),
                       "gnorm": optax.global_norm((dgrads, sgrads)),
                       # coverage-loss telemetry, logged every round
                       "overflow_splats": jnp.sum(overflow),
                       "truncated_entries": jnp.sum(truncated)}
            return dparams, surfels, gs_adam, warp_opt_state, metrics

        return step

    # ------------------------------------------------------------------

    def _update_rollback_cache(self):
        """Two-deep per-round snapshot (`trainer.py:134-137,343-353`)."""
        self._rollback_cache[0] = self._rollback_cache[1]
        self._rollback_cache[1] = (
            self.params, self.surfels, self.gs_adam, self.warp_opt_state
        )

    def _maybe_rollback(self, gnorm) -> bool:
        """Gradient-spike rollback to the model from two rounds ago
        (`trainer.py:862-884` check_grad; opt-in via
        rollback_on_grad_spike like Stage2Trainer)."""
        thresh = self.opts.get("grad_spike_thresh", 5.0)
        if float(gnorm) <= thresh or self._rollback_cache[0] is None:
            return False
        print(f"large grad: {float(gnorm):.2f}, resume from cached weights")
        (self.params, self.surfels, self.gs_adam,
         self.warp_opt_state) = self._rollback_cache[0]
        return True

    def _step_weights(self, cfg, step):
        weights = progress_schedule({**cfg, "reg_eikonal_wt": 0.0}, step)
        weights["lambda_normal"] = cfg["lambda_normal"] if step > 8000 else 0.0
        weights["lambda_dist"] = cfg["lambda_dist"] if step > 8000 else 0.0
        return weights

    def _train_chunk(self, batches, weights_list, use_2dgs_reg):
        """Run k iterations as ONE device-resident lax.scan dispatch.

        Through the remote-dispatch runtime each step call pays a fixed
        overhead that scales with the arg/output buffer count (~hundreds of
        ms for the ~300-leaf trainer signature, vs ~20 ms of device compute
        for the warp-grad executable — xplane-profiled r2); scanning the
        step amortizes it and is the natural TPU-resident training loop."""
        import functools

        if not hasattr(self, "_chunk_fns"):
            self._chunk_fns = {}
        k = len(batches)
        key = (k, use_2dgs_reg)
        if key not in self._chunk_fns:
            step = self._train_step

            @functools.partial(jax.jit, static_argnames=("use_2dgs_reg",))
            def run_chunk(params, surfels, gs_adam, warp_opt_state,
                          batches, weights, use_2dgs_reg=False):
                def body(carry, xs):
                    p, s, a, w = carry
                    b, wt = xs
                    p, s, a, w, m = step(p, s, a, w, b, wt,
                                         use_2dgs_reg=use_2dgs_reg)
                    return (p, s, a, w), m

                (p, s, a, w), ms = jax.lax.scan(
                    body, (params, surfels, gs_adam, warp_opt_state),
                    (batches, weights),
                )
                last = jax.tree.map(lambda x: x[-1], ms)
                return p, s, a, w, last

            self._chunk_fns[key] = run_chunk
        stacked_b = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        stacked_w = jax.tree.map(
            lambda *xs: jnp.asarray(xs), *weights_list
        )
        return self._chunk_fns[key](
            self.params, self.surfels, self.gs_adam, self.warp_opt_state,
            stacked_b, stacked_w, use_2dgs_reg=use_2dgs_reg,
        )

    def train_one_round(self, log_fn=None):
        opts = self.opts
        cfg = self._loss_config()
        rollback = opts.get("rollback_on_grad_spike", False)
        iters = opts.get("iters_per_round", 200)
        k = int(opts.get("iters_per_dispatch", 1) or 1)
        if k > 1 and rollback:
            # rollback needs per-iteration gnorm
            k = 1
        metrics = None

        done = 0
        while done < iters:
            kk = min(k, iters - done)
            if kk > 1:
                batches = [self._next_batch() for _ in range(kk)]
                weights_list = [
                    self._step_weights(cfg, self.current_steps + i)
                    for i in range(kk)
                ]
                use_2dgs_reg = self.current_steps > 8000
                (self.params, self.surfels, self.gs_adam,
                 self.warp_opt_state, metrics) = self._train_chunk(
                    batches, weights_list, use_2dgs_reg
                )
                self.current_steps += kk
                done += kk
                self._densify_hooks(span=kk)
            else:
                weights = self._step_weights(cfg, self.current_steps)
                batch = self._next_batch()
                use_2dgs_reg = self.current_steps > 8000
                (self.params, self.surfels, self.gs_adam,
                 self.warp_opt_state, metrics) = self._train_step(
                    self.params, self.surfels, self.gs_adam,
                    self.warp_opt_state, batch, weights,
                    use_2dgs_reg=use_2dgs_reg,
                )
                if rollback and self._maybe_rollback(metrics["gnorm"]):
                    continue
                self.current_steps += 1
                done += 1
                self._densify_hooks()
            if log_fn is not None and self.current_steps % 100 < kk:
                log_fn(self.current_steps,
                       {kk2: float(v) for kk2, v in metrics.items()})
        return metrics

    def _densify_hooks(self, span: int = 1):
        """Densify / opacity reset / outlier prune cadence
        (`trainer.py:549-598`).

        `span` is the number of steps just executed (iters_per_dispatch
        chunking): each hook fires if a multiple of its interval falls
        inside the window (current_steps - span, current_steps] — so
        cadence points never need to land exactly on chunk boundaries and
        chunks shorter than k cannot silently shift hooks off-grid. With
        span > interval, multiple cadence points collapse into one firing
        (at most one densify per dispatch — same device-side behavior)."""
        o = self.opts
        it = self.current_steps

        def due(interval):
            return cadence_due(it, span, interval)

        m = due(o.get("densification_interval", 100))
        if (
            m is not None
            and m < o.get("densify_until_iter", 15000)
            and m > o.get("densify_from_iter", 500)
        ):
            size_thr = 20.0 if m > o.get("opacity_reset_interval", 3000) else 0.0
            self.surfels, self.gs_adam, info = densify_mod.densify_and_prune(
                self.surfels, self.gs_adam, jax.random.PRNGKey(m),
                extent=o.get("cameras_extent", 1.0),
                max_screen_size=size_thr,
                config=densify_mod.DensifyConfig(
                    grad_threshold=o.get("densify_grad_threshold", 2e-4),
                    min_opacity=0.005,
                    percent_dense=o.get("percent_dense", 0.01),
                ),
            )
        m = due(o.get("opacity_reset_interval", 3000))
        if m is not None and m < o.get("densify_until_iter", 15000):
            self.surfels, self.gs_adam = densify_mod.reset_opacity(
                self.surfels, self.gs_adam
            )
        m = due(o.get("outlier_filtering_interval", 2000))
        if m is not None and m < o.get("outlier_stop_iter", 29000):
            mask = densify_mod.radius_outlier_mask(
                self.surfels.params.xyz, self.surfels.alive,
                nb_points=20, radius=0.004,
            )
            self.surfels = densify_mod.prune_by_mask(self.surfels, mask)

    def train(self, log_fn=None):
        from vidu4d_tpu.utils.logging import ScalarLogger
        from vidu4d_tpu.utils.profiler import round_trace

        logger = ScalarLogger(self.save_dir)
        if log_fn is None:
            log_fn = logger.log_loss_dict
        profile = self.opts.get("profile", False)
        for rnd in range(self.current_round, self.opts.get("num_rounds", 60)):
            self._update_rollback_cache()
            t0 = time.time()
            # per-round eval render to tensorboard (`trainer.py:319-323,767-794`)
            try:
                from vidu4d_tpu.utils.camera_trajectories import construct_batch

                eval_batch = construct_batch(
                    inst_id=0, frameid_sub=np.arange(1), eval_res=self.res,
                    field2cam=None, camera_int=None, crop2raw=None,
                )
                rendered = self.render_batch(eval_batch, res=self.res)
                logger.image(rnd, "eval/rendered", rendered["rendered"][0])
                logger.image(rnd, "eval/mask", rendered["mask"][0])
            except Exception as e:  # logging must never kill training
                print(f"[eval render skipped: {e}]")
            with round_trace(self.save_dir, rnd, enabled=profile):
                metrics = self.train_one_round(log_fn=log_fn)
            self.current_round = rnd + 1
            if (rnd + 1) % self.opts.get("save_freq", 10) == 0 or (
                rnd + 1 == self.opts.get("num_rounds", 60)
            ):
                self.save_checkpoint(self.current_round)
            overflow = int(metrics.get("overflow_splats", 0))
            truncated = int(metrics.get("truncated_entries", 0))
            cover = ""
            if overflow or truncated:
                cover = (f" [coverage: {overflow} span-clamped splats,"
                         f" {truncated} budget-dropped entries]")
            print(
                f"Round {rnd:03d}: time={time.time() - t0:.3f}s "
                f"total={float(metrics['total']):.4f} "
                f"alive={int(metrics['alive'])}{cover}"
            )

    # ------------------------------------------------------------------
    # rendering (render.py / reanimate.py backend)
    # ------------------------------------------------------------------

    def render_batch(self, batch: Dict, res: Optional[int] = None,
                     no_warp: bool = False) -> Dict:
        """Render frames described by a `construct_batch` dict. Returns dict of
        (M, res, res, c) numpy arrays incl. learnable-bg composited rgb
        (`engine/model.py:186-284` evaluate)."""
        res = res or self.res
        deformer = self.deformer
        raster_cfg = self.raster_cfg
        sh_degree = self.opts.get("sh_degree", 3)

        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if "frameid" not in batch:
            batch = data_utils.compute_frameid(batch, self.frame_info)

        @jax.jit
        def run(dparams, sparams, alive, batch):
            samples = deformer.apply(dparams, batch, method=deformer.get_samples)
            xyz = sparams.xyz
            rot = sf.get_rotation(sparams)
            # joint-angle override for reanimation (`reanimate.py:31-60`)
            xyz_cam, rot_cam, _ = deformer.apply(
                dparams, xyz, rot, samples, no_warp=no_warp,
                method=deformer.warp_surfels,
            )
            intrins = geom.mat2K(geom.Kmatinv(samples["Kinv"]))
            bg = deformer.apply(dparams, method=deformer.background)
            out = render_surfels_batch(
                sparams, alive, xyz_cam, rot_cam, intrins,
                res, res, sh_degree, bg, raster_cfg,
            )
            # bg is already composited by the rasterizer (T_fin * bg inside
            # render_surfels_batch) — adding it again doubled the background
            # and cost ~9 dB of eval PSNR vs the training-path render
            rgb = out.color
            return {
                "rendered": rgb,
                "mask": out.alpha[..., None],
                "depth": out.depth[..., None],
                "normal": out.normal,
                "median_depth": out.median_depth[..., None],
            }

        out = run(self.params, self.surfels.params, self.surfels.alive, batch)
        return {k: np.asarray(v) for k, v in out.items()}

    def save_checkpoint(self, round_count: int):
        payload = {
            "current_steps": self.current_steps,
            "current_round": round_count,
            "params": jax.tree.map(np.asarray, self.params),
            "surfels": jax.tree.map(np.asarray, self.surfels),
            "gs_adam": jax.tree.map(np.asarray, self.gs_adam),
            "opts": {k: v for k, v in self.opts.items() if not callable(v)},
        }
        path = os.path.join(self.save_dir, f"ckpt_{round_count:04d}.pth")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        with open(os.path.join(self.save_dir, "ckpt_latest.pth"), "wb") as f:
            pickle.dump(payload, f)
        # canonical 3DGS ply export (`gaussian_model.py:203-220`)
        save_ply(
            os.path.join(self.save_dir, f"point_cloud_{round_count:04d}.ply"),
            jax.tree.map(np.asarray, self.surfels.params),
            np.asarray(self.surfels.alive),
        )

    def load_checkpoint(self, path: str, reset_steps: bool = True):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.params = jax.tree.map(jnp.asarray, payload["params"])
        self.surfels = jax.tree.map(jnp.asarray, payload["surfels"])
        self.gs_adam = jax.tree.map(jnp.asarray, payload["gs_adam"])
        if not reset_steps:
            self.current_steps = payload["current_steps"]
            self.current_round = payload["current_round"]
        return payload

    def load_stage2(self, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        s2 = jax.tree.map(jnp.asarray, payload["params"])
        self.params = transfer_stage2_params(s2, self.params)
