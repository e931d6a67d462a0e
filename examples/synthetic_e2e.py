"""End-to-end evidence run: synthetic video -> Stage 1 -> 2 -> 3 -> render.

Generates a ground-truth video by rendering a known deforming surfel cloud
with our own rasterizer, then runs the full pipeline from raw frames:
preprocessing (masks given), neural-SDF stage, dynamic-surfel stage, and a
reference-view render, reporting PSNR of the final renders against the
input frames. Writes artifacts + metrics.json under --out.

    python examples/synthetic_e2e.py --out /tmp/e2e --res 64 --frames 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# self-sufficient import path: do NOT ask users to set PYTHONPATH=. — on
# hosts where PYTHONPATH already carries platform hooks (e.g. a PJRT
# plugin's sitecustomize dir), overriding it silently breaks the backend
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_gt_video(res: int, n_frames: int, n_splats: int = 400, seed: int = 0,
                  motion_scale: float = 1.0):
    """Render a rotating, breathing surfel blob: frames, masks, GT depth.

    motion_scale multiplies the per-frame rotation/breathing rates; at 1.0
    the max delta-1 optical flow is ~1.5 px (below the shipped RAFT's noise
    floor, so the SNR-gated flow loss is mostly inactive), at 2.0 it is
    ~3 px (real signal for the flow supervision)."""
    import jax
    import jax.numpy as jnp

    from vidu4d_tpu.models.gaussian import surfels as sf
    from vidu4d_tpu.ops.rasterize import RasterizeConfig, rasterize

    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_splats, 3)).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-6)
    pts *= rng.uniform(0.7, 1.0, size=(n_splats, 1)).astype(np.float32) * 0.12
    # textured (rotation-observable) coloring: random per-splat colors — a
    # radially-symmetric pattern makes camera registration ill-posed
    cols = rng.uniform(0.1, 1.0, size=(n_splats, 3)).astype(np.float32)
    state = sf.init_from_points(jnp.asarray(pts), jnp.asarray(cols),
                                capacity=n_splats, sh_degree=0)
    params = state.params._replace(
        # near-opaque: optical flow (and hence camera registration) is only
        # well-posed on an opaque surface, not a semi-transparent cloud
        opacity=jnp.full_like(state.params.opacity, 4.0),  # sigmoid ~0.98
        scaling=jnp.full_like(state.params.scaling, np.log(0.02)),
    )
    cfg = RasterizeConfig(budget=512, tile_chunk=4)
    intrins = jnp.asarray([1.2 * res, 1.2 * res, res / 2, res / 2])

    frames, masks, depths = [], [], []
    for t in range(n_frames):
        ang = 0.08 * motion_scale * t
        breathe = 1.0 + 0.1 * np.sin(0.5 * motion_scale * t)
        rot = np.array([
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ], np.float32)
        xyz_t = (np.asarray(params.xyz) * breathe) @ rot.T
        xyz_t = xyz_t + np.array([0, 0, 0.5], np.float32)
        p_t = params._replace(xyz=jnp.asarray(xyz_t))
        out = rasterize(
            p_t.xyz, sf.get_rotation(p_t), sf.get_scaling(p_t),
            sf.get_opacity(p_t)[:, 0],
            jnp.eye(4), intrins, res, res,
            shs=sf.get_features(p_t), sh_degree=0,
            bg_color=jnp.asarray([1.0, 1.0, 1.0]), mask=state.alive, config=cfg,
        )
        frames.append(np.asarray(out.color))
        masks.append(np.asarray(out.alpha) > 0.3)
        # alpha-normalized expected depth = the GT depth prior (the ZoeDepth
        # slot; flow-parallax depth is invalid under pure object rotation)
        a = np.asarray(out.alpha)
        depths.append(np.asarray(out.depth) / np.maximum(a, 1e-6) * (a > 0.3))
    return (np.stack(frames), np.stack(masks).astype(np.float32),
            np.stack(depths))


def make_gt_video_raymarch(res: int, n_frames: int, seed: int = 0,
                           motion_scale: float = 1.0,
                           background: str = "white",
                           cam_jitter: float = 0.0):
    """GT video that does NOT come from the repo's own rasterizer (VERDICT
    r2 #2): a sphere-traced SDF blob — unit sphere + gaussian bumps —
    rotating and breathing, textured by 3D value noise sampled at CANONICAL
    coordinates (so a surface point keeps its color over time), Lambertian
    shaded. Pure jnp math, no rasterize() anywhere.

    Adversarial knobs (VERDICT r3 #9 — the zero-egress stand-in for a real
    clip): ``background="textured"`` composites over a cluttered 2D-noise
    background that pans slowly (parallax clutter instead of clean white);
    ``cam_jitter`` adds per-frame random SO(3)xR^3 pose noise (radians /
    scene units) on top of the smooth object motion — handheld-camera
    shake the camera MLPs must absorb."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    bump_c = jnp.asarray(rng.normal(size=(6, 3)) * 0.5, jnp.float32)
    bump_a = jnp.asarray(rng.uniform(0.02, 0.06, size=(6,)), jnp.float32)
    noise = jnp.asarray(rng.uniform(0.1, 1.0, size=(8, 8, 8, 3)), jnp.float32)
    # cluttered background: a coarse color lattice bilinearly upsampled, with
    # mid-gray mean so it neither matches the white model-bg prior nor the
    # object's palette
    bg_lat = rng.uniform(0.15, 0.85, size=(9, 9, 3)).astype(np.float32)

    def bg_frame(ti):
        if background != "textured":
            return np.ones((res, res, 3), np.float32)
        ys, xs = np.mgrid[0:res, 0:res].astype(np.float32)
        # slow pan: ~0.15 px/frame at res 64 — background clutter with its
        # own (camera-consistent) drift
        u = (xs / res * 8.0 + 0.02 * ti) % 8.0
        v = (ys / res * 8.0 + 0.01 * ti) % 8.0
        i, j = u.astype(np.int32), v.astype(np.int32)
        fu, fv = (u - i)[..., None], (v - j)[..., None]
        c = (bg_lat[j, i] * (1 - fu) * (1 - fv)
             + bg_lat[j, i + 1] * fu * (1 - fv)
             + bg_lat[j + 1, i] * (1 - fu) * fv
             + bg_lat[j + 1, i + 1] * fu * fv)
        return c.astype(np.float32)

    jit_rng = np.random.default_rng(seed + 101)

    r0, center_z, fpx = 0.12, 0.5, 1.2 * res

    def sdf_canon(p):
        d = jnp.linalg.norm(p, axis=-1) - r0
        b = jnp.sum(
            bump_a * jnp.exp(-jnp.sum((p[..., None, :] / r0 - bump_c) ** 2,
                                      axis=-1) * 4.0),
            axis=-1,
        )
        return d - b * r0

    def texture(p):
        u = jnp.clip((p / (2.2 * r0) + 0.5) * 7.0, 0.0, 6.999)
        i = u.astype(jnp.int32)
        f = u - i
        # trilinear sample of the noise lattice
        def tap(dx, dy, dz):
            return noise[i[..., 0] + dx, i[..., 1] + dy, i[..., 2] + dz]
        c = (
            tap(0, 0, 0) * (1 - f[..., :1]) * (1 - f[..., 1:2]) * (1 - f[..., 2:3])
            + tap(1, 0, 0) * f[..., :1] * (1 - f[..., 1:2]) * (1 - f[..., 2:3])
            + tap(0, 1, 0) * (1 - f[..., :1]) * f[..., 1:2] * (1 - f[..., 2:3])
            + tap(0, 0, 1) * (1 - f[..., :1]) * (1 - f[..., 1:2]) * f[..., 2:3]
            + tap(1, 1, 0) * f[..., :1] * f[..., 1:2] * (1 - f[..., 2:3])
            + tap(1, 0, 1) * f[..., :1] * (1 - f[..., 1:2]) * f[..., 2:3]
            + tap(0, 1, 1) * (1 - f[..., :1]) * f[..., 1:2] * f[..., 2:3]
            + tap(1, 1, 1) * f[..., :1] * f[..., 1:2] * f[..., 2:3]
        )
        return c

    @jax.jit
    def render_frame(rot, breathe, center):
        def world_to_canon(p):
            return ((p - center) @ rot) / breathe

        def sdf_world(p):
            return sdf_canon(world_to_canon(p)) * breathe

        ys, xs = jnp.meshgrid(jnp.arange(res) + 0.5, jnp.arange(res) + 0.5,
                              indexing="ij")
        dirs = jnp.stack(
            [(xs - res / 2) / fpx, (ys - res / 2) / fpx, jnp.ones_like(xs)],
            axis=-1,
        )
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        t = jnp.full((res, res), 0.2, jnp.float32)
        for _ in range(48):  # sphere tracing
            p = dirs * t[..., None]
            t = t + jnp.clip(sdf_world(p), -0.05, 0.05)
        p = dirs * t[..., None]
        hit = jnp.abs(sdf_world(p)) < 2e-3

        eps = 1e-3
        n = jnp.stack([
            sdf_world(p + jnp.asarray([eps, 0, 0])) - sdf_world(p - jnp.asarray([eps, 0, 0])),
            sdf_world(p + jnp.asarray([0, eps, 0])) - sdf_world(p - jnp.asarray([0, eps, 0])),
            sdf_world(p + jnp.asarray([0, 0, eps])) - sdf_world(p - jnp.asarray([0, 0, eps])),
        ], axis=-1)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
        light = jnp.asarray([0.4, -0.5, -0.76])
        lam = 0.35 + 0.65 * jnp.clip(-jnp.sum(n * light, axis=-1), 0.0, 1.0)
        alb = texture(world_to_canon(p))
        rgb_fg = alb * lam[..., None]
        depth = jnp.where(hit, t, 0.0)
        return rgb_fg, hit, depth

    frames, masks, depths = [], [], []
    for ti in range(n_frames):
        ang = 0.08 * motion_scale * ti
        breathe = 1.0 + 0.1 * np.sin(0.5 * motion_scale * ti)
        rot = np.array([
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ], np.float32)
        center = np.array([0.0, 0.0, center_z], np.float32)
        if cam_jitter > 0:
            # small-angle Rodrigues + translation shake per frame
            w = jit_rng.normal(0, cam_jitter, size=3).astype(np.float32)
            wx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                           [-w[1], w[0], 0]], np.float32)
            th = np.linalg.norm(w) + 1e-9
            rj = (np.eye(3, dtype=np.float32)
                  + np.sin(th) / th * wx
                  + (1 - np.cos(th)) / th**2 * (wx @ wx))
            rot = rj @ rot
            center = center + jit_rng.normal(
                0, 0.1 * cam_jitter, size=3
            ).astype(np.float32)
        rgb_fg, hit, depth = render_frame(
            jnp.asarray(rot), jnp.float32(breathe), jnp.asarray(center)
        )
        hit_np = np.asarray(hit)
        frame = np.where(hit_np[..., None], np.asarray(rgb_fg), bg_frame(ti))
        frames.append(frame.astype(np.float32))
        masks.append(hit_np)
        depths.append(np.asarray(depth))
    return (np.stack(frames).astype(np.float32),
            np.stack(masks).astype(np.float32), np.stack(depths))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/vidu4d_e2e")
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--s2_rounds", type=int, default=3)
    ap.add_argument("--s2_iters", type=int, default=60)
    ap.add_argument("--s3_rounds", type=int, default=4)
    ap.add_argument("--s3_iters", type=int, default=100)
    ap.add_argument("--motion_scale", type=float, default=1.0,
                    help="multiplies the GT rotation/breathing rates; 2.0 "
                         "pushes delta-1 flow above the RAFT noise floor so "
                         "the SNR-gated flow loss carries real signal")
    ap.add_argument("--gt_source", default="surfel",
                    choices=["surfel", "raymarch"],
                    help="surfel: own-rasterizer GT; raymarch: sphere-traced "
                         "SDF GT fully independent of the rasterizer")
    ap.add_argument("--background", default="white",
                    choices=["white", "textured"],
                    help="raymarch GT background: textured = cluttered "
                         "panning noise (adversarial, VERDICT r3 #9)")
    ap.add_argument("--cam_jitter", type=float, default=0.0,
                    help="per-frame random pose shake (radians) on the "
                         "raymarch GT — handheld-camera stand-in")
    ap.add_argument("--mask_source", default="gt",
                    choices=["gt", "flow", "auto"],
                    help="masks fed to the pipeline: gt = perfect; flow = "
                         "tracked from the GT frame-0 seed (imperfect); "
                         "auto = no seed at all (motion seed + tracking)")
    ap.add_argument("--flow_wt", type=float, default=None,
                    help="override stage-3 flow loss weight (ablations)")
    ap.add_argument("--depth_wt", type=float, default=None)
    ap.add_argument("--raster_budget", type=int, default=512,
                    help="stage-3 per-tile entry budget (sweep: VERDICT r2 #5)")
    ap.add_argument("--s3_logname", default="s3",
                    help="stage-3 logdir name; set per budget-sweep point so "
                         "runs sharing --out (and its stage-1/2 artifacts via "
                         "--resume) train independent stage-3 models")
    ap.add_argument("--resume", action="store_true",
                    help="skip stages whose artifacts already exist in --out "
                         "(crash recovery: stage-3 resumes from its latest "
                         "checkpoint)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    metrics = {"config": vars(args)}
    t_all = time.time()

    # ---- ground-truth video (seeded: identical across resume runs) ----
    if args.gt_source == "surfel":
        frames, masks, gt_depth = make_gt_video(
            args.res, args.frames, motion_scale=args.motion_scale)
    else:
        frames, masks, gt_depth = make_gt_video_raymarch(
            args.res, args.frames, motion_scale=args.motion_scale,
            background=args.background, cam_jitter=args.cam_jitter)
    gt_masks = masks  # evaluation always scores against the true masks
    if args.mask_source != "gt":
        # imperfect masks from the in-repo tracker (adversarial: the
        # trainer sees segmentation errors, eval still uses GT)
        from vidu4d_tpu.preprocess.segment import segment_video

        seed = masks[0] if args.mask_source == "flow" else None
        masks = segment_video(frames, seed_mask=seed,
                              auto_seed=args.mask_source == "auto")
        ious_m = [
            float(((masks[i] > .5) & (gt_masks[i] > .5)).sum()
                  / max(((masks[i] > .5) | (gt_masks[i] > .5)).sum(), 1))
            for i in range(len(masks))
        ]
        metrics["train_mask_iou_vs_gt"] = round(float(np.mean(ious_m)), 4)
        print(f"[masks:{args.mask_source}] IoU vs GT "
              f"{metrics['train_mask_iou_vs_gt']}", flush=True)
    print(f"[gt:{args.gt_source}] frames {frames.shape} "
          f"coverage {np.asarray(masks).mean():.2f}", flush=True)

    # ---- stage 1 --------------------------------------------------------
    from vidu4d_tpu.preprocess.pipeline import preprocess_video, write_config

    t0 = time.time()
    db = os.path.join(args.out, "database")
    cfg_path = os.path.join(db, "configs", "synth.config")
    if args.resume and os.path.exists(cfg_path):
        print("[stage1] resume: database exists, skipping", flush=True)
    else:
        preprocess_video(frames, db, "synth-0000", masks=masks,
                         crop_size=args.res, delta_list=(1, 2, 4, 8),
                         tsdf_grid=64, depths=gt_depth)
        write_config(db, "synth", crop_size=args.res)
    metrics["stage1_s"] = round(time.time() - t0, 1)
    print(f"[stage1] {metrics['stage1_s']}s", flush=True)

    common = {
        "dataroot": db, "seqname": "synth",
        "logroot": os.path.join(args.out, "logdir"),
        "data_prefix": "crop", "train_res": args.res,
    }

    # ---- stage 2 --------------------------------------------------------
    from vidu4d_tpu.engine.trainer import Stage2Trainer

    t0 = time.time()
    s2_dir = os.path.join(common["logroot"], "synth-s2")
    s2_ckpt = os.path.join(s2_dir, "ckpt_latest.pth")
    mesh = os.path.join(s2_dir, f"{args.s2_rounds - 1:03d}-fg-geo.obj")
    if args.resume and os.path.exists(s2_ckpt):
        print("[stage2] resume: checkpoint exists, skipping", flush=True)
    else:
        s2 = Stage2Trainer({
            **common, "logname": "s2", "pixels_per_image": 16,
            "imgs_per_gpu": 32, "num_rounds": args.s2_rounds,
            "iters_per_round": args.s2_iters, "save_freq": args.s2_rounds,
            "fg_motion": "bob", "field_depth": 4, "field_width": 128,
            "train_depth_samples": 32, "rgb_timefree": True,
            "rgb_dirfree": True, "iters_per_dispatch": 10,
        })
        s2.mlp_init(sdf_iters=300, verbose=True)
        s2.train()
    metrics["stage2_s"] = round(time.time() - t0, 1)
    print(f"[stage2] {metrics['stage2_s']}s mesh={os.path.exists(mesh)}", flush=True)

    # ---- stage 3 --------------------------------------------------------
    from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

    t0 = time.time()
    s3 = Stage3Trainer({
        **common, "logname": args.s3_logname,
        "pixels_per_image": -1, "imgs_per_gpu": 1,
        "num_rounds": args.s3_rounds, "iters_per_round": args.s3_iters,
        # checkpoint every 4 rounds: a flaky-backend crash resumes from the
        # last multiple of 4 instead of restarting stage 3 from scratch
        "save_freq": min(4, args.s3_rounds), "fg_motion": "gs-bob",
        "gs_capacity": 40000, "gs_init_samples": 20000, "sh_degree": 1,
        "raster_budget": args.raster_budget, "raster_tile_chunk": 4,
        "gs_init_mesh": mesh if os.path.exists(mesh) else "",
        "densify_from_iter": 50, "densification_interval": 100,
        "opacity_reset_interval": 10_000, "outlier_filtering_interval": 10_000,
        "cameras_extent": 0.3,
        # 10 iterations per device dispatch (divides the densify cadence)
        "iters_per_dispatch": 10,
        **({"flow_wt": args.flow_wt} if args.flow_wt is not None else {}),
        **({"depth_wt": args.depth_wt} if args.depth_wt is not None else {}),
    })
    s3_ckpt = os.path.join(s3.save_dir, "ckpt_latest.pth")
    if args.resume and os.path.exists(s3_ckpt):
        s3.load_checkpoint(s3_ckpt, reset_steps=False)
        print(f"[stage3] resume from round {s3.current_round}", flush=True)
    else:
        s3.load_stage2(s2_ckpt)
    s3.train()
    metrics["stage3_s"] = round(time.time() - t0, 1)
    print(f"[stage3] {metrics['stage3_s']}s alive={int(s3.surfels.num_alive())}",
          flush=True)

    # ---- render reference views + PSNR ---------------------------------
    from vidu4d_tpu.utils.camera_trajectories import construct_batch
    from vidu4d_tpu.ops.image_losses import psnr, ssim
    import jax.numpy as jnp

    n_eval = min(args.frames - 1, 8)
    batch = construct_batch(
        inst_id=0, frameid_sub=np.arange(n_eval), eval_res=args.res,
        field2cam=None, camera_int=None, crop2raw=None,
    )
    rendered = s3.render_batch(batch, res=args.res)
    gt = frames[:n_eval]
    psnrs = [
        float(psnr(jnp.asarray(rendered["rendered"][i]), jnp.asarray(gt[i])))
        for i in range(n_eval)
    ]
    ssims = [
        float(ssim(jnp.asarray(rendered["rendered"][i]).transpose(2, 0, 1),
                   jnp.asarray(gt[i]).transpose(2, 0, 1)))
        for i in range(n_eval)
    ]
    metrics["render_psnr_mean"] = round(float(np.mean(psnrs)), 3)
    metrics["render_psnr_per_frame"] = [round(p, 2) for p in psnrs]
    metrics["render_ssim_mean"] = round(float(np.mean(ssims)), 4)
    # foreground-only PSNR: on adversarial (textured-background) scenes the
    # full-frame number is dominated by the background model; this isolates
    # the reconstruction target
    fg_psnrs = []
    for i in range(n_eval):
        m = np.asarray(gt_masks[i]) > 0.5
        if m.sum() > 16:
            mse = float(np.mean(
                (np.asarray(rendered["rendered"][i])[m] - gt[i][m]) ** 2))
            fg_psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
    if fg_psnrs:
        metrics["render_psnr_fg_mean"] = round(float(np.mean(fg_psnrs)), 3)

    # geometry: alpha-normalized rendered depth vs GT where both agree the
    # surface exists — the axis the flow/depth supervision actually targets
    # (PSNR alone can prefer dropping it; `lab4d/engine/model.py:697-702`)
    alpha_r = np.asarray(rendered["mask"])[..., 0]
    depth_r = np.asarray(rendered["depth"])[..., 0] / np.maximum(alpha_r, 1e-6)
    d_errs, ious = [], []
    for i in range(n_eval):
        gt_m = gt_depth[i] > 0
        r_m = alpha_r[i] > 0.5
        both = gt_m & r_m
        if both.sum() > 16:
            d_errs.append(float(np.sqrt(np.mean(
                (depth_r[i][both] - gt_depth[i][both]) ** 2))))
        ious.append(float((gt_m & r_m).sum() / max((gt_m | r_m).sum(), 1)))
    if d_errs:
        metrics["render_depth_rmse"] = round(float(np.mean(d_errs)), 5)
    metrics["render_mask_iou"] = round(float(np.mean(ious)), 4)
    metrics["total_s"] = round(time.time() - t_all, 1)

    from vidu4d_tpu.utils.io import save_vid

    suffix = "" if args.s3_logname == "s3" else f"_{args.s3_logname}"
    save_vid(os.path.join(args.out, f"render_vs_gt{suffix}"),
             [np.concatenate([r, g], axis=1)
              for r, g in zip(rendered["rendered"], gt)])
    with open(os.path.join(args.out, f"metrics{suffix}.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2), flush=True)


if __name__ == "__main__":
    main()
