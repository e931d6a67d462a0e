"""Stage-1 preprocessing orchestrator.

Replaces `scripts/run_preprocess.py` + `preprocess/scripts/*`: one call turns
raw frames (+ optional external masks/depth) into the exact on-disk contract
the trainer reads (SURVEY.md §2.5):

    database/processed/{JPEGImages,Annotations,FlowFW_d,FlowBW_d,Depth,
                        Features,Cameras}/Full-Resolution/<seq>/...
    database/configs/<collection>.config

Differences from the reference, by design (north star: batched XLA, no
process farm):
* flow/depth/features run as jitted batched JAX over the whole video
  (no gpu_map multiprocessing, `lab4d/utils/gpu_utils.py:6-128`);
* flow is computed directly on the per-frame crops, so it lands in crop
  coordinates without the raw->crop flow rewarping pass (`libs/io.py:204+`);
* segmentation masks are an external input (the reference's GUI /
  GroundingDINO+SAM+XMem path needs downloaded checkpoints); without them a
  center-prior box mask is used so the pipeline still runs end to end.
"""

from __future__ import annotations

import configparser
import glob
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.ops.geometry import K2inv, K2mat
from vidu4d_tpu.ops.marching import save_obj
from vidu4d_tpu.preprocess import ops as pops
from vidu4d_tpu.preprocess.canonical import canonical_registration
from vidu4d_tpu.preprocess.depth import estimate_depth
from vidu4d_tpu.preprocess.features import extract_video_features
from vidu4d_tpu.preprocess.flow import compute_flow_pairs, occlusion_from_cycle
from vidu4d_tpu.preprocess.registration import (
    chain_poses,
    two_frame_registration_np,
)
from vidu4d_tpu.preprocess.tsdf import (
    fuse_tsdf,
    recenter_mesh_and_cams,
    tsdf_to_mesh,
    view_frustum_points,
)


def extract_frames(video_path: str, out_dir: str, skip_black: bool = True) -> np.ndarray:
    """Decode a video to jpgs + return (T, H, W, 3) floats
    (`preprocess/scripts/extract_frames.py:10-26`)."""
    import imageio

    os.makedirs(out_dir, exist_ok=True)
    reader = imageio.get_reader(video_path)
    frames = []
    for i, frame in enumerate(reader):
        if skip_black and not frames and frame.max() < 10:
            continue  # skip leading black frames
        frames.append(frame)
    for i, frame in enumerate(frames):
        imageio.imwrite(os.path.join(out_dir, f"{i:05d}.jpg"), frame)
    return np.stack(frames).astype(np.float32) / 255.0


def filter_frames(
    frames: np.ndarray,
    flow_threshold: float = 0.05,
    max_frames: int = 500,
    min_frames: int = 8,
    work_res: int = 128,
) -> Optional[np.ndarray]:
    """Motion-based frame filter (`vcnplus/frame_filter.py:31-103`).

    Greedy anchor scan: keep frame 0, then keep frame j iff the max flow
    magnitude from the last-kept frame to j — normalized by the working
    resolution — exceeds ``flow_threshold``; cap at ``max_frames``. Returns
    the kept indices, or None when fewer than ``min_frames`` survive ("lack
    of motion" rejection, frame_filter.py:92-102). The reference runs VCN+
    at ~300x300; we run our pyramidal-LK flow on a ``work_res`` square. The
    anchor loop is host-side but each pair is one small jitted XLA call.
    Disabled by default upstream (run_preprocess.py:153) and here.
    """
    import jax
    import jax.numpy as jnp

    from vidu4d_tpu.preprocess.flow import lk_flow

    small = jax.image.resize(
        jnp.asarray(frames, jnp.float32),
        (frames.shape[0], work_res, work_res, 3), method="bilinear",
    )

    @jax.jit
    def max_norm_flow(i0, i1):
        f = lk_flow(i0, i1) / jnp.float32(work_res)
        return jnp.sqrt(jnp.maximum(jnp.sum(f * f, axis=-1), 1e-24)).max()

    keep = [0]
    anchor = 0
    for j in range(1, frames.shape[0]):
        if float(max_norm_flow(small[anchor], small[j])) > flow_threshold:
            keep.append(j)
            anchor = j
        if len(keep) >= max_frames:
            break
    if len(keep) <= min_frames:
        return None
    return np.asarray(keep, np.int64)


def load_frames_dir(img_dir: str) -> np.ndarray:
    import imageio

    paths = sorted(glob.glob(os.path.join(img_dir, "*.jpg")))
    return np.stack([imageio.imread(p) for p in paths]).astype(np.float32) / 255.0


def center_box_mask(shape, frac: float = 0.6) -> np.ndarray:
    """Fallback foreground prior when no segmentation is available."""
    h, w = shape
    m = np.zeros((h, w), np.float32)
    dy, dx = int(h * (1 - frac) / 2), int(w * (1 - frac) / 2)
    m[dy : h - dy, dx : w - dx] = 1.0
    return m


def preprocess_video(
    frames: np.ndarray,  # (T, H, W, 3) in [0, 1]
    out_root: str,
    seqname: str,
    masks: Optional[np.ndarray] = None,  # (T, H, W) float/bool fg masks
    crop_size: int = 256,
    delta_list=(1, 2, 4, 8),
    canonical_cams: Optional[Dict[int, np.ndarray]] = None,
    tsdf_grid: int = 96,
    depth_backend: str = "auto",
    depths: Optional[np.ndarray] = None,  # (T, H, W) external depth priors
    segment_backend: str = "external",
) -> Dict[str, str]:
    """Run the full Stage-1 pipeline for one video. Returns written paths.

    ``depths``: raw-resolution metric depth priors (the ZoeDepth slot,
    `preprocess/scripts/depth.py:37-58` — the reference always consumes a
    depth network's output; pass sensor/renderer/model depth here). When
    None, falls back to ``depth_backend`` (flow-parallax — valid only under
    camera translation).

    ``segment_backend``: "external" uses ``masks`` as given (center prior
    when None, every frame); "flow" tracks a SEED mask — masks[0] if
    provided, else the center prior — through the video with RAFT-flow
    propagation + online appearance models (the Track-Anything slot,
    `track_anything_cli.py:53-263`; see preprocess/segment.py); "auto" is
    "flow" with NO provided seed: the frame-0 mask comes from the in-repo
    dominant-motion residual seed (`segment.motion_seed_mask`, the
    GroundingDINO+SAM stand-in), falling back to the center prior when the
    motion evidence is degenerate."""
    t, hr, wr = frames.shape[:3]
    written = {}

    def subdir(kind):
        d = os.path.join(out_root, "processed", kind, "Full-Resolution", seqname)
        os.makedirs(d, exist_ok=True)
        return d

    prefix = f"crop-{crop_size}"
    if segment_backend in ("flow", "auto"):
        from vidu4d_tpu.preprocess.segment import segment_video

        seed = np.asarray(masks[0]) if masks is not None else None
        masks = segment_video(frames, seed_mask=seed,
                              auto_seed=segment_backend == "auto")
    elif masks is None:
        masks = np.stack([center_box_mask((hr, wr))] * t)
    masks = np.asarray(masks, np.float32)
    is_detected = (masks.reshape(t, -1).max(-1) > 0).astype(np.float32)

    # raw intrinsics (`write_config.py:33-36`)
    max_l = float(max(hr, wr))
    k_raw = np.array([max_l, max_l, wr / 2.0, hr / 2.0], np.float32)

    # ---- crop params + resampling (batched jit) -----------------------
    @jax.jit
    def crop_one(img, mask):
        c2r = pops.compute_crop_params(mask, crop_size=crop_size)
        rgb_c = pops.crop_resample(img, c2r, crop_size)
        mask_c = pops.crop_resample(mask[..., None], c2r, crop_size, nearest=True)
        # vis2d: inside-raw-frame indicator
        xs = jnp.arange(crop_size, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
        xrw = gx * c2r[0] + c2r[2]
        yrw = gy * c2r[1] + c2r[3]
        vis = ((xrw >= 0) & (xrw < wr) & (yrw >= 0) & (yrw < hr)).astype(jnp.float32)
        return rgb_c, mask_c[..., 0], vis, c2r

    rgb_crop, mask_crop, vis_crop, crop2raw = jax.vmap(crop_one)(
        jnp.asarray(frames), jnp.asarray(masks)
    )
    rgb_crop = np.asarray(rgb_crop)
    mask_crop = np.asarray(mask_crop)
    vis_crop = np.asarray(vis_crop)
    crop2raw = np.asarray(crop2raw)

    np.save(os.path.join(subdir("JPEGImages"), f"{prefix}.npy"),
            rgb_crop.astype(np.float16))
    ann = np.stack([mask_crop, vis_crop], axis=-1).astype(np.float16)
    np.save(os.path.join(subdir("Annotations"), f"{prefix}.npy"), ann)
    np.save(os.path.join(subdir("Annotations"), f"{prefix}-crop2raw.npy"), crop2raw)
    np.save(os.path.join(subdir("Annotations"), f"{prefix}-is_detected.npy"),
            is_detected)
    # also write per-frame jpgs (render CLI reads frame counts from here)
    import imageio

    jdir = subdir("JPEGImages")
    for i in range(t):
        imageio.imwrite(
            os.path.join(jdir, f"{i:05d}.jpg"),
            (np.clip(frames[i], 0, 1) * 255).astype(np.uint8),
        )

    # ---- flow at temporal deltas (`run_preprocess.py:85-88`) ----------
    for delta in delta_list:
        if delta >= t:
            continue
        fw, bw = compute_flow_pairs(jnp.asarray(rgb_crop), delta)
        # loader contract: row k of FlowFW_d is the pair (k*d, k*d + d)
        # (`vidloader.py:358-368` indexes with frame // delta)
        np.save(
            os.path.join(subdir(f"FlowFW_{delta}"), f"{prefix}.npy"),
            np.asarray(fw)[::delta].astype(np.float16),
        )
        np.save(
            os.path.join(subdir(f"FlowBW_{delta}"), f"{prefix}.npy"),
            np.asarray(bw)[::delta].astype(np.float16),
        )

    # ---- depth ---------------------------------------------------------
    if depths is not None:
        depth = np.asarray(
            jax.vmap(
                lambda d, c2r: pops.crop_resample(d[..., None], c2r,
                                                  crop_size)[..., 0]
            )(jnp.asarray(depths, jnp.float32), jnp.asarray(crop2raw))
        )
    else:
        depth = estimate_depth(rgb_crop, backend=depth_backend)  # (T, H, W)
    np.save(os.path.join(subdir("Depth"), f"{prefix}.npy"), depth)

    # ---- features ------------------------------------------------------
    feats = extract_video_features(rgb_crop, masks=mask_crop)
    np.save(
        os.path.join(subdir("Features"), f"{prefix}-dinov2-01.npy"), feats
    )

    # ---- camera registration (bg=0, fg=1) ------------------------------
    k_crop = np.stack(
        [np.asarray(K2inv(jnp.asarray(c2r)) @ K2mat(jnp.asarray(k_raw)))
         for c2r in crop2raw]
    )
    kinv_crop = np.linalg.inv(k_crop)
    fw1 = np.load(os.path.join(subdir("FlowFW_1"), f"{prefix}.npy")).astype(np.float32)

    cam_dir = subdir("Cameras")
    for comp_id, comp_name in ((0, "00"), (1, "01")):
        pair_mats = []
        for i in range(t - 1):
            m = mask_crop[i] if comp_id == 1 else (1 - mask_crop[i])
            m = m * (fw1[i, ..., 2] < 0.5)  # drop occluded
            # host f64 Kabsch: the TPU's bf16 matmul default destroys the
            # small covariance asymmetry that encodes the rotation
            rt = two_frame_registration_np(
                depth[i], depth[i + 1], fw1[i, ..., :2],
                kinv_crop[i], kinv_crop[i + 1], m,
            )
            pair_mats.append(rt)
        cams = np.asarray(chain_poses(jnp.asarray(np.stack(pair_mats))))
        np.save(os.path.join(cam_dir, f"{comp_name}.npy"), cams.astype(np.float32))

    # ---- TSDF fusion of the fg component -> centered mesh + cams -------
    cams_fg = np.load(os.path.join(cam_dir, "01.npy"))
    depth_masked = depth.astype(np.float32) * mask_crop
    cam2scene = np.linalg.inv(cams_fg)
    corners = []
    for i in range(t):
        corners.append(np.asarray(view_frustum_points(
            jnp.asarray(depth_masked[i]), jnp.asarray(kinv_crop[i]),
            jnp.asarray(cam2scene[i]))))
    corners = np.concatenate(corners, 0)
    vol_bnds = np.stack([corners.min(0), corners.max(0)])
    tsdf, color, weight = fuse_tsdf(
        jnp.asarray(depth_masked), jnp.asarray(rgb_crop, jnp.float32),
        jnp.asarray(kinv_crop), jnp.asarray(cam2scene),
        jnp.asarray(vol_bnds), grid_size=tsdf_grid,
    )
    verts, faces = tsdf_to_mesh(np.asarray(tsdf), np.asarray(weight), vol_bnds)
    if len(verts):
        verts, cams_centered = recenter_mesh_and_cams(verts, cams_fg)
        save_obj(os.path.join(cam_dir, "mesh-01-centered.obj"), verts, faces)
        save_obj(os.path.join(cam_dir, "mesh-00-centered.obj"), verts, faces)
    else:
        cams_centered = cams_fg

    # ---- canonical registration (`canonical_registration.py:67-158`) ---
    if canonical_cams is None:
        canonical_cams = {0: cams_centered[0]}
    cams_canonical, _ = canonical_registration(canonical_cams, cams_centered,
                                               num_iter=500)
    # the reference DISCARDS the optimized translations and re-derives them
    # per frame from the 2D mask bbox (`canonical_registration.py:130-152`):
    # z = focal / sqrt(bbox_area), xy = z * (bbox_center - principal) / focal.
    # This pins the object IN FRONT of every camera at a bbox-consistent
    # depth — without it, a bad Procrustes chain can place the object behind
    # the camera, where rendering is empty and stage-2/3 gradients can never
    # recover (observed: flat mask loss, final alpha == 0 everywhere).
    cams_canonical = np.array(cams_canonical)
    for i in range(t):
        ys, xs = np.nonzero(mask_crop[i] > 0)
        if len(xs) == 0:
            continue
        bw = float(xs.max() - xs.min() + 1)
        bh = float(ys.max() - ys.min() + 1)
        focal = float(k_crop[i][0, 0])
        z = min(focal / np.sqrt(max(bw * bh, 1.0)), 10.0)
        cx, cy = float(k_crop[i][0, 2]), float(k_crop[i][1, 2])
        bcx = (float(xs.max()) + float(xs.min())) / 2.0
        bcy = (float(ys.max()) + float(ys.min())) / 2.0
        cams_canonical[i, 0, 3] = z * (bcx - cx) / focal
        cams_canonical[i, 1, 3] = z * (bcy - cy) / focal
        cams_canonical[i, 2, 3] = z
    np.save(os.path.join(cam_dir, "01-canonical.npy"),
            cams_canonical.astype(np.float32))

    written["root"] = out_root
    return written


def write_config(out_root: str, collection_name: str, crop_size: int = 256):
    """database/configs/<collection>.config (`write_config.py:11-45`)."""
    import imageio

    imgroot = os.path.join(out_root, "processed", "JPEGImages", "Full-Resolution")
    config = configparser.ConfigParser()
    config["data"] = {"init_frame": "0", "end_frame": "-1"}
    seqs = sorted(glob.glob(os.path.join(imgroot, f"{collection_name}-*")))
    total = 0
    for seq in seqs:
        jpgs = sorted(glob.glob(os.path.join(seq, "*.jpg")))
        if len(jpgs) < 8:
            continue
        img = imageio.imread(jpgs[0])
        fl = max(img.shape[:2])
        config[f"data_{total}"] = {
            "ks": f"{fl} {fl} {img.shape[1] // 2} {img.shape[0] // 2}",
            "shape": f"{img.shape[0]} {img.shape[1]}",
            "img_path": seq + "/",
        }
        total += 1
    os.makedirs(os.path.join(out_root, "configs"), exist_ok=True)
    with open(os.path.join(out_root, "configs", f"{collection_name}.config"), "w") as f:
        config.write(f)


def run_preprocess(out_root: str, collection_name: str, video_paths: List[str],
                   masks_per_video: Optional[List[np.ndarray]] = None,
                   crop_size: int = 256, use_filter_frames: bool = False,
                   segment_backend: str = "external"):
    """Full multi-video orchestrator (`scripts/run_preprocess.py:122-235`);
    ``use_filter_frames`` defaults off like run_preprocess.py:153."""
    for vidid, path in enumerate(video_paths):
        seqname = f"{collection_name}-{vidid:04d}"
        frames_dir = os.path.join(
            out_root, "processed", "JPEGImagesRaw", "Full-Resolution", seqname
        )
        frames = extract_frames(path, frames_dir)
        masks = masks_per_video[vidid] if masks_per_video else None
        if use_filter_frames:
            keep = filter_frames(frames)
            if keep is None:
                print(f"lack of motion, ignored: {seqname}")
                continue
            frames = frames[keep]
            if masks is not None:
                masks = masks[keep]
        preprocess_video(frames, out_root, seqname, masks=masks,
                         crop_size=crop_size,
                         segment_backend=segment_backend)
    write_config(out_root, collection_name, crop_size=crop_size)
