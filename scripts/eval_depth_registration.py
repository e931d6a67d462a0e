"""End-metric eval for the monodepth slot (VERDICT r2 #7): camera
registration accuracy with depthnet depth vs GT depth vs flow-parallax.

The depth prior's only consumer in the pipeline is Stage-1 camera
registration (`pipeline.py` pair loop -> `two_frame_registration_np`;
reference: `preprocess/scripts/camera_registration.py`), so ordering
accuracy is a proxy — THIS is the metric that matters. Scene: a rigidly
rotating textured surfel blob (0.08 rad/frame about y, static camera, no
breathing) rendered by the repo's rasterizer, whose exact per-pair
rotation is known. For each depth source we run the production pair
registration + chaining and report geodesic rotation error.

    python scripts/eval_depth_registration.py --res 64 --frames 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_rigid_scene(res: int, n_frames: int, n_splats: int = 500, seed: int = 3):
    """Rotating textured blob (no breathing — rigid GT for registration)."""
    import jax.numpy as jnp

    from vidu4d_tpu.models.gaussian import surfels as sf
    from vidu4d_tpu.ops.rasterize import RasterizeConfig, rasterize

    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_splats, 3)).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-6)
    pts *= rng.uniform(0.7, 1.0, size=(n_splats, 1)).astype(np.float32) * 0.12
    cols = rng.uniform(0.1, 1.0, size=(n_splats, 3)).astype(np.float32)
    state = sf.init_from_points(jnp.asarray(pts), jnp.asarray(cols),
                                capacity=n_splats, sh_degree=0)
    params = state.params._replace(
        opacity=jnp.full_like(state.params.opacity, 4.0),
        scaling=jnp.full_like(state.params.scaling, np.log(0.02)),
    )
    cfg = RasterizeConfig(budget=512, tile_chunk=4)
    f = 1.2 * res
    intrins = jnp.asarray([f, f, res / 2, res / 2])
    kinv = np.array([[1 / f, 0, -res / 2 / f],
                     [0, 1 / f, -res / 2 / f],
                     [0, 0, 1]], np.float32)

    frames, masks, depths = [], [], []
    for t in range(n_frames):
        ang = 0.08 * t
        rot = np.array([
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ], np.float32)
        xyz_t = np.asarray(params.xyz) @ rot.T + np.array([0, 0, 0.5], np.float32)
        p_t = params._replace(xyz=jnp.asarray(xyz_t))
        out = rasterize(
            p_t.xyz, sf.get_rotation(p_t), sf.get_scaling(p_t),
            sf.get_opacity(p_t)[:, 0], jnp.eye(4), intrins, res, res,
            shs=sf.get_features(p_t), sh_degree=0,
            bg_color=jnp.asarray([1.0, 1.0, 1.0]), mask=state.alive, config=cfg,
        )
        a = np.asarray(out.alpha)
        frames.append(np.asarray(out.color))
        masks.append((a > 0.3).astype(np.float32))
        depths.append(np.asarray(out.depth) / np.maximum(a, 1e-6) * (a > 0.3))
    return (np.stack(frames), np.stack(masks), np.stack(depths), kinv)


def rot_geodesic_deg(r_a: np.ndarray, r_b: np.ndarray) -> float:
    c = (np.trace(r_a.T @ r_b) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def registration_errors(depth, flow_fw, masks, kinv, ang_step=0.08):
    from vidu4d_tpu.preprocess.registration import chain_poses, two_frame_registration_np
    import jax.numpy as jnp

    n = depth.shape[0] - 1
    r_gt = np.array([
        [np.cos(ang_step), 0, np.sin(ang_step)],
        [0, 1, 0],
        [-np.sin(ang_step), 0, np.cos(ang_step)],
    ])
    pair_errs, mats = [], []
    for i in range(n):
        m = masks[i] * (flow_fw[i, ..., 2] < 0.5)
        rt = two_frame_registration_np(
            depth[i], depth[i + 1], flow_fw[i, ..., :2], kinv, kinv, m
        )
        mats.append(rt)
        pair_errs.append(rot_geodesic_deg(rt[:3, :3], r_gt))
    chained = np.asarray(chain_poses(jnp.asarray(np.stack(mats))))
    ang_total = ang_step * n
    r_tot = np.array([
        [np.cos(ang_total), 0, np.sin(ang_total)],
        [0, 1, 0],
        [-np.sin(ang_total), 0, np.cos(ang_total)],
    ])
    # chain_poses yields world(frame0)->frame_i transforms; compare last
    chain_err = rot_geodesic_deg(chained[-1][:3, :3], r_tot)
    return {
        "pair_rot_err_deg_mean": round(float(np.mean(pair_errs)), 3),
        "pair_rot_err_deg_max": round(float(np.max(pair_errs)), 3),
        "chained_rot_err_deg": round(chain_err, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax.numpy as jnp

    from vidu4d_tpu.preprocess.depth import estimate_depth
    from vidu4d_tpu.preprocess.flow import compute_flow_pairs

    frames, masks, gt_depth, kinv = make_rigid_scene(args.res, args.frames)
    flow_fw, _ = compute_flow_pairs(jnp.asarray(frames), delta=1)
    flow_fw = np.asarray(flow_fw)

    results = {}
    results["gt_depth"] = registration_errors(gt_depth, flow_fw, masks, kinv)
    net = estimate_depth(frames, backend="auto").astype(np.float32)
    results["depthnet"] = registration_errors(net, flow_fw, masks, kinv)
    par = estimate_depth(frames, backend="flow_parallax").astype(np.float32)
    results["flow_parallax"] = registration_errors(par, flow_fw, masks, kinv)

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(results, fp, indent=2)


if __name__ == "__main__":
    main()
