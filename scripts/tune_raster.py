"""Sweep rasterizer backend knobs on real hardware.

Times the full Stage-3 train step (same harness as bench.py) across
(impl, budget, tile_chunk) combinations and prints a ranked table, so the
training defaults in `config.py` / `RasterizeConfig` are measured, not
guessed.

    python scripts/tune_raster.py --surfels 200000 --res 256 --iters 10
"""

from __future__ import annotations

import argparse
import itertools
import json
import time

import jax
import jax.numpy as jnp


def time_config(args, impl, budget, tile_chunk):
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
    cfg = RasterizeConfig(
        tile=16, span_cap=4, budget=budget, tile_chunk=tile_chunk, impl=impl
    )
    step = build_stage3_train_step(deformer, args.res, cfg)
    gs_adam = gs_adam_init(surfels.params)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    s, a, metrics = step(params, surfels, gs_adam, batch)  # compile+warm
    jax.block_until_ready(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s, a, metrics = step(params, s, a, batch)
    jax.block_until_ready(metrics["total"])
    return (time.perf_counter() - t0) / args.iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--surfels", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--impls", default="tiles,pallas_grad")
    ap.add_argument("--budgets", default="512,1024,2048")
    ap.add_argument("--tile_chunks", default="4,8,16")
    args = ap.parse_args()

    rows = []
    for impl in args.impls.split(","):
        budgets = [0] if impl == "pallas_grad" else [
            int(b) for b in args.budgets.split(",")
        ]
        chunks = [0] if impl == "pallas_grad" else [
            int(c) for c in args.tile_chunks.split(",")
        ]
        for budget, chunk in itertools.product(budgets, chunks):
            try:
                dt = time_config(args, impl, budget or 1024, chunk or 8)
                rows.append({"impl": impl, "budget": budget,
                             "tile_chunk": chunk,
                             "step_ms": round(dt * 1e3, 3)})
                print(json.dumps(rows[-1]), flush=True)
            except Exception as e:  # noqa: BLE001 — keep sweeping
                print(json.dumps({"impl": impl, "budget": budget,
                                  "tile_chunk": chunk,
                                  "error": str(e).splitlines()[0][:160]}),
                      flush=True)
    rows.sort(key=lambda r: r["step_ms"])
    print("\nbest-first:")
    for r in rows:
        print(f"  {r['impl']:12s} budget={r['budget']:5d} "
              f"chunk={r['tile_chunk']:3d}  {r['step_ms']:8.3f} ms")


if __name__ == "__main__":
    main()
