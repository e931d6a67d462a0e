"""Benchmark: PRODUCTION Stage-3 training step on real hardware.

Times `Stage3Trainer._build_train_step` — the full hot path (SURVEY.md §3.3):
DQ-skinning warp of P surfels, tiled differentiable 2DGS rasterization at
res², the complete loss stack (rgb/mask/feat-reproj/cycle/skin regs),
backward, densify-stat projection pass, surfel Adam + warp AdamW. Prints ONE
JSON line:

    {"metric": "stage3_splats_per_sec", "value": N, "unit": "splats/s",
     "vs_baseline": R}

Measurement rules (VERDICT.md r1: `jax.block_until_ready` returns before
execution finishes on the axon platform, so r1's numbers timed dispatch):
* iterations are chained (step consumes the previous step's outputs) and the
  LAST iteration's loss scalar is fetched to host inside the timed region —
  the only sync XLA actually honors here;
* the workload is a converged-scene surfel distribution (object-shaped
  cloud, knn-derived scales ≈1-2 px projected), not a degenerate point blob;
* FLOPs from `compiled.cost_analysis()` give an effective-TFLOP/s figure so
  a physically impossible number is visible immediately.

The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is against REFERENCE_SPLATS_PER_SEC = 4.0e6 — the central A100
estimate DERIVED in BASELINE.md ("Derivation of the splats/s bar"):
10 pair-it/s x 200k surfels x 2 frames/iter, from a bottom-up sum of the
reference iteration's CUDA kernels + torch dispatch overhead, cross-checked
against published 3DGS/2DGS per-iteration costs. Rounds 1-3 divided by
2.0e6 under an inconsistent accounting; detail.vs_baseline_r3_accounting
keeps that series comparable. Update when a measured number exists.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _enable_compile_cache():
    """Persistent XLA compile cache: the bench retries in FRESH processes
    (a TPU worker crash poisons the in-process client), and the production
    step's compile is minutes through the tunneled runtime — the cache makes
    retry N start where retry N-1 left off."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/vidu4d_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


# central A100 estimate, derived in BASELINE.md ("Derivation of the
# splats/s bar"): 10 pair-it/s x 200k surfels x 2 frames rendered/iter.
# Uncertainty band [2.6e6, 1.6e7]; rounds 1-3 used 2.0e6 (older accounting).
REFERENCE_SPLATS_PER_SEC = 4.0e6
REFERENCE_SPLATS_PER_SEC_R3 = 2.0e6
V5E_PEAK_FLOPS = 197e12  # bf16; f32 VPU work peaks far lower


def build_trainer(surfels: int, res: int, frames: int, impl: str,
                  span_cap: int, budget: int, tmp: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tests.helpers import make_fake_db
    from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer
    from vidu4d_tpu.models.gaussian import surfels as sf

    db = make_fake_db(tmp, num_vids=1, T=16, H=res, W=res)
    opts = {
        "dataroot": db,
        "seqname": "toy",
        "logname": "bench",
        "logroot": os.path.join(tmp, "logdir"),
        "data_prefix": "crop",
        "train_res": res,
        "pixels_per_image": -1,
        "imgs_per_gpu": frames // 2,
        "fg_motion": "gs-bob",
        "gs_capacity": surfels,
        "gs_init_samples": surfels,
        "sh_degree": 3,
        "raster_impl": impl,
        "raster_span_cap": span_cap,
        "raster_budget": budget,
        "num_rounds": 60,
        "iters_per_round": 200,
    }
    trainer = Stage3Trainer(opts)

    # The bench skips the Stage-2 mlp_init that normally fits the camera
    # and intrinsics MLPs to priors, so at random init the focal is ~0.5 px
    # and nearly every splat culls away (r2 probe: 619 of 200k entries —
    # the step then times the fixed-capacity sort/pack pipeline, not
    # compositing). Fix the intrinsics to the pixel-true prior and place
    # the cloud THROUGH the warp so the workload is a real render.
    from vidu4d_tpu.models.fields.time_mlp import init_intrinsics_base_params

    n_frames_total = int(np.asarray(trainer.frame_info.frame_offset)[-1])
    prior = np.tile(
        np.array([1.2 * res, 1.2 * res, res / 2, res / 2], np.float32),
        (n_frames_total, 1),
    )
    p = dict(trainer.params["params"])
    intr_params = init_intrinsics_base_params(
        {"params": p["intrinsics"]}, prior, trainer.frame_info
    )
    p["intrinsics"] = intr_params["params"]
    trainer.params = {**trainer.params, "params": p}

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(surfels, 3)).astype(np.float32)
    pts *= np.array([0.03, 0.04, 0.03], np.float32)
    pts = _calibrate_scene(trainer, pts)
    cols = rng.uniform(size=(surfels, 3)).astype(np.float32)
    feats = rng.normal(size=(surfels, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    trainer.surfels = sf.init_from_points(
        jnp.asarray(pts), jnp.asarray(cols), surfels, sh_degree=3,
        key=jax.random.PRNGKey(0), regist_feat=jnp.asarray(feats),
    )
    from vidu4d_tpu.models.gaussian.optimizer import gs_adam_init

    trainer.gs_adam = gs_adam_init(trainer.surfels.params)
    trainer._bench_scene_diag = _scene_diag(trainer, res)
    return trainer


def _calibrate_scene(trainer, pts: "np.ndarray") -> "np.ndarray":
    """Place the cloud so its WARPED image fills the frame.

    The deformer is at random init (25 random bones + random camera heads),
    so world placement doesn't map to camera space in any obvious way.
    Affine-fit cam ≈ world @ A + b through the actual warp on a subsample,
    then solve for the cloud that lands in a visible camera-space box;
    iterate to absorb the warp's nonlinearity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidu4d_tpu.models.gaussian import surfels as sf

    d = trainer.deformer
    batch = trainer._next_batch()
    samples = d.apply(trainer.params, batch, method=d.get_samples)
    n = pts.shape[0]
    rot = np.zeros((n, 4), np.float32)
    rot[:, 0] = 1.0
    rot = jnp.asarray(rot)

    warp = jax.jit(
        lambda xyz: d.apply(
            trainer.params, xyz, rot, samples, method=d.warp_surfels
        )[0]
    )
    rngl = np.random.default_rng(1)
    # target: z safely past the 0.2 near plane, ~±70 px spread at fx=1.2res
    target = (
        rngl.normal(size=(n, 3)) * np.array([0.05, 0.06, 0.035])
        + np.array([0.0, 0.0, 0.38])
    ).astype(np.float32)
    sub = np.arange(0, n, max(1, n // 2048))
    for _ in range(3):
        xc = np.asarray(warp(jnp.asarray(pts)))  # (M, n, 3)
        x_s = np.concatenate([pts[sub]] * xc.shape[0])
        y_s = np.concatenate([np.asarray(xc[f])[sub] for f in range(xc.shape[0])])
        xh = np.concatenate([x_s, np.ones((len(x_s), 1), np.float32)], 1)
        w, *_ = np.linalg.lstsq(xh, y_s, rcond=None)
        a, b = w[:3], w[3]
        pts = ((target - b) @ np.linalg.pinv(a, rcond=1e-3)).astype(np.float32)
    return pts


def _scene_diag(trainer, res: int) -> dict:
    """Per-frame visibility/occupancy telemetry for the bench workload."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidu4d_tpu.models.gaussian import surfels as sf
    from vidu4d_tpu.ops import geometry as geom
    from vidu4d_tpu.ops.rasterize.common import bin_splats, project_splats

    d = trainer.deformer
    batch = trainer._next_batch()
    samples = d.apply(trainer.params, batch, method=d.get_samples)
    sp = trainer.surfels.params
    xc, rc, _ = d.apply(
        trainer.params, sp.xyz, sf.get_rotation(sp), samples,
        method=d.warp_surfels,
    )
    intr = geom.mat2K(geom.Kmatinv(samples["Kinv"]))
    diag = {"valid": [], "entries": [], "tiles_occupied": [], "max_tile": []}

    @jax.jit
    def one(xc_f, rc_f, intr_f):
        proj = project_splats(
            xc_f, rc_f, sf.get_scaling(sp), jnp.eye(4), intr_f,
            mask=trainer.surfels.alive,
        )
        b = bin_splats(proj, res, res, tile=16, span_cap=4)
        return (jnp.sum(proj.valid), b.num_entries,
                jnp.sum(b.tile_count > 0), jnp.max(b.tile_count))

    for f in range(xc.shape[0]):
        v, e, t, m = one(xc[f], rc[f], intr[f])
        diag["valid"].append(int(v))
        diag["entries"].append(int(e))
        diag["tiles_occupied"].append(int(t))
        diag["max_tile"].append(int(m))
    return diag


def run_bench(args) -> dict:
    _enable_compile_cache()
    import jax
    import numpy as np

    from vidu4d_tpu.engine.schedules import progress_schedule

    tmp = tempfile.mkdtemp(prefix="bench_")
    try:
        trainer = build_trainer(
            args.surfels, args.res, args.frames, args.impl,
            args.span_cap, args.budget, tmp,
        )
        batch = trainer._next_batch()
        cfg = trainer._loss_config()
        weights = progress_schedule(
            {**cfg, "reg_eikonal_wt": 0.0}, 1000
        )
        weights["lambda_normal"] = 0.0
        weights["lambda_dist"] = 0.0
        step = trainer._train_step

        state = (trainer.params, trainer.surfels, trainer.gs_adam,
                 trainer.warp_opt_state)

        def once(state):
            p, s, a, w = state
            p, s, a, w, metrics = step(p, s, a, w, batch, weights,
                                       use_2dgs_reg=False)
            return (p, s, a, w), metrics

        # compile + warmup; the host fetch is the only real sync on axon.
        # TWO chained warmups: the first step's outputs have canonical device
        # avals that the init-produced state does not, so the second call
        # compiles again — timing must start after both compiles.
        state_w, metrics = once(state)
        _ = float(metrics["total"])
        state_w, metrics = once(state_w)
        _ = float(metrics["total"])

        # device-resident loop: lax.scan over the step so per-call dispatch
        # overhead doesn't pollute the number (measured ~250 ms/call through
        # the tunneled runtime for ~60-buffer signatures — the xplane trace
        # showed the warp-grad executable itself at 20.8 ms vs 290 ms/call).
        # This is also how the production trainer runs on TPU
        # (iters_per_dispatch); per-dispatch timing is reported alongside.
        import jax as _jax

        def scan_body(st, _):
            st2, m = once(st)
            return st2, m["total"]

        @_jax.jit
        def run_scan(st):
            st2, totals = _jax.lax.scan(
                scan_body, st, None, length=args.iters
            )
            return st2, totals

        st, totals = run_scan(state)  # compile
        _ = float(totals[-1])
        t0 = time.perf_counter()
        st, totals = run_scan(state)
        _ = float(totals[-1])
        dt = (time.perf_counter() - t0) / args.iters

        # single-dispatch timing for reference (includes runtime overhead)
        t0 = time.perf_counter()
        st1 = state
        for _ in range(max(3, args.iters // 3)):
            st1, metrics = once(st1)
        total = float(metrics["total"])
        dt_dispatch = (time.perf_counter() - t0) / max(3, args.iters // 3)

        flops = None
        try:
            lowered = step.lower(*state, batch, weights, use_2dgs_reg=False)
            cost = lowered.compile().cost_analysis()
            if cost:
                flops = cost.get("flops")
        except Exception:
            pass

        if not np.isfinite(total):
            raise RuntimeError(f"non-finite loss {total}")
        gnorm = float(metrics.get("gnorm", 0.0))
        if not np.isfinite(gnorm):
            # finite losses with NaN grads was exactly the r1->r2 bug class;
            # never report a throughput number for a step that can't train
            raise RuntimeError(f"non-finite grad norm {gnorm}")

        splats_per_sec = args.surfels * args.frames / dt
        detail = {
            "step_ms": round(dt * 1000, 2),
            "step_ms_per_dispatch": round(dt_dispatch * 1000, 2),
            "surfels": args.surfels,
            "res": args.res,
            "frames": args.frames,
            "impl": args.impl,
            "loss": round(total, 4),
            "gnorm": round(gnorm, 4),
            "device": str(jax.devices()[0]),
        }
        if flops:
            detail["gflop_per_step"] = round(flops / 1e9, 1)
            detail["tflops_eff"] = round(flops / dt / 1e12, 3)
            detail["mfu_vs_bf16_peak"] = round(flops / dt / V5E_PEAK_FLOPS, 5)
        diag = getattr(trainer, "_bench_scene_diag", None)
        if diag:
            detail["scene"] = diag
            if min(diag["valid"]) < 0.5 * args.surfels:
                # a near-empty render times the fixed sort/pack pipeline,
                # not compositing (exactly the r2 bench bug) — refuse to
                # report a throughput number for it
                raise RuntimeError(f"bench scene degenerate: {diag}")
        detail["vs_baseline_r3_accounting"] = round(
            splats_per_sec / REFERENCE_SPLATS_PER_SEC_R3, 4
        )
        return {
            "metric": "stage3_splats_per_sec",
            "value": round(splats_per_sec, 1),
            "unit": "splats/s",
            "vs_baseline": round(splats_per_sec / REFERENCE_SPLATS_PER_SEC, 4),
            "detail": detail,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _acquire_tpu_lock():
    """Win the chip from any leftover campaign job (VERDICT r3 missing #1).

    Long-running jobs in this repo go through scripts/with_tpu_lock.sh,
    which holds an exclusive flock on /tmp/vidu4d_tpu.lock and records the
    job pid in /tmp/vidu4d_campaign.pid. If the lock is busy when the
    driver's bench starts, kill the RECORDED pid (never by pattern) and
    take the lock; on any failure proceed anyway — a stale lock must not
    stop the bench from producing its JSON line."""
    import fcntl
    import signal

    lockf = open("/tmp/vidu4d_tpu.lock", "w")

    def try_lock():
        try:
            fcntl.flock(lockf, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return True
        except OSError:
            return False

    if try_lock():
        return lockf
    try:
        pid = int(open("/tmp/vidu4d_campaign.pid").read().strip())
        sys.stderr.write(f"[bench] killing campaign holder pid={pid}\n")
        os.kill(pid, signal.SIGTERM)
        time.sleep(5)
        try:
            os.kill(pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
    except Exception:  # noqa: BLE001
        pass
    deadline = time.time() + 60
    while time.time() < deadline:
        if try_lock():
            return lockf
        time.sleep(2)
    sys.stderr.write("[bench] proceeding without the lock\n")
    return lockf  # keep the fd alive; lock simply not held


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--surfels", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--frames", type=int, default=2,
                    help="frames per step (pairs*2)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--budget", type=int, default=1024)
    ap.add_argument("--span-cap", type=int, default=4)
    ap.add_argument("--impl", default="pallas_grad",
                    choices=["tiles", "naive", "pallas_grad"])
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--child", action="store_true",
                    help="internal: single-attempt worker process")
    args = ap.parse_args()

    if args.quick:
        args.surfels, args.res, args.iters = 4096, 64, 5

    if args.child:
        # single attempt; parent handles retries in fresh processes (a TPU
        # worker crash poisons the in-process client irrecoverably)
        try:
            print(json.dumps(run_bench(args)))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"error": str(e).splitlines()[0][:300]}))
            sys.exit(1)
        return

    # Total wall-clock is BOUNDED (VERDICT r3: the 3x3000s retry ladder
    # alone exceeded the driver's budget). One full-workload attempt (warm
    # persistent-cache run is ~2.5 min; a cold compile is the long pole) +
    # one small fresh-process fallback, then a parseable error line.
    # Worst case: 60 s lock + 1260 s + 420 s ≈ 29 min.
    import subprocess

    _lock = _acquire_tpu_lock()  # noqa: F841  (held for bench lifetime)

    attempts = [
        (args.surfels, args.res, args.iters, 1260),
        (max(args.surfels // 16, 4096), min(args.res, 128),
         min(args.iters, 5), 420),
    ]
    last_err = None
    for surfels, res, iters, budget_s in attempts:
        cmd = [
            sys.executable, os.path.abspath(__file__), "--child",
            "--surfels", str(surfels), "--res", str(res),
            "--frames", str(args.frames), "--iters", str(iters),
            "--budget", str(args.budget), "--span-cap", str(args.span_cap),
            "--impl", args.impl,
        ]
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=budget_s,
            )
            line = None
            for ln in (proc.stdout or "").splitlines():
                ln = ln.strip()
                if ln.startswith("{"):
                    line = ln
            if line and proc.returncode == 0:
                if (surfels, res) != (attempts[0][0], attempts[0][1]):
                    # the advertised workload died — say so in the output
                    # instead of silently reporting the smaller run
                    obj = json.loads(line)
                    obj.setdefault("detail", {})["fallback_from"] = {
                        "surfels": attempts[0][0], "res": attempts[0][1],
                        "error": last_err,
                    }
                    line = json.dumps(obj)
                print(line)
                return
            if line:
                last_err = json.loads(line).get("error", line)
            else:
                last_err = (proc.stderr or "no output").splitlines()[-1][:300]
        except subprocess.TimeoutExpired:
            last_err = f"child timeout after {budget_s}s"
        except Exception as e:  # noqa: BLE001
            last_err = str(e).splitlines()[0][:300]
    print(json.dumps({
        "metric": "stage3_splats_per_sec",
        "value": 0.0,
        "unit": "splats/s",
        "vs_baseline": 0.0,
        "detail": {"error": last_err},
    }))


if __name__ == "__main__":
    main()
