"""Train RAFT-small on procedurally generated warps (no external data).

The reference ships VCN+ with pretrained weights; this environment has zero
egress, so the learned-flow model is trained in-repo: random multi-scale
textures warped by random smooth flows (affine + gaussian-bump displacement
fields), photometric noise + brightness jitter for robustness. The
gamma-weighted per-iteration L1 of the RAFT paper supervises all update
steps.

    PYTHONPATH=. python scripts/train_raft.py --steps 2000 \
        --out vidu4d_tpu/weights/raft_small_synthetic.npz

Prints train EPE every 100 steps and final held-out EPE vs the pyramidal-LK
baseline (vidu4d_tpu/preprocess/flow.py).
"""

from __future__ import annotations

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidu4d_tpu.preprocess.raft import ITERS, RaftSmall, save_weights


def random_texture(rng, res, batch):
    """Multi-scale random textures: sum of upsampled noise octaves."""
    img = np.zeros((batch, res, res, 3), np.float32)
    for scale in (4, 8, 16, 32, 64):
        n = rng.normal(size=(batch, scale, scale, 3)).astype(np.float32)
        img += np.asarray(
            jax.image.resize(jnp.asarray(n), (batch, res, res, 3), "bilinear")
        ) / np.sqrt(scale)
    img -= img.min(axis=(1, 2, 3), keepdims=True)
    img /= np.maximum(img.max(axis=(1, 2, 3), keepdims=True), 1e-6)
    return img


def random_flow(rng, res, batch, max_disp):
    """Smooth random flow: affine + gaussian-bump displacement field."""
    flow = np.zeros((batch, res, res, 2), np.float32)
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    xy = np.stack([xx, yy], -1).astype(np.float32)
    c = xy - res / 2
    for b in range(batch):
        a = rng.normal(size=(2, 2)).astype(np.float32) * 0.03
        t = rng.uniform(-max_disp, max_disp, size=(2,)).astype(np.float32)
        flow[b] = c @ a.T + t
        for _ in range(rng.integers(1, 4)):
            ctr = rng.uniform(0, res, size=(2,))
            sig = rng.uniform(res / 8, res / 3)
            amp = rng.uniform(-max_disp, max_disp, size=(2,))
            g = np.exp(-np.sum((xy - ctr) ** 2, -1) / (2 * sig**2))
            flow[b] += g[..., None] * amp
    return np.clip(flow, -max_disp * 2, max_disp * 2)


def warp_image(img, flow):
    """Backward-warp: img2 such that img2(x) = img1(x + flow(x))."""
    b, h, w, c = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = jnp.clip(xx[None] + flow[..., 0], 0, w - 1)
    sy = jnp.clip(yy[None] + flow[..., 1], 0, h - 1)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    x1 = jnp.minimum(x0 + 1, w - 1); y1 = jnp.minimum(y0 + 1, h - 1)
    wx = sx - x0; wy = sy - y0

    def tap(yi, xi):
        idx = (yi * w + xi).astype(jnp.int32).reshape(b, -1)
        return jnp.take_along_axis(
            img.reshape(b, -1, c), idx[..., None], axis=1
        ).reshape(b, h, w, c)

    return (
        tap(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + tap(y0, x1) * (wx * (1 - wy))[..., None]
        + tap(y1, x0) * ((1 - wx) * wy)[..., None]
        + tap(y1, x1) * (wx * wy)[..., None]
    )


def make_batch(rng, res, batch, max_disp=12.0):
    img1 = random_texture(rng, res, batch)
    flow = random_flow(rng, res, batch, max_disp)
    # img1(x) corresponds to img2(x + flow): generate img2 by backward-
    # warping img1 with the INVERSE mapping approximated by -flow sampling
    img2 = np.asarray(warp_image(jnp.asarray(img1), jnp.asarray(flow)))
    # photometric jitter
    img2 = np.clip(
        img2 * rng.uniform(0.8, 1.2) + rng.normal(0, 0.02, img2.shape), 0, 1
    ).astype(np.float32)
    return jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(flow)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--out", default="vidu4d_tpu/weights/raft_small_synthetic.npz")
    ap.add_argument("--gamma", type=float, default=0.8)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    model = RaftSmall()
    img1, img2, gt = make_batch(rng, args.res, args.batch)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"raft-small params: {n_params/1e6:.2f}M")

    sched = optax.linear_onecycle_schedule(args.steps, args.lr)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, img1, img2, gt):
        def loss_fn(p):
            preds = model.apply(p, img1, img2, all_iters=True)
            total = 0.0
            for i, fl in enumerate(preds):
                w = args.gamma ** (len(preds) - i - 1)
                total += w * jnp.mean(jnp.abs(fl - gt))
            epe = jnp.mean(
                jnp.linalg.norm(preds[-1] - gt, axis=-1)
            )
            return total, epe

        (loss, epe), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, epe

    t0 = time.time()
    for it in range(args.steps):
        img1, img2, gt = make_batch(rng, args.res, args.batch)
        params, opt_state, loss, epe = step(params, opt_state, img1, img2, gt)
        if it % 100 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} epe={float(epe):.3f}px "
                  f"({time.time()-t0:.0f}s)", flush=True)

    save_weights(params, args.out)
    print(f"saved {args.out}")

    # held-out eval vs the pyramidal-LK baseline
    from vidu4d_tpu.preprocess.flow import lk_flow

    rng_eval = np.random.default_rng(123)
    epes_raft, epes_lk = [], []
    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))
    lk = jax.jit(lk_flow)
    for _ in range(4):
        img1, img2, gt = make_batch(rng_eval, args.res, args.batch)
        pred = fwd(params, img1, img2)
        epes_raft.append(float(jnp.mean(jnp.linalg.norm(pred - gt, axis=-1))))
        for b in range(img1.shape[0]):
            fl = lk(img1[b], img2[b])
            epes_lk.append(
                float(jnp.mean(jnp.linalg.norm(fl - gt[b], axis=-1)))
            )
    print(f"held-out EPE: raft={np.mean(epes_raft):.3f}px "
          f"lk={np.mean(epes_lk):.3f}px")


if __name__ == "__main__":
    main()
