"""Eval-only harness for trained depthnet weights (round-5 depth ask).

Loads an .npz produced by scripts/train_depthnet.py and reruns its held-out
eval (SSI-MAE + depth-order accuracy vs the flow-parallax fallback) on the
same seed-123 scene distribution, so retrained weights can be scored and
compared without retraining. Reference consumer: camera registration's
monocular prior (reference `preprocess/scripts/depth.py:37-58`).

    PYTHONPATH=. python scripts/eval_depthnet.py \
        --weights vidu4d_tpu/weights/depthnet_synthetic_r5.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.train_depthnet import make_batch, order_accuracy
from vidu4d_tpu.preprocess.depth import depth_from_flow_parallax
from vidu4d_tpu.preprocess.depthnet import DepthNet, load_weights, ssi_mae


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    model = DepthNet(width=args.width)
    params = load_weights(args.weights)
    fwd = jax.jit(lambda p, x: model.apply(p, x))

    rng_eval = np.random.default_rng(123)
    maes, accs, accs_fp = [], [], []
    for _ in range(args.rounds):
        rgb, dep, val = make_batch(rng_eval, args.res, args.batch)
        disp = fwd(params, rgb)
        gt_disp = 1.0 / jnp.maximum(dep, 1e-3)
        maes.append(float(ssi_mae(disp, gt_disp, val)))
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
