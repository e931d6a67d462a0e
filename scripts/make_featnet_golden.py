"""Generate tests/golden/featnet_pairs.npz — frozen image pairs + GT
correspondences for the FeatNet golden test (run once; the npz is
committed). Uses the seed-777 procedural-warp stream (training consumes
seed 0), mirroring scripts/train_featnet.py's held-out eval."""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from train_featnet import sample_correspondences  # noqa: E402
from train_raft import make_batch  # noqa: E402


def main():
    rng = np.random.default_rng(777)
    res, n_pairs, n_pts = 128, 4, 256
    img1s, img2s, xy1s, xy2s = [], [], [], []
    for _ in range(n_pairs):
        i1, i2, fl = make_batch(rng, res, 1)
        xy1, xy2 = sample_correspondences(rng, np.asarray(fl[0]), n_pts, res)
        img1s.append(np.asarray(i1[0], np.float32))
        img2s.append(np.asarray(i2[0], np.float32))
        xy1s.append(xy1)
        xy2s.append(xy2)
    out = os.path.join(os.path.dirname(HERE), "tests", "golden",
                       "featnet_pairs.npz")
    np.savez_compressed(
        out, img1=np.stack(img1s), img2=np.stack(img2s),
        xy1=np.stack(xy1s), xy2=np.stack(xy2s),
    )
    print("wrote", out)


if __name__ == "__main__":
    main()
