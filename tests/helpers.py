"""Shared test helpers: synthetic on-disk dataset in the Stage-1 contract."""

import configparser
import os

import numpy as np


def make_fake_db(root_dir, num_vids=2, T=8, H=16, W=16, seed=0):
    """Create a fake database/ tree (Stage-1 npy contract). Returns its root."""
    rng = np.random.default_rng(seed)
    root = os.path.join(str(root_dir), "database")
    prefix = f"crop-{H}"
    names = []
    for vid in range(num_vids):
        Tv = T + vid * 2
        seq = f"toy-{vid:04d}"
        names.append(seq)
        for sub, arr in [
            ("JPEGImages", rng.uniform(size=(Tv, H, W, 3)).astype(np.float16)),
            ("Depth", rng.uniform(1, 3, size=(Tv, H, W)).astype(np.float16)),
        ]:
            d = os.path.join(root, "processed", sub, "Full-Resolution", seq)
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, f"{prefix}.npy"), arr)
        d = os.path.join(root, "processed", "Annotations", "Full-Resolution", seq)
        os.makedirs(d, exist_ok=True)
        mask = np.concatenate(
            [rng.uniform(size=(Tv, H, W, 1)) > 0.5, np.ones((Tv, H, W, 1))], -1
        ).astype(np.float16)
        np.save(os.path.join(d, f"{prefix}.npy"), mask)
        np.save(
            os.path.join(d, f"{prefix}-crop2raw.npy"),
            np.tile([2.0, 2.0, 0.0, 0.0], (Tv, 1)).astype(np.float32),
        )
        np.save(os.path.join(d, f"{prefix}-is_detected.npy"), np.ones(Tv))
        for delta in (1, 2):
            for dname in ("FlowFW", "FlowBW"):
                d = os.path.join(
                    root, "processed", f"{dname}_{delta}", "Full-Resolution", seq
                )
                os.makedirs(d, exist_ok=True)
                np.save(
                    os.path.join(d, f"{prefix}.npy"),
                    rng.normal(size=(Tv // delta, H, W, 3)).astype(np.float16),
                )
        d = os.path.join(root, "processed", "Features", "Full-Resolution", seq)
        os.makedirs(d, exist_ok=True)
        np.save(
            os.path.join(d, f"{prefix}-dinov2-01.npy"),
            rng.normal(size=(Tv, 14, 14, 16)).astype(np.float16),
        )
        d = os.path.join(root, "processed", "Cameras", "Full-Resolution", seq)
        os.makedirs(d, exist_ok=True)
        cams = np.tile(np.eye(4, dtype=np.float32), (Tv, 1, 1))
        cams[:, 2, 3] = 3.0
        np.save(os.path.join(d, "00.npy"), cams)
        np.save(os.path.join(d, "01-canonical.npy"), cams)

    cfg = configparser.ConfigParser()
    cfg["data"] = {"init_frame": "0", "end_frame": "-1"}
    for vid, seq in enumerate(names):
        cfg[f"data_{vid}"] = {
            "ks": f"{W} {W} {W // 2} {H // 2}",
            "shape": f"{H} {W}",
            "img_path": os.path.join(
                root, "processed", "JPEGImages", "Full-Resolution", seq
            ),
        }
    os.makedirs(os.path.join(root, "configs"), exist_ok=True)
    with open(os.path.join(root, "configs", "toy.config"), "w") as f:
        cfg.write(f)
    return root
