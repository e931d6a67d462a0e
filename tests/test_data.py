"""Data pipeline tests: synthetic on-disk dataset in the Stage-1 npy contract."""

import configparser
import os

import numpy as np
import pytest

from vidu4d_tpu.data import data_utils
from vidu4d_tpu.data.vidloader import VidDataset, bilinear_interp


@pytest.fixture
def fake_db(tmp_path):
    """Create a fake database/ tree with 2 videos in the Stage-1 contract."""
    rng = np.random.default_rng(0)
    root = tmp_path / "database"
    prefix = "crop-16"
    names = []
    for vid in range(2):
        T, H, W = 8 + vid * 2, 16, 16
        seq = f"toy-{vid:04d}"
        names.append(seq)
        for sub, arr in [
            ("JPEGImages", rng.uniform(size=(T, H, W, 3)).astype(np.float16)),
            ("Depth", rng.uniform(1, 3, size=(T, H, W)).astype(np.float16)),
        ]:
            d = root / "processed" / sub / "Full-Resolution" / seq
            os.makedirs(d, exist_ok=True)
            np.save(d / f"{prefix}.npy", arr)
        d = root / "processed" / "Annotations" / "Full-Resolution" / seq
        os.makedirs(d, exist_ok=True)
        mask = np.concatenate(
            [rng.uniform(size=(T, H, W, 1)) > 0.5, np.ones((T, H, W, 1))], -1
        ).astype(np.float16)
        np.save(d / f"{prefix}.npy", mask)
        np.save(d / f"{prefix}-crop2raw.npy", np.tile([2.0, 2.0, 0.0, 0.0], (T, 1)))
        np.save(d / f"{prefix}-is_detected.npy", np.ones(T))
        for delta in (1, 2):
            for dname, count in (("FlowFW", T // delta - 1), ("FlowBW", T // delta - 1)):
                d = root / "processed" / f"{dname}_{delta}" / "Full-Resolution" / seq
                os.makedirs(d, exist_ok=True)
                np.save(
                    d / f"{prefix}.npy",
                    rng.normal(size=(count + 1, H, W, 3)).astype(np.float16),
                )
        d = root / "processed" / "Features" / "Full-Resolution" / seq
        os.makedirs(d, exist_ok=True)
        np.save(
            d / f"{prefix}-dinov2-01.npy",
            rng.normal(size=(T, 14, 14, 16)).astype(np.float16),
        )
        d = root / "processed" / "Cameras" / "Full-Resolution" / seq
        os.makedirs(d, exist_ok=True)
        cams = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
        np.save(d / "00.npy", cams)
        np.save(d / "01-canonical.npy", cams)

    cfg = configparser.ConfigParser()
    cfg["data"] = {"init_frame": "0", "end_frame": "-1"}
    for vid, seq in enumerate(names):
        cfg[f"data_{vid}"] = {
            "ks": "16 16 8 8",
            "shape": "16 16",
            "img_path": str(
                root / "processed" / "JPEGImages" / "Full-Resolution" / seq
            ),
        }
    os.makedirs(root / "configs", exist_ok=True)
    with open(root / "configs" / "toy.config", "w") as f:
        cfg.write(f)
    return str(tmp_path)


def test_vid_dataset_pair_loading(fake_db):
    opts = {
        "dataroot": os.path.join(fake_db, "database"),
        "seqname": "toy",
        "data_prefix": "crop",
        "train_res": 16,
        "pixels_per_image": 8,
        "delta_list": [2],
    }
    datasets = data_utils.build_datasets(opts, rng=np.random.default_rng(1))
    assert len(datasets) == 2
    item = datasets[0][0]
    assert item["rgb"].shape == (2, 8, 3)
    assert item["mask"].shape == (2, 8, 1)
    assert item["flow"].shape == (2, 8, 2)
    assert item["feature"].shape == (2, 8, 16)
    assert item["hxy"].shape == (2, 8, 3)
    assert item["crop2raw"].shape == (2, 4)

    info = data_utils.get_data_info(datasets)
    fi = info["frame_info"]
    assert fi.num_frames == 18
    assert fi.num_vids == 2
    assert info["intrinsics"].shape == (18, 4)
    assert info["rtmat"].shape == (2, 18, 4, 4)

    batcher = data_utils.PairBatcher(datasets, imgs_per_batch=3, seed=0)
    batch = batcher.next_batch()
    assert batch["rgb"].shape == (3, 2, 8, 3)
    flat = data_utils.flatten_pairs(batch)
    assert flat["rgb"].shape == (6, 8, 3)
    flat = data_utils.compute_frameid(flat, fi)
    assert flat["frameid"].shape == (6,)
    assert (flat["frameid"] >= 0).all() and (flat["frameid"] < 18).all()
    # pair structure: consecutive entries are the pair, frame ids differ by delta
    deltas = np.abs(flat["frameid"][1::2] - flat["frameid"][::2])
    assert set(deltas.tolist()) <= {1, 2}


def test_full_image_mode(fake_db):
    opts = {
        "dataroot": os.path.join(fake_db, "database"),
        "seqname": "toy",
        "data_prefix": "crop",
        "train_res": 16,
        "pixels_per_image": -1,
    }
    datasets = data_utils.build_datasets(opts)
    item = datasets[0][1]
    assert item["rgb"].shape == (2, 256, 3)
    assert item["hxy"].shape == (2, 256, 3)
    # hxy spans the full image grid
    assert item["hxy"][0, 0, 0] == 0 and item["hxy"][0, -1, 1] == 15


def test_bilinear_interp():
    feat = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    xy = np.array([[0.0, 0.0], [1.5, 1.5], [3.0, 3.0]])
    out = bilinear_interp(feat, xy)
    assert out[0, 0] == 0.0
    assert abs(out[1, 0] - 7.5) < 1e-5
    assert abs(out[2, 0] - 15.0) < 1e-5


def test_pair_batcher_host_sharding(tmp_path):
    """Multi-host sample-space sharding (`host_slice`; DistributedSampler
    analog, reference `data_utils.py:56-71`)."""
    from tests.helpers import make_fake_db
    from vidu4d_tpu.data import data_utils

    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    opts = {"dataroot": db, "seqname": "toy", "data_prefix": "crop",
            "train_res": 16, "pixels_per_image": 4}
    ds = data_utils.build_datasets(opts)
    full = data_utils.PairBatcher(ds, imgs_per_batch=2, num_hosts=1, host_id=0)
    shard0 = data_utils.PairBatcher(ds, imgs_per_batch=2, num_hosts=2, host_id=0)
    shard1 = data_utils.PairBatcher(ds, imgs_per_batch=2, num_hosts=2, host_id=1)
    # disjoint, covering partition of the (vid, frame) index space
    s0, s1 = set(shard0.index), set(shard1.index)
    assert s0 | s1 == set(full.index)
    assert not (s0 & s1)
    assert abs(len(s0) - len(s1)) <= 1
    # both shards actually produce batches
    b = shard1.next_batch()
    assert b["rgb"].shape[0] == 2
