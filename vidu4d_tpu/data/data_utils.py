"""Dataset construction + metadata extraction + batching.

Replaces `lab4d/dataloader/data_utils.py`: sequence config ini ->
per-video VidDatasets -> dataset metadata (`get_data_info`) and a simple
random-pair batcher. The reference's DataLoader + DistributedSampler +
dataset-duplication machinery (`data_utils.py:34-124`) exists to pin
iterations-per-round under torch's epoch model; here a batcher samples
(video, frame) pairs directly each step, which is equivalent for training
and removes the host-side shuffling infrastructure. Multi-host sharding
slices the index space by `jax.process_index()` (SURVEY §2.2).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.data.vidloader import VidDataset, load_sequence_config


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def build_datasets(opts: Dict, rng: Optional[np.random.Generator] = None) -> List[VidDataset]:
    config_path = os.path.join(
        opts.get("dataroot", "database"), "configs", f"{opts['seqname']}.config"
    )
    if rng is None:
        # deterministic per (seed, host): trainer runs are reproducible and
        # per-host pixel sampling decorrelates in multi-process runs
        rng = np.random.default_rng(
            opts.get("seed", 0) + 7919 * _process_index() + 1
        )
    vids = load_sequence_config(config_path)
    prefix = f"{opts['data_prefix']}-{opts['train_res']}"
    datasets = []
    for vidid, vid in enumerate(vids):
        datasets.append(
            VidDataset(
                rgb_path=vid["img_path"],
                dataid=vidid,
                ks=vid["ks"],
                raw_size=vid["shape"],
                data_prefix=prefix,
                feature_type=opts.get("feature_type", "dinov2"),
                pixels_per_image=opts.get("pixels_per_image", 16),
                load_pair=opts.get("load_pair", True),
                rng=rng,
            )
        )
    return datasets


def pca_fn(features: np.ndarray, n_components: int = 3):
    """Fit PCA, return an apply function (`data_utils.py` pca_numpy)."""
    mean = features.mean(axis=0)
    centered = features - mean
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    basis = vt[:n_components]

    def apply(x):
        shape = x.shape
        flat = x.reshape(-1, shape[-1])
        out = (flat - mean) @ basis.T
        return out.reshape(shape[:-1] + (n_components,))

    return apply


def get_data_info(datasets: List[VidDataset]) -> Dict:
    """Dataset metadata (`data_utils.py:226-335`)."""
    if not datasets:
        raise ValueError(
            "config lists no videos — write_config skips sequences shorter "
            "than 8 frames (reference rule), so check the sequence length "
            "and that JPEGImages/Full-Resolution/<seqname>/ has .jpg frames"
        )
    frame_offset = [0]
    frame_offset_raw = [0]
    frame_mapping = []
    intrinsics = []
    raw_size = []
    feature_px = []

    for ds in datasets:
        n = ds.num_frames
        frame_offset.append(frame_offset[-1] + n)
        frame_offset_raw.append(frame_offset_raw[-1] + n)
        frame_mapping += [i + frame_offset_raw[-2] for i in range(n)]
        intrinsics += [ds.ks] * n
        raw_size.append(ds.raw_size)
        feats = np.asarray(ds.mmap["feature"], np.float32).reshape(-1, 16)
        feature_px.append(feats[:: max(1, len(feats) // 1000)])

    feature_px = np.concatenate(feature_px, 0)
    feature_px = feature_px[np.linalg.norm(feature_px, 2, -1) > 0]

    frame_info = FrameInfo(
        frame_offset=tuple(frame_offset),
        frame_mapping=tuple(frame_mapping),
        frame_offset_raw=tuple(frame_offset_raw),
    )

    data_info = {
        "frame_info": frame_info,
        "total_frames": frame_offset[-1],
        "intrinsics": np.asarray(intrinsics, np.float32),
        "raw_size": np.asarray(raw_size),
        "apply_pca_fn": pca_fn(feature_px) if len(feature_px) else None,
    }

    # camera priors + centered meshes (`data_utils.py:305-335`)
    rt_bg, rt_fg = [], []
    for ds in datasets:
        if os.path.exists(ds.paths["cambg"]):
            rt_bg.append(np.load(ds.paths["cambg"]).astype(np.float32))
        if os.path.exists(ds.paths["camfg"]):
            rt_fg.append(np.load(ds.paths["camfg"]).astype(np.float32))
    if rt_fg:
        rtmat_fg = np.concatenate(rt_fg, 0)
        rtmat_bg = np.concatenate(rt_bg, 0) if rt_bg else rtmat_fg
        data_info["rtmat"] = np.stack([rtmat_bg, rtmat_fg], 0)
        cam_dir = os.path.dirname(datasets[0].paths["cambg"])
        data_info["geom_path"] = [
            os.path.join(cam_dir, "mesh-00-centered.obj"),
            os.path.join(cam_dir, "mesh-01-centered.obj"),
        ]
    return data_info


class PairBatcher:
    """Sample batches of frame pairs across videos.

    Each call returns a dict of (imgs_per_batch, 2, ...) numpy arrays, which
    `flatten_pairs` merges into (2*imgs, ...) as the model expects
    (`model.py:539-548` reshape_batch). Slices the sample space by host when
    running multi-process."""

    def __init__(self, datasets: List[VidDataset], imgs_per_batch: int,
                 seed: int = 0, num_hosts: int = None, host_id: int = None):
        from vidu4d_tpu.utils.host_map import host_slice

        self.datasets = datasets
        self.imgs_per_batch = imgs_per_batch
        self.index = []  # (vid, frame) pairs
        for vid, ds in enumerate(datasets):
            for t in range(len(ds)):
                self.index.append((vid, t))
        # per-host shard of the sample space (the DistributedSampler analog,
        # `data_utils.py:56-71`); defaults to jax.process_index/count so
        # multi-host runs shard automatically
        self.index = host_slice(
            self.index, process_index=host_id, process_count=num_hosts
        )
        self.host_id = host_id
        self.rng = np.random.default_rng(
            seed + (host_id if host_id is not None else _process_index())
        )

    def next_batch(self) -> Dict[str, np.ndarray]:
        picks = self.rng.integers(0, len(self.index), size=self.imgs_per_batch)
        items = []
        for p in picks:
            vid, t = self.index[p]
            items.append(self.datasets[vid][t])
        return {k: np.stack([it[k] for it in items]) for k in items[0]}


def flatten_pairs(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """(M, 2, ...) -> (2M, ...) (`model.py:539-548`)."""
    return {k: v.reshape((-1,) + v.shape[2:]) for k, v in batch.items()}


def compute_frameid(batch: Dict, frame_info: FrameInfo) -> Dict:
    """Add global raw frame ids (`model.py:94-110`)."""
    offset = np.asarray(frame_info.frame_offset_raw)
    batch = dict(batch)
    batch["frameid"] = batch["frameid_sub"] + offset[batch["dataid"]]
    return batch
