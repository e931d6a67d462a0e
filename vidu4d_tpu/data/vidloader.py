"""Video dataset: mmap'd npy frame data + pair sampling.

Numpy re-implementation of `lab4d/dataloader/vidloader.py` reading the exact
Stage-1 on-disk contract:

    database/processed/{JPEGImages,Annotations,FlowFW_d,FlowBW_d,Depth,
                        Features,Cameras}/Full-Resolution/<seqname>/
        {crop,full}-256.npy            (T,H,W,3) rgb, fp16, 0..1
        Annotations/.../{prefix}.npy   (T,H,W,2) [mask, vis2d]
        .../{prefix}-crop2raw.npy      (T,4)
        .../{prefix}-is_detected.npy   (T,)
        FlowFW_d/.../{prefix}.npy      (T//d,H,W,3) [flow_xy, uncertainty]
        Depth/.../{prefix}.npy         (T,H,W) fp16
        Features/.../{prefix}-{feature_type}-01.npy  (T,112,112,16)
        Cameras/.../00.npy, 01-canonical.npy         (T,4,4)

Pairs (frame t, t+delta) with delta sampled from {1} + {2,4,8} gated by
divisibility (`vidloader.py:179-195`); pixel sampling without replacement via
a permutation queue (`RangeSampler`).
"""

from __future__ import annotations

import configparser
import glob
import os
from typing import Dict, List, Optional

import numpy as np


def bilinear_interp(feat: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """Bilinear sample feat (H, W, C) at float pixel coords xy (N, 2)."""
    h, w = feat.shape[:2]
    x = np.clip(xy[:, 0], 0, w - 1.000001)
    y = np.clip(xy[:, 1], 0, h - 1.000001)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    out = (
        feat[y0, x0] * (1 - wx) * (1 - wy)
        + feat[y0, x1] * wx * (1 - wy)
        + feat[y1, x0] * (1 - wx) * wy
        + feat[y1, x1] * wx * wy
    )
    return out


class RangeSampler:
    """Sample without replacement from [0, num_elems) (`vidloader.py:15-45`)."""

    def __init__(self, num_elems: int, rng: Optional[np.random.Generator] = None):
        self.num_elems = num_elems
        self.rng = rng or np.random.default_rng()
        self._queue = self.rng.permutation(num_elems)
        self._idx = 0

    def sample(self, num_samples: int) -> np.ndarray:
        if self._idx + num_samples > self.num_elems:
            self._queue = self.rng.permutation(self.num_elems)
            self._idx = 0
        out = self._queue[self._idx : self._idx + num_samples]
        self._idx += num_samples
        return out


class VidDataset:
    """Frame data and annotations for one video."""

    def __init__(
        self,
        rgb_path: str,
        dataid: int,
        ks: List[float],
        raw_size: List[int],
        data_prefix: str = "crop-256",
        feature_type: str = "dinov2",
        delta_list=(2, 4, 8),
        pixels_per_image: int = 16,
        load_pair: bool = True,
        rng: Optional[np.random.Generator] = None,
    ):
        self.dataid = dataid
        self.ks = ks
        self.raw_size = raw_size
        self.delta_list = list(delta_list)
        self.pixels_per_image = pixels_per_image
        self.load_pair = load_pair
        self.rng = rng or np.random.default_rng()

        base = os.path.join(rgb_path, f"{data_prefix}.npy")
        mask_path = base.replace("JPEGImages", "Annotations")
        self.paths = {
            "rgb": base,
            "mask": mask_path,
            "depth": base.replace("JPEGImages", "Depth"),
            "feature": os.path.join(
                os.path.dirname(base.replace("JPEGImages", "Features")),
                f"{data_prefix}-{feature_type}-01.npy",
            ),
            "crop2raw": mask_path.replace(".npy", "-crop2raw.npy"),
            "is_detected": mask_path.replace(".npy", "-is_detected.npy"),
            "cambg": os.path.join(base.replace("JPEGImages", "Cameras").rsplit("/", 1)[0], "00.npy"),
            "camfg": os.path.join(base.replace("JPEGImages", "Cameras").rsplit("/", 1)[0], "01-canonical.npy"),
        }

        self.mmap: Dict[str, np.ndarray] = {}
        self.mmap["rgb"] = np.load(self.paths["rgb"], mmap_mode="r")
        self.num_frames = self.mmap["rgb"].shape[0]
        self.img_size = self.mmap["rgb"].shape[1:3]
        self.mmap["mask"] = np.load(self.paths["mask"], mmap_mode="r")
        self.mmap["depth"] = np.load(self.paths["depth"], mmap_mode="r")
        if os.path.exists(self.paths["feature"]):
            self.mmap["feature"] = np.load(self.paths["feature"], mmap_mode="r")
        else:
            self.mmap["feature"] = np.zeros(
                (self.num_frames, 112, 112, 16), np.float16
            )
        self.crop2raw = np.load(self.paths["crop2raw"]).astype(np.float32)
        self.is_detected = np.load(self.paths["is_detected"]).astype(np.float32)

        self.flow = {"fw": {}, "bw": {}}
        for delta in [1] + self.delta_list:
            for dname, key in (("FlowFW", "fw"), ("FlowBW", "bw")):
                p = base.replace("JPEGImages", f"{dname}_{delta}")
                if os.path.exists(p):
                    self.flow[key][delta] = np.load(p, mmap_mode="r")

        self.idx_sampler = RangeSampler(
            self.img_size[0] * self.img_size[1], rng=self.rng
        )

    def __len__(self):
        return self.num_frames - 1

    def sample_delta(self, index: int) -> int:
        """(`vidloader.py:179-195`)."""
        deltas = [1] + [
            d
            for d in self.delta_list
            if (index % d == 0) and (index + d) < self.num_frames and d in self.flow["fw"]
        ]
        return int(self.rng.choice(deltas))

    def sample_xy(self) -> Optional[np.ndarray]:
        if self.pixels_per_image == -1:
            return None
        idx = self.idx_sampler.sample(self.pixels_per_image)
        y0 = idx % self.img_size[0]
        x0 = idx // self.img_size[0]
        return np.stack([x0, y0], axis=-1)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        delta = self.sample_delta(index)
        d0 = self.read_raw(index, delta, self.sample_xy())
        if not self.load_pair:
            return d0
        d1 = self.read_raw(index + delta, -delta, self.sample_xy())
        return {k: np.stack([d0[k], d1[k]]) for k in d0}

    def read_raw(self, idx: int, delta: int, rand_xy=None) -> Dict[str, np.ndarray]:
        flow = self._read_flow(idx, delta)
        feat = self.mmap["feature"][idx]

        if rand_xy is not None:
            native_out = self._read_raw_native(idx, flow, feat, rand_xy)
            if native_out is not None:
                return native_out

        rgb = np.asarray(self.mmap["rgb"][idx], np.float32)
        mask_all = np.asarray(self.mmap["mask"][idx], np.float32)
        depth = np.asarray(self.mmap["depth"][idx], np.float32)

        if rand_xy is None:
            x0, y0 = np.meshgrid(range(self.img_size[1]), range(self.img_size[0]))
            hxy = np.stack([x0, y0, np.ones_like(x0)], -1).reshape(-1, 3)
            sel = lambda a: a.reshape((-1,) + a.shape[2:])
            feat_sel = bilinear_interp(
                np.asarray(feat, np.float32),
                hxy[:, :2] / self.img_size[0] * feat.shape[0],
            )
        else:
            hxy = np.concatenate([rand_xy, np.ones_like(rand_xy[:, :1])], -1)
            sel = lambda a: a[rand_xy[:, 1], rand_xy[:, 0]]
            feat_sel = bilinear_interp(
                np.asarray(feat, np.float32),
                rand_xy / self.img_size[0] * feat.shape[0],
            )

        if rgb.ndim == 2:
            rgb = np.repeat(rgb[..., None], 3, -1)
        mask = mask_all[..., :1]
        vis2d = mask_all[..., 1:2]
        return {
            "rgb": sel(rgb).astype(np.float32),
            "mask": sel(mask).astype(np.float32),
            "vis2d": sel(vis2d).astype(np.float32),
            "depth": sel(depth[..., None]).astype(np.float32),
            "flow": sel(flow[..., :2]).astype(np.float32),
            "flow_uct": sel(flow[..., 2:3]).astype(np.float32),
            "feature": feat_sel.astype(np.float32),
            "crop2raw": self.crop2raw[idx],
            "is_detected": np.float32(self.is_detected[idx]),
            "dataid": np.int32(self.dataid),
            "frameid_sub": np.int32(idx),
            "hxy": hxy.astype(np.float32),
        }

    def _read_raw_native(self, idx, flow, feat, rand_xy):
        """Pixel-sampled read via the native threaded gather
        (csrc/batch_sampler.cpp). Gathers straight from the f16 mmaps so
        only the touched pages are read and no full-frame f16->f32 convert
        happens. Measured by `scripts/bench_sampler.py --T 64 --res 256`
        (r3, build host): 1.84 ms vs 7.90 ms median per 16-px image-pair
        read — 4.3x. (Full-image reads bypass this path entirely.)
        Returns None when the native library is unavailable (numpy path
        runs instead); disable with VIDU4D_NATIVE_SAMPLER=0."""
        import os as _os

        if _os.environ.get("VIDU4D_NATIVE_SAMPLER", "1") == "0":
            return None
        from vidu4d_tpu.data import native

        if native.load_library() is None:
            return None

        zero = np.zeros(1, np.int32)
        xyb = np.ascontiguousarray(rand_xy, np.int32)[None]

        def g(a):
            if a.ndim == 2:
                a = a[..., None]
            if not a.flags.c_contiguous or a.dtype not in (
                np.float16, np.float32
            ):
                a = np.ascontiguousarray(a, np.float32)
            return native.gather_pixels(a[None], zero, xyb)[0]

        rgb = g(self.mmap["rgb"][idx])
        if rgb.shape[-1] == 1:
            rgb = np.repeat(rgb, 3, -1)
        mask_all = g(self.mmap["mask"][idx])
        depth = g(self.mmap["depth"][idx])
        flow_s = g(flow)
        hxy = np.concatenate([rand_xy, np.ones_like(rand_xy[:, :1])], -1)
        feat_sel = bilinear_interp(
            np.asarray(feat, np.float32),
            rand_xy / self.img_size[0] * feat.shape[0],
        )
        return {
            "rgb": rgb,
            "mask": mask_all[..., 0:1],
            "vis2d": mask_all[..., 1:2],
            "depth": depth,
            "flow": flow_s[..., :2],
            "flow_uct": flow_s[..., 2:3],
            "feature": feat_sel.astype(np.float32),
            "crop2raw": self.crop2raw[idx],
            "is_detected": np.float32(self.is_detected[idx]),
            "dataid": np.int32(self.dataid),
            "frameid_sub": np.int32(idx),
            "hxy": hxy.astype(np.float32),
        }

    def _read_flow(self, idx: int, delta: int) -> np.ndarray:
        is_fw = delta > 0
        d = abs(delta)
        table = self.flow["fw" if is_fw else "bw"]
        if d not in table:
            return np.zeros(self.img_size + (3,), np.float32)
        if is_fw:
            return np.asarray(table[d][idx // d], np.float32)
        return np.asarray(table[d][idx // d - 1], np.float32)


def load_sequence_config(config_path: str):
    """Parse the database/configs/<seq>.config ini (`write_config.py:11-45`)."""
    config = configparser.RawConfigParser()
    config.read(config_path)
    data_section = dict(config["data"]) if "data" in config else {}
    vids = []
    for name in config.sections():
        if not name.startswith("data_"):
            continue
        sec = dict(config[name])
        sec = {**data_section, **sec}
        vids.append(
            {
                "img_path": sec["img_path"],
                "ks": [float(x) for x in sec["ks"].split(" ")],
                "shape": [int(x) for x in sec["shape"].split(" ")],
            }
        )
    return vids
