"""Binary PLY import/export for surfel checkpoints.

Byte-compatible with the canonical 3DGS schema the reference writes/reads
(`gs/scene/gaussian_model.py:189-268`): little-endian float32 vertex
properties x,y,z,nx,ny,nz,f_dc_*,f_rest_*,opacity,scale_*,rot_* with f_rest
flattened channel-major. Implemented directly on numpy (no plyfile dep).
"""

from __future__ import annotations

import io
import os
from typing import Optional, Tuple

import numpy as np

from vidu4d_tpu.models.gaussian.surfels import SurfelParams


def _attribute_names(n_rest: int, n_scale: int = 2) -> list:
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(3 * n_rest)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(n_scale)]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_ply(path: str, params: SurfelParams, alive: Optional[np.ndarray] = None):
    """Write alive surfels in the 3DGS ply layout (raw/log-space values)."""
    xyz = np.asarray(params.xyz, dtype=np.float32)
    if alive is not None:
        keep = np.asarray(alive)
    else:
        keep = np.ones(xyz.shape[0], dtype=bool)

    xyz = xyz[keep]
    n = xyz.shape[0]
    normals = np.zeros_like(xyz)
    # (N, K, 3) -> channel-major flatten (N, 3*K), matching torch
    # `transpose(1, 2).flatten(start_dim=1)`
    f_dc = np.asarray(params.features_dc, np.float32)[keep]
    f_dc = f_dc.transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(params.features_rest, np.float32)[keep]
    n_rest = f_rest.shape[1]
    f_rest = f_rest.transpose(0, 2, 1).reshape(n, -1)
    opac = np.asarray(params.opacity, np.float32)[keep].reshape(n, 1)
    scale = np.asarray(params.scaling, np.float32)[keep]
    rot = np.asarray(params.rotation, np.float32)[keep]

    attrs = np.concatenate([xyz, normals, f_dc, f_rest, opac, scale, rot], axis=1)
    names = _attribute_names(n_rest, n_scale=scale.shape[1])
    assert attrs.shape[1] == len(names)

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name in names]
    header += ["end_header"]

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(attrs.astype("<f4").tobytes())


def load_ply(path: str) -> Tuple[SurfelParams, int]:
    """Read a 3DGS-schema ply. Returns (params as numpy arrays, count)."""
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii").splitlines()
    n = None
    names = []
    for line in header:
        if line.startswith("element vertex"):
            n = int(line.split()[-1])
        elif line.startswith("property float"):
            names.append(line.split()[-1])
    if n is None:
        raise ValueError("not a vertex ply")
    rec = np.frombuffer(
        data[head_end:], dtype=np.dtype([(nm, "<f4") for nm in names]), count=n
    )

    def cols(prefix, count):
        return np.stack([rec[f"{prefix}_{i}"] for i in range(count)], axis=1)

    xyz = np.stack([rec["x"], rec["y"], rec["z"]], axis=1)
    f_dc = cols("f_dc", 3).reshape(n, 3, 1).transpose(0, 2, 1)  # (N, 1, 3)
    n_rest3 = sum(1 for nm in names if nm.startswith("f_rest_"))
    n_rest = n_rest3 // 3
    if n_rest:
        f_rest = cols("f_rest", n_rest3).reshape(n, 3, n_rest).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    n_scale = sum(1 for nm in names if nm.startswith("scale_"))
    scale = cols("scale", n_scale)
    rot = cols("rot", 4)
    opac = rec["opacity"].reshape(n, 1)

    params = SurfelParams(
        xyz=xyz.astype(np.float32),
        features_dc=np.ascontiguousarray(f_dc, np.float32),
        features_rest=np.ascontiguousarray(f_rest, np.float32),
        scaling=scale.astype(np.float32),
        rotation=rot.astype(np.float32),
        opacity=opac.astype(np.float32),
        regist_feat=np.zeros((n, 0), np.float32),
    )
    return params, n
