"""Image/video export helpers (replaces `lab4d/utils/io.py` save_vid/save_rendered)."""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img, np.float32), 0, 1) * 255).astype(np.uint8)


def save_vid(path_prefix: str, frames: List[np.ndarray], fps: int = 10):
    """Save frames as mp4 (gif fallback). frames: list of (H, W, 3) in [0, 1]."""
    import imageio

    frames8 = [to_uint8(f) for f in frames]
    os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
    try:
        imageio.mimsave(f"{path_prefix}.mp4", frames8, fps=fps)
        return f"{path_prefix}.mp4"
    except Exception:
        # pillow gif writer takes per-frame duration (ms), not fps
        imageio.mimsave(f"{path_prefix}.gif", frames8,
                        duration=int(1000 / max(fps, 1)))
        return f"{path_prefix}.gif"


def save_rendered(rendered: Dict[str, np.ndarray], save_dir: str, fps: int = 10):
    """Save each rendered output key as npy + video (`lab4d/utils/io.py:76+`)."""
    os.makedirs(save_dir, exist_ok=True)
    for key, value in rendered.items():
        value = np.asarray(value)
        np.save(os.path.join(save_dir, f"{key}.npy"), value)
        if value.ndim == 4 and value.shape[-1] in (1, 3):
            if value.shape[-1] == 1:
                v = value[..., 0]
                vmax = max(v.max(), 1e-6)
                frames = [np.stack([f / vmax] * 3, -1) for f in v]
            else:
                frames = list(value)
            save_vid(os.path.join(save_dir, key), frames, fps=fps)
