"""Camera trajectory generation for novel-view rendering.

Numpy re-implementation of `lab4d/utils/camera_utils.py` (rotating /
fixed / bird's-eye / orbit trajectories and render-batch construction).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from vidu4d_tpu.ops.geometry import hxy_grid
import jax.numpy as jnp


def _rodrigues(axis_angle: np.ndarray) -> np.ndarray:
    theta = np.linalg.norm(axis_angle)
    if theta < 1e-12:
        return np.eye(3)
    k = axis_angle / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def get_object_to_camera_matrix(theta_deg: float, axis, distance: float) -> np.ndarray:
    """(4, 4) object-to-camera rotating the object around `axis`
    (`camera_utils.py:50-70`)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    rt = np.eye(4)
    rt[:3, :3] = _rodrigues(axis * theta_deg / 180.0 * np.pi)
    rt[:3, 3] = [0, 0, distance]
    return rt


def get_rotating_cam(num_cameras, axis=(0, 1, 0), distance=3.0,
                     initial_angle=0.0, max_angle=360.0) -> np.ndarray:
    angles = np.linspace(initial_angle, max_angle, num_cameras)
    return np.stack(
        [get_object_to_camera_matrix(a, axis, distance) for a in angles]
    )


def get_fixed_cam(num_cameras, axis=(0, 1, 0), distance=3.0, angle=0.0):
    rshift, lshift = np.eye(4)[None], np.eye(4)[None]
    lshift[0, :3, 3] = [0, 0, distance]
    rshift[0, :3, 3] = [0, 0, -distance]
    ext = get_rotating_cam(num_cameras, axis, 0.0, angle, angle)
    return lshift @ ext @ rshift


def get_bev_cam(field2cam: np.ndarray, elev: float = 90.0) -> np.ndarray:
    ave_depth = field2cam[:, 2, 3].mean()
    center2cam = get_object_to_camera_matrix(0, [1, 0, 0], ave_depth)[None]
    center2bev = get_object_to_camera_matrix(elev, [1, 0, 0], 2 * ave_depth)[None]
    return center2bev @ np.linalg.inv(center2cam) @ field2cam


def get_orbit_camera(num_cameras, max_angle=5.0, cycles=2):
    max_angle = max_angle / 180 * np.pi
    out = np.tile(np.eye(4), (num_cameras, 1, 1))
    for i in range(num_cameras):
        aa = np.array([
            max_angle * np.cos(cycles * 2 * np.pi * i / num_cameras),
            max_angle * np.sin(cycles * 2 * np.pi * i / num_cameras),
            0.0,
        ])
        out[i, :3, :3] = _rodrigues(aa)
    return out


def construct_batch(
    inst_id: int,
    frameid_sub: np.ndarray,
    eval_res: int,
    field2cam: Optional[np.ndarray],
    camera_int: Optional[np.ndarray],
    crop2raw: Optional[np.ndarray],
) -> Dict:
    """Render batch (`camera_utils.py:148-192`): hxy grid + optional
    field2cam (as quaternion+translation (N, 7)) and Kinv overrides."""
    from vidu4d_tpu.ops.geometry import K2inv
    from vidu4d_tpu.ops.quaternion import se3_to_quaternion_translation

    n = len(frameid_sub)
    batch = {
        "frameid_sub": jnp.asarray(frameid_sub, jnp.int32),
        "dataid": jnp.full((n,), inst_id, jnp.int32),
        "hxy": jnp.broadcast_to(
            hxy_grid(eval_res, eval_res)[None], (n, eval_res * eval_res, 3)
        ),
    }
    if crop2raw is not None:
        batch["crop2raw"] = jnp.asarray(crop2raw, jnp.float32)
    else:
        batch["crop2raw"] = jnp.tile(
            jnp.asarray([[1.0, 1.0, 0.0, 0.0]], jnp.float32), (n, 1)
        )
    if field2cam is not None:
        q, t = se3_to_quaternion_translation(jnp.asarray(field2cam, jnp.float32))
        batch["field2cam"] = jnp.concatenate([q, t], axis=-1)
    if camera_int is not None:
        batch["Kinv"] = K2inv(jnp.asarray(camera_int, jnp.float32))
    return batch
