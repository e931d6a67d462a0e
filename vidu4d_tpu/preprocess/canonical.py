"""Canonical (object-frame) camera registration.

Replaces `preprocess/scripts/canonical_registration.py` +
`preprocess/libs/torch_models.py:14-91`: a pose-graph optimization over a
CameraMLP with a unary term (match annotated canonical rotations at key
frames) and a pairwise term (relative rotations match the chained
view-1 Procrustes cameras), run as a jitted Adam loop. The viewpoint
network (CSE/DensePose, detectron2 CUDA) applies only to human/quad
classes; the published Vidu4D recipe uses manual/`other` cameras
(SURVEY.md §2.1), which this covers. Translation is re-initialized from
the object bbox depth heuristic (`canonical_registration.py:133-152`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.time_mlp import CameraMLP, init_camera_base_params
from vidu4d_tpu.ops.geometry import rot_angle
from vidu4d_tpu.ops.quaternion import quaternion_translation_to_se3


def canonical_registration(
    cams_canonical: Dict[int, np.ndarray],  # frame -> (4, 4) annotated cams
    cams_view1: np.ndarray,  # (T, 4, 4) chained Procrustes cameras
    num_iter: int = 2000,
    lr: float = 5e-4,
) -> np.ndarray:
    """Returns (T, 4, 4) canonical object-to-camera transforms
    (`01-canonical.npy` contract)."""
    t = len(cams_view1)
    annotated_idx = np.asarray(sorted(cams_canonical.keys()), np.int32)
    cams_anno = np.tile(np.eye(4, dtype=np.float32), (t, 1, 1))
    for k, v in cams_canonical.items():
        cams_anno[k] = v

    rel_gt = cams_view1[1:, :3, :3] @ np.transpose(cams_view1[:-1, :3, :3], (0, 2, 1))
    rel_gt = jnp.asarray(rel_gt)
    anno = jnp.asarray(cams_anno)
    anno_idx = jnp.asarray(annotated_idx)

    frame_info = FrameInfo.single_video(t)
    model = CameraMLP(frame_info=frame_info, width=128, depth=3)
    params = model.init(jax.random.PRNGKey(0), jnp.arange(t))
    params = init_camera_base_params(params, cams_anno, frame_info)

    def loss_fn(params, unary_wt, pairwise_wt):
        # f32 rotation products: TPU bf16 matmul noise (~0.4%/entry) is the
        # same order as the small relative-rotation residuals being optimized
        mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        quat, trans = model.apply(params, jnp.arange(t))
        pred = quaternion_translation_to_se3(quat, trans)
        loss_unary = rot_angle(
            mm(pred[anno_idx, :3, :3], jnp.swapaxes(anno[anno_idx, :3, :3], -1, -2))
        ).mean()
        rel = mm(pred[1:, :3, :3], jnp.swapaxes(pred[:-1, :3, :3], -1, -2))
        loss_pair = rot_angle(mm(rel, jnp.swapaxes(rel_gt, -1, -2))).mean()
        return unary_wt * loss_unary + pairwise_wt * loss_pair

    opt = optax.adam(lr)

    @jax.jit
    def run(params, unary_wt):
        opt_state = opt.init(params)

        def body(i, carry):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, unary_wt, 1.0)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, num_iter, body, (params, opt.init(params)))
        return params, loss_fn(params, unary_wt, 1.0)

    # phase 1: pairwise only (`torch_models.py:57-69` init_pairwise)
    params, _ = run(params, 0.0)
    # phase 2: unary + pairwise (`torch_models.py:71-89` optimize)
    params, final = run(params, 1.0)

    quat, trans = model.apply(params, jnp.arange(t))
    cams = np.asarray(quaternion_translation_to_se3(quat, trans))
    return cams, float(final)


def translation_from_bbox(depth_med: float, bbox_wh: np.ndarray,
                          focal: float, obj_size: float = 0.5) -> np.ndarray:
    """Bbox-depth translation heuristic (`canonical_registration.py:133-152`):
    z ~ focal * obj_size / bbox_extent."""
    extent = max(float(bbox_wh.max()), 1.0)
    z = focal * obj_size / extent
    return np.array([0.0, 0.0, z], np.float32)
