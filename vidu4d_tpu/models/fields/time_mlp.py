"""Time-conditioned MLPs: camera pose, intrinsics, appearance code.

Re-design of `lab4d/nnutils/time.py`, `pose.py:29-150`, `intrinsics.py`,
`appearance.py` with composition instead of inheritance (linen-idiomatic).
The reference's `mlp_init` "optimize until loss < 1e-4" prior-fitting loops
become a single jitted `lax.while_loop` (`fit_to_prior`), so initialization
runs entirely on device.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidu4d_tpu.ops.numerics import safe_norm, safe_normalize

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.embeddings import TimeEmbedding, adjusted_num_freq_t
from vidu4d_tpu.models.fields.mlp import BaseMLP
from vidu4d_tpu.ops.quaternion import (
    matrix_to_quaternion,
    quaternion_mul,
    quaternion_translation_to_se3,
)


class TimeMLPTrunk(nn.Module):
    """TimeEmbedding -> MLP(W -> W) trunk shared by time-conditioned heads
    (`time.py:11-75`)."""

    frame_info: FrameInfo
    depth: int = 5
    width: int = 256
    num_freq_t: int = 6
    time_scale: float = 1.0

    def setup(self):
        nft = adjusted_num_freq_t(self.frame_info, self.num_freq_t)
        self.time_embedding = TimeEmbedding(
            num_freq_t=nft,
            frame_info=self.frame_info,
            out_channels=self.width,
            time_scale=self.time_scale,
        )
        self.trunk = BaseMLP(
            depth=self.depth, width=self.width, out_channels=self.width,
            skips=(), final_act=True,
        )
        self._raw_fid_to_vid = jnp.asarray(self.frame_info.raw_fid_to_vid())

    def vid_of(self, frame_id):
        return self._raw_fid_to_vid[frame_id.astype(jnp.int32)]

    def __call__(self, frame_id=None):
        return self.trunk(self.time_embedding(frame_id))

    def mean_feat(self):
        return self.trunk(self.time_embedding.mean_embedding())


class Head(nn.Module):
    """Two-layer head: W -> W//2 -> out (`pose.py:70-80`)."""

    out_channels: int
    hidden: int = 128

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_channels)(nn.relu(nn.Dense(self.hidden)(x)))


class CameraMLP(nn.Module):
    """Object-to-camera SE(3) over time: per-video base quaternion composed
    with MLP quat/trans heads (`pose.py:29-150`)."""

    frame_info: FrameInfo
    depth: int = 5
    width: int = 256
    num_freq_t: int = 6

    def setup(self):
        self.time_mlp = TimeMLPTrunk(
            frame_info=self.frame_info, depth=self.depth, width=self.width,
            num_freq_t=self.num_freq_t,
        )
        self.trans_head = Head(3, hidden=self.width // 2)
        self.quat_head = Head(4, hidden=self.width // 2)
        self.base_quat = self.param(
            "base_quat", nn.initializers.zeros, (self.frame_info.num_vids, 4)
        )

    def __call__(self, frame_id=None):
        """Returns (quat (..., 4), trans (..., 3)) field-to-camera."""
        if frame_id is None:
            frame_id = jnp.asarray(self.frame_info.frame_mapping)
        feat = self.time_mlp(frame_id)
        trans = self.trans_head(feat)
        quat = self.quat_head(feat)
        quat = safe_normalize(quat)

        bq = self.base_quat[self.time_mlp.vid_of(frame_id)]
        bq_norm = safe_norm(bq, axis=-1, keepdims=True)
        # zero-init base quats act as identity until base_init overwrites them
        bq = jnp.where(
            bq_norm > 1e-6,
            bq / bq_norm,
            jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], dtype=bq.dtype), bq.shape),
        )
        return quaternion_mul(quat, bq), trans


class IntrinsicsMLP(nn.Module):
    """Time-varying intrinsics: per-video base log-focal/ppoint modulated by an
    MLP focal factor; square pixels forced (`intrinsics.py:9-107`)."""

    frame_info: FrameInfo
    depth: int = 5
    width: int = 256
    num_freq_t: int = 0
    time_scale: float = 0.1

    def setup(self):
        self.time_mlp = TimeMLPTrunk(
            frame_info=self.frame_info, depth=self.depth, width=self.width,
            num_freq_t=self.num_freq_t, time_scale=self.time_scale,
        )
        self.focal_head = Head(2, hidden=self.width // 2)
        self.base_logfocal = self.param(
            "base_logfocal", nn.initializers.zeros, (self.frame_info.num_vids, 2)
        )
        self.base_ppoint = self.param(
            "base_ppoint", nn.initializers.zeros, (self.frame_info.num_vids, 2)
        )

    def __call__(self, frame_id=None):
        """Returns (..., 4) intrinsics (fx, fy, cx, cy)."""
        if frame_id is None:
            frame_id = jnp.asarray(self.frame_info.frame_mapping)
        feat = self.time_mlp(frame_id)
        vid = self.time_mlp.vid_of(frame_id)
        focal = jnp.exp(self.focal_head(feat)) * jnp.exp(self.base_logfocal[vid])
        focal = (focal + focal[..., ::-1]) / 2.0  # square pixels
        return jnp.concatenate([focal, self.base_ppoint[vid]], axis=-1)


class AppearanceEmbedding(nn.Module):
    """Global appearance code over time (`appearance.py`)."""

    frame_info: FrameInfo
    appr_channels: int = 32
    depth: int = 2
    width: int = 64
    num_freq_t: int = 6
    time_scale: float = 0.1

    def setup(self):
        self.time_mlp = TimeMLPTrunk(
            frame_info=self.frame_info, depth=self.depth, width=self.width,
            num_freq_t=self.num_freq_t, time_scale=self.time_scale,
        )
        self.output = nn.Dense(self.appr_channels)

    def __call__(self, frame_id=None):
        return self.output(self.time_mlp(frame_id))


# ---------------------------------------------------------------------------
# prior fitting ("mlp_init")
# ---------------------------------------------------------------------------


def camera_prior_loss(module: CameraMLP, params, rtmat_gt: jax.Array) -> jax.Array:
    """MSE between predicted SE(3) (as 4x4) and priors (`pose.py:88-93`)."""
    quat, trans = module.apply(params, None)
    pred = quaternion_translation_to_se3(quat, trans)
    return jnp.mean((pred - rtmat_gt) ** 2)


def intrinsics_prior_loss(module: IntrinsicsMLP, params, intrinsics_gt) -> jax.Array:
    pred = module.apply(params, None)
    return jnp.mean((pred - intrinsics_gt) ** 2)


def init_camera_base_params(params, rtmat: np.ndarray, frame_info: FrameInfo):
    """Set per-video base quaternions from the first frame of each video
    (`pose.py:96-102` base_init)."""
    first = np.asarray(frame_info.frame_offset[:-1])
    base_rmat = jnp.asarray(rtmat)[first, :3, :3]
    base_quat = matrix_to_quaternion(base_rmat)
    p = dict(params["params"])
    p["base_quat"] = base_quat
    return {**params, "params": p}


def init_intrinsics_base_params(params, intrinsics: np.ndarray, frame_info: FrameInfo):
    """Set per-video base focal/ppoint from priors (`intrinsics.py:70-75`)."""
    first = np.asarray(frame_info.frame_offset[:-1])
    k = jnp.asarray(intrinsics)[first]
    p = dict(params["params"])
    p["base_logfocal"] = jnp.log(k[:, :2])
    p["base_ppoint"] = k[:, 2:]
    return {**params, "params": p}


def fit_to_prior(
    loss_fn: Callable,
    params,
    lr: float = 1e-3,
    termination_loss: float = 1e-4,
    max_steps: int = 5000,
):
    """Fit module params to priors: Adam until loss < threshold
    (`time.py:76-96` mlp_init), as one jitted lax.while_loop.

    Returns (params, final_loss, steps).
    """
    opt = optax.adam(lr)

    @jax.jit
    def run(params):
        opt_state = opt.init(params)

        def cond(carry):
            _, _, loss, i = carry
            return (loss > termination_loss) & (i < max_steps)

        def body(carry):
            params, opt_state, _, i = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, i + 1

        init = (params, opt_state, jnp.asarray(jnp.inf), jnp.asarray(0))
        params, _, loss, steps = jax.lax.while_loop(cond, body, init)
        return params, loss, steps

    return run(params)
