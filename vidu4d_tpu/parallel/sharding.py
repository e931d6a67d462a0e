"""Multi-chip parallelism: device mesh + sharded Stage-3 training step.

The reference's parallelism is DDP over NCCL (`lab4d/train.py:28-36`,
SURVEY.md §2.2). The TPU-native equivalent is a single-program jit over a
`jax.sharding.Mesh` with two axes:

  * ``data``   — frames (the batch/pair axis). Gradients are all-reduced by
                 XLA automatically (the psum that DDP does with NCCL).
  * ``surfel`` — the surfel dimension P for warp/skinning compute (the
                 analog of the reference's 8192-pixel chunking,
                 `model.py:432-498`): per-surfel DQ skinning is sharded, and
                 XLA inserts the all-gather before rasterization where each
                 frame needs every surfel.

Parameters stay replicated (they are MLPs of a few MB). The same step
function runs on 1 chip (trivial mesh) or a v5e-8 / multi-host slice; only
the mesh changes. Collectives ride ICI — there is no host-side communication
code at all.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.gaussian import surfels as sf
from vidu4d_tpu.models.gaussian.deformable import GaussianDeformer, render_surfels_batch
from vidu4d_tpu.models.gaussian.optimizer import (
    GsLearningRates,
    gs_adam_init,
    gs_adam_update,
)
from vidu4d_tpu.ops import geometry as geom
from vidu4d_tpu.ops.numerics import safe_norm
from vidu4d_tpu.ops.rasterize import RasterizeConfig


def make_mesh(n_devices: Optional[int] = None, data_axis: Optional[int] = None) -> Mesh:
    """2D (data, surfel) mesh over the first n devices.

    data axis gets min(n, 2) by default (frame pairs), the rest goes to the
    surfel axis — warp compute scales with P, which dwarfs the frame count.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if data_axis is None:
        data_axis = 2 if n % 2 == 0 else 1
    surfel_axis = n // data_axis
    assert data_axis * surfel_axis == n, (n, data_axis)
    return Mesh(devices.reshape(data_axis, surfel_axis), ("data", "surfel"))


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a (M, ...) pixel batch with M sharded over the data axis."""
    def put(x):
        spec = P("data") if x.ndim >= 1 and x.shape[0] % mesh.shape["data"] == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return {k: put(v) for k, v in batch.items()}


def make_synthetic_stage3_inputs(
    frame_info: FrameInfo,
    n_frames: int,
    n_surfels: int,
    res: int,
    capacity: Optional[int] = None,
    seed: int = 0,
):
    """Synthetic deformer params + surfels + pixel batch (for dryruns/bench)."""
    rng = np.random.default_rng(seed)
    capacity = capacity or n_surfels

    deformer = GaussianDeformer(frame_info=frame_info, fg_motion="bob")
    pts = rng.normal(size=(n_surfels, 3)).astype(np.float32) * 0.05
    cols = rng.uniform(size=(n_surfels, 3)).astype(np.float32)
    feats = rng.normal(size=(n_surfels, 16)).astype(np.float32)
    surfels = sf.init_from_points(
        jnp.asarray(pts), jnp.asarray(cols), capacity, sh_degree=3,
        regist_feat=jnp.asarray(feats / np.linalg.norm(feats, axis=-1, keepdims=True)),
    )

    m = n_frames
    hw = res * res
    x0, y0 = np.meshgrid(range(res), range(res))
    hxy = np.stack([x0, y0, np.ones_like(x0)], -1).reshape(1, -1, 3)
    # camera placing the cloud in front, in world units (x logscale=0.1
    # inside get_samples -> field-space translation z=0.4 > near plane)
    field2cam = np.tile(
        np.array([[1.0, 0, 0, 0, 0, 0, 4.0]], np.float32), (m, 1)
    )
    batch = {
        "rgb": rng.uniform(size=(m, hw, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(m, hw, 1)) > 0.5).astype(np.float32),
        "vis2d": np.ones((m, hw, 1), np.float32),
        "feature": rng.normal(size=(m, hw, 16)).astype(np.float32),
        "is_detected": np.ones((m,), np.float32),
        "crop2raw": np.tile([1.0, 1.0, 0.0, 0.0], (m, 1)).astype(np.float32),
        "dataid": np.zeros((m,), np.int32),
        "frameid": (np.arange(m) % frame_info.num_frames_raw).astype(np.int32),
        "frameid_sub": (np.arange(m) % frame_info.num_frames_raw).astype(np.int32),
        "hxy": np.tile(hxy, (m, 1, 1)).astype(np.float32),
        "field2cam": field2cam,
    }

    def init_fn(mdl):
        samples = mdl.get_samples({k: jnp.asarray(v) for k, v in batch.items()})
        xyz = surfels.params.xyz
        rot = sf.get_rotation(surfels.params)
        xyz_cam, _, _ = mdl.warp_surfels(xyz, rot, samples)
        mdl.cycle_loss(xyz_cam, xyz, samples)
        mdl.background()
        return xyz_cam

    params = deformer.init(jax.random.PRNGKey(seed), method=init_fn)
    # give the zero-init intrinsics a realistic focal/principal point so the
    # cloud covers a meaningful image area
    p = dict(params["params"])
    intr = dict(p["intrinsics"])
    intr["base_logfocal"] = jnp.log(jnp.full((frame_info.num_vids, 2), 1.2 * res))
    intr["base_ppoint"] = jnp.full((frame_info.num_vids, 2), res / 2.0)
    p["intrinsics"] = intr
    params = {**params, "params": p}
    return deformer, params, surfels, batch


def build_stage3_train_step(
    deformer: GaussianDeformer,
    res: int,
    raster_cfg: RasterizeConfig,
    mesh: Optional[Mesh] = None,
    sh_degree: int = 3,
    gs_lrs: GsLearningRates = GsLearningRates(),
):
    """Jitted Stage-3 training step (loss -> grads -> surfel Adam), optionally
    sharded over a (data, surfel) mesh.

    Returns step(params, surfels, gs_adam, batch) -> (surfels, gs_adam, metrics).
    """
    def constrain(x, spec):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def loss_fn(dparams, sparams, alive, batch):
        samples = deformer.apply(dparams, batch, method=deformer.get_samples)
        xyz = constrain(sparams.xyz, P("surfel"))
        rot = constrain(sf.get_rotation(sparams), P("surfel"))
        # warp compute sharded over surfels
        xyz_cam, rot_cam, _ = deformer.apply(
            dparams, xyz, rot, samples, method=deformer.warp_surfels
        )
        xyz_cam = constrain(xyz_cam, P("data", "surfel"))
        rot_cam = constrain(rot_cam, P("data", "surfel"))

        # rasterization: frames over data axis, surfels gathered
        xyz_cam_g = constrain(xyz_cam, P("data", None))
        rot_cam_g = constrain(rot_cam, P("data", None))
        intrins = geom.mat2K(geom.Kmatinv(samples["Kinv"]))
        bg = deformer.apply(dparams, method=deformer.background)
        out = render_surfels_batch(
            sparams, alive, xyz_cam_g, rot_cam_g, intrins,
            res, res, sh_degree, bg, raster_cfg,
        )
        m = xyz_cam.shape[0]
        img = lambda x: x.reshape((m, res, res, -1))
        rgb_l1 = jnp.mean(jnp.abs(out.color - img(batch["rgb"])) * img(batch["vis2d"]))
        mask_l = jnp.mean((out.alpha[..., None] - img(batch["mask"])) ** 2)

        cyc = deformer.apply(
            dparams, xyz_cam, xyz, samples, method=deformer.cycle_loss
        )
        cyc_l = jnp.mean(cyc["cyc_dist"])
        total = 0.1 * rgb_l1 + 0.1 * mask_l + 0.01 * cyc_l
        return total, {"rgb": rgb_l1, "mask": mask_l, "cyc": cyc_l}

    def step(dparams, surfels: sf.SurfelState, gs_adam, batch):
        (total, parts), sgrads = jax.value_and_grad(
            lambda sp: loss_fn(dparams, sp, surfels.alive, batch), has_aux=True
        )(surfels.params)
        new_params, gs_adam = gs_adam_update(sgrads, gs_adam, surfels.params, gs_lrs)
        surfels = surfels._replace(params=new_params)
        return surfels, gs_adam, {"total": total, **parts}

    if mesh is None:
        return jax.jit(step)
    with mesh:
        return jax.jit(step)


def make_synthetic_stage2_inputs(n_frames: int = 8, n_pixels: int = 12,
                                 m: int = 4, res: int = 32, seed: int = 0):
    """Tiny DvrModel + pixel-ray batch for multi-chip dryruns of Stage 2."""
    from vidu4d_tpu.engine.model import DvrModel
    from vidu4d_tpu.engine.schedules import progress_schedule
    from vidu4d_tpu.models.fields.dyn_nerf import FieldState

    rng = np.random.default_rng(seed)
    fi = FrameInfo.single_video(n_frames)
    intr = np.tile(np.array([[40.0, 40.0, res / 2, res / 2]], np.float32),
                   (n_frames, 1))
    rt = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    rt[:, 2, 3] = 3.0
    config = {
        "field_type": "fg", "fg_motion": "bob", "train_res": res,
        "mask_wt": 0.1, "rgb_wt": 0.1, "depth_wt": 1e-4, "flow_wt": 0.5,
        "vis_wt": 1e-2, "feature_wt": 1e-2, "feat_reproj_wt": 5e-2,
        "reg_visibility_wt": 1e-4, "reg_eikonal_wt": 1e-3,
        "reg_deform_cyc_wt": 0.01, "reg_delta_skin_wt": 5e-3,
        "reg_skin_entropy_wt": 5e-4, "reg_gauss_skin_wt": 1e-3,
        "reg_cam_prior_wt": 0.1, "reg_skel_prior_wt": 0.1,
        "reg_gauss_mask_wt": 0.01, "reg_soft_deform_wt": 100.0,
        "lambda_normal": 0.05, "lambda_dist": 0.0,
    }
    model = DvrModel(
        frame_info=fi, fg_motion="bob",
        intrinsics_prior=tuple(map(tuple, intr)),
        rtmat_prior=tuple(map(tuple, rt.reshape(n_frames, -1))),
        train_res=res, train_depth_samples=8, field_depth=2, field_width=32,
    )
    n = n_pixels
    batch = {
        "rgb": rng.uniform(size=(m, n, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(m, n, 1)) > 0.4).astype(np.float32),
        "depth": rng.uniform(1, 3, size=(m, n, 1)).astype(np.float32),
        "flow": rng.normal(size=(m, n, 2)).astype(np.float32),
        "flow_uct": rng.uniform(size=(m, n, 1)).astype(np.float32),
        "vis2d": np.ones((m, n, 1), np.float32),
        "crop2raw": np.tile([1.0, 1.0, 0.0, 0.0], (m, 1)).astype(np.float32),
        "dataid": np.zeros((m,), np.int32),
        "frameid_sub": (np.arange(m) % n_frames).astype(np.int32),
        "frameid": (np.arange(m) % n_frames).astype(np.int32),
        "is_detected": np.ones((m,), np.float32),
        "hxy": np.concatenate(
            [rng.uniform(0, res, (m, n, 2)), np.ones((m, n, 1))], axis=-1
        ).astype(np.float32),
        "feature": rng.normal(size=(m, n, 16)).astype(np.float32),
    }
    states = {"fg": FieldState.initial(fi.num_frames_raw)}
    weights = progress_schedule(config, 100)
    params = model.init(
        jax.random.PRNGKey(seed),
        {k: jnp.asarray(v) for k, v in batch.items()},
        states, config, weights, jax.random.PRNGKey(1), method=model.loss,
    )
    return model, params, states, batch, config, weights


def build_stage2_train_step(model, states, config, weights,
                            mesh: Optional[Mesh] = None, lr: float = 1e-3):
    """Jitted Stage-2 step (loss -> grads -> adam), optionally data-parallel.

    Pixel-ray batches shard their leading frame axis over ``data``
    (the DDP axis, `train.py:28-36`); parameters stay replicated and XLA
    all-reduces the gradients — the explicit NCCL of the reference becomes
    an inserted psum.
    """
    import optax

    opt = optax.adam(lr)

    def constrain(x):
        if mesh is None or x.ndim < 1 or x.shape[0] % mesh.shape["data"]:
            return x
        spec = P(*(("data",) + (None,) * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def step(params, opt_state, batch, rng):
        batch = {k: constrain(jnp.asarray(v)) for k, v in batch.items()}

        def loss_fn(p):
            loss_dict, _ = model.apply(
                p, batch, states, config, weights, rng, method=model.loss
            )
            return sum(jax.tree.leaves(loss_dict)), loss_dict

        (total, loss_dict), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, loss_dict

    init = lambda params: opt.init(params)
    if mesh is None:
        return jax.jit(step), init
    with mesh:
        return jax.jit(step), init
