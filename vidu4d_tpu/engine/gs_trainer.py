"""Static-scene 2DGS trainer — the TPU equivalent of `gs/train.py`.

One jitted train step (render → (1-λ)·L1 + λ·DSSIM → per-field Adam →
densification-stat accumulation) over the fixed-capacity surfel store, plus a
host-side loop that fires densify/prune/opacity-reset at the reference
cadence (`gs/train.py:31-132`). Densify itself is jitted and in-place
(static shapes), so the whole run is two XLA programs.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.models.gaussian import densify as densify_mod
from vidu4d_tpu.models.gaussian import surfels as sf
from vidu4d_tpu.models.gaussian.optimizer import (
    GsAdamState,
    GsLearningRates,
    gs_adam_init,
    gs_adam_update,
)
from vidu4d_tpu.ops.image_losses import dssim_l1_loss, psnr
from vidu4d_tpu.ops.rasterize import RasterizeConfig, rasterize
from vidu4d_tpu.ops.rasterize.common import compute_tile_rects, project_splats


class Camera(NamedTuple):
    viewmat: jax.Array  # (4, 4) world-to-camera
    intrins: jax.Array  # (4,) fx, fy, cx, cy
    image: jax.Array  # (H, W, 3) ground truth in [0, 1]


class GsTrainConfig(NamedTuple):
    """Reference defaults: `gs/arguments/__init__.py` OptimizationParams."""

    iterations: int = 30_000
    lambda_dssim: float = 0.2
    sh_degree: int = 3
    sh_increase_interval: int = 1000
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    percent_dense: float = 0.01
    size_threshold: float = 20.0
    white_background: bool = False
    raster: RasterizeConfig = RasterizeConfig()
    lrs: GsLearningRates = GsLearningRates()


def _bg_color(config: GsTrainConfig) -> jax.Array:
    v = 1.0 if config.white_background else 0.0
    return jnp.full((3,), v, dtype=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "active_sh_degree", "config"),
)
def train_step(
    state: sf.SurfelState,
    adam: GsAdamState,
    viewmat: jax.Array,
    intrins: jax.Array,
    gt_image: jax.Array,
    height: int,
    width: int,
    active_sh_degree: int,
    config: GsTrainConfig,
):
    """One optimization step. Returns (state, adam, metrics dict)."""
    alive = state.alive
    bg = _bg_color(config)

    def loss_fn(params: sf.SurfelParams, dummy: jax.Array):
        out = rasterize(
            params.xyz,
            sf.get_rotation(params),
            sf.get_scaling(params),
            sf.get_opacity(params)[:, 0],
            viewmat,
            intrins,
            height,
            width,
            shs=sf.get_features(params),
            sh_degree=active_sh_degree,
            bg_color=bg,
            mask=alive,
            densify_dummy=dummy,
            config=config.raster,
        )
        loss = dssim_l1_loss(
            jnp.transpose(out.color, (2, 0, 1)),
            jnp.transpose(gt_image, (2, 0, 1)),
            config.lambda_dssim,
        )
        return loss, out

    dummy = jnp.zeros((state.capacity, 2), dtype=state.params.xyz.dtype)
    (loss, out), (grads, dummy_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, dummy)

    new_params, new_adam = gs_adam_update(grads, adam, state.params, config.lrs)

    # densification stats: reference's NDC-scaled mean2D gradient
    # (backward.cu:647-649): dL/dT[u,z]·z·W, dL/dT[v,z]·z·H
    proj = project_splats(
        state.params.xyz,
        sf.get_rotation(state.params),
        sf.get_scaling(state.params),
        viewmat,
        intrins,
        mask=alive,
    )
    rects = compute_tile_rects(
        proj, height, width, config.raster.tile, config.raster.span_cap
    )
    vs_grad = dummy_grad * (proj.depth[:, None]) * jnp.array(
        [[width, height]], dtype=dummy_grad.dtype
    )
    new_state = sf.add_densification_stats(
        state._replace(params=new_params), vs_grad, rects.valid, proj.radius
    )

    metrics = {
        "loss": loss,
        "psnr": psnr(out.color, gt_image),
        "alive": state.num_alive(),
    }
    return new_state, new_adam, metrics


@functools.partial(jax.jit, static_argnames=("max_screen_size", "config"))
def densify_step(
    state: sf.SurfelState,
    adam: GsAdamState,
    key: jax.Array,
    extent: float,
    max_screen_size: float,
    config: GsTrainConfig,
):
    dcfg = densify_mod.DensifyConfig(
        grad_threshold=config.densify_grad_threshold,
        min_opacity=config.min_opacity,
        percent_dense=config.percent_dense,
    )
    return densify_mod.densify_and_prune(
        state, adam, key, extent, max_screen_size=max_screen_size, config=dcfg
    )


def render_viewer_frame(state: sf.SurfelState, cam, active_sh: int,
                        config: GsTrainConfig) -> np.ndarray:
    """Render one live-viewer request (`gs/train.py:58-60`).

    ``cam`` is a `utils.network_gui.ViewerCamera`; scaling_modifier scales
    the surfel extents like the reference's rasterizer settings knob.
    """
    params = state.params
    if cam.scaling_modifier != 1.0:
        params = params._replace(
            scaling=params.scaling + jnp.log(jnp.float32(cam.scaling_modifier))
        )
    out = rasterize(
        params.xyz, sf.get_rotation(params), sf.get_scaling(params),
        sf.get_opacity(params)[:, 0],
        jnp.asarray(cam.viewmat), jnp.asarray(cam.intrins),
        cam.height, cam.width,
        shs=sf.get_features(params), sh_degree=active_sh,
        bg_color=_bg_color(config), mask=state.alive, config=config.raster,
    )
    return np.asarray(out.color)


def train(
    state: sf.SurfelState,
    cameras: Sequence[Camera],
    config: GsTrainConfig,
    scene_extent: float,
    key: Optional[jax.Array] = None,
    log_every: int = 0,
    viewer=None,
) -> tuple:
    """Host training loop (camera sampling + densification cadence).

    ``viewer`` is an optional `utils.network_gui.ViewerServer`, polled once
    per iteration like `gs/train.py:52-65`.
    Returns (state, adam, history list of metric dicts).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    adam = gs_adam_init(state.params)
    history = []
    active_sh = 0
    t0 = time.time()

    for it in range(1, config.iterations + 1):
        if viewer is not None:
            viewer.poll(
                lambda cam: render_viewer_frame(state, cam, active_sh, config),
                training_done=it == config.iterations,
            )
        if it % config.sh_increase_interval == 0 and active_sh < config.sh_degree:
            active_sh += 1
        key, k_cam, k_den = jax.random.split(key, 3)
        cam = cameras[int(jax.random.randint(k_cam, (), 0, len(cameras)))]
        h, w = cam.image.shape[:2]
        state, adam, metrics = train_step(
            state, adam, cam.viewmat, cam.intrins, cam.image,
            h, w, active_sh, config,
        )

        if it < config.densify_until_iter:
            if it > config.densify_from_iter and it % config.densification_interval == 0:
                size_thr = (
                    config.size_threshold if it > config.opacity_reset_interval else 0.0
                )
                state, adam, info = densify_step(
                    state, adam, k_den, scene_extent, size_thr, config
                )
            if it % config.opacity_reset_interval == 0 or (
                config.white_background and it == config.densify_from_iter
            ):
                state, adam = densify_mod.reset_opacity(state, adam)

        if log_every and it % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(iter=it, elapsed=time.time() - t0)
            history.append(m)

    return state, adam, history
