"""End-to-end static 2DGS training smoke test (the minimum e2e slice,
SURVEY.md §7): fit a synthetic scene and verify PSNR improves substantially."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.engine.gs_trainer import Camera, GsTrainConfig, train, train_step
from vidu4d_tpu.models.gaussian import surfels as sf
from vidu4d_tpu.models.gaussian.optimizer import GsLearningRates, gs_adam_init
from vidu4d_tpu.ops.image_losses import psnr
from vidu4d_tpu.ops.rasterize import RasterizeConfig, rasterize


def look_at_viewmat(eye, target=np.zeros(3), up=np.array([0.0, -1.0, 0.0])):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    rot = np.stack([right, down, fwd], axis=0)  # world->cam rows
    t = -rot @ eye
    vm = np.eye(4)
    vm[:3, :3] = rot
    vm[:3, 3] = t
    return vm


def make_gt_scene(rng, n=48):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    cols = rng.uniform(0.2, 1.0, size=(n, 3)).astype(np.float32)
    state = sf.init_from_points(jnp.array(pts), jnp.array(cols), capacity=n, sh_degree=0)
    # make them opaque-ish and reasonably sized
    params = state.params._replace(
        opacity=jnp.full_like(state.params.opacity, sf.inverse_sigmoid(jnp.asarray(0.8))),
        scaling=jnp.full_like(state.params.scaling, np.log(0.12)),
    )
    return state._replace(params=params)


def render_views(state, cams_meta, H, W, cfg):
    cams = []
    for viewmat, intrins in cams_meta:
        out = rasterize(
            state.params.xyz,
            sf.get_rotation(state.params),
            sf.get_scaling(state.params),
            sf.get_opacity(state.params)[:, 0],
            jnp.array(viewmat, jnp.float32),
            jnp.array(intrins, jnp.float32),
            H, W,
            shs=sf.get_features(state.params),
            sh_degree=0,
            mask=state.alive,
            config=cfg,
        )
        cams.append(
            Camera(
                viewmat=jnp.array(viewmat, jnp.float32),
                intrins=jnp.array(intrins, jnp.float32),
                image=out.color,
            )
        )
    return cams


@pytest.mark.slow
def test_static_training_converges():
    rng = np.random.default_rng(7)
    H = W = 48
    raster_cfg = RasterizeConfig(tile=16, span_cap=4, budget=160, tile_chunk=3)
    gt = make_gt_scene(rng)

    cams_meta = []
    for ang in np.linspace(0, 2 * np.pi, 5)[:-1]:
        eye = np.array([2.2 * np.sin(ang), 0.4, 2.2 * np.cos(ang)])
        vm = look_at_viewmat(eye)
        intrins = np.array([55.0, 55.0, W / 2, H / 2])
        cams_meta.append((vm, intrins))
    cams = render_views(gt, cams_meta, H, W, raster_cfg)

    # init from noisy GT points with wrong colors
    pts = np.asarray(gt.params.xyz) + rng.normal(size=(48, 3)).astype(np.float32) * 0.05
    cols = rng.uniform(size=(48, 3)).astype(np.float32)
    state = sf.init_from_points(jnp.array(pts), jnp.array(cols), capacity=96, sh_degree=0)

    config = GsTrainConfig(
        iterations=220,
        sh_degree=0,
        densify_from_iter=60,
        densification_interval=80,
        densify_until_iter=200,
        opacity_reset_interval=10_000,
        raster=raster_cfg,
        lrs=GsLearningRates(
            xyz_init=0.002, xyz_final=0.0002, xyz_max_steps=220,
            features_dc=0.05, opacity=0.1, scaling=0.01, rotation=0.005,
        ),
    )

    # PSNR before
    adam0 = gs_adam_init(state.params)
    _, _, m0 = train_step(
        state, adam0, cams[0].viewmat, cams[0].intrins, cams[0].image,
        H, W, 0, config,
    )
    psnr_before = float(m0["psnr"])

    state, adam, hist = train(
        state, cams, config, scene_extent=2.0, key=jax.random.PRNGKey(1),
        log_every=50,
    )

    _, _, m1 = train_step(
        state, adam, cams[0].viewmat, cams[0].intrins, cams[0].image,
        H, W, 0, config,
    )
    psnr_after = float(m1["psnr"])
    assert psnr_after > psnr_before + 4.0, (psnr_before, psnr_after)
    assert psnr_after > 21.0, psnr_after
