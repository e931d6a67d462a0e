"""Rasterizer correctness tests: tiled XLA implementation vs naive oracle,
plus analytic sanity checks on degenerate scenes and autodiff gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.rasterize import (
    RasterizeConfig,
    rasterize,
    rasterize_naive,
)
from vidu4d_tpu.ops.rasterize.common import project_splats, bin_splats


def make_scene(rng, n=200, spread=0.8):
    """Random surfel cloud in front of a simple camera."""
    means = rng.normal(size=(n, 3)) * spread + np.array([0.0, 0.0, 3.0])
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.exp(rng.normal(size=(n, 2)) * 0.5) * 0.05
    opac = 1.0 / (1.0 + np.exp(-rng.normal(size=(n,))))
    colors = rng.uniform(size=(n, 3))
    viewmat = np.eye(4)
    intrins = np.array([60.0, 60.0, 32.0, 32.0])
    return tuple(
        jnp.array(v, dtype=jnp.float32)
        for v in (means, quats, scales, opac, colors, viewmat, intrins)
    )


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_tiles_match_naive_oracle(rng):
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng)
    H = W = 64
    bg = jnp.array([0.1, 0.2, 0.3], dtype=jnp.float32)
    kw = dict(
        viewmat=viewmat, intrins=intrins, height=H, width=W,
        colors=colors, bg_color=bg,
    )
    cfg = RasterizeConfig(tile=16, span_cap=4, budget=256, tile_chunk=4)
    out_naive = rasterize_naive(means, quats, scales, opac, config=cfg, **kw)
    out_tiles = rasterize(means, quats, scales, opac, config=cfg, **kw)
    for name in ("color", "depth", "alpha", "normal", "median_depth",
                 "distortion", "median_weight", "final_t"):
        a = np.asarray(getattr(out_naive, name))
        b = np.asarray(getattr(out_tiles, name))
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4, err_msg=name)


def test_gradients_match_oracle(rng):
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=64)
    H = W = 32
    target = jnp.array(rng.uniform(size=(H, W, 3)), dtype=jnp.float32)
    cfg_t = RasterizeConfig(tile=16, span_cap=4, budget=128, tile_chunk=2)

    def loss_fn(impl):
        def f(means, quats, scales, opac, colors):
            out = rasterize(
                means, quats, scales, opac,
                viewmat=viewmat, intrins=intrins, height=H, width=W,
                colors=colors, config=cfg_t._replace(impl=impl),
            )
            return (
                jnp.mean(jnp.abs(out.color - target))
                + 0.1 * jnp.mean(out.distortion)
                + 0.05 * jnp.mean(out.depth)
                + 0.02 * jnp.mean(out.normal)
            )
        return f

    args = (means, quats, scales, opac, colors)
    g_naive = jax.grad(loss_fn("naive"), argnums=(0, 1, 2, 3, 4))(*args)
    g_tiles = jax.grad(loss_fn("tiles"), argnums=(0, 1, 2, 3, 4))(*args)
    for gn, gt, name in zip(g_naive, g_tiles, "means quats scales opac colors".split()):
        np.testing.assert_allclose(
            np.asarray(gn), np.asarray(gt), atol=1e-4, rtol=1e-3, err_msg=name
        )
        assert np.isfinite(np.asarray(gn)).all(), name


def test_single_flat_splat_color_and_normal():
    # one axis-aligned surfel facing the camera, covering the image center
    means = jnp.array([[0.0, 0.0, 2.0]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])  # identity: normal = +z
    scales = jnp.array([[0.5, 0.5]])
    opac = jnp.array([0.9])
    colors = jnp.array([[1.0, 0.0, 0.0]])
    viewmat = jnp.eye(4)
    intrins = jnp.array([32.0, 32.0, 16.0, 16.0])
    out = rasterize(
        means, quats, scales, opac, viewmat, intrins, 32, 32, colors=colors,
        config=RasterizeConfig(budget=8, span_cap=4),
    )
    # center pixel: alpha ~ 0.9, color ~ red * 0.9
    c = np.asarray(out.color[16, 16])
    a = float(out.alpha[16, 16])
    assert abs(a - 0.9) < 0.01
    np.testing.assert_allclose(c, [a, 0.0, 0.0], atol=1e-5)
    # depth of the flat splat is its z
    assert abs(float(out.depth[16, 16]) / a - 2.0) < 1e-3
    # normal is the camera-space -z-facing (dual-visible flip): n = (0,0,-1)*w
    n = np.asarray(out.normal[16, 16])
    np.testing.assert_allclose(n / a, [0.0, 0.0, -1.0], atol=1e-4)


def test_two_splats_compositing_order():
    # red splat at z=2 in front of green splat at z=4 — red must dominate
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
    scales = jnp.full((2, 2), 1.0)
    opac = jnp.array([0.8, 0.8])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    viewmat = jnp.eye(4)
    intrins = jnp.array([32.0, 32.0, 16.0, 16.0])
    out = rasterize(
        means, quats, scales, opac, viewmat, intrins, 32, 32, colors=colors,
        config=RasterizeConfig(budget=8),
    )
    c = np.asarray(out.color[16, 16])
    np.testing.assert_allclose(c, [0.8, 0.8 * 0.2, 0.0], atol=1e-3)
    # median depth: first splat still has T=1>0.5; second has T=0.2<0.5
    assert abs(float(out.median_depth[16, 16]) - 2.0) < 1e-3


def test_mask_culls_splats(rng):
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=32)
    mask = jnp.zeros((32,), dtype=bool)
    out = rasterize(
        means, quats, scales, opac, viewmat, intrins, 32, 32,
        colors=colors, mask=mask, config=RasterizeConfig(budget=64),
    )
    assert float(jnp.max(out.alpha)) == 0.0


def test_densify_dummy_gradient(rng):
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=64)
    dummy = jnp.zeros((64, 2))

    def loss(dummy):
        out = rasterize(
            means, quats, scales, opac, viewmat, intrins, 32, 32,
            colors=colors, densify_dummy=dummy,
            config=RasterizeConfig(budget=128, tile_chunk=2),
        )
        return jnp.mean(out.color ** 2)

    g = jax.grad(loss)(dummy)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_binning_counts(rng):
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=100)
    proj = project_splats(means, quats, scales, viewmat, intrins)
    b = bin_splats(proj, 64, 64, tile=16, span_cap=4)
    assert int(b.num_entries) > 0
    assert int(jnp.sum(b.tile_count)) == int(b.num_entries)
    # starts are consistent with counts
    starts = np.asarray(b.tile_start)
    counts = np.asarray(b.tile_count)
    assert (starts[1:] == starts[:-1] + counts[:-1]).all()


def test_sh_color_path(rng):
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=16)
    shs = jnp.array(rng.normal(size=(16, 1, 3)) * 0.3, dtype=jnp.float32)
    out = rasterize(
        means, quats, scales, opac, viewmat, intrins, 32, 32,
        shs=shs, sh_degree=0, config=RasterizeConfig(budget=64),
    )
    assert np.isfinite(np.asarray(out.color)).all()


@pytest.mark.slow
@pytest.mark.xdist_group("sharded_parity")
def test_tiles_batch_mesh_parity(rng):
    """Mesh-partitioned batched tiles path (the CPU/multi-chip fallback
    backend): the flat (frame, tile) grid shard_mapped over the 8-device
    CPU mesh must match per-frame single-device tiles rasterization in
    value AND gradients (replicated-input cotangent psum included)."""
    from vidu4d_tpu.ops.rasterize.xla_tiles import (
        rasterize_tiles_batch,
        rasterize_tiles_from_projection,
    )
    from vidu4d_tpu.parallel.sharding import make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)

    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=60)
    shift = jnp.asarray([0.1, -0.05, 0.2], jnp.float32)
    means_b = jnp.stack([means, means + shift])
    colors_b = jnp.stack([colors, colors * 0.5])
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    H = W = 64  # 2 frames x 16 tiles = 32 grid slots over 8 devices

    def proj_of(means_b):
        return jax.vmap(
            lambda mn: project_splats(mn, quats, scales, viewmat, intrins)
        )(means_b)

    def loss_mesh(means_b, colors_b, opac):
        out = rasterize_tiles_batch(
            proj_of(means_b), colors_b, opac, bg, H, W,
            tile=16, span_cap=4, budget=128, tile_chunk=2, mesh=mesh,
        )
        return (
            jnp.mean(out.color ** 2) + 0.2 * jnp.mean(out.alpha)
            + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.distortion)
        )

    def loss_ref(means_b, colors_b, opac):
        proj_b = proj_of(means_b)
        outs = [
            rasterize_tiles_from_projection(
                jax.tree.map(lambda x: x[f], proj_b), colors_b[f], opac, bg,
                H, W, tile=16, span_cap=4, budget=128, tile_chunk=2,
            )
            for f in range(2)
        ]
        out = jax.tree.map(lambda *x: jnp.stack(x), *outs)
        return (
            jnp.mean(out.color ** 2) + 0.2 * jnp.mean(out.alpha)
            + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.distortion)
        )

    args = (means_b, colors_b, opac)
    v1, g1 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(*args)
    v2, g2 = jax.value_and_grad(loss_mesh, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ["means_b", "colors_b", "opac"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4, err_msg=name
        )
