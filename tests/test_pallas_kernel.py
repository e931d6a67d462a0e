"""Pallas rasterizer kernel parity vs the XLA tiles implementation.

Runs in interpreter mode on CPU (same numerics path as the compiled kernel);
compiled-TPU parity was verified separately at ~1e-3 (accumulation-order
differences on long compositing chains)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_rasterize import make_scene
from vidu4d_tpu.ops.rasterize.common import project_splats
from vidu4d_tpu.ops.rasterize.pallas_kernel import rasterize_pallas_from_projection
from vidu4d_tpu.ops.rasterize.xla_tiles import rasterize_tiles_from_projection


@pytest.mark.slow
def test_pallas_matches_xla_tiles_interpret():
    rng = np.random.default_rng(42)
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=200)
    proj = project_splats(means, quats, scales, viewmat, intrins)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    H = W = 64
    ref = rasterize_tiles_from_projection(
        proj, colors, opac, bg, H, W, tile=16, span_cap=4, budget=256,
        tile_chunk=4,
    )
    out = rasterize_pallas_from_projection(
        proj, colors, opac, bg, H, W, tile=16, span_cap=4, interpret=True
    )
    for name in ("color", "depth", "alpha", "normal", "median_depth",
                 "distortion", "median_weight"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        # the kernel evaluates the two-plane intersection in its affine-
        # coefficient form (p = A + px*B + py*C) while the XLA oracle keeps
        # the direct k x l cross product; identical math, different f32
        # rounding (the oracle's bilinear px*py*|Tw|^2 products carry the
        # LARGER rounding term), so parity is reassociation-level, not exact
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3, err_msg=name)


@pytest.mark.slow
def test_pallas_backward_matches_autodiff_interpret():
    """Hand-written backward kernel vs XLA autodiff gradients."""
    import jax

    from vidu4d_tpu.ops.rasterize.pallas_backward import rasterize_pallas_grad

    rng = np.random.default_rng(7)
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=80)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    H = W = 32

    def make_loss(raster):
        def loss(means, quats, scales, opac, colors, bg):
            proj = project_splats(means, quats, scales, viewmat, intrins)
            out = raster(proj, colors, opac, bg)
            return (
                jnp.mean(out.color ** 2) + 0.3 * jnp.mean(out.depth)
                + 0.2 * jnp.mean(out.alpha) + 0.1 * jnp.mean(out.normal)
                + 0.5 * jnp.mean(out.distortion)
            )
        return loss

    loss_xla = make_loss(
        lambda p, c, o, b: rasterize_tiles_from_projection(
            p, c, o, b, H, W, tile=16, span_cap=4, budget=128, tile_chunk=2
        )
    )
    loss_pal = make_loss(
        lambda p, c, o, b: rasterize_pallas_grad(
            p, c, o, b, H, W, tile=16, span_cap=4, interpret=True
        )
    )
    args = (means, quats, scales, opac, colors, bg)
    v1, g1 = jax.value_and_grad(loss_xla, argnums=tuple(range(6)))(*args)
    v2, g2 = jax.value_and_grad(loss_pal, argnums=tuple(range(6)))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=3e-5)  # affine-form reassociation (see fwd parity comment)
    for a, b, name in zip(g1, g2, ["means", "quats", "scales", "opac",
                                   "colors", "bg"]):
        # affine-coefficient vs direct-cross-product rounding (see the
        # forward parity test comment) — gradients diverge at the same
        # reassociation level
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4, err_msg=name
        )


@pytest.mark.slow
def test_api_dispatch_pallas_grad_interpret():
    """api.rasterize(impl=pallas_grad) wiring — value + grad flow end to end.

    Uses the interpret-mode kernel via a monkeypatched default so the test
    runs on CPU; on TPU the same path compiles (exercised by bench --impl)."""
    import jax

    from vidu4d_tpu.ops.rasterize import RasterizeConfig, rasterize
    from vidu4d_tpu.ops.rasterize import pallas_backward as pb

    rng = np.random.default_rng(3)
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=40)
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(impl="pallas_grad", span_cap=4)

    orig = pb.rasterize_pallas_grad

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pb_dict = pb.__dict__
    pb_dict["rasterize_pallas_grad"], saved = interp, orig
    try:
        def loss(op):
            out = rasterize(means, quats, scales, op, viewmat, intrins,
                            32, 32, colors=colors, bg_color=bg, config=cfg)
            return jnp.mean(out.color)

        v, g = jax.value_and_grad(loss)(opac)
        assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()
        assert float(np.abs(np.asarray(g)).max()) > 0
    finally:
        pb_dict["rasterize_pallas_grad"] = saved


@pytest.mark.slow
def test_pallas_extra_channels_interpret():
    """Extra composited channels (flow supervision path) match the tiles
    implementation in value and gradient."""
    import jax

    from vidu4d_tpu.ops.rasterize.pallas_backward import rasterize_pallas_grad

    rng = np.random.default_rng(11)
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=60)
    extra = jnp.asarray(rng.normal(size=(colors.shape[0], 2)), jnp.float32)
    colors5 = jnp.concatenate([colors, extra], axis=-1)
    bg = jnp.asarray([0.1, 0.2, 0.3, 0.0, 0.0], jnp.float32)
    H = W = 32

    def make_loss(raster):
        def loss(means, colors5, opac, bg):
            proj = project_splats(means, quats, scales, viewmat, intrins)
            out = raster(proj, colors5, opac, bg)
            return (
                jnp.mean(out.color[..., :3] ** 2)
                + 0.7 * jnp.mean(jnp.abs(out.color[..., 3:]))
                + 0.2 * jnp.mean(out.alpha)
            )
        return loss

    loss_xla = make_loss(
        lambda p, c, o, b: rasterize_tiles_from_projection(
            p, c, o, b, H, W, tile=16, span_cap=4, budget=128, tile_chunk=2
        )
    )
    loss_pal = make_loss(
        lambda p, c, o, b: rasterize_pallas_grad(
            p, c, o, b, H, W, tile=16, span_cap=4, interpret=True
        )
    )
    args = (means, colors5, opac, bg)
    v1, g1 = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    v2, g2 = jax.value_and_grad(loss_pal, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ["means", "colors5", "opac", "bg"]):
        # reassociation-level parity vs the direct-form oracle (see the
        # forward parity test comment)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4, err_msg=name
        )


@pytest.mark.slow
def test_pallas_batched_frames_interpret():
    """Batched-grid kernel (frame dim folded into the grid) matches the
    per-frame tiles path in value and gradient."""
    import jax

    from vidu4d_tpu.ops.rasterize.pallas_backward import (
        rasterize_pallas_grad_batch,
    )

    rng = np.random.default_rng(21)
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=50)
    # two frames with different poses + extra flow channels
    shift = jnp.asarray([0.1, -0.05, 0.2], jnp.float32)
    means_b = jnp.stack([means, means + shift])
    extra = jnp.asarray(rng.normal(size=(2, means.shape[0], 2)), jnp.float32)
    colors_b = jnp.concatenate(
        [jnp.stack([colors, colors * 0.5]), extra], axis=-1
    )
    bg = jnp.asarray([0.1, 0.2, 0.3, 0.0, 0.0], jnp.float32)
    H = W = 32

    def loss_tiles(means_b, colors_b, opac):
        def one(mn, cl):
            proj = project_splats(mn, quats, scales, viewmat, intrins)
            out = rasterize_tiles_from_projection(
                proj, cl, opac, bg, H, W, tile=16, span_cap=4, budget=128,
                tile_chunk=2,
            )
            return out
        out = jax.vmap(one)(means_b, colors_b)
        return (
            jnp.mean(out.color ** 2) + 0.2 * jnp.mean(out.alpha)
            + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.distortion)
        )

    def loss_batch(means_b, colors_b, opac):
        proj_b = jax.vmap(
            lambda mn: project_splats(mn, quats, scales, viewmat, intrins)
        )(means_b)
        out = rasterize_pallas_grad_batch(
            proj_b, colors_b, opac, bg, H, W, tile=16, span_cap=4,
            interpret=True,
        )
        return (
            jnp.mean(out.color ** 2) + 0.2 * jnp.mean(out.alpha)
            + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.distortion)
        )

    args = (means_b, colors_b, opac)
    v1, g1 = jax.value_and_grad(loss_tiles, argnums=(0, 1, 2))(*args)
    v2, g2 = jax.value_and_grad(loss_batch, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ["means_b", "colors_b", "opac"]):
        # reassociation-level parity vs the direct-form oracle (see the
        # forward parity test comment)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4, err_msg=name
        )


@pytest.mark.slow
def test_pallas_entry_cap_exact_when_under_interpret():
    """entry_cap >= the scene's entry count must be bit-identical to the
    uncapped path (value + grads) — the truncation is a pure prefix slice."""
    import jax

    from vidu4d_tpu.ops.rasterize.common import bin_splats
    from vidu4d_tpu.ops.rasterize.pallas_backward import rasterize_pallas_grad

    rng = np.random.default_rng(17)
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=120)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    H = W = 32

    proj0 = project_splats(means, quats, scales, viewmat, intrins)
    entries = int(bin_splats(proj0, H, W, tile=16, span_cap=4).num_entries)
    cap = ((entries + 127) // 128 + 1) * 128
    assert cap < 120 * 16  # the cap actually truncates the padded slab

    def make_loss(entry_cap):
        def loss(means, opac):
            proj = project_splats(means, quats, scales, viewmat, intrins)
            out = rasterize_pallas_grad(
                proj, colors, opac, bg, H, W, tile=16, span_cap=4,
                interpret=True, entry_cap=entry_cap,
            )
            return jnp.mean(out.color ** 2) + 0.2 * jnp.mean(out.alpha)
        return loss

    v1, g1 = jax.value_and_grad(make_loss(0), argnums=(0, 1))(means, opac)
    v2, g2 = jax.value_and_grad(make_loss(cap), argnums=(0, 1))(means, opac)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


@pytest.mark.slow
@pytest.mark.xdist_group("sharded_parity")
def test_pallas_batch_shard_map_mesh_parity_interpret():
    """Multi-chip Pallas path (VERDICT r2 #4): the (frame, tile) grid
    partitioned over the 8-device CPU mesh via shard_map must match the
    single-device batched kernel in value AND gradient (the replicated-slab
    cotangent psum included)."""
    import jax

    from vidu4d_tpu.ops.rasterize.pallas_backward import (
        rasterize_pallas_grad_batch,
    )
    from vidu4d_tpu.parallel.sharding import make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)  # (data 2, surfel 4); 2 frames x 4 tiles = 8 programs

    rng = np.random.default_rng(33)
    means, quats, scales, opac, colors, viewmat, intrins = make_scene(rng, n=50)
    shift = jnp.asarray([0.1, -0.05, 0.2], jnp.float32)
    means_b = jnp.stack([means, means + shift])
    colors_b = jnp.stack([colors, colors * 0.5])
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    H = W = 32

    def make_loss(use_mesh):
        def loss(means_b, colors_b, opac):
            proj_b = jax.vmap(
                lambda mn: project_splats(mn, quats, scales, viewmat, intrins)
            )(means_b)
            out = rasterize_pallas_grad_batch(
                proj_b, colors_b, opac, bg, H, W, tile=16, span_cap=4,
                interpret=True, mesh=mesh if use_mesh else None,
            )
            return (
                jnp.mean(out.color ** 2) + 0.2 * jnp.mean(out.alpha)
                + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.distortion)
            )
        return loss

    args = (means_b, colors_b, opac)
    v1, g1 = jax.value_and_grad(make_loss(False), argnums=(0, 1, 2))(*args)
    v2, g2 = jax.value_and_grad(make_loss(True), argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ["means_b", "colors_b", "opac"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4, err_msg=name
        )


@pytest.mark.slow
def test_pallas_backward_deep_chains_interpret():
    """Regression (r2): deep per-pixel compositing chains crossing many
    CHUNK boundaries. The forward carry used to reset the transmittance
    chain to the last-included T, letting the include mask "resurrect"
    across chunks; the backward's division-based reconstruction then
    inflated t_before exponentially (~1e18 gradients at 50k splats).
    Parity vs the XLA path with an untruncated budget pins both the
    include semantics and the reconstruction."""
    import jax

    from vidu4d_tpu.ops.rasterize.pallas_backward import rasterize_pallas_grad

    rng = np.random.default_rng(99)
    n = 1500  # ~1500 entries in a handful of tiles -> chains span 5+ chunks
    means = np.zeros((n, 3), np.float32)
    means[:, :2] = rng.normal(0, 0.15, size=(n, 2))
    means[:, 2] = 2.0 + rng.uniform(0, 1.0, size=n)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.full((n, 2), 0.04, np.float32)
    opac = rng.uniform(0.02, 0.35, size=(n,)).astype(np.float32)  # deep chains
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    viewmat = jnp.eye(4)
    intrins = jnp.asarray([40.0, 40.0, 16.0, 16.0])
    bg = jnp.asarray([0.3, 0.2, 0.1])
    H = W = 32
    args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))

    def make_loss(raster):
        def loss(means, quats, scales, opac, colors):
            proj = project_splats(means, quats, scales, viewmat, intrins)
            out = raster(proj, colors, opac)
            return (
                jnp.mean(jnp.abs(out.color)) + 0.2 * jnp.mean(out.alpha)
                + 1e-3 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.distortion)
            )
        return loss

    loss_xla = make_loss(
        lambda p, c, o: rasterize_tiles_from_projection(
            p, c, o, bg, H, W, tile=16, span_cap=4, budget=2048, tile_chunk=2
        )
    )
    loss_pal = make_loss(
        lambda p, c, o: rasterize_pallas_grad(
            p, c, o, bg, H, W, tile=16, span_cap=4, interpret=True
        )
    )
    v1, g1 = jax.value_and_grad(loss_xla, argnums=(0, 3))(*args)
    v2, g2 = jax.value_and_grad(loss_pal, argnums=(0, 3))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ["means", "opac"]):
        a, b = np.asarray(a), np.asarray(b)
        # the old bug inflated grads by orders of magnitude; pin tight parity
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-3, err_msg=name)
