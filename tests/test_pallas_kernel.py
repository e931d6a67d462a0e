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
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-4, err_msg=name)


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
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ["means", "quats", "scales", "opac",
                                   "colors", "bg"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4, err_msg=name
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
