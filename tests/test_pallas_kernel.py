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
