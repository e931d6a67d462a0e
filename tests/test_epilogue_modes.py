"""The slab row-gather's backward epilogue (entry grads -> splat grads)
has three lowerings (xla / narrow / sorted, see pallas_kernel._row_gather);
all must produce identical parameter gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_fused_binning import scene_proj
from vidu4d_tpu.ops.rasterize import pallas_kernel
from vidu4d_tpu.ops.rasterize.pallas_backward import rasterize_pallas_grad


def _grads(mode, proj, colors, opac, bg):
    old = pallas_kernel._EPILOGUE
    pallas_kernel._EPILOGUE = mode
    jax.clear_caches()
    try:
        def loss(colors, opac):
            out = rasterize_pallas_grad(
                proj, colors, opac, bg, 32, 32, tile=16, span_cap=4,
                interpret=True,
            )
            return (jnp.sum(out.color ** 2) + jnp.sum(out.depth)
                    + jnp.sum(out.alpha * out.distortion))

        return jax.grad(loss, argnums=(0, 1))(colors, opac)
    finally:
        pallas_kernel._EPILOGUE = old
        jax.clear_caches()


@pytest.mark.parametrize("mode", ["narrow", "sorted"])
def test_epilogue_mode_matches_xla(mode):
    rng = np.random.default_rng(5)
    proj = scene_proj(rng, n=96, big_frac=0.1, res=32)
    colors = jnp.asarray(rng.uniform(size=(96, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, size=(96,)), jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    ref = _grads("xla", proj, colors, opac, bg)
    got = _grads(mode, proj, colors, opac, bg)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(g), atol=1e-5, rtol=1e-5
        )
