"""Parity of the fused one-sort binning (bin_splats_aligned) against the
separate bin_splats -> cap_binning -> align_binning pipeline.

The fused path computes per-tile counts pre-sort with the matmul corner
histogram and emits alignment pads into the same single key sort; its
output must reproduce the separate pipeline's aligned layout exactly
(same tile_start/tile_count, identical per-tile id segments in depth
order, id-0 pads) — modulo the two documented differences (far-plane
depth-code clip; cap applied in aligned coordinates, which only ever
RETAINS more real entries).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.rasterize.common import (
    align_binning,
    bin_splats,
    bin_splats_aligned,
    bin_splats_aligned_batch,
    cap_binning,
    project_splats,
)


def scene_proj(rng, n=500, big_frac=0.1, res=64):
    """Random projection with a controllable fraction of multi-tile splats
    (exercises the two-pool big path)."""
    means = rng.normal(size=(n, 3)) * 0.8 + np.array([0.0, 0.0, 3.0])
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.exp(rng.normal(size=(n, 2)) * 0.5) * 0.05
    big = rng.random(n) < big_frac
    scales[big] *= 20.0  # span several 16px tiles
    viewmat = np.eye(4)
    intrins = np.array([60.0, 60.0, res / 2, res / 2])
    return project_splats(
        jnp.asarray(means, jnp.float32), jnp.asarray(quats, jnp.float32),
        jnp.asarray(scales, jnp.float32), jnp.asarray(viewmat, jnp.float32),
        jnp.asarray(intrins, jnp.float32),
    )


def assert_same_layout(sep, fused, prefix_only=False):
    s_start = np.asarray(sep.tile_start)
    s_count = np.asarray(sep.tile_count)
    f_start = np.asarray(fused.tile_start)
    f_count = np.asarray(fused.tile_count)
    s_ids = np.asarray(sep.sorted_splat_ids)
    f_ids = np.asarray(fused.sorted_splat_ids)
    if prefix_only:
        # cap in aligned coordinates only ever keeps MORE real entries
        assert (f_count >= s_count).all()
    else:
        np.testing.assert_array_equal(f_start, s_start)
        np.testing.assert_array_equal(f_count, s_count)
        assert f_ids.shape == s_ids.shape
    for t in range(s_start.shape[0]):
        c = s_count[t]
        np.testing.assert_array_equal(
            f_ids[f_start[t]: f_start[t] + c],
            s_ids[s_start[t]: s_start[t] + c],
            err_msg=f"tile {t}",
        )
    # every slot outside [start, start+count) is an id-0 pad
    used = np.zeros(f_ids.shape[0], bool)
    for t in range(f_start.shape[0]):
        used[f_start[t]: f_start[t] + f_count[t]] = True
    assert (f_ids[~used] == 0).all()


@pytest.mark.parametrize("span_cap,big_frac", [(4, 0.1), (4, 0.0), (2, 0.1)])
def test_fused_matches_separate_pipeline(span_cap, big_frac):
    rng = np.random.default_rng(7)
    for trial in range(3):
        proj = scene_proj(rng, n=400 + 100 * trial, big_frac=big_frac)
        sep = align_binning(
            bin_splats(proj, 64, 64, tile=16, span_cap=span_cap), chunk=32
        )
        fused = bin_splats_aligned(
            proj, 64, 64, tile=16, span_cap=span_cap, chunk=32
        )
        assert int(fused.num_entries) == int(sep.num_entries)
        assert int(fused.overflowed) == int(sep.overflowed)
        assert_same_layout(sep, fused)


def test_fused_with_entry_cap_retains_separate_prefix():
    rng = np.random.default_rng(11)
    proj = scene_proj(rng, n=600, big_frac=0.15)
    cap = 64
    sep = align_binning(
        cap_binning(
            bin_splats(proj, 64, 64, tile=16, span_cap=4), cap, chunk=32
        ),
        chunk=32,
    )
    fused = bin_splats_aligned(
        proj, 64, 64, tile=16, span_cap=4, chunk=32, entry_cap=cap
    )
    # documented size contract: identical static shapes
    assert fused.sorted_splat_ids.shape == sep.sorted_splat_ids.shape
    assert_same_layout(sep, fused, prefix_only=True)


def test_fused_batch_matches_per_frame():
    rng = np.random.default_rng(13)
    projs = [scene_proj(rng, n=300, big_frac=0.1) for _ in range(2)]
    proj_b = jax.tree.map(lambda *x: jnp.stack(x), *projs)
    batched = bin_splats_aligned_batch(proj_b, 64, 64, tile=16, span_cap=4,
                                       chunk=32)
    for f in range(2):
        single = bin_splats_aligned(projs[f], 64, 64, tile=16, span_cap=4,
                                    chunk=32)
        for a, b in zip(batched, single):
            np.testing.assert_array_equal(np.asarray(a[f]), np.asarray(b))


def test_fused_empty_scene():
    rng = np.random.default_rng(17)
    proj = scene_proj(rng, n=64)
    proj = proj._replace(valid=jnp.zeros_like(proj.valid))
    fused = bin_splats_aligned(proj, 64, 64, tile=16, span_cap=4, chunk=32)
    assert int(fused.num_entries) == 0
    assert (np.asarray(fused.tile_count) == 0).all()
    assert (np.asarray(fused.sorted_splat_ids) == 0).all()
