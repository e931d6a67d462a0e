"""Property tests for align_binning (ADVICE r4) + the feat_reproj
uniform pixel subsample (ADVICE r4).

align_binning's scan/sort re-layout (`ops/rasterize/common.py`) was only
covered transitively through Pallas fwd/bwd parity; this pins the layout
contract directly against a numpy oracle over randomized TileBinnings,
including cap_binning interaction, empty tiles, non-default chunk sizes,
and sentinel tails.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vidu4d_tpu.engine.gs4d_trainer import _uniform_pixel_subsample
from vidu4d_tpu.ops.rasterize.common import (
    TileBinning,
    align_binning,
    cap_binning,
)


def _random_binning(rng, num_tiles, max_per_tile, pad_tail):
    """Build a valid TileBinning directly: per-tile counts, contiguous
    depth-sorted segments, sentinel tail (tile id == num_tiles, splat 0)."""
    count = rng.integers(0, max_per_tile + 1, size=num_tiles).astype(np.int32)
    # sprinkle empty tiles aggressively
    count[rng.random(num_tiles) < 0.35] = 0
    start = np.concatenate([[0], np.cumsum(count)[:-1]]).astype(np.int32)
    e_used = int(count.sum())
    e_total = e_used + int(pad_tail)
    ids = np.zeros(e_total, np.int32)
    tiles = np.full(e_total, num_tiles, np.int32)
    for t in range(num_tiles):
        s, c = start[t], count[t]
        ids[s : s + c] = rng.integers(0, 10_000, size=c)
        tiles[s : s + c] = t
    return TileBinning(
        sorted_splat_ids=jnp.asarray(ids),
        sorted_tile_ids=jnp.asarray(tiles),
        tile_start=jnp.asarray(start),
        tile_count=jnp.asarray(count),
        num_entries=jnp.int32(e_used),
        overflowed=jnp.int32(0),
    )


def _check_aligned(binning, aligned, chunk):
    """The layout contract (numpy oracle):
    - aligned tile_start == exclusive cumsum of chunk-padded counts,
    - every chunk boundary-aligned,
    - entries of tile t land at [astart[t], astart[t]+count[t]) in their
      original (depth-sorted) order with identical ids,
    - all other slots are pad: splat id 0, tile id == num_tiles (so the
      kernels mask them exactly like sentinel tails)."""
    ids = np.asarray(binning.sorted_splat_ids)
    start = np.asarray(binning.tile_start)
    count = np.asarray(binning.tile_count)
    a_ids = np.asarray(aligned.sorted_splat_ids)
    a_tiles = np.asarray(aligned.sorted_tile_ids)
    a_start = np.asarray(aligned.tile_start)
    a_count = np.asarray(aligned.tile_count)
    num_tiles = start.shape[0]

    padded = -(-count // chunk) * chunk
    want_start = np.concatenate([[0], np.cumsum(padded)[:-1]])
    np.testing.assert_array_equal(a_start, want_start)
    np.testing.assert_array_equal(a_count, count)  # counts unchanged
    assert (a_start % chunk == 0).all()
    assert a_ids.shape[0] == ids.shape[0] + num_tiles * chunk

    used = np.zeros(a_ids.shape[0], bool)
    gap = np.zeros(a_ids.shape[0], bool)
    gap_tile = np.zeros(a_ids.shape[0], np.int32)
    for t in range(num_tiles):
        src = ids[start[t] : start[t] + count[t]]
        dst = a_ids[a_start[t] : a_start[t] + count[t]]
        np.testing.assert_array_equal(dst, src)
        np.testing.assert_array_equal(
            a_tiles[a_start[t] : a_start[t] + count[t]], t
        )
        used[a_start[t] : a_start[t] + count[t]] = True
        gap[a_start[t] + count[t] : a_start[t] + padded[t]] = True
        gap_tile[a_start[t] + count[t] : a_start[t] + padded[t]] = t
    # pad slots: id 0 everywhere; alignment-gap pads keep their tile's id
    # (chunk -> tile mapping stays consistent; masked via count), surplus
    # pads past every segment carry the sentinel tile id
    assert (a_ids[~used] == 0).all()
    np.testing.assert_array_equal(a_tiles[gap], gap_tile[gap])
    assert (a_tiles[~used & ~gap] >= num_tiles).all()


@pytest.mark.parametrize("chunk", [8, 128])
def test_align_binning_matches_oracle(chunk):
    rng = np.random.default_rng(0)
    for trial in range(8):
        num_tiles = int(rng.integers(1, 40))
        binning = _random_binning(
            rng,
            num_tiles,
            max_per_tile=int(rng.integers(1, 3 * chunk)),
            pad_tail=int(rng.integers(0, 64)),
        )
        aligned = align_binning(binning, chunk=chunk)
        _check_aligned(binning, aligned, chunk)


def test_align_binning_after_cap():
    """cap_binning truncates to a chunk multiple; align of the capped
    binning must still satisfy the layout contract on the capped counts."""
    rng = np.random.default_rng(1)
    chunk = 16
    for trial in range(4):
        binning = _random_binning(rng, 24, max_per_tile=40, pad_tail=32)
        capped = cap_binning(binning, entry_cap=100, chunk=chunk)
        aligned = align_binning(capped, chunk=chunk)
        _check_aligned(capped, aligned, chunk)


def test_align_binning_all_empty():
    binning = _random_binning(np.random.default_rng(2), 10, 0, pad_tail=16)
    aligned = align_binning(binning, chunk=32)
    _check_aligned(binning, aligned, 32)


def test_align_binning_batched():
    rng = np.random.default_rng(3)
    b0 = _random_binning(rng, 12, 20, pad_tail=0)
    b1 = _random_binning(rng, 12, 20, pad_tail=0)
    # equalize entry counts so they stack
    e = max(b0.sorted_splat_ids.shape[0], b1.sorted_splat_ids.shape[0])

    def pad(b):
        n = e - b.sorted_splat_ids.shape[0]
        return b._replace(
            sorted_splat_ids=jnp.pad(b.sorted_splat_ids, (0, n)),
            sorted_tile_ids=jnp.pad(
                b.sorted_tile_ids, (0, n), constant_values=12
            ),
        )

    b0, b1 = pad(b0), pad(b1)
    batched = TileBinning(*[jnp.stack([x, y]) for x, y in zip(b0, b1)])
    aligned = align_binning(batched, chunk=16)
    for f, single in enumerate([b0, b1]):
        one = TileBinning(*[a[f] for a in aligned])
        _check_aligned(single, one, 16)


def test_uniform_pixel_subsample_coverage():
    """Every knob value must keep full-image row AND column coverage
    (the flat stride degenerates at st == train_res or n_px ~ n_total)."""
    res = 64
    n = res * res
    x = jnp.arange(n, dtype=jnp.int32)[None, :, None]  # (1, N, 1) pixel ids
    for n_px in [64, 256, 1024, 3000, 4000, n // 2, n - 100]:
        sub = _uniform_pixel_subsample(n, n_px, res)
        got = np.asarray(sub(x))[0, :, 0]
        assert got.shape[0] == n_px
        rows = got // res
        cols = got % res
        # uniform 2D coverage: samples span (almost) the full image in both
        # axes, and no row/col hogs the budget
        assert rows.max() - rows.min() >= res * 0.75, (n_px, rows.min(), rows.max())
        assert cols.max() - cols.min() >= res * 0.75, (n_px, cols.min(), cols.max())
        _, rc = np.unique(rows, return_counts=True)
        assert rc.max() <= max(4 * n_px // res, 2 * rc.min() + 8)


def test_uniform_pixel_subsample_default_is_strided_slice():
    """The default knob (8192 @ 256^2) must keep the zero-gather slice."""
    res, n_px = 256, 8192
    n = res * res
    sub = _uniform_pixel_subsample(n, n_px, res)
    x = jnp.arange(n, dtype=jnp.int32)[None, :, None]
    got = np.asarray(sub(x))[0, :, 0]
    np.testing.assert_array_equal(got, np.arange(0, n, n // n_px))
