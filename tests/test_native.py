"""Native batch sampler: correctness vs numpy fallback."""

import numpy as np

from vidu4d_tpu.data.native import gather_pixels, load_library


def test_native_gather_matches_numpy():
    rng = np.random.default_rng(0)
    for dtype in (np.float16, np.float32):
        src = rng.uniform(size=(10, 32, 48, 3)).astype(dtype)
        fids = rng.integers(0, 10, size=64).astype(np.int32)
        xy = np.stack(
            [rng.integers(0, 48, size=(64, 16)),
             rng.integers(0, 32, size=(64, 16))], axis=-1
        ).astype(np.int32)
        out = gather_pixels(src, fids, xy)
        want = src[fids[:, None], xy[..., 1], xy[..., 0]].astype(np.float32)
        np.testing.assert_allclose(out, want, atol=0, rtol=0)


def test_library_loads_or_falls_back():
    # either the native library compiled, or the numpy fallback handles it —
    # both paths exercised by test_native_gather_matches_numpy
    load_library()
