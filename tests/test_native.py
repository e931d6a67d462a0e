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


def test_loader_native_path_matches_numpy(tmp_path):
    """read_raw via the native gather == the numpy gather path."""
    import os

    from tests.helpers import make_fake_db
    from vidu4d_tpu.data import data_utils, native

    if native.load_library() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    opts = {"dataroot": db, "seqname": "toy", "data_prefix": "crop",
            "train_res": 16, "pixels_per_image": 8}
    ds = data_utils.build_datasets(opts)[0]
    rng = np.random.default_rng(0)
    xy = rng.integers(0, 16, size=(8, 2)).astype(np.int32)

    out_native = ds.read_raw(2, 1, xy)
    os.environ["VIDU4D_NATIVE_SAMPLER"] = "0"
    try:
        out_numpy = ds.read_raw(2, 1, xy)
    finally:
        del os.environ["VIDU4D_NATIVE_SAMPLER"]

    assert set(out_native) == set(out_numpy)
    for k in out_numpy:
        np.testing.assert_allclose(
            np.asarray(out_native[k]), np.asarray(out_numpy[k]),
            atol=1e-6, err_msg=k,
        )
