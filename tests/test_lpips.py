"""LPIPS metric (pure-JAX VGG16; `gs/lpipsPyTorch/__init__.py:1-21`)."""

import numpy as np

from vidu4d_tpu.ops.lpips import LPIPS


def test_lpips_basic_properties():
    m = LPIPS()
    assert m.kind == "vgg16-random-pinned"  # no pretrained weights on disk
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)

    d_self = m(img, img)
    assert abs(d_self) < 1e-6

    d_small = m(img, np.clip(img + 0.05 * rng.normal(size=img.shape), 0, 1))
    d_large = m(img, np.clip(img + 0.4 * rng.normal(size=img.shape), 0, 1))
    assert 0 < d_small < d_large

    # deterministic across instances (pinned fallback weights)
    m2 = LPIPS()
    assert abs(m(img, img * 0.5) - m2(img, img * 0.5)) < 1e-6


def test_metrics_cli_reports_lpips(tmp_path):
    import imageio.v2 as imageio

    from vidu4d_tpu.metrics import compute_metrics, load_images

    rng = np.random.default_rng(1)
    a = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    for d in ("pred", "gt"):
        (tmp_path / d).mkdir()
    imageio.imwrite(str(tmp_path / "pred" / "0.png"), a)
    imageio.imwrite(str(tmp_path / "gt" / "0.png"), a)
    out = compute_metrics(
        load_images(str(tmp_path / "pred")), load_images(str(tmp_path / "gt"))
    )
    # fallback weights report under lpips_random; "lpips" stays None so
    # nobody compares the random-VGG number against published LPIPS(vgg)
    assert out["lpips"] is None
    assert out["lpips_random"] is not None and out["lpips_random"] < 1e-6
    assert out["lpips_kind"] == "vgg16-random-pinned"
    assert out["psnr"] > 40
