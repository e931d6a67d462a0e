"""Tests for geometry utils, knn, and image losses."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from vidu4d_tpu.ops import geometry as geom
from vidu4d_tpu.ops.knn import mean_knn_sq_dist
from vidu4d_tpu.ops.image_losses import psnr, ssim


@pytest.fixture
def rng():
    return np.random.default_rng(1)


def test_k_matrix_roundtrips(rng):
    K = jnp.array(np.abs(rng.normal(size=(5, 4))) + 1.0)
    Kmat = geom.K2mat(K)
    np.testing.assert_allclose(np.asarray(geom.mat2K(Kmat)), np.asarray(K))
    Kinv = geom.K2inv(K)
    prod = jnp.einsum("bij,bjk->bik", Kmat, Kinv)
    np.testing.assert_allclose(
        np.asarray(prod), np.tile(np.eye(3), (5, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(geom.Kmatinv(Kmat)), np.asarray(Kinv), atol=1e-6
    )


def test_pinhole_projection(rng):
    K = jnp.array([[500.0, 500.0, 128.0, 128.0]])
    Kmat = geom.K2mat(K)
    pts = jnp.array([[[0.0, 0.0, 2.0], [0.1, -0.2, 4.0]]])
    hxy = geom.pinhole_projection(Kmat, pts)
    np.testing.assert_allclose(
        np.asarray(hxy[0, 0]), [128.0, 128.0, 1.0], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(hxy[0, 1, :2]),
        [500 * 0.1 / 4 + 128, 500 * -0.2 / 4 + 128],
        atol=1e-3,
    )


def test_so3_exp_map_matches_scipy(rng):
    v = rng.normal(size=(16, 3))
    got = np.asarray(geom.so3_to_exp_map(jnp.array(v)))
    want = R.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hat_map():
    v = jnp.array([[1.0, 2.0, 3.0]])
    V = np.asarray(geom.hat_map(v))[0]
    x = np.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(V @ x, np.cross([1, 2, 3.0], x), atol=1e-6)


def test_near_far(rng):
    pts = jnp.array(rng.normal(size=(100, 3)))
    # camera looking at origin from z=-5 (object at +5 in cam coords)
    rt = np.eye(4)[None].repeat(2, axis=0)
    rt[:, 2, 3] = 5.0
    nf = np.asarray(geom.get_near_far(pts, jnp.array(rt)))
    assert nf.shape == (2, 2)
    assert (nf[:, 0] < nf[:, 1]).all()
    assert (nf[:, 0] >= 1e-3).all()
    z = np.asarray(pts)[:, 2] + 5
    assert nf[0, 0] <= z.min() and nf[0, 1] >= z.max()


def test_hxy_grid():
    g = np.asarray(geom.hxy_grid(2, 3))
    assert g.shape == (6, 3)
    np.testing.assert_allclose(g[0], [0, 0, 1])
    np.testing.assert_allclose(g[5], [2, 1, 1])


def test_mean_knn_sq_dist_matches_bruteforce(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    got = np.asarray(mean_knn_sq_dist(jnp.array(pts), k=3, chunk_size=128))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ssim_identity_and_noise(rng):
    img = jnp.array(rng.uniform(size=(3, 64, 64)).astype(np.float32))
    assert float(ssim(img, img)) > 0.9999
    noisy = img + 0.2 * jnp.array(rng.normal(size=(3, 64, 64)).astype(np.float32))
    assert float(ssim(img, noisy)) < 0.9


def test_psnr():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-3)
