"""Learned monodepth U-Net (the ZoeDepth slot, trained in-repo)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.preprocess.depthnet import (
    DepthNet, align_affine, depth_loss, disparity_to_depth, load_weights,
    save_weights, ssi_mae,
)


def test_depthnet_shapes_and_loss_grad():
    model = DepthNet(width=8)
    rgb = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 32, 32, 3)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), rgb)
    disp = model.apply(params, rgb)
    assert disp.shape == (2, 32, 32)
    assert bool(jnp.all(disp >= 0))

    gt = jnp.asarray(np.random.default_rng(1).uniform(0.5, 4.0, (2, 32, 32)),
                     jnp.float32)
    mask = jnp.ones((2, 32, 32))
    loss, grads = jax.value_and_grad(
        lambda p: depth_loss(model.apply(p, rgb), gt, mask)
    )(params)
    assert np.isfinite(float(loss))
    gn = float(jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))))
    assert np.isfinite(gn) and gn > 0


def test_ssi_alignment_invariance():
    """SSI-MAE is zero for any affine transform of the GT disparity."""
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0.2, 2.0, (3, 16, 16)), jnp.float32)
    mask = jnp.ones_like(gt)
    pred = 3.7 * gt - 1.2
    np.testing.assert_allclose(float(ssi_mae(pred, gt, mask)), 0.0, atol=1e-5)
    s, t = align_affine(pred, gt, mask)
    np.testing.assert_allclose(np.asarray(s), 1 / 3.7, rtol=1e-4)

    d = disparity_to_depth(pred)
    assert float(d.min()) >= 0.5 - 1e-4 and float(d.max()) <= 4.0 + 1e-4


def test_depthnet_weights_roundtrip(tmp_path):
    model = DepthNet(width=8)
    rgb = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), rgb)
    p = os.path.join(str(tmp_path), "w.npz")
    save_weights(p, params)
    loaded = load_weights(p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_estimate_depth_auto_backend(tmp_path, monkeypatch):
    """estimate_depth(auto) routes through the net when weights exist."""
    from vidu4d_tpu.preprocess import depth as depth_mod

    model = DepthNet(width=8)
    rgb = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), rgb)
    p = os.path.join(str(tmp_path), "w.npz")
    save_weights(p, params)
    monkeypatch.setenv("VIDU4D_DEPTHNET_NPZ", p)

    # width=8 differs from the default DepthNet(); monkeypatch the ctor so
    # the backend builds the matching architecture
    monkeypatch.setattr(depth_mod, "_depthnet_backend",
                        lambda: (model, load_weights(p)))
    frames = np.random.default_rng(0).uniform(size=(2, 20, 20)).astype(
        np.float32)
    d = depth_mod.estimate_depth(frames, backend="auto")
    assert d.shape == (2, 20, 20) and d.dtype == np.float16
    assert np.isfinite(d.astype(np.float32)).all()
    assert d.astype(np.float32).min() >= 0.4


def test_ranking_loss_orders():
    """Perfectly ordered disparity -> ~0; inverted ordering -> large."""
    from vidu4d_tpu.preprocess.depthnet import ranking_loss

    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.5, 4.0, (2, 16, 16)), jnp.float32)
    mask = jnp.ones_like(depth)
    key = jax.random.PRNGKey(0)
    good = 1.0 / depth          # correct order, big margin
    bad = depth                 # inverted order
    lg = float(ranking_loss(good, depth, mask, key))
    lb = float(ranking_loss(bad, depth, mask, key))
    # correctly-ordered close pairs still pay a sliver of the margin hinge
    assert lg < 0.1 and lg < lb / 5, (lg, lb)
    assert lb > 0.3, lb
    # gradient flows
    g = jax.grad(lambda p: ranking_loss(p, depth, mask, key))(bad)
    assert float(jnp.abs(g).max()) > 0
