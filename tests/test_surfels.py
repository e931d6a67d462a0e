"""Surfel store, densification, optimizer, and ply I/O tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.models.gaussian import densify as dn
from vidu4d_tpu.models.gaussian import surfels as sf
from vidu4d_tpu.models.gaussian.optimizer import (
    GsLearningRates,
    expon_lr,
    gs_adam_init,
    gs_adam_update,
)
from vidu4d_tpu.models.gaussian.ply_io import load_ply, save_ply


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def make_state(rng, n=32, capacity=64, sh_degree=1):
    pts = jnp.array(rng.normal(size=(n, 3)), jnp.float32)
    cols = jnp.array(rng.uniform(size=(n, 3)), jnp.float32)
    return sf.init_from_points(pts, cols, capacity, sh_degree=sh_degree)


def test_init_from_points(rng):
    state = make_state(rng)
    assert state.capacity == 64
    assert int(state.num_alive()) == 32
    assert state.params.features_rest.shape == (64, 3, 3)  # deg1: 4-1 coeffs... no: (deg+1)^2-1 = 3
    np.testing.assert_allclose(
        np.asarray(sf.get_opacity(state.params))[:32], 0.1, atol=1e-5
    )
    # scales positive and finite
    s = np.asarray(sf.get_scaling(state.params))[:32]
    assert np.isfinite(s).all() and (s > 0).all()


def test_adam_moves_params(rng):
    state = make_state(rng)
    adam = gs_adam_init(state.params)
    grads = jax.tree.map(jnp.ones_like, state.params)
    new_params, adam2 = gs_adam_update(grads, adam, state.params, GsLearningRates())
    assert int(adam2.count) == 1
    # xyz moved by approximately its lr in the negative direction
    delta = np.asarray(new_params.xyz - state.params.xyz)
    assert (delta < 0).all()
    # rotation lr != xyz lr
    d_rot = np.abs(np.asarray(new_params.rotation - state.params.rotation)).mean()
    d_xyz = np.abs(delta).mean()
    assert not np.isclose(d_rot, d_xyz)


def test_expon_lr_schedule():
    lr0 = float(expon_lr(0, 1e-2, 1e-4, max_steps=100))
    lr_mid = float(expon_lr(50, 1e-2, 1e-4, max_steps=100))
    lr_end = float(expon_lr(100, 1e-2, 1e-4, max_steps=100))
    assert abs(lr0 - 1e-2) < 1e-6
    assert abs(lr_end - 1e-4) < 1e-7
    assert abs(lr_mid - 1e-3) < 1e-6  # geometric midpoint


def test_densify_clone_and_split(rng):
    state = make_state(rng, n=16, capacity=64)
    adam = gs_adam_init(state.params)
    # force: splat 0 hot+small (clone), splat 1 hot+big (split)
    scaling = state.params.scaling
    scaling = scaling.at[0].set(jnp.log(0.001))
    scaling = scaling.at[1].set(jnp.log(10.0))
    state = state._replace(params=state.params._replace(scaling=scaling))
    state = state._replace(
        grad_accum=state.grad_accum.at[0].set(1.0).at[1].set(1.0),
        denom=state.denom.at[0].set(1.0).at[1].set(1.0),
    )
    # put junk in adam moments to verify new rows get zeroed
    adam = adam._replace(mu=jax.tree.map(lambda x: x + 7.0, adam.mu))

    new_state, new_adam, info = dn.densify_and_prune(
        state, adam, jax.random.PRNGKey(0), extent=1.0,
        config=dn.DensifyConfig(grad_threshold=0.5, min_opacity=0.0),
    )
    assert int(info["cloned"]) == 1
    assert int(info["split"]) == 1
    # 16 initial - 1 split original + 1 clone + 2 children = 18
    assert int(info["alive"]) == 18
    # 3 new rows (1 clone + 2 split children) were written with zeroed Adam
    # moments; slot reuse is allowed, so identify them via the zeroed mu.
    mu = np.asarray(new_adam.mu.xyz)
    alive = np.asarray(new_state.alive)
    fresh = alive & (np.abs(mu).sum(-1) == 0)
    assert fresh.sum() == 3
    # the split original's children carry its (big) scaling shrunk by 1/1.6
    child_scales = np.exp(np.asarray(new_state.params.scaling)[fresh])
    big_children = np.isclose(child_scales, 10.0 / 1.6, rtol=1e-4).all(-1)
    assert big_children.sum() == 2
    # stats reset
    assert float(jnp.sum(new_state.grad_accum)) == 0.0


def test_densify_prune_opacity(rng):
    state = make_state(rng, n=16, capacity=32)
    adam = gs_adam_init(state.params)
    opac = state.params.opacity.at[3].set(sf.inverse_sigmoid(jnp.asarray(0.001)))
    state = state._replace(params=state.params._replace(opacity=opac))
    new_state, _, info = dn.densify_and_prune(
        state, adam, jax.random.PRNGKey(0), extent=1.0,
    )
    assert int(info["pruned"]) == 1
    assert not bool(new_state.alive[3])
    assert int(info["alive"]) == 15


def test_capacity_overflow_drops_children(rng):
    state = make_state(rng, n=16, capacity=17)
    adam = gs_adam_init(state.params)
    state = state._replace(
        grad_accum=jnp.ones_like(state.grad_accum),
        denom=jnp.ones_like(state.denom),
    )
    new_state, _, info = dn.densify_and_prune(
        state, adam, jax.random.PRNGKey(0), extent=1e9,  # everything "small" -> clone
        config=dn.DensifyConfig(grad_threshold=0.5, min_opacity=0.0),
    )
    assert int(info["cloned"]) == 16
    assert int(info["dropped_children"]) == 15  # only one dead slot available
    assert int(info["alive"]) == 17


def test_reset_opacity(rng):
    state = make_state(rng)
    adam = gs_adam_init(state.params)
    adam = adam._replace(nu=jax.tree.map(lambda x: x + 1.0, adam.nu))
    state2, adam2 = dn.reset_opacity(state, adam)
    op = np.asarray(sf.get_opacity(state2.params))[:32]
    assert (op <= 0.01 + 1e-6).all()
    assert (np.asarray(adam2.nu.opacity) == 0).all()
    assert (np.asarray(adam2.nu.xyz) == 1.0).all()


def test_radius_outlier_mask(rng):
    # a tight cluster + one far-away point
    pts = np.concatenate(
        [rng.normal(size=(50, 3)) * 0.001, np.array([[10.0, 10, 10]])]
    ).astype(np.float32)
    alive = jnp.ones((51,), bool)
    mask = dn.radius_outlier_mask(jnp.array(pts), alive, nb_points=20, radius=0.01)
    assert bool(mask[50])
    assert not np.asarray(mask[:50]).any()


def test_ply_roundtrip(rng, tmp_path):
    state = make_state(rng, n=20, capacity=32, sh_degree=2)
    path = os.path.join(tmp_path, "point_cloud.ply")
    save_ply(path, jax.tree.map(np.asarray, state.params), np.asarray(state.alive))
    loaded, n = load_ply(path)
    assert n == 20
    for field in sf.SurfelParams._fields:
        if field == "regist_feat":
            continue
        a = np.asarray(getattr(state.params, field))[:20]
        b = getattr(loaded, field)
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=field)
