"""RAFT-small flow net (learned VCN+ replacement, `compute_flow.py:36-169`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.preprocess.raft import RaftSmall


@pytest.mark.slow
def test_raft_shapes_and_shift_direction():
    """An un-trained net runs end to end with the right shapes; after a few
    supervised steps on a constant-shift pair it moves toward the target."""
    import optax

    model = RaftSmall(iters=2)
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    shift = 3  # img2 = img1 shifted right by 3 px -> flow x = +3... (backward warp convention)
    img2 = jnp.roll(img1, shift, axis=2)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    out = model.apply(params, img1, img2)
    assert out.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()

    gt = jnp.full((1, 32, 32, 2), 0.0).at[..., 0].set(float(shift))
    opt = optax.adam(1e-3)
    st = opt.init(params)

    @jax.jit
    def step(p, st):
        def loss(p):
            preds = model.apply(p, img1, img2, all_iters=True)
            return sum(jnp.mean(jnp.abs(f - gt)) for f in preds)
        l, g = jax.value_and_grad(loss)(p)
        up, st2 = opt.update(g, st)
        return optax.apply_updates(p, up), st2, l

    l0 = None
    for i in range(8):
        params, st, l = step(params, st)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0  # learning signal flows through the whole net


def test_flow_backend_fallback_is_lk(monkeypatch):
    """Without trained weights compute_flow_pairs uses the LK fallback."""
    import vidu4d_tpu.preprocess.flow as F

    monkeypatch.setenv("VIDU4D_FLOW_BACKEND", "lk")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)), jnp.float32)
    fw, bw = F.compute_flow_pairs(frames, 1, levels=2)
    assert fw.shape == (2, 16, 16, 3) and bw.shape == (2, 16, 16, 3)
