"""Numerical helpers shared across the framework."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_norm(x: jax.Array, axis=-1, keepdims: bool = False,
              eps: float = 1e-12) -> jax.Array:
    """L2 norm with a zero subgradient at x = 0.

    `jnp.linalg.norm` backpropagates NaN at exactly zero (0/0); torch defines
    the subgradient there as 0, and the reference's losses rely on that
    (e.g. cycle distance of points whose warp cycles exactly,
    `deformable.py:222`). sqrt(max(sum(x^2), eps^2)) reproduces torch's
    behavior: the max clamp zeroes the gradient below eps.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def safe_normalize(x: jax.Array, axis=-1, eps: float = 1e-12) -> jax.Array:
    """x / ||x|| with NaN-free gradients at 0 (returns ~0 there)."""
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)
