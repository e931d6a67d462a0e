"""Densification / pruning / opacity reset on the fixed-capacity store.

Replicates the reference recipe (`gs/scene/gaussian_model.py:384-448`,
orchestrated from `gs/train.py:115-127` and `lab4d/engine/trainer.py:549-588`)
as pure jittable functions:

  clone  — grad >= thr and max(scale) <= percent_dense·extent → copy
  split  — grad >= thr and max(scale) >  percent_dense·extent → 2 children
           sampled from N(0, diag(s)) in the splat frame, scales /(0.8·N),
           original dies
  prune  — opacity < min_opacity, plus (when size_threshold active)
           screen radius > threshold or world scale > 0.1·extent

Instead of concatenating tensors + Adam-state surgery, children are scattered
into dead slots (capacity permitting — overflow children are dropped and
counted) and the corresponding Adam moment rows are zeroed, which is exactly
what zero-initialized appended state means in the reference. All stats reset
afterwards, as in `densification_postfix`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vidu4d_tpu.models.gaussian.optimizer import GsAdamState
from vidu4d_tpu.models.gaussian.surfels import (
    SurfelParams,
    SurfelState,
    get_opacity,
    get_rotation,
    get_scaling,
    inverse_sigmoid,
)
from vidu4d_tpu.ops.quaternion import quaternion_to_matrix


class DensifyConfig(NamedTuple):
    grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    percent_dense: float = 0.01
    split_n: int = 2  # reference N=2
    scale_shrink: float = 0.8  # children scale divisor = scale_shrink * N


def _write_rows(tree, slots: jax.Array, values, write: jax.Array, capacity: int):
    """Scatter rows of `values` (same pytree structure) into `tree` at `slots`
    where `write`; out-of-capacity writes are dropped."""
    idx = jnp.where(write, slots, capacity)

    def w(dst, src):
        return dst.at[idx].set(src, mode="drop")

    return jax.tree.map(w, tree, values)


def _zero_rows(tree, slots: jax.Array, write: jax.Array, capacity: int):
    idx = jnp.where(write, slots, capacity)

    def w(dst):
        return dst.at[idx].set(jnp.zeros_like(dst[:1]), mode="drop")

    return jax.tree.map(w, tree)


def densify_and_prune(
    state: SurfelState,
    adam: GsAdamState,
    key: jax.Array,
    extent: float,
    max_screen_size: float = 0.0,
    config: DensifyConfig = DensifyConfig(),
) -> Tuple[SurfelState, GsAdamState, dict]:
    """One densify+prune pass. Returns (state, adam_state, info dict)."""
    p = state.params
    cap = state.capacity
    alive = state.alive

    grads = state.grad_accum / jnp.maximum(state.denom, 1e-12)
    grads = jnp.where(jnp.isnan(grads) | (state.denom == 0), 0.0, grads)

    scaling = get_scaling(p)  # (N, 2)
    max_scale = jnp.max(scaling, axis=-1)
    opacity = get_opacity(p)[:, 0]

    hot = alive & (grads >= config.grad_threshold)
    small = max_scale <= config.percent_dense * extent
    clone_mask = hot & small
    split_mask = hot & ~small

    # prune rules on existing splats
    prune = opacity < config.min_opacity
    if max_screen_size > 0:
        prune = prune | (state.max_radii2d > max_screen_size) | (
            max_scale > 0.1 * extent
        )
    alive_after = alive & ~split_mask & ~prune

    # ---- children -------------------------------------------------------
    n_child = config.split_n  # children per parent slot (clone uses child 0)
    # split child positions: x + R @ sample, sample ~ N(0, diag(sx, sy, 0))
    noise = jax.random.normal(key, (cap, n_child, 2), dtype=p.xyz.dtype)
    samples3 = jnp.concatenate(
        [noise * scaling[:, None, :], jnp.zeros((cap, n_child, 1), p.xyz.dtype)],
        axis=-1,
    )
    rot = quaternion_to_matrix(get_rotation(p))  # (N, 3, 3)
    split_xyz = p.xyz[:, None, :] + jnp.einsum("nij,ncj->nci", rot, samples3)
    split_scaling = jnp.log(scaling / (config.scale_shrink * n_child))

    # child prune check (children have zero radii, so only opacity/world-size)
    child_prune = opacity < config.min_opacity
    if max_screen_size > 0:
        child_prune_split = child_prune | (
            jnp.max(jnp.exp(split_scaling), axis=-1) > 0.1 * extent
        )
        child_prune_clone = child_prune | (max_scale > 0.1 * extent)
    else:
        child_prune_split = child_prune
        child_prune_clone = child_prune

    def child_values(c: int) -> SurfelParams:
        is_clone_slot = (c == 0)
        xyz = jnp.where(
            (clone_mask if is_clone_slot else jnp.zeros_like(clone_mask))[:, None],
            p.xyz,
            split_xyz[:, c],
        )
        scale = jnp.where(
            (clone_mask if is_clone_slot else jnp.zeros_like(clone_mask))[:, None],
            p.scaling,
            split_scaling,
        )
        return p._replace(xyz=xyz, scaling=scale)

    child_valid = []
    child_params = []
    for c in range(n_child):
        if c == 0:
            valid_c = (clone_mask & ~child_prune_clone) | (
                split_mask & ~child_prune_split
            )
        else:
            valid_c = split_mask & ~child_prune_split
        child_valid.append(valid_c)
        child_params.append(child_values(c))

    valid_flat = jnp.concatenate(child_valid)  # (n_child*N,)
    params_flat = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0), *child_params
    )

    # ---- placement into dead slots --------------------------------------
    dead_order = jnp.argsort(alive_after)  # dead slots first (stable)
    num_dead = cap - jnp.sum(alive_after.astype(jnp.int32))
    rank = jnp.cumsum(valid_flat.astype(jnp.int32)) - 1
    write = valid_flat & (rank < num_dead)
    slots = dead_order[jnp.clip(rank, 0, cap - 1)]

    new_params = _write_rows(p, slots, params_flat, write, cap)
    new_alive = alive_after.at[jnp.where(write, slots, cap)].set(True, mode="drop")
    new_mu = _zero_rows(adam.mu, slots, write, cap)
    new_nu = _zero_rows(adam.nu, slots, write, cap)

    zeros = jnp.zeros_like(state.grad_accum)
    new_state = SurfelState(
        params=new_params,
        alive=new_alive,
        max_radii2d=zeros,
        grad_accum=zeros,
        denom=zeros,
    )
    info = {
        "cloned": jnp.sum(clone_mask.astype(jnp.int32)),
        "split": jnp.sum(split_mask.astype(jnp.int32)),
        "pruned": jnp.sum((alive & prune).astype(jnp.int32)),
        "dropped_children": jnp.sum((valid_flat & ~write).astype(jnp.int32)),
        "alive": jnp.sum(new_alive.astype(jnp.int32)),
    }
    return new_state, adam._replace(mu=new_mu, nu=new_nu), info


def reset_opacity(
    state: SurfelState, adam: GsAdamState, ceiling: float = 0.01
) -> Tuple[SurfelState, GsAdamState]:
    """Clamp opacity to <= ceiling and zero its Adam moments
    (`gaussian_model.py:222-226`)."""
    new_op = inverse_sigmoid(jnp.minimum(get_opacity(state.params), ceiling))
    params = state.params._replace(opacity=new_op)
    mu = adam.mu._replace(opacity=jnp.zeros_like(adam.mu.opacity))
    nu = adam.nu._replace(opacity=jnp.zeros_like(adam.nu.opacity))
    return state._replace(params=params), adam._replace(mu=mu, nu=nu)


def prune_by_mask(
    state: SurfelState, prune_mask: jax.Array
) -> SurfelState:
    """External pruning hook (e.g. radius-outlier pruning,
    `lab4d/engine/trainer.py:576-588`)."""
    return state._replace(alive=state.alive & ~prune_mask)


def radius_outlier_mask(
    xyz: jax.Array, alive: jax.Array, nb_points: int = 20, radius: float = 0.004,
    chunk_size: int = 1024,
) -> jax.Array:
    """Device-side radius-outlier detection (replaces the reference's
    open3d CPU round-trip, `trainer.py:573-588`): a splat is an outlier if
    fewer than `nb_points` alive neighbors lie within `radius`."""
    n = xyz.shape[0]
    pad = (-n) % chunk_size
    big = jnp.asarray(1e18, xyz.dtype)
    xyz_pad = jnp.concatenate([xyz, jnp.full((pad, 3), big)], axis=0)
    alive_f = alive.astype(xyz.dtype)

    def chunk_fn(q):
        d2 = (
            jnp.sum(q * q, axis=-1, keepdims=True)
            + jnp.sum(xyz * xyz, axis=-1)[None, :]
            - 2.0 * jnp.dot(q, xyz.T, preferred_element_type=jnp.float32)
        )
        within = (d2 <= radius * radius).astype(xyz.dtype) * alive_f[None, :]
        return jnp.sum(within, axis=-1)

    counts = jax.lax.map(chunk_fn, xyz_pad.reshape(-1, chunk_size, 3)).reshape(-1)[:n]
    # exclude self (always within radius)
    return alive & ((counts - 1.0) < nb_points)
