"""Per-field Adam for the surfel store (replaces the reference's torch Adam
with per-tensor param groups, `lab4d/engine/trainer.py:240-255`).

A minimal hand-rolled Adam (eps 1e-15, like the reference) whose moments are
plain SurfelParams pytrees: densify/prune can write rows into mu/nu directly
instead of the reference's `_prune_optimizer`/`cat_tensors_to_optimizer`
state surgery. The xyz field uses the 3DGS exponential log-lerp schedule.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vidu4d_tpu.models.gaussian.surfels import SurfelParams


class GsLearningRates(NamedTuple):
    """Defaults = reference `gs/arguments/__init__.py` OptimizationParams."""

    xyz_init: float = 0.00016
    xyz_final: float = 0.0000016
    xyz_delay_mult: float = 0.01
    xyz_max_steps: int = 30_000
    spatial_scale: float = 1.0  # multiplies xyz lr (cameras extent)
    features_dc: float = 0.0025
    features_rest: float = 0.0025 / 20.0
    opacity: float = 0.05
    scaling: float = 0.005
    rotation: float = 0.001
    regist_feat: float = 0.0


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000):
    """3DGS log-lerp learning-rate schedule."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        math.log(max(lr_init, 1e-30)) * (1 - t) + math.log(max(lr_final, 1e-30)) * t
    )
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    return delay * log_lerp


def field_lrs(lrs: GsLearningRates, step) -> SurfelParams:
    """Per-field learning rates at `step`, as a SurfelParams of scalars."""
    xyz_lr = expon_lr(
        step,
        lrs.xyz_init * lrs.spatial_scale,
        lrs.xyz_final * lrs.spatial_scale,
        lr_delay_mult=lrs.xyz_delay_mult,
        max_steps=lrs.xyz_max_steps,
    )
    f = jnp.float32
    return SurfelParams(
        xyz=xyz_lr,
        features_dc=f(lrs.features_dc),
        features_rest=f(lrs.features_rest),
        scaling=f(lrs.scaling),
        rotation=f(lrs.rotation),
        opacity=f(lrs.opacity),
        regist_feat=f(lrs.regist_feat),
    )


class GsAdamState(NamedTuple):
    count: jax.Array  # () int32
    mu: SurfelParams
    nu: SurfelParams


def gs_adam_init(params: SurfelParams) -> GsAdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return GsAdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=zeros)


def gs_adam_update(
    grads: SurfelParams,
    state: GsAdamState,
    params: SurfelParams,
    lrs: GsLearningRates,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step with per-field learning rates. Returns (params, state)."""
    count = state.count + 1
    lr_tree = field_lrs(lrs, count.astype(jnp.float32))
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def upd(g, m, v, p, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g * g)
        step = lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
        return p - step, m, v

    res = [
        upd(
            getattr(grads, f), getattr(state.mu, f), getattr(state.nu, f),
            getattr(params, f), getattr(lr_tree, f),
        )
        for f in SurfelParams._fields
    ]
    new_params = SurfelParams(*[r[0] for r in res])
    new_mu = SurfelParams(*[r[1] for r in res])
    new_nu = SurfelParams(*[r[2] for r in res])
    return new_params, GsAdamState(count=count, mu=new_mu, nu=new_nu)
