"""Stage-2 optimizer: AdamW + per-parameter learning-rate groups + OneCycle.

Mirrors `lab4d/engine/trainer.py:139-286`: base AdamW(lr, wd=1e-4) with a
x10 multiplier for "explicit" parameters (logibeta/logsigma/logscale/
log_gauss/base_quat/base_logfocal/base_ppoint/trans_scaling), an
intrinsics_lr_mult group, grad-clip at 5.0 (`trainer.py:861-884` check_grad),
and a linear OneCycle schedule (warmup 2 rounds, div_factor 25).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

EXPLICIT_PARAM_NAMES = (
    "logibeta",
    "logsigma",
    "logscale",
    "log_gauss",
    "base_quat",
    "base_logfocal",
    "base_ppoint",
    "trans_scaling",
    # stage-3 learnable background: the reference trains bg_rgb in its GS
    # Adam at feature_lr=2.5e-3 (trainer.py:254-255) — 5x the base LR; at
    # base LR it never reaches the scene background within a schedule
    "bg_color",
)


def lr_multiplier_tree(params, explicit_mult: float = 10.0,
                       intrinsics_mult: float = 1.0):
    """Per-leaf LR multipliers keyed on parameter path names."""

    def mult_for_path(path):
        keys = [getattr(p, "key", str(p)) for p in path]
        mult = 1.0
        if any(k in EXPLICIT_PARAM_NAMES for k in keys):
            mult = explicit_mult
        if any(k == "intrinsics" for k in keys):
            mult = mult * intrinsics_mult
        return mult

    return jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.asarray(mult_for_path(path), jnp.float32), params
    )


def scale_by_tree(mult_tree) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, mult_tree), state

    return optax.GradientTransformation(init_fn, update_fn)


def onecycle_linear(lr: float, total_steps: int, num_rounds: int,
                    is_resumed: bool = False):
    """Linear OneCycle matching torch OneCycleLR usage (`trainer.py:262-286`)."""
    if is_resumed:
        div_factor, final_div, pct_start = 1.0, 5.0, 1e-6
    else:
        div_factor, final_div, pct_start = 25.0, 1.0, 2.0 / max(num_rounds, 2)
    initial = lr / div_factor
    final = initial / final_div
    warmup = max(int(total_steps * pct_start), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = initial + (lr - initial) * jnp.clip(step / warmup, 0, 1)
        down_t = jnp.clip((step - warmup) / jnp.maximum(total_steps - warmup, 1), 0, 1)
        down = lr + (final - lr) * down_t
        return jnp.where(step < warmup, up, down)

    return schedule


def make_stage2_optimizer(
    params,
    learning_rate: float,
    total_steps: int,
    num_rounds: int,
    intrinsics_lr_mult: float = 1.0,
    weight_decay: float = 1e-4,
    grad_clip: float = 5.0,
    is_resumed: bool = False,
) -> optax.GradientTransformation:
    mult_tree = lr_multiplier_tree(params, intrinsics_mult=intrinsics_lr_mult)
    schedule = onecycle_linear(learning_rate, total_steps, num_rounds, is_resumed)
    return optax.chain(
        optax.zero_nans(),  # one NaN leaf must not poison the global clip
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=0.9, b2=0.999),
        optax.add_decayed_weights(weight_decay),
        scale_by_tree(mult_tree),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )
