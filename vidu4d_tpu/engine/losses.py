"""Loss assembly: reconstruction + regularization + masking + weighting.

Pure-functional mirror of `lab4d/engine/model.py:549-1012`
(compute_recon_loss / compute_reg_loss / mask_losses / apply_loss_weights),
operating on dicts of jnp arrays so the whole thing jits inside the train
step. Masking rules, the positive/negative mask balancing, and the
nonzero-mean reduction all match the reference.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.numerics import safe_norm, safe_normalize

# masking rule groups (`model.py:910-919`)
KEYS_IGNORE_MASKING = ("reg_gauss_mask",)
KEYS_ALLPIX = ("mask",)
KEYS_FG = ("feature", "feat_reproj")
KEYS_TYPE_SPECIFIC = ("rgb", "depth", "flow", "vis", "rgb_ssim")
KEYS_MASK_NOT_DETECTED = ("mask", "feature", "feat_reproj")
PX_UNIT_KEYS = ("flow", "feat_reproj")


def get_mask_balance_wt(mask, vis2d, is_detected):
    """Balance positive/negative mask pixels (`model.py:586-611`)."""
    mask = mask.astype(jnp.float32)
    extra = (1,) * (mask.ndim - 1)
    vis2d = vis2d.astype(jnp.float32) * is_detected.astype(jnp.float32).reshape(
        (-1,) + extra
    )
    pos_px = jnp.sum(mask * (vis2d > 0))
    neg_px = jnp.sum((1 - mask) * (vis2d > 0))
    total = jnp.sum(vis2d)
    pos_wt = total / jnp.maximum(pos_px, 1e-6)
    neg_wt = total / jnp.maximum(neg_px, 1e-6)
    balanced = 0.5 * pos_wt * mask + 0.5 * neg_wt * (1 - mask)
    usable = (jnp.sum(mask) > 0) & (jnp.sum(1 - mask) > 0)
    return jnp.where(usable, balanced, jnp.ones_like(balanced))


def compute_recon_loss(rendered: Dict, aux_dict: Dict, batch: Dict, config: Dict):
    """Reconstruction losses (`model.py:614-801`), dense per-pixel terms."""
    loss_dict = {}
    field_type = config["field_type"]

    if field_type == "fg":
        rendered_fg_mask = rendered["mask"]
    elif field_type == "comp":
        rendered_fg_mask = rendered["mask_fg"]
    else:
        rendered_fg_mask = None

    mask_balance_wt = get_mask_balance_wt(
        batch["mask"], batch["vis2d"], batch["is_detected"]
    )
    gt_mask = batch["mask"].astype(jnp.float32)
    if field_type == "bg":
        loss_dict["mask"] = (rendered["mask"] - 1.0) ** 2
    elif field_type == "fg":
        loss_dict["mask"] = ((rendered_fg_mask - gt_mask) ** 2) * mask_balance_wt
    elif field_type == "comp":
        loss_dict["mask"] = ((rendered_fg_mask - gt_mask) ** 2) * mask_balance_wt
        loss_dict["mask"] = loss_dict["mask"] + (rendered["mask"] - 1.0) ** 2
    else:
        raise ValueError(field_type)

    if field_type in ("fg", "comp") and "fg" in aux_dict:
        fg_aux = aux_dict["fg"]
        if "feature" in fg_aux and fg_aux["feature"].shape[-1] > 0:
            loss_dict["feature"] = safe_norm(
                fg_aux["feature"] - batch["feature"], axis=-1, keepdims=True
            )
        if "xy_reproj" in fg_aux:
            loss_dict["feat_reproj"] = safe_norm(
                fg_aux["xy_reproj"] - batch["hxy"][..., :2], axis=-1, keepdims=True
            )

    loss_dict["rgb"] = (rendered["rgb"] - batch["rgb"]) ** 2
    loss_dict["depth"] = safe_norm(
        rendered["depth"] - batch["depth"], axis=-1, keepdims=True
    )
    if "flow" in rendered and "flow" in batch:
        flow_l = safe_norm(
            rendered["flow"] - batch["flow"], axis=-1, keepdims=True
        )
        loss_dict["flow"] = flow_l * (batch["flow_uct"] > 0).astype(flow_l.dtype)

    # visibility: fg + down-weighted bg (`model.py:726-744`)
    vis_terms = []
    for cate, aux_cate in aux_dict.items():
        if "vis" not in aux_cate:
            continue
        v = aux_cate["vis"]
        vis_terms.append(v * 0.01 if cate == "bg" else v)
    if vis_terms:
        loss_dict["vis"] = sum(vis_terms)

    # gauss mask consistency (`model.py:747-751`)
    if "fg" in aux_dict and "gauss_mask" in aux_dict["fg"]:
        loss_dict["reg_gauss_mask"] = (
            aux_dict["fg"]["gauss_mask"] - jax.lax.stop_gradient(rendered_fg_mask)
        ) ** 2
    return loss_dict


def mask_losses(loss_dict: Dict, batch: Dict, config: Dict):
    """Apply segmentation-mask rules in place-style (`model.py:895-977`)."""
    vis2d = batch["vis2d"].astype(jnp.float32)
    maskfg = batch["mask"].astype(jnp.float32)
    field_type = config["field_type"]
    if field_type == "bg":
        mask = (1 - maskfg) * vis2d
    elif field_type == "fg":
        mask = maskfg * vis2d
    elif field_type == "comp":
        mask = vis2d
    else:
        raise ValueError(field_type)

    if config.get("no_loss_mask", False):
        mask = jnp.ones_like(mask)
        maskfg = jnp.ones_like(maskfg)
        vis2d = jnp.ones_like(vis2d)

    out = {}
    for k, v in loss_dict.items():
        if config.get("maskloss_no_vis2d", False) and "mask" in k:
            out[k] = v * jnp.where(vis2d == 0, 0.1, vis2d)
        elif k in KEYS_IGNORE_MASKING:
            out[k] = v
        elif k in KEYS_ALLPIX:
            out[k] = v * vis2d
        elif k in KEYS_FG:
            out[k] = v * maskfg
        elif k in KEYS_TYPE_SPECIFIC:
            out[k] = v * mask
        else:
            out[k] = v

    is_det = batch["is_detected"].astype(jnp.float32)
    for k in KEYS_MASK_NOT_DETECTED:
        if k in out:
            extra = (1,) * (out[k].ndim - 1)
            out[k] = out[k] * is_det.reshape((-1,) + extra)
    return out


def nonzero_mean(v: jax.Array) -> jax.Array:
    """Mean over strictly-positive entries; plain mean if none
    (`model.py:997-1001`)."""
    pos = (v > 0).astype(v.dtype)
    cnt = jnp.sum(pos)
    return jnp.where(cnt > 0, jnp.sum(v * pos) / jnp.maximum(cnt, 1.0), jnp.mean(v))


def apply_loss_weights(loss_dict: Dict, config: Dict, weight_overrides: Dict):
    """Reduce each dense loss with nonzero-mean and scale by its weight
    (`model.py:979-1012`). weight_overrides holds the step-annealed weights."""
    out = {}
    for k, v in loss_dict.items():
        val = nonzero_mean(v) if hasattr(v, "ndim") and v.ndim > 0 else v
        if k in PX_UNIT_KEYS:
            val = val / config["train_res"]
        wt_name = k + "_wt"
        if wt_name in weight_overrides:
            val = val * weight_overrides[wt_name]
        elif wt_name in config:
            val = val * config[wt_name]
        out[k] = val
    return out
