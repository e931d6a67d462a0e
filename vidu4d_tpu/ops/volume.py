"""Volume rendering: ray sampling, alpha compositing, importance sampling.

Semantics match `lab4d/utils/render_utils.py` exactly (uniform z between
near/far — not disparity; deltas scaled by unnormalized ray length; weight
normalization with stop-gradient freeze lists; flow z-weighting; per-field
density -> mask normalization).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.numerics import safe_norm, safe_normalize

# rendered quantities never integrated (`render_utils.py:152-161`)
KEY_SKIP = ("density", "vis", "flow", "eikonal", "xy_reproj", "xyz_reproj",
            "gauss_density")
# integrated with stop-gradient weights (`render_utils.py:162`)
KEY_FREEZE = ("cyc_dist", "xyz_cam", "skin_entropy")


def sample_cam_rays(
    hxy: jax.Array,  # (M, N, 3) homogeneous pixel coords
    Kinv: jax.Array,  # (M, 3, 3)
    near_far: jax.Array,  # (M, 2)
    n_depth: int = 64,
    depth: Optional[jax.Array] = None,  # (M, N, D, 1) override
    perturb: bool = False,
    rng: Optional[jax.Array] = None,
):
    """Sample points along camera rays (`render_utils.py:8-64`).

    Returns (xyz (M,N,D,3), dir (M,N,D,3) unit, deltas (M,N,D,1), depth (M,N,D,1)).
    """
    direction = jnp.einsum("mni,mji->mnj", hxy, Kinv)  # hxy @ Kinv^T
    dir_norm = safe_norm(direction, axis=-1)  # (M, N)

    if depth is None:
        z = jnp.linspace(0.0, 1.0, n_depth, dtype=hxy.dtype)
        depth = near_far[:, 0:1] * (1 - z)[None] + near_far[:, 1:2] * z[None]  # (M, D)
        depth = jnp.broadcast_to(
            depth[:, None, :, None], (hxy.shape[0], hxy.shape[1], n_depth, 1)
        )
    else:
        n_depth = depth.shape[2]

    if perturb:
        assert rng is not None
        mid = 0.5 * (depth[:, :, :-1] + depth[:, :, 1:])
        upper = jnp.concatenate([mid, depth[:, :, -1:]], axis=-2)
        lower = jnp.concatenate([depth[:, :, :1], mid], axis=-2)
        u = jax.random.uniform(rng, depth.shape, dtype=depth.dtype)
        depth = lower + (upper - lower) * u

    xyz = direction[:, :, None, :] * depth  # (M, N, D, 3)
    deltas = depth[:, :, 1:] - depth[:, :, :-1]
    deltas = jnp.concatenate([deltas, deltas[:, :, -1:]], axis=-2)
    deltas = deltas * dir_norm[:, :, None, None]

    unit_dir = direction / jnp.maximum(dir_norm[..., None], 1e-12)
    unit_dir = jnp.broadcast_to(unit_dir[:, :, None, :], xyz.shape)
    return xyz, unit_dir, deltas, depth


def compute_weights(density: jax.Array, deltas: jax.Array):
    """Volume-rendering weights/transmittance (`render_utils.py:107-134`).

    density, deltas: (M, N, D, 1). Returns weights, transmit: (M, N, D).
    """
    tau = (deltas * density)[..., 0]  # (M, N, D)
    alpha = 1.0 - jnp.exp(-tau)
    transmit = jnp.exp(-jnp.cumsum(tau, axis=-1))  # T after each sample
    transmit_before = jnp.concatenate(
        [jnp.ones_like(transmit[..., :1]), transmit[..., :-1]], axis=-1
    )
    weights = alpha * transmit_before
    return weights, transmit


def integrate(field_dict: Dict[str, jax.Array], weights: jax.Array) -> Dict[str, jax.Array]:
    """Integrate field outputs over rays (`render_utils.py:137-192`)."""
    rendered = {}
    mask = jnp.sum(weights, axis=-1, keepdims=True)  # (M, N, 1)
    rendered["mask"] = mask
    w_norm = weights / (mask + 1e-6)

    for k, v in field_dict.items():
        if k in KEY_SKIP:
            continue
        wt = jax.lax.stop_gradient(w_norm) if k in KEY_FREEZE else w_norm
        rendered[k] = jnp.sum(wt[..., None] * v, axis=-2)

    if "flow" in field_dict:
        flow = field_dict["flow"]
        w_flow = weights * flow[..., 2]
        w_flow = w_flow / (jnp.sum(w_flow, axis=-1, keepdims=True) + 1e-6)
        rendered["flow"] = jnp.sum(w_flow[..., None] * flow[..., :2], axis=-2)

    if "normal" in rendered:
        n = rendered["normal"]
        rendered["normal"] = safe_normalize(n)

    # normalize per-field densities into masks (`render_utils.py:176-190`)
    density_keys = [k for k in rendered if k.startswith("density_")]
    if density_keys:
        total = sum(rendered[k] for k in density_keys) + 1e-6
        for k in density_keys:
            rendered["mask_" + k[len("density_"):]] = rendered[k] / total
            del rendered[k]
    return rendered


def render_pixel(field_dict: Dict[str, jax.Array], deltas: jax.Array) -> Dict[str, jax.Array]:
    """Full per-pixel rendering incl. vis/eikonal/gauss-mask auxiliaries
    (`render_utils.py:67-105`)."""
    weights, transmit = compute_weights(field_dict["density"], deltas)
    rendered = integrate(field_dict, weights)

    if "eikonal" in field_dict:
        rendered["eikonal"] = jnp.mean(field_dict["eikonal"], axis=(-1, -2))
    if "delta_skin" in field_dict:
        rendered["delta_skin"] = jnp.mean(field_dict["delta_skin"], axis=(-1, -2))

    # visibility BCE weighted by (detached) transmittance
    transmit_d = jax.lax.stop_gradient(transmit)[..., None]
    vis_loss = -jnp.mean(
        jax.nn.log_sigmoid(field_dict["vis"]) * transmit_d, axis=-2
    )
    rendered["vis"] = vis_loss / jax.lax.stop_gradient(jnp.mean(transmit_d))

    if "gauss_density" in field_dict:
        gauss_w, _ = compute_weights(field_dict["gauss_density"], deltas)
        rendered["gauss_mask"] = jnp.sum(gauss_w, axis=-1, keepdims=True)
    return rendered


def sample_pdf(
    bins: jax.Array,  # (R, S-1) depth bin midpoints
    weights: jax.Array,  # (R, S-2)
    n_importance: int,
    det: bool = False,
    rng: Optional[jax.Array] = None,
    eps: float = 1e-5,
):
    """Inverse-CDF importance sampling (`render_utils.py:195-241`)."""
    n_rays, n_samples = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, S-1)

    if det:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype),
            (n_rays, n_importance),
        )
    else:
        assert rng is not None
        u = jax.random.uniform(rng, (n_rays, n_importance), dtype=bins.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_samples)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=1)
    bin_lo = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[1] - 1), axis=1)
    bin_hi = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[1] - 1), axis=1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bin_lo + (u - cdf_lo) / denom * (bin_hi - bin_lo)
