"""Fixed-capacity Gaussian-surfel parameter store.

TPU re-design of the reference `gs/scene/gaussian_model.py`: instead of
dynamically growing/shrinking tensors (which forces the reference into
optimizer-state surgery, `gaussian_model.py:270-378`), surfels live in a
static-capacity struct-of-arrays with an ``alive`` mask. Densify/prune flip
mask bits and write rows in place, so jit never recompiles, Adam moments stay
slot-aligned for free, and the whole training step stays on device.

Parameterization matches the reference exactly:
  scaling = exp(raw)        (2 tangent axes — 2DGS surfels)
  opacity = sigmoid(raw)
  rotation = normalize(raw) (w, x, y, z)
  color   = SH with features_dc (N,1,3) + features_rest (N,K-1,3)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vidu4d_tpu.ops.numerics import safe_norm, safe_normalize

from vidu4d_tpu.ops import sh as sh_ops
from vidu4d_tpu.ops.knn import mean_knn_sq_dist


class SurfelParams(NamedTuple):
    """The optimizable leaves (all first-dim = capacity)."""

    xyz: jax.Array  # (N, 3)
    features_dc: jax.Array  # (N, 1, 3)
    features_rest: jax.Array  # (N, K-1, 3)
    scaling: jax.Array  # (N, 2) log-scale
    rotation: jax.Array  # (N, 4) unnormalized quaternion (w, x, y, z)
    opacity: jax.Array  # (N, 1) pre-sigmoid
    regist_feat: jax.Array  # (N, F) registration features (F=0 if unused)


class SurfelState(NamedTuple):
    params: SurfelParams
    alive: jax.Array  # (N,) bool
    max_radii2d: jax.Array  # (N,) float, max screen radius seen since last densify
    grad_accum: jax.Array  # (N,) accumulated viewspace grad norms
    denom: jax.Array  # (N,) number of accumulation events

    @property
    def capacity(self) -> int:
        return self.alive.shape[0]

    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))


def get_scaling(p: SurfelParams) -> jax.Array:
    return jnp.exp(p.scaling)


def get_opacity(p: SurfelParams) -> jax.Array:
    return jax.nn.sigmoid(p.opacity)


def get_rotation(p: SurfelParams) -> jax.Array:
    return safe_normalize(p.rotation)


def get_features(p: SurfelParams) -> jax.Array:
    """(N, K, 3) SH coefficients."""
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


def inverse_sigmoid(x: jax.Array) -> jax.Array:
    return jnp.log(x / (1.0 - x))


def init_from_points(
    points: jax.Array,
    colors: jax.Array,
    capacity: int,
    sh_degree: int = 3,
    key: Optional[jax.Array] = None,
    regist_feat: Optional[jax.Array] = None,
    init_opacity: float = 0.1,
) -> SurfelState:
    """Initialize surfels from a colored point cloud.

    Matches `gaussian_model.py` create_from_pcd: SH DC from RGB, log-scale
    from sqrt(mean 3-NN squared distance), random rotations, opacity 0.1.
    Points beyond ``capacity`` are dropped; the remainder are dead slots.
    """
    n = points.shape[0]
    if n > capacity:
        points, colors = points[:capacity], colors[:capacity]
        if regist_feat is not None:
            regist_feat = regist_feat[:capacity]
        n = capacity
    if key is None:
        key = jax.random.PRNGKey(0)

    n_coeffs = sh_ops.num_sh_coeffs(sh_degree)
    dc = sh_ops.rgb_to_sh(colors)[:, None, :]  # (n, 1, 3)
    rest = jnp.zeros((n, n_coeffs - 1, 3), dtype=points.dtype)

    dist2 = jnp.maximum(mean_knn_sq_dist(points, k=3), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(2, axis=1)
    rots = jax.random.uniform(key, (n, 4), dtype=points.dtype)
    opac = jnp.full((n, 1), inverse_sigmoid(jnp.asarray(init_opacity)), dtype=points.dtype)

    feat_dim = 0 if regist_feat is None else regist_feat.shape[-1]
    rfeat = (
        jnp.zeros((n, 0), dtype=points.dtype) if regist_feat is None else regist_feat
    )

    def pad(x):
        widths = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    params = SurfelParams(
        xyz=pad(points),
        features_dc=pad(dc),
        features_rest=pad(rest),
        scaling=pad(scales),
        rotation=pad(rots).at[n:, 0].set(1.0),  # dead slots: identity quats
        opacity=pad(opac),
        regist_feat=pad(rfeat) if feat_dim else jnp.zeros((capacity, 0), points.dtype),
    )
    alive = jnp.arange(capacity) < n
    zeros = jnp.zeros((capacity,), dtype=points.dtype)
    return SurfelState(
        params=params, alive=alive, max_radii2d=zeros,
        grad_accum=zeros, denom=zeros,
    )


def add_densification_stats(
    state: SurfelState, viewspace_grad: jax.Array, visible: jax.Array,
    radii: jax.Array,
) -> SurfelState:
    """Accumulate per-splat viewspace gradient norms + track max radii
    (`gs/train.py:117-119`, `gaussian_model.py:450-452`)."""
    norm = safe_norm(viewspace_grad, axis=-1)
    vis = visible & state.alive
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(vis, norm, 0.0),
        denom=state.denom + vis.astype(state.denom.dtype),
        max_radii2d=jnp.where(
            vis, jnp.maximum(state.max_radii2d, radii), state.max_radii2d
        ),
    )
