"""K-nearest-neighbor distances (replaces the `simple-knn` CUDA extension).

The reference uses `simple_knn._C.distCUDA2(points)` once at surfel init to
set initial scales: mean *squared* distance to the 3 nearest neighbors
(`gs/scene/gaussian_model.py:139`). On TPU this is a chunked distance-matrix
top-k: the pairwise distances ride the MXU as a matmul, so no Morton-code
spatial structure is needed at the call frequency involved (once per init).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk_size"))
def mean_knn_sq_dist(points: jax.Array, k: int = 3, chunk_size: int = 1024) -> jax.Array:
    """Mean squared distance from each point to its k nearest neighbors.

    Args:
        points: (N, 3) float array. N must be > k.
        k: number of neighbors (excluding the point itself).
        chunk_size: query rows per chunk (controls peak memory: chunk x N).
    Returns:
        (N,) mean squared distances (same contract as distCUDA2 with k=3).
    """
    n = points.shape[0]
    pad = (-n) % chunk_size
    # pad with +inf-distance sentinels so they never enter anyone's top-k
    pts_pad = jnp.concatenate(
        [points, jnp.full((pad, 3), 1e18, dtype=points.dtype)], axis=0
    )
    sq_norms = jnp.sum(points * points, axis=-1)  # (N,)

    def chunk_fn(q):  # q: (chunk, 3)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)  # (chunk, 1)
        # dist² = |q|² + |p|² − 2 q·p  — the q·p term maps onto the MXU
        d2 = q_sq + sq_norms[None, :] - 2.0 * jnp.dot(
            q, points.T, preferred_element_type=jnp.float32
        )
        d2 = jnp.maximum(d2, 0.0)
        # k+1 to drop the self-distance (the smallest entry)
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        return jnp.mean(-neg_top[:, 1:], axis=-1)

    chunks = pts_pad.reshape(-1, chunk_size, 3)
    out = jax.lax.map(chunk_fn, chunks).reshape(-1)
    return out[:n]
