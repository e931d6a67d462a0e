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


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "cand_chunk"))
def mean_knn_sq_dist(points: jax.Array, k: int = 3, chunk_size: int = 1024,
                     cand_chunk: int = 4096) -> jax.Array:
    """Mean squared distance from each point to its k nearest neighbors.

    Exact streaming formulation: for each query chunk, candidate points are
    scanned in `cand_chunk`-wide slabs with a running (k+1)-best merge, so
    `top_k` only ever sees `cand_chunk + k + 1` lanes. (The previous
    full-row variant ran top_k over all N lanes at once — at 200k points
    that is a ~200M-element sort per chunk, which both dominated init time
    and destabilized the TPU worker.) The distance matmul still rides the
    MXU.

    Args:
        points: (N, 3) float array. N must be > k.
        k: number of neighbors (excluding the point itself).
        chunk_size: query rows per step.
        cand_chunk: candidate columns per merge step.
    Returns:
        (N,) mean squared distances (same contract as distCUDA2 with k=3).
    """
    n = points.shape[0]
    qpad = (-n) % chunk_size
    cpad = (-n) % cand_chunk
    big = jnp.asarray(1e18, points.dtype)
    # sentinel-padded copies: padded entries never enter anyone's top-k
    q_pts = jnp.concatenate(
        [points, jnp.full((qpad, 3), 1e18, dtype=points.dtype)], axis=0
    )
    # candidates pad with ZERO coords (keeps the q·p matmul term finite) and
    # push their distances out of every top-k through the |p|² term alone
    c_pts = jnp.concatenate(
        [points, jnp.zeros((cpad, 3), dtype=points.dtype)], axis=0
    )
    c_sq = jnp.where(
        jnp.arange(c_pts.shape[0]) < n, jnp.sum(c_pts * c_pts, axis=-1), big
    )
    c_chunks = c_pts.reshape(-1, cand_chunk, 3)
    csq_chunks = c_sq.reshape(-1, cand_chunk)

    def query_chunk(q):  # q: (chunk, 3)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)

        def merge(best, cand):
            cpts, csq = cand
            # dist² = |q|² + |p|² − 2 q·p — the q·p term maps onto the MXU
            d2 = q_sq + csq[None, :] - 2.0 * jnp.dot(
                q, cpts.T, preferred_element_type=jnp.float32
            )
            d2 = jnp.maximum(d2, 0.0)
            merged = jnp.concatenate([best, d2], axis=1)
            neg_top, _ = jax.lax.top_k(-merged, k + 1)
            return -neg_top, None

        best0 = jnp.full((q.shape[0], k + 1), 1e18, jnp.float32)
        best, _ = jax.lax.scan(merge, best0, (c_chunks, csq_chunks))
        # k+1 keeps the self-distance (the smallest entry); drop it
        return jnp.mean(best[:, 1:], axis=-1)

    out = jax.lax.map(query_chunk, q_pts.reshape(-1, chunk_size, 3))
    return out.reshape(-1)[:n]
