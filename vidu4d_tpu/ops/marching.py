"""Isosurface extraction: marching tetrahedra on a dense SDF grid (pure JAX).

Replaces the reference's skimage marching-cubes proxy extraction
(`lab4d/utils/geom_utils.py:492-554`). Marching tetrahedra needs no lookup
tables, produces watertight surfaces, and maps to fixed-shape gather/where
ops that jit cleanly — each cube is split into 6 tets, each tet emits up to
2 triangles into a fixed-capacity buffer with a validity mask.

Returned vertices are *per-triangle* (soup) — downstream users (proxy
points, aabb, near-far, surfel init sampling, obj export) don't need
connectivity; `weld_vertices` merges duplicates on the host for export.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 6-tetrahedra decomposition of a cube (corner indices in binary zyx order)
_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 3, 6],
        [0, 3, 2, 6],
        [0, 2, 4, 6],  # note: 2,4 ordering keeps orientation consistent enough
        [0, 4, 5, 6],
        [3, 1, 5, 6],
    ],
    dtype=np.int32,
)
# corner offsets (dz, dy, dx) for corner ids 0..7 = binary (x + 2y + 4z)
_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
    dtype=np.int32,
)  # (dx, dy, dz)


@functools.partial(jax.jit, static_argnames=("level",))
def marching_tets(sdf_grid: jax.Array, aabb: jax.Array, level: float = 0.0):
    """Extract the `level` isosurface of a dense SDF sampled on a grid.

    Args:
        sdf_grid: (G, G, G) signed distances, index order [x, y, z] spanning
            the aabb uniformly.
        aabb: (2, 3) bounds.
    Returns:
        tri_verts: (T, 3, 3) triangle soup vertex positions,
        tri_valid: (T,) bool mask of real triangles,
        where T = 6 * 2 * (G-1)^3 is the static capacity... compacted by the
        caller on host if needed.
    """
    g = sdf_grid.shape[0]
    n = g - 1
    sdf = sdf_grid - level

    # cell corner coordinates
    cells = jnp.stack(
        jnp.meshgrid(jnp.arange(n), jnp.arange(n), jnp.arange(n), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)  # (C, 3) xyz integer coords

    corners = cells[:, None, :] + jnp.asarray(_CORNERS)[None]  # (C, 8, 3)
    corner_sdf = sdf[corners[..., 0], corners[..., 1], corners[..., 2]]  # (C, 8)
    spacing = (aabb[1] - aabb[0]) / n
    corner_pos = aabb[0] + corners.astype(sdf.dtype) * spacing  # (C, 8, 3)

    tets = jnp.asarray(_TETS)  # (6, 4)
    tet_sdf = corner_sdf[:, tets]  # (C, 6, 4)
    tet_pos = corner_pos[:, tets]  # (C, 6, 4, 3)
    c6 = tet_sdf.shape[0] * 6
    tet_sdf = tet_sdf.reshape(c6, 4)
    tet_pos = tet_pos.reshape(c6, 4, 3)

    inside = tet_sdf < 0  # (C6, 4)
    n_inside = jnp.sum(inside.astype(jnp.int32), axis=-1)

    # edge interpolation points for all 6 tet edges
    edges = jnp.asarray(
        [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=jnp.int32
    )
    s0 = tet_sdf[:, edges[:, 0]]
    s1 = tet_sdf[:, edges[:, 1]]
    denom = s0 - s1
    t = s0 / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    p0 = tet_pos[:, edges[:, 0]]
    p1 = tet_pos[:, edges[:, 1]]
    edge_pts = p0 + t * (p1 - p0)  # (C6, 6, 3)

    # For each sign configuration choose crossing edges.
    # single-vertex cases (1 inside or 3 inside): triangle from the 3 edges
    # incident to the lone vertex; two-vertex case: quad -> 2 triangles.
    # edges incident to vertex v (in `edges` order):
    vert_edges = jnp.asarray(
        [[0, 1, 2], [0, 3, 4], [1, 3, 5], [2, 4, 5]], dtype=jnp.int32
    )
    # for pair (v_in0, v_in1): quad edges in strip order
    pair_table = jnp.asarray(
        [
            [1, 2, 3, 4],  # pair (0,1): edges 02,03,12,13
            [0, 2, 3, 5],  # pair (0,2): 01,03,12,23
            [0, 1, 4, 5],  # pair (0,3): 01,02,13,23
            [0, 4, 1, 5],  # pair (1,2): 01,13,02,23  (kept strip-consistent)
            [0, 3, 2, 5],  # pair (1,3)
            [1, 3, 2, 4],  # pair (2,3)
        ],
        dtype=jnp.int32,
    )

    # lone vertex id: for n_inside==1 the inside one; for ==3 the outside one
    lone_in = jnp.argmax(inside, axis=-1)
    lone_out = jnp.argmax(~inside, axis=-1)
    lone = jnp.where(n_inside == 1, lone_in, lone_out)
    tri1_edges = vert_edges[lone]  # (C6, 3)

    # pair index for n_inside==2: identify which two are inside
    pid = (
        (inside[:, 0] & inside[:, 1]) * 0
        + (inside[:, 0] & inside[:, 2]) * 1
        + (inside[:, 0] & inside[:, 3]) * 2
        + (inside[:, 1] & inside[:, 2]) * 3
        + (inside[:, 1] & inside[:, 3]) * 4
        + (inside[:, 2] & inside[:, 3]) * 5
    )
    quad = pair_table[pid]  # (C6, 4)

    is1or3 = (n_inside == 1) | (n_inside == 3)
    is2 = n_inside == 2

    # triangle A: single-vertex triangle OR first quad triangle
    triA_idx = jnp.where(is1or3[:, None], tri1_edges, quad[:, :3])
    triA = jnp.take_along_axis(
        edge_pts, triA_idx[..., None].repeat(3, axis=-1), axis=1
    )  # (C6, 3, 3)
    # triangle B: second quad triangle (valid only for n_inside==2)
    triB_idx = quad[:, 1:]
    triB = jnp.take_along_axis(
        edge_pts, triB_idx[..., None].repeat(3, axis=-1), axis=1
    )

    tri_verts = jnp.concatenate([triA, triB], axis=0)  # (2*C6, 3, 3)
    tri_valid = jnp.concatenate([is1or3 | is2, is2], axis=0)
    return tri_verts, tri_valid


def extract_mesh_np(sdf_grid, aabb, level: float = 0.0):
    """Host-side compact mesh: returns (verts (V,3), faces (F,3)) numpy."""
    tri_verts, tri_valid = marching_tets(
        jnp.asarray(sdf_grid), jnp.asarray(aabb), level=level
    )
    tri = np.asarray(tri_verts)[np.asarray(tri_valid)]
    return weld_vertices(tri)


def weld_vertices(tri_soup: np.ndarray, decimals: int = 6):
    """Merge duplicate vertices in a triangle soup (host-side)."""
    if len(tri_soup) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    flat = tri_soup.reshape(-1, 3)
    key = np.round(flat, decimals)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return uniq.astype(np.float32), faces[good]


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray,
             colors: np.ndarray = None):
    """Minimal OBJ writer (replaces trimesh export for proxy meshes)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i, v in enumerate(verts):
            if colors is not None:
                c = colors[i]
                f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def load_obj(path: str):
    """Minimal OBJ reader: returns (verts, faces) numpy arrays."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(x) for x in parts[1:4]])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:4]]
                faces.append(idx)
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def sample_mesh_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                        rng: np.random.Generator = None):
    """Uniform area-weighted surface sampling (replaces trimesh.sample).

    Returns (points (n, 3), face_ids (n,), barycentric (n, 3))."""
    rng = rng or np.random.default_rng(0)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    probs = areas / areas.sum()
    fid = rng.choice(len(faces), size=n, p=probs)
    u = rng.uniform(size=(n, 1))
    v = rng.uniform(size=(n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    w = 1 - u - v
    pts = w * verts[faces[fid, 0]] + u * verts[faces[fid, 1]] + v * verts[faces[fid, 2]]
    bary = np.concatenate([w, u, v], axis=-1)
    return pts.astype(np.float32), fid, bary.astype(np.float32)
