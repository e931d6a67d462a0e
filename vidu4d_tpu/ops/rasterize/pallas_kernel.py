"""Hand-written Pallas TPU kernel for per-tile surfel compositing (forward).

The production rendering path: replaces the per-tile gather + cumprod XLA
graph (`xla_tiles.py`) with one fused kernel that streams depth-sorted
entries from HBM and composites them with in-register prefix ops:

* grid = one program per 16x16 tile;
* the sorted per-entry property slab is stored CHUNK-major, (N, 32, 128):
  entries ride the 128-wide lane dimension inside each block, so each chunk
  is one whole-block (32, 128) DMA — no unaligned memref slicing, and no
  memref dimension ever exceeds ~thousands (a flat (32, E) layout crashes
  the TPU backend once E reaches 2^20);
* per chunk: evaluate all 256 x 128 splat-pixel responses on the VPU
  (broadcasted two-plane intersection, exactly `forward.cu:359-382`), then a
  Hillis-Steele prefix product along lanes gives the transmittance chain
  without a sequential loop;
* the reference's per-pixel early-out (`forward.cu:401-406`) is exact:
  entries past the T<1e-4 point contribute identically zero through the
  include mask (the loop bound already limits work to the tile's entries);
* depth/normal/median/distortion auxiliaries accumulate in carries matching
  the 8-channel out_others contract (`auxiliary.h:25-30`).

Gradients: `pallas_backward.rasterize_pallas_grad` pairs this forward with
the analytic backward kernel via jax.custom_vjp; the autodiff XLA path
(`xla_tiles.py`) remains available and pins both in parity tests.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidu4d_tpu.ops.rasterize import common
from vidu4d_tpu.ops.rasterize.compositing import CompositeOutput

# property slab rows (per sorted entry), padded to 32 rows.
#
# The slab stores the two-plane intersection in AFFINE-COEFFICIENT form
# rather than the raw (Tu, Tv, Tw) transform rows: with k = px*Tw - Tu and
# l = py*Tw - Tv (forward.cu:359-362), the homogeneous intersection point
#   p = k x l = (Tu x Tv) + px*(Tv x Tw) + py*(Tw x Tu)
# is AFFINE in the pixel coords (the bilinear px*py term is Tw x Tw = 0),
# and the 3D-branch depth numerator p . Tw collapses to the per-splat
# CONSTANT q = det(Tu, Tv, Tw) (the B/C coefficients are orthogonal to Tw).
# Evaluating p therefore costs 2 FMAs per component instead of the 12-op
# k/l assembly + 12-op cross product, and the depth needs one multiply by
# 1/pz. The low-pass 2D fallback rho2d = FIS*((cx-px)^2+(cy-py)^2)
# (forward.cu:373-378) is likewise carried as its polynomial coefficients
# in (px, py). pack_props computes the coefficients once per splat in XLA
# (O(P), fused into the pack), so the per-(pixel x entry) VPU work inside
# the kernels drops by ~40% and the backward's cross-product gradient
# chain disappears entirely (its slab-row grads chain to Tu/Tv/Tw through
# pack_props by autodiff).
_F = 32
_PA = 0    # A = Tu x Tv          (p constant term, 3 rows)
_PB = 3    # B = Tv x Tw          (p coefficient of px, 3 rows)
_PC = 6    # C = Tw x Tu          (p coefficient of py, 3 rows)
_QD = 9    # q = det(Tu,Tv,Tw)    (3D-branch depth numerator)
_TW2 = 10  # Tw.z                 (2D-branch depth value)
_E0 = 11   # FIS*(cx^2+cy^2)      (rho2d constant term)
_E1 = 12   # -2*FIS*cx            (rho2d coefficient of px)
_E2 = 13   # -2*FIS*cy            (rho2d coefficient of py)
_OPAC = 14
_RGB = 15
_NRM = 18
_EXTRA = 21  # extra composited channels (flow/gauss-mask/...), up to _F-21
MAX_EXTRA = _F - _EXTRA

# entries per chunk; default == lane width (DMA stays lane-aligned).
# VIDU4D_RASTER_CHUNK sweeps 128/256/512 without code edits (powers of 2).
CHUNK = int(os.environ.get("VIDU4D_RASTER_CHUNK", "128"))
# the Hillis-Steele prefix/suffix scans take log2(CHUNK) steps and the DMA
# slices assume lane alignment — a non-power-of-two (or <128) value would
# silently produce wrong compositing/gradients, so fail loudly at import
if CHUNK < 128 or (CHUNK & (CHUNK - 1)) != 0:
    raise ValueError(
        f"VIDU4D_RASTER_CHUNK must be a power of two >= 128, got {CHUNK}"
    )


def _prefix_mul_lanes(x: jax.Array) -> jax.Array:
    """Inclusive prefix product along the lane axis (axis 1), Hillis-Steele."""
    k = x.shape[1]
    steps = int(math.log2(k))
    assert 2 ** steps == k
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s in range(steps):
        shift = 1 << s
        shifted = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(col >= shift, shifted, 1.0)
    return x


def _prefix_add_lanes(x: jax.Array) -> jax.Array:
    k = x.shape[1]
    steps = int(math.log2(k))
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s in range(steps):
        shift = 1 << s
        shifted = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(col >= shift, shifted, 0.0)
    return x


def _make_kernel(tiles_x: int, tile: int, n_entries: int, n_extra: int = 0,
                 n_tiles_per_frame: int = 0):
    """Per-tile compositing kernel. When n_tiles_per_frame > 0, the grid
    spans multiple frames (batch dim folded into the grid: program t handles
    frame t // n_tiles_per_frame, tile t % n_tiles_per_frame) — ONE kernel
    launch composites the whole batch instead of a vmap of launches.

    tile_ids maps the LOCAL program id to the GLOBAL tile index (for pixel
    coordinates / frame assignment). It is arange(num_tiles) single-device;
    under shard_map each device gets its slice of the tile grid and the ids
    keep the pixel math global while start/count stay locally indexed."""
    px_n = tile * tile

    n_chunks_total = n_entries // CHUNK

    def kernel(tile_ids_ref, start_ref, count_ref, props_hbm, bg_ref,
               color_ref, aux_ref, scratch, sem):
        t = pl.program_id(0)
        start = start_ref[t]
        count = count_ref[t]
        tg = tile_ids_ref[t]
        tl = tg % n_tiles_per_frame if n_tiles_per_frame else tg
        base_x = (tl % tiles_x) * tile
        base_y = (tl // tiles_x) * tile

        # pixel centers on the sublane axis: (px_n, 1)
        lin = jax.lax.broadcasted_iota(jnp.int32, (px_n, 1), 0)
        pxf = (base_x + lin % tile).astype(jnp.float32) + 0.5
        pyf = (base_y + lin // tile).astype(jnp.float32) + 0.5
        # pixel-only quadratic term of rho2d (per tile, not per chunk)
        pq = common.FILTER_INV_SQUARE * (pxf * pxf + pyf * pyf)

        # chunks start lane-aligned; masks trim [start, start+count)
        first_chunk = start // CHUNK
        base0 = first_chunk * CHUNK
        num_chunks = jnp.where(
            count > 0, pl.cdiv(start + count - base0, CHUNK), 0
        )

        # the slab is CHUNK-major (N, 32, CHUNK): each DMA fetches one whole
        # leading-index block. (The flat (32, E) layout put E on the memref
        # minor dim, which the TPU backend mishandles past 2^20 — crashes
        # at >= 1.6M entries, i.e. >= 100k surfels at span_cap 4.)
        def chunk_idx(c):
            return jnp.minimum(first_chunk + c, n_chunks_total - 1)

        def chunk_base(c):
            return chunk_idx(c) * CHUNK

        def chunk_copy(c, slot):
            return pltpu.make_async_copy(
                props_hbm.at[chunk_idx(c)],
                scratch.at[slot], sem.at[slot],
            )

        @pl.when(num_chunks > 0)
        def _():
            chunk_copy(0, 0).start()

        zeros = jnp.zeros((px_n, 1), jnp.float32)
        carry0 = (
            # TWO transmittance carries (they differ once the include
            # cutoff fires): t_c is the FULL product over every composited
            # alpha (the cumprod of the XLA path — monotone, so the include
            # mask can never "resurrect" in a later chunk), while t_last is
            # the T after the LAST INCLUDED entry (the reference's final_T,
            # used for the alpha output / bg composite / backward chain).
            # Carrying only the latter inflated the backward's
            # division-based reconstruction exponentially on deep chains
            # (~1e18 gradients at 50k splats).
            jnp.ones((px_n, 1), jnp.float32),  # t_c: full-product chain
            zeros, zeros, zeros,  # color r, g, b
            zeros,  # expected depth
            zeros, zeros, zeros,  # normal x, y, z
            zeros, zeros,  # dist1 = sum w·m, dist2 = sum w·m²
            zeros, zeros,  # med_depth, med_w
            zeros,  # n_contrib (last composited rank + 1)
            jnp.ones((px_n, 1), jnp.float32),  # t_last: T after last included
            (zeros,) * n_extra,  # extra composited channels
        )

        def cond(state):
            c, tmax, _ = state
            # tile-level early-out (forward.cu:401-406 generalized to the
            # whole tile): once every pixel's T dropped below the stop
            # threshold, remaining chunks contribute exactly zero.
            return (c < num_chunks) & (tmax >= common.T_EARLY_STOP)

        def body(state):
            c, _, carry = state
            (t_c, cr, cg, cb, d_acc, nx, ny, nz,
             dist1, dist2, med_d, med_w, ncon, t_last,
             extras) = carry

            slot = jax.lax.rem(c, 2)
            # prefetch the next chunk into the other buffer; its DMA rides
            # under this chunk's compute (double buffering)
            @pl.when(c + 1 < num_chunks)
            def _():
                chunk_copy(c + 1, 1 - slot).start()

            chunk_copy(c, slot).wait()
            base = chunk_base(c)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            entry_id = base + lane
            valid_k = (entry_id >= start) & (entry_id < start + count)

            row = lambda i: scratch[slot, i, :][None, :]  # (1, CHUNK)
            # two-plane intersection (forward.cu:359-372) in affine form:
            # p = A + px*B + py*C, depth3d = q / pz (see slab layout)
            px_ = row(_PA) + pxf * row(_PB) + pyf * row(_PC)
            py_ = row(_PA + 1) + pxf * row(_PB + 1) + pyf * row(_PC + 1)
            pz_ = row(_PA + 2) + pxf * row(_PB + 2) + pyf * row(_PC + 2)
            pz_ok = pz_ != 0.0
            pz_safe = jnp.where(pz_ok, pz_, 1.0)
            ipz = 1.0 / pz_safe
            rho3d = (px_ * px_ + py_ * py_) * (ipz * ipz)
            rho2d = pq + row(_E0) + pxf * row(_E1) + pyf * row(_E2)
            rho = jnp.minimum(rho3d, rho2d)
            depth = jnp.where(
                rho3d <= rho2d,
                row(_QD) * ipz,
                jnp.broadcast_to(row(_TW2), rho3d.shape),
            )
            alpha = jnp.minimum(
                common.ALPHA_CLAMP, row(_OPAC) * jnp.exp(-0.5 * rho)
            )
            ok = (
                pz_ok & (depth >= common.NEAR_PLANE)
                & (alpha >= common.ALPHA_EPS) & valid_k
            )
            alpha = jnp.where(ok, alpha, 0.0)  # (px_n, CHUNK)
            # w is 0 where ~ok, but 0 * inf/NaN (degenerate-conic depths)
            # would still poison the accumulators
            depth = jnp.where(ok, depth, 0.0)

            om = 1.0 - alpha
            cp_incl = _prefix_mul_lanes(om)
            t_incl = t_c * cp_incl
            include = t_incl >= common.T_EARLY_STOP
            colid = jax.lax.broadcasted_iota(jnp.int32, om.shape, 1)
            t_prefix = t_c * jnp.where(
                colid == 0, 1.0, pltpu.roll(cp_incl, 1, axis=1)
            )
            w = alpha * t_prefix * jnp.where(include, 1.0, 0.0)

            lsum = lambda x: jnp.sum(x, axis=1, keepdims=True)
            cr2 = cr + lsum(w * row(_RGB))
            cg2 = cg + lsum(w * row(_RGB + 1))
            cb2 = cb + lsum(w * row(_RGB + 2))
            extras2 = tuple(
                ex + lsum(w * row(_EXTRA + e)) for e, ex in enumerate(extras)
            )
            d2_ = d_acc + lsum(w * depth)
            nx2 = nx + lsum(w * row(_NRM))
            ny2 = ny + lsum(w * row(_NRM + 1))
            nz2 = nz + lsum(w * row(_NRM + 2))

            # distortion accumulators: the streaming pairwise loss
            # (forward.cu:410-436) telescopes to the totals-only closed
            # form D = S2·A − S1² with A = Σw, S1 = Σw·m, S2 = Σw·m²
            # (the backward kernel already exploits this), so the forward
            # only tracks S1/S2 — no per-entry prefix scans needed. D is
            # assembled in the epilogue.
            depth_pos = jnp.maximum(depth, 1e-6)
            m = (common.FAR_PLANE * depth_pos
                 - common.FAR_PLANE * common.NEAR_PLANE) / (
                (common.FAR_PLANE - common.NEAR_PLANE) * depth_pos)
            wm = w * m
            wmm = w * m * m
            dist1_2 = dist1 + lsum(wm)
            dist2_2 = dist2 + lsum(wmm)

            # median: last composited entry with T(before) > 0.5
            cand = (w > 0) & (t_prefix > 0.5)
            last = jnp.max(jnp.where(cand, colid, -1), axis=1, keepdims=True)
            sel = (colid == last) & cand
            has = last >= 0  # (bool reductions unsupported in Mosaic)
            med_d2 = jnp.where(has, lsum(jnp.where(sel, depth, 0.0)), med_d)
            med_w2 = jnp.where(has, lsum(jnp.where(sel, w, 0.0)), med_w)

            # chain carry: FULL product over the chunk's composited alphas
            # (matches the XLA path's cumprod; keeps `include` monotone
            # across chunk boundaries)
            t_c2 = t_c * cp_incl[:, CHUNK - 1:CHUNK]
            # output carry: T after the last INCLUDED entry (reference
            # final_T; t_incl is non-increasing along lanes)
            t_last2 = jnp.min(
                jnp.where(include, t_incl,
                          jnp.broadcast_to(t_last, t_incl.shape)),
                axis=1, keepdims=True,
            )
            # contributor count residual for the backward kernel
            rank1 = (entry_id - start + 1).astype(jnp.float32)
            ncon2 = jnp.maximum(
                ncon,
                jnp.max(jnp.where(w > 0, rank1, 0.0), axis=1, keepdims=True),
            )
            carry2 = (t_c2, cr2, cg2, cb2, d2_, nx2, ny2, nz2,
                      dist1_2, dist2_2, med_d2, med_w2, ncon2,
                      t_last2, extras2)
            return (c + 1, jnp.max(t_c2), carry2)

        c_fin, _, carry_out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(1.0), carry0)
        )
        # tile-level early-out (cond's tmax clause) can leave the NEXT
        # chunk's prefetch in flight: body(c) starts (c+1, 1-slot) before
        # computing, and if the loop exits at state c+1 nothing waits on it.
        # An outstanding DMA at kernel end is a Mosaic error — and whether
        # the early-out fires is scene-density-dependent, which is exactly
        # why 50k-surfel scenes ran while >=100k (4x denser, tiles saturate)
        # died with "TPU backend error" (r2 VERDICT #1 crash).
        @pl.when((c_fin < num_chunks) & (c_fin > 0))
        def _():
            chunk_copy(c_fin, jax.lax.rem(c_fin, 2)).wait()

        (t_c, cr, cg, cb, d_acc, nx, ny, nz,
         dist1, dist2, med_d, med_w, ncon, t_last,
         extras) = carry_out
        # totals-form distortion (exactly the pairwise loss the streaming
        # form of forward.cu:410-436 accumulates; self-terms cancel)
        distort = dist2 * (1.0 - t_last) - dist1 * dist1

        color_ref[0, :, 0] = (cr + t_last * bg_ref[0, 0])[:, 0]
        color_ref[0, :, 1] = (cg + t_last * bg_ref[0, 1])[:, 0]
        color_ref[0, :, 2] = (cb + t_last * bg_ref[0, 2])[:, 0]
        for e, ex in enumerate(extras):
            color_ref[0, :, 3 + e] = (ex + t_last * bg_ref[0, 3 + e])[:, 0]
        aux_ref[0, :, 0] = d_acc[:, 0]
        aux_ref[0, :, 1] = (1.0 - t_last)[:, 0]
        aux_ref[0, :, 2] = nx[:, 0]
        aux_ref[0, :, 3] = ny[:, 0]
        aux_ref[0, :, 4] = nz[:, 0]
        aux_ref[0, :, 5] = med_d[:, 0]
        aux_ref[0, :, 6] = distort[:, 0]
        aux_ref[0, :, 7] = med_w[:, 0]
        aux_ref[0, :, 8] = t_last[:, 0]
        aux_ref[0, :, 9] = ncon[:, 0]
        aux_ref[0, :, 10] = dist1[:, 0]  # S1 = sum w·m (bwd residual)
        aux_ref[0, :, 11] = dist2[:, 0]  # S2 = sum w·m²

    return kernel


# Backward epilogue for the slab row gather (entry grads -> splat grads,
# the atomics-free stand-in for backward.cu's atomicAdd into dL_d*):
#   xla    — autodiff transpose (one scatter-add of the full (E, 32) rows)
#   narrow — custom_vjp that scatter-adds only the rows the backward kernel
#            can write (18 + n_extra of 32): same op, ~40% less payload
#   sorted — custom_vjp that sorts (id, iota) pairs (8B payload instead of
#            riding all 32 grad columns through the sort a scatter lowers
#            to), row-gathers the grads by the permutation, and reduces
#            with a sorted segment_sum
_EPILOGUE = os.environ.get("VIDU4D_RASTER_EPILOGUE", "narrow")


def _row_gather(props: jax.Array, sorted_ids: jax.Array,
                n_used: int) -> jax.Array:
    """props (P, 32) -> rows (E, 32) with an epilogue-tuned VJP.

    The cotangent's columns past n_used are identically zero (the backward
    kernel only writes rows [0, 18+n_extra) and the grad slab is
    zero-initialized), so the transpose may drop them."""
    if _EPILOGUE == "xla":
        return props[sorted_ids]

    @jax.custom_vjp
    def gather(p, ids):
        return p[ids]

    def fwd(p, ids):
        return p[ids], (ids, p.shape[0])

    def bwd_narrow(res, g):
        ids, p = res
        gp = jnp.zeros((p, g.shape[1]), g.dtype)
        gp = gp.at[:, :n_used].set(
            jnp.zeros((p, n_used), g.dtype).at[ids].add(g[:, :n_used])
        )
        return gp, jnp.zeros(ids.shape, jax.dtypes.float0)

    def bwd_sorted(res, g):
        ids, p = res
        e = ids.shape[0]
        ids_s, perm = jax.lax.sort(
            [ids, jnp.arange(e, dtype=jnp.int32)], num_keys=1
        )
        gs = jax.ops.segment_sum(
            g[perm, :n_used], ids_s, num_segments=p,
            indices_are_sorted=True,
        )
        gp = jnp.zeros((p, g.shape[1]), g.dtype)
        return gp.at[:, :n_used].set(gs), jnp.zeros(
            ids.shape, jax.dtypes.float0)

    gather.defvjp(fwd, bwd_sorted if _EPILOGUE == "sorted" else bwd_narrow)
    return gather(props, sorted_ids)


def pack_props(proj: common.SplatProjection, colors, opacities,
               sorted_ids) -> jax.Array:
    """Gather per-splat props into the CHUNK-major (N, 32, CHUNK) slab
    (N = ceil(E/CHUNK) + 1 spare block for clamped reads).

    Layout matters enormously here: 18 per-column gathers over E≈P·span²
    sorted ids cost ~1.1 s at 3.2M entries on v5e (each lowers to a
    scalarized gather), while ONE row-gather from a pre-packed (P, 32)
    matrix + an XLA transpose costs ~12 ms (rows are contiguous 128-byte
    loads). This is the TPU equivalent of the reference's coalesced
    per-entry fetch in `duplicateWithKeys` (`rasterizer_impl.cu:290`).
    Chunk-major keeps every memref dim small — a flat (32, E) slab put E on
    the minor dim and the TPU backend crashes past ~2^20 there (the r2
    "INTERNAL: TPU backend error" at >= 100k surfels). Gradients reverse
    through the same path as one row scatter-add.
    """
    p = proj.tu.shape[0]
    n_extra = colors.shape[-1] - 3
    if n_extra > MAX_EXTRA:
        raise ValueError(
            f"pallas rasterizer supports at most {MAX_EXTRA} extra channels "
            f"(got {n_extra}); use impl='tiles' for wide feature rendering"
        )
    # affine-coefficient form of the two-plane intersection (see the slab
    # layout comment): computed ONCE per splat here (O(P) XLA, fused into
    # the pack) instead of per pixel x entry inside the kernels. Gradients
    # w.r.t. Tu/Tv/Tw/center2d chain through these lines by autodiff.
    a = jnp.cross(proj.tu, proj.tv)
    b = jnp.cross(proj.tv, proj.tw)
    c = jnp.cross(proj.tw, proj.tu)
    q = jnp.sum(a * proj.tw, axis=-1, keepdims=True)  # det(Tu,Tv,Tw)
    cx = proj.center2d[:, :1]
    cy = proj.center2d[:, 1:2]
    fis = common.FILTER_INV_SQUARE
    props = jnp.concatenate(
        [
            a, b, c,                              # rows 0-8
            q,                                    # row 9
            proj.tw[:, 2:3],                      # row 10
            fis * (cx * cx + cy * cy),            # row 11
            -2.0 * fis * cx,                      # row 12
            -2.0 * fis * cy,                      # row 13
            opacities[:, None],                   # row 14
            colors[:, :3],                        # rows 15-17
            proj.normal,                          # rows 18-20
            colors[:, 3:],                        # rows 21..21+n_extra
            jnp.zeros((p, _F - _EXTRA - n_extra), jnp.float32),
        ],
        axis=-1,
    )  # (P, 32)
    rows = _row_gather(props, sorted_ids, _EXTRA + n_extra)  # (E, 32)
    e = rows.shape[0]
    pad = (-e) % CHUNK + CHUNK  # CHUNK multiple + one spare block
    rows = jnp.pad(rows, ((0, pad), (0, 0)))
    n = rows.shape[0] // CHUNK
    return jnp.transpose(rows.reshape(n, CHUNK, _F), (0, 2, 1))


def forward_tiles_pallas(slab, tile_start, tile_count, bg_color,
                         tiles_x: int, tiles_y: int, tile: int,
                         n_extra: int = 0, n_frames: int = 1,
                         interpret: bool = False, tile_ids=None):
    """Tile-space forward: returns (color (F*T,px,3+n_extra), aux (F*T,px,12)).

    slab: (N, 32, CHUNK) chunk-major property blocks (see pack_props).
    With n_frames > 1 the tables/outputs concatenate frames along the tile
    axis and the slab concatenates per-frame chunk segments (tile_start is
    pre-offset by the caller). tile_ids: optional (T_local,) global tile
    index per program (shard_map slices; defaults to arange)."""
    num_tiles = tile_start.shape[0]
    px_n = tile * tile
    n_entries = slab.shape[0] * CHUNK
    nchan = 3 + n_extra
    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    kernel = _make_kernel(
        tiles_x, tile, n_entries, n_extra=n_extra,
        n_tiles_per_frame=(tiles_x * tiles_y if n_frames > 1 else 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, px_n, nchan), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, px_n, 12), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _F, CHUNK), jnp.float32),  # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    bg = jnp.concatenate(
        [bg_color[:nchan],
         jnp.zeros((max(0, nchan - bg_color.shape[0]),), bg_color.dtype)]
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, px_n, nchan), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, px_n, 12), jnp.float32),
        ),
        interpret=interpret,
    )(tile_ids, tile_start, tile_count, slab, bg[None, :])


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "span_cap", "interpret"),
)
def rasterize_pallas_from_projection(
    proj: common.SplatProjection,
    colors: jax.Array,
    opacities: jax.Array,
    bg_color: jax.Array,
    height: int,
    width: int,
    tile: int = 16,
    span_cap: int = 4,
    interpret: bool = False,
) -> CompositeOutput:
    """Forward rasterization via the Pallas kernel. Output contract matches
    `xla_tiles.rasterize_tiles_from_projection` (no per-tile entry budget:
    the kernel streams arbitrarily many entries per tile)."""
    tiles_y, tiles_x = common.tile_grid_shape(height, width, tile)
    px_n = tile * tile

    binning = common.bin_splats(proj, height, width, tile=tile, span_cap=span_cap)
    slab = pack_props(proj, colors, opacities, binning.sorted_splat_ids)
    color, aux = forward_tiles_pallas(
        slab, binning.tile_start, binning.tile_count, bg_color,
        tiles_x, tiles_y, tile, n_extra=colors.shape[-1] - 3,
        interpret=interpret,
    )

    def assemble(x):
        feat = x.shape[2:]
        img = x.reshape((tiles_y, tiles_x, tile, tile) + feat)
        img = jnp.swapaxes(img, 1, 2).reshape(
            (tiles_y * tile, tiles_x * tile) + feat
        )
        return img[:height, :width]

    color = assemble(color)
    aux = assemble(aux)
    return CompositeOutput(
        color=color,
        depth=aux[..., 0],
        alpha=aux[..., 1],
        normal=aux[..., 2:5],
        median_depth=aux[..., 5],
        distortion=aux[..., 6],
        median_weight=aux[..., 7],
        final_t=1.0 - aux[..., 1],
    )
