"""MXU ray-triangle intersection: Moller-Trumbore as matrix multiply.

The fastest TPU formulation for coherent ray batches (primary rays,
shadow rays toward lights).  Replaces per-node traversal entirely with a
two-phase plan:

  1. **XLA cull pre-pass** (pure vectorized array code, no kernels): the
     ray stream is split into 128-ray screen tiles; per tile a
     conservative interval-arithmetic test against *chunk* AABBs (128
     DFS-contiguous triangles per chunk — spatially compact thanks to the
     BVH leaf remap) yields a contiguous candidate chunk range [lo, lo+n).
  2. **Pallas MXU kernel**: per tile, each candidate chunk is intersected
     with TWO f32 matmuls split by precision class.  Moller-Trumbore is
     bilinear in per-ray features F = [d, o x d, o, 1] and per-triangle
     coefficients, so u_num/v_num fall out of `dot(C_uv[256,16], F)` and
     det/t_num out of `dot(C_dt[256,16], F)` for all 128x128 (tri,ray)
     pairs; acceptance tests and the closest-hit reduction are a short
     VPU epilogue.  Triangles live on sublanes and rays on lanes, so
     per-ray reductions are native sublane reduces and results write out
     as [1,128] rows — no transposes anywhere.

Derivation (matching reference shaders/rt/rt_bvh.glsl:154-170 exactly):
  pvec  = d x e2,  tvec = o - v0,  qvec = tvec x e1,  n = e1 x e2
  det   = e1 . pvec =  d . (e2 x e1)
  u_num = tvec . pvec = (o x d) . e2        - d . (e2 x v0)
  v_num = d . qvec    = (o x d) . (-e1)     - d . (v0 x e1)
  t_num = e2 . qvec   = o . n - v0 . n
All four are linear in F = [d(3), oxd(3), o(3), 1, tmax, pad].

Why this shape: scalar-core control flow and vector<->scalar syncs cost
hundreds of cycles per node on TPU (measured ~450ns/node on the packet
walk), while a 512x16x128 f32 matmul costs ~a microsecond — so we spend
MXU FLOPs to eliminate traversal control entirely.  Incoherent batches
(GI/AO) degrade to more chunks per tile; they run in pixel order with
active-masked tile culls (docs/DESIGN.md 4b — direction sorting measured
10x slower than the gated trace it saves).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS, INF
from ..scene.bvh import BVH
from .scene_analytic import Hit
from .vecmath import normalize

CHUNK = 128          # triangles per chunk
TILE_RAYS = 128      # rays per tile == lane width
SUBTILES = int(os.environ.get("ORT_SUBTILES", "32"))  # tiles per grid step
KDIM = 16            # MT feature dim fed to the matmul (10 used + tmax)
# Per-ray data streams into the kernels as separate [NT,128] SoA planes
# (o(3), d(3) [+ tmax]); m = o x d, the ones row, and padding are built
# in-kernel, so no concatenated feature buffer is ever materialized.

# MXU passes per f32 matmul: HIGHEST = 6 bf16 passes, DEFAULT = 1
# (Mosaic supports only these two).  The coefficient rows are split into
# a u|v block and a det|t block, so the closest-hit can run MIXED
# precision: 1-pass bf16 for the u/v acceptance numerators (whose
# boundaries tolerate bf16 wobble) and 6-pass f32 for det and t (whose
# error would shift hit positions and shadow-ray origins — CLAUDE.md).
# Modes: highest (both 6-pass), default (both 1-pass), mixed, x3.
# The shadow any-hit is a binary test; 1-pass bf16 measured 13.5ms
# faster per baseline frame with 0.06% checksum drift (PERF.md r2).
#
# x3: ONE bf16 pass at k=48 with the error-compensated split packed
# into the contraction dim — coef cols [hi | hi | lo] against feature
# rows [f_hi; f_lo; f_hi] gives hi*fh + hi*fl + lo*fh (the bf16_3x
# algorithm, dropping only the ~2^-16 lo*fl term), accumulated in f32
# by the MXU.  At k<=128 the pass count equals the k=16 1-pass form,
# so x3 costs what `default` costs while carrying ~16 mantissa bits:
# per group-step MXU issues drop 96 (highest) -> 16.  Both coef blocks
# store bf16 [NC,256,48] (1.5x the f32 [NC,256,16] bytes); the shadow
# kernel shares the store, so its 1-pass test upgrades to x3 accuracy
# at identical cost.  chunk_study.py (PERF.md r3) for the motivation.
_PREC = {"default": jax.lax.Precision.DEFAULT,
         "highest": jax.lax.Precision.HIGHEST,
         "x3": jax.lax.Precision.DEFAULT}
# Default x3 (r3k/r3l paired A/Bs: baseline 13.02 vs 16.54 ms, then
# 11.10 ms in the r3l nine-case record; realistic 22.87 vs 30.55;
# heavy 53.66 vs 68.73; cf_close within noise — checksum drift 3.2e-4
# relative, inside the documented bf16_3x t-error bound).
_MT_MODE = os.environ.get("ORT_MT_PRECISION", "x3")
MT_X3 = _MT_MODE == "x3"
K_EFF = 48 if MT_X3 else KDIM
MT_PREC_UV = _PREC["default" if _MT_MODE == "mixed" else _MT_MODE]
MT_PREC_DT = _PREC["highest" if _MT_MODE == "mixed" else _MT_MODE]
SHADOW_PRECISION = _PREC[os.environ.get("ORT_SHADOW_PRECISION", "default")]

# Chunks per kernel loop step (unordered walks).  Each scalar-core loop
# iteration costs ~450ns — comparable to the 512x16x128 matmul itself —
# so the unordered kernels fuse GROUP consecutive chunks into ONE
# [GROUP*256,16]x[16,128] matmul pair per step, amortizing the
# control-flow overhead GROUPx.  Must divide PAGE_CHUNKS; group bitmasks need
# ceil(PAGE_CHUNKS/GROUP) <= 32.
GROUP = int(os.environ.get("ORT_CHUNK_GROUP", "4"))

# Group-mask words per tile: the walk bitmask spans ceil(PAGE_CHUNKS /
# GROUP) groups at 32 bits per int32 word (minimum 2 keeps the meta
# layout stable for default configs).  Lets any page size ride any
# GROUP: ORT_PAGE_CHUNKS=672 at GROUP=4 (single page, unchanged MXU
# element count) needs 6 words.
_NW = max(2, -(-(-(-int(os.environ.get("ORT_PAGE_CHUNKS", "96"))
                   // GROUP)) // 32))
_ORIG_COL = 8 + _NW          # compact-mode original-subtile-index col

# Order positions per scalar step of the ORDERED front-to-back walk.
# The per-chunk walk pays the ~450ns scalar iteration per position —
# close cameras open wide windows (the 81,920-tri cf_close frame
# measured 546 ms at default knobs, r3) and the walk becomes purely
# scalar-bound.  ORT_ORDERED_GROUP=G processes G consecutive positions
# per step: chunk coef blocks load + concatenate inside one lax.cond
# (skipped groups issue no DMA), ONE [G*256,16]x[16,128] matmul pair,
# and merges run in ascending position order with each chunk's range/
# interval bit folded into the accept mask — bit-identical to the
# per-chunk walk (a masked-out merge carries through unchanged), with
# early termination at group granularity.  1 = per-chunk walk.
ORDERED_GROUP = int(os.environ.get("ORT_ORDERED_GROUP", "1"))

# Lane-packed multi-batch shadow wavefronts (ORT_SHADOW_PACK): the k
# same-shape shadow batches of a wavefront (4 disk + sun + point in
# direct lighting; S hemisphere samples in AO) today trace as k
# CONSECUTIVE tile streams — the same pixel tile walks its (nearly
# identical) chunk window k times, paying k scalar loops, k coef-load
# sequences and k cull plans.  Packing puts the k batches on LANES
# instead: one walk per pixel tile intersects each group against a
# [K_EFF, k*128] feature block (one matmul pair, k*128-wide — wider N
# amortizes the MXU weight load), under ONE union-hull cull plan.
# cf_stats 1080p: the 4 disk batches' surviving-group sets differ <2%,
# so the union walk does ~1/k the scalar steps at equal MXU elements.
# ORT_SHADOW_PACK=1 enables (opt-in pending hardware A/B).
SHADOW_PACK = os.environ.get("ORT_SHADOW_PACK", "0") == "1"

# Per-tile near-first compacted group walk (see _sorted_group_plan):
# each tile visits exactly its surviving chunk groups, nearest slab
# entry first, with tile-wide early exit once no remaining group can
# beat the running best t (closest) and faster all-occluded exits
# (shadow).  Replaces the window+bitmask walk in the UNORDERED kernels.
# ORT_GROUP_SORT=1 enables (opt-in pending hardware A/B).
GROUP_SORT = os.environ.get("ORT_GROUP_SORT", "0") == "1"

# Shared-origin kernels take the camera origin as a tiny broadcast-
# constant input instead of streaming three [NT,128] planes of the same
# value (25 MB/frame at 1080p).  ORT_SMEM_ORIGIN=0 reverts to the plane
# form (bench.py safe-mode includes it).
SMEM_ORIGIN = os.environ.get("ORT_SMEM_ORIGIN", "1") == "1"

# Multi-batch shadow wavefronts whose batches share ONE origin array
# (compute_ao: S hemisphere samples from the same offset hit points)
# materialize the origin planes once and let the kernel's index map
# repeat them per batch, instead of concatenating k identical copies.
# ORT_SHARED_SHADOW_ORIGIN=0 reverts (bench safe-mode includes it).
SHARED_SHADOW_ORIGIN = os.environ.get(
    "ORT_SHARED_SHADOW_ORIGIN", "1") == "1"

# Deferred normal extraction: the closest-hit kernel returns (t, winning
# triangle index) instead of (t, nx, ny, nz), dropping the per-chunk
# one-hot normal extraction (a [128,128] where + three masked
# multiply-reduces per merge — ~1/3 of the VPU epilogue) and the whole
# norms_ref VMEM stream; the normal is fetched afterwards by ONE flat
# XLA row-gather over the per-page normal planes (~the TAA-history
# gather form, measured ~1.2 ms per 2M indices at 1080p).  The winning
# triangle and its stored normal are selected by identical logic, so the
# result is bit-identical to the in-kernel form.  ORT_DEFER_NORMAL=1
# enables (hardware A/B pending; flip the default if it wins).
DEFER_NORMAL = os.environ.get("ORT_DEFER_NORMAL", "0") == "1"

# Inter-page t-pruning for the multi-page closest-hit walk: after each
# page's kernel, the per-tile max of the running best-t caps the NEXT
# page's chunk-range cull (`t_cap` in _tile_chunk_ranges — the same
# test the shadow path has always used with its t_max).  Exact: a
# chunk whose conservative slab-entry lower bound exceeds every
# active lane's current best cannot produce a winner (any triangle
# inside the chunk AABB hits at t >= the tile's entry bound).  This is
# the paged analog of the reference's per-ray t-pruned stack walk
# (rt_bvh.glsl:224-239) at tile granularity: close cameras resolve
# most lanes at tiny t in the page holding the nearby surface, and the
# remaining pages cull to near-empty grids — the interval test alone
# cannot see this (a close camera's diverging tile hulls pass chunks
# in every page; cf_close measured ~500 ms with full candidate ranges
# on all 7 pages).  Miss lanes carry INF so their tiles keep full
# ranges; pad rays miss in O(1) and inactive lanes are masked out.
# ORT_PAGE_TCAP=0 reverts (bench safe-mode includes it).
PAGE_TCAP = os.environ.get("ORT_PAGE_TCAP", "1") == "1"

# Shadow all-occluded early-exit cadence: the exit check reduces the
# occlusion vector to a scalar loop bound — a vector->scalar sync per
# window step in the =1 (legacy) form.  N>1 checks every N bitmask
# steps (scalar-only in between); 0 removes the exit (pure fori).
# Default 8 (r5b session, 2026-08-21): same-session baseline pair
# 9.62 ms (exit=1 canary) vs 9.49 (exit=8); cf_close 105.17 with the
# full shadow-economics stack (vs 520 at r4d defaults); the amortized
# form's extra work is bounded by K-1 group steps per tile while the
# removed sync is per-step.  ORT_SHADOW_EXIT_EVERY=1 reverts (also in
# bench safe-mode).
SHADOW_EXIT_EVERY = int(os.environ.get("ORT_SHADOW_EXIT_EVERY", "8"))

# Near-first dynamic page order (multiplies the t-cap's effect): pages
# stack into one [P,...] slab set and a lax.scan walks them through a
# data-dependent permutation — argsort of each page's AABB distance
# from the traced camera origin (or the active tiles' origin-hull
# centroid for per-pixel-origin wavefronts).  The page holding the
# nearby surface then runs first and every later page culls against
# an already-tiny cap; the static unrolled order only prunes pages
# that happen to come later in chunk preorder.  Page visit order is
# not expressible as a static jit order when the camera moves — the
# scan + gathered page slabs (~0.2 ms of HBM copy per trace at 7
# pages) is what buys the dynamic order.  ORT_PAGE_ORDER=1 enables
# (hardware A/B pending; defer-normal path keeps static order).
PAGE_ORDER = os.environ.get("ORT_PAGE_ORDER", "0") == "1"


def _origin_rows(origin):
    """[8,128] f32 whose rows 0..2 broadcast the shared origin (rows
    3..7 pad to the full f32 sublane tile)."""
    o = jnp.asarray(origin, jnp.float32)
    return jnp.broadcast_to(jnp.pad(o, (0, 5)).reshape(8, 1),
                            (8, TILE_RAYS))


def _subtiles_for(nt: int) -> int:
    # Large batched ray streams (multi-sample shadow wavefronts) amortize
    # the ~4us per-grid-step overhead with bigger blocks.
    return SUBTILES if nt <= 24576 else 4 * SUBTILES



class MXUBVH(NamedTuple):
    """Device arrays for the MXU path (a pytree).

    Coefficient rows are split by precision class (same total bytes as
    one [NC,512,16] block): the u|v numerators tolerate 1-pass bf16
    matmuls, det|t must stay 6-pass f32 in mixed mode."""
    coef_uv: jnp.ndarray       # [NC, 256, 16] f32 — u|v numerator rows
    coef_dt: jnp.ndarray       # [NC, 256, 16] f32 — det|t rows
    norms: jnp.ndarray         # [NC, 128, 8] f32 — per-tri nx,ny,nz rows
    chunk_bounds: jnp.ndarray  # [NC, 8] f32 — bmin(3), bmax(3), pad2
    tris: jnp.ndarray          # [NC*128, 12] f32 — padded (v0,e1,e2)


# Max chunks per page: keeps coef_uv + coef_dt (2x NC x 256 x 16 f32) +
# norms VMEM-resident with headroom.  Larger scenes split into pages
# traced sequentially and merged (closest-hit min / any-hit or).
# NOTE: pages with >64 chunks degrade the ordered walk's per-tile chunk
# bitmask to range-only (the mask is 2x int32); ORT_PAGE_CHUNKS=64
# trades more pages (cheap since prep is shared) for exact masks on the
# close-camera ordered path — an on-hardware A/B knob.
PAGE_CHUNKS = int(os.environ.get("ORT_PAGE_CHUNKS", "96"))


def build_mxu_paged(bvh: BVH):
    """Split a (leaf-remapped) triangle array into VMEM-sized MXU pages."""
    tris = np.asarray(bvh.tris, np.float32)
    t = max(tris.shape[0], 1)
    nc = (t + CHUNK - 1) // CHUNK
    n_pages = max((nc + PAGE_CHUNKS - 1) // PAGE_CHUNKS, 1)
    pages = []
    for p in range(n_pages):
        sl = slice(p * PAGE_CHUNKS * CHUNK,
                   min((p + 1) * PAGE_CHUNKS * CHUNK, tris.shape[0]))
        sub = BVH(bvh.bmin, bvh.bmax, bvh.left, bvh.right, bvh.first,
                  bvh.count, bvh.skip, tris[sl])
        pages.append(build_mxu_arrays(sub))
    return tuple(pages)


def build_mxu_arrays(bvh: BVH) -> MXUBVH:
    """Host-side packing of the (leaf-remapped) triangle array into
    128-triangle chunks with per-chunk AABBs and MT coefficient blocks."""
    tris = np.asarray(bvh.tris, np.float32)
    t = tris.shape[0]
    nc = max((t + CHUNK - 1) // CHUNK, 1)
    nc = -(-nc // 8) * 8  # pad to a chunk-group multiple (GROUP <= 8);
    # padded chunks have zero coef (det==0 rejects) and inverted bounds
    # (the cull never selects them)
    padded = np.zeros((nc * CHUNK, 12), np.float32)
    padded[:t, :9] = tris

    v0 = padded[:, 0:3]
    e1 = padded[:, 3:6]
    e2 = padded[:, 6:9]
    n = np.cross(e1, e2)

    def rows(d3, m3, o3, c1):
        r = np.zeros((nc * CHUNK, KDIM), np.float32)
        r[:, 0:3] = d3
        r[:, 3:6] = m3
        r[:, 6:9] = o3
        r[:, 9] = c1
        return r

    z = np.zeros_like(v0)
    c_det = rows(np.cross(e2, e1), z, z, 0.0)
    c_u = rows(-np.cross(e2, v0), e2, z, 0.0)
    c_v = rows(-np.cross(v0, e1), -e1, z, 0.0)
    c_t = rows(z, z, n, -np.sum(v0 * n, axis=1))

    coef_uv = np.zeros((nc, 2 * CHUNK, KDIM), np.float32)
    coef_dt = np.zeros((nc, 2 * CHUNK, KDIM), np.float32)
    for ci in range(nc):
        s = slice(ci * CHUNK, (ci + 1) * CHUNK)
        coef_uv[ci, 0:128] = c_u[s]
        coef_uv[ci, 128:256] = c_v[s]
        coef_dt[ci, 0:128] = c_det[s]
        coef_dt[ci, 128:256] = c_t[s]

    bounds = np.zeros((nc, 8), np.float32)
    for ci in range(nc):
        s = slice(ci * CHUNK, min((ci + 1) * CHUNK, t))
        if s.start >= t:
            bounds[ci, 0:3] = 1e30
            bounds[ci, 3:6] = -1e30
            continue
        w0 = tris[s, 0:3]
        w1 = w0 + tris[s, 3:6]
        w2 = w0 + tris[s, 6:9]
        bounds[ci, 0:3] = np.minimum(w0, np.minimum(w1, w2)).min(axis=0)
        bounds[ci, 3:6] = np.maximum(w0, np.maximum(w1, w2)).max(axis=0)

    norms = np.zeros((nc, CHUNK, 8), np.float32)
    norms[:, :, 0:3] = n.reshape(nc, CHUNK, 3)

    def pack(c):
        c = jnp.asarray(c)
        if not MT_X3:
            return c
        # bf16_3x layout: cols [hi | hi | lo] (pairs with the feature
        # rows [f_hi; f_lo; f_hi] built in _expand_features)
        hi = c.astype(jnp.bfloat16)
        lo = (c - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, hi, lo], axis=-1)

    return MXUBVH(pack(coef_uv), pack(coef_dt),
                  jnp.asarray(norms), jnp.asarray(bounds),
                  jnp.asarray(padded))


# -----------------------------------------------------------------------------
# XLA cull pre-pass
# -----------------------------------------------------------------------------

def _safe_inv(d):
    return 1.0 / jnp.where(d == 0.0, 1e-30, d)


def _tile_hulls(ro_soa, rd_soa, act=None, shared_origin=None,
                act_origin=None):
    """Per-tile interval hulls of the ray stream: for each axis,
    (o_lo, o_hi, i_lo, i_hi) [NT] min/max over the tile's ACTIVE lanes
    (i = 1/d), plus the per-tile any-active flag.  This is the part of
    the cull that reads the full ray stream — computed ONCE and shared
    by every page's chunk test on paged scenes.

    `act` (flat [R] bool or None): lanes whose results the caller
    discards are EXCLUDED from the hull — an all-inactive tile culls to
    empty (its block is skipped), and a mixed tile's hull stays tight
    around its real rays.  This is the sort-free form of active gating:
    the direction-sorted path's argsort + gathers measured ~130-145 ms
    per 2M rays on TPU (PERF.md round 2), 10x the cost of the whole
    gated any-hit trace.  Inactive lanes still flow through the kernel
    (their outputs are garbage); callers must mask.

    Everything is SoA with packed layouts — a flat [R,3] array lane-pads
    its minor dim 43x on TPU (measured: each pass over one costs ~7ms at
    12M rays).

    `act_origin` (shared-origin wavefronts only): per-batch `act` rows
    may DIFFER once per-batch window collapses (ndl gate, SPP dedup)
    fold into the mask — the single origin-plane copy must then reduce
    under the OR over batches (a lane alive in ANY batch needs its
    origin inside the hull), which the caller provides here.
    """
    nt = rd_soa[0].shape[0] // TILE_RAYS
    act_t = None if act is None else act.reshape(nt, TILE_RAYS)

    def per_axis(k):
        i = _safe_inv(rd_soa[k].reshape(nt, TILE_RAYS))
        if shared_origin is not None:
            # all rays share one origin (primary rays): the per-tile
            # origin stats are the constant itself — skip six full-stream
            # min/max reductions (even all-inactive tiles are safe: the
            # any_act gate in _tile_chunk_ranges kills them regardless
            # of their hull values)
            ok = jnp.broadcast_to(shared_origin[k], (nt,))
            o_lo = o_hi = ok
        else:
            # shared-origin wavefronts pass ONE batch of origin planes
            # (length L) while directions span k*L: reduce the single
            # copy and tile the stats per batch (per-batch `act` rows
            # are identical by construction, so the first batch's mask
            # slice is the right one)
            nt_o = ro_soa[k].shape[0] // TILE_RAYS
            o = ro_soa[k].reshape(nt_o, TILE_RAYS)
            if act_origin is not None:
                a_o = act_origin.reshape(nt_o, TILE_RAYS)
            else:
                a_o = act_t[:nt_o] if act_t is not None else None
            if a_o is not None:
                o_lo = jnp.min(jnp.where(a_o, o, INF), axis=1)
                o_hi = jnp.max(jnp.where(a_o, o, -INF), axis=1)
            else:
                o_lo, o_hi = jnp.min(o, axis=1), jnp.max(o, axis=1)
            if nt_o != nt:
                o_lo = jnp.tile(o_lo, nt // nt_o)
                o_hi = jnp.tile(o_hi, nt // nt_o)
        if act_t is not None:
            i_lo = jnp.min(jnp.where(act_t, i, INF), axis=1)
            i_hi = jnp.max(jnp.where(act_t, i, -INF), axis=1)
        else:
            i_lo, i_hi = jnp.min(i, axis=1), jnp.max(i, axis=1)
        return o_lo, o_hi, i_lo, i_hi

    axes = tuple(per_axis(k) for k in range(3))
    any_act = None if act_t is None else jnp.any(act_t, axis=1)
    return axes, any_act


def _chunk_hit_matrix(chunk_bounds, hulls, t_cap=None):
    """Per-(chunk, tile) conservative slab test for ONE page.

    Returns (hit [NC,NT] bool, tmin_lo [NC,NT] f32): `hit` marks chunks
    whose AABB the tile's ray hull may enter (t-capped when `t_cap`
    given); `tmin_lo` is the interval lower bound on any ray's slab
    entry t — exact in the sense that every real intersection of a tile
    ray with a triangle in the chunk satisfies t >= tmin_lo.  Shared by
    the range/bitmask cull and the sorted-group plan."""
    axes, any_act = hulls
    nt = axes[0][0].shape[0]
    nc = chunk_bounds.shape[0]

    # [NC, NT] orientation: NT on lanes stays packed (an [NT, NC<128]
    # array pads its minor dim to 128 lanes = 3.2x traffic here).
    tmin_lo = jnp.zeros((nc, nt), jnp.float32)
    tmax_hi = jnp.full((nc, nt), INF, jnp.float32)
    for k in range(3):
        o_lo, o_hi, i_lo, i_hi = axes[k]         # [NT]
        bmin = chunk_bounds[:, k][:, None]       # [NC,1]
        bmax = chunk_bounds[:, 3 + k][:, None]

        def interval(bval):
            a_lo = bval - o_hi[None, :]
            a_hi = bval - o_lo[None, :]
            p1 = a_lo * i_lo[None, :]
            p2 = a_lo * i_hi[None, :]
            p3 = a_hi * i_lo[None, :]
            p4 = a_hi * i_hi[None, :]
            return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                    jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

        lo0, hi0 = interval(bmin)
        lo1, hi1 = interval(bmax)
        tmin_lo = jnp.maximum(tmin_lo, jnp.minimum(lo0, lo1))
        tmax_hi = jnp.minimum(tmax_hi, jnp.maximum(hi0, hi1))

    hit = tmax_hi >= tmin_lo                     # [NC,NT]
    # Group-pad chunks carry inverted bounds (+1e30/-1e30), but interval
    # min/max products are insensitive to the swap, so they'd PASS the
    # slab test — making every tile (sky included) look occupied on any
    # page whose chunk count isn't a GROUP multiple, which defeats the
    # sparse-grid block skip and widens the ordered walk window.  Mask
    # them out explicitly.
    valid = chunk_bounds[:, 0] <= chunk_bounds[:, 3]  # [NC] False for pads
    hit = hit & valid[:, None]
    if t_cap is not None:
        hit = hit & (tmin_lo <= t_cap[None, :])
    if any_act is not None:
        # all-inactive tiles have +/-INF hulls whose interval products
        # degenerate to "pass everything" — gate them off explicitly
        hit = hit & any_act[None, :]
    return hit, tmin_lo


def _tile_chunk_ranges(chunk_bounds, hulls, t_cap=None, hit=None):
    """Conservative per-tile candidate chunk range for ONE page.

    `hulls` from _tile_hulls.  Returns (lo [NT], n [NT]) int32 such that
    any triangle intersected by any tile ray lies within chunks
    [lo, lo+n), plus the ordered/group walk bitmasks.  `hit` (from
    _chunk_hit_matrix) avoids recomputing the slab tests when the
    caller already has them.
    """
    nc = chunk_bounds.shape[0]
    if hit is None:
        hit, _ = _chunk_hit_matrix(chunk_bounds, hulls, t_cap)
    nt = hit.shape[1]

    cidx = jnp.arange(nc, dtype=jnp.int32)[:, None]
    lo = jnp.min(jnp.where(hit, cidx, nc), axis=0)
    hi = jnp.max(jnp.where(hit, cidx + 1, 0), axis=0)
    n = jnp.maximum(hi - lo, 0)

    # Per-tile 64-bit hit bitmask (two int32 words) lets the ordered
    # kernel skip non-hit chunks inside the contiguous range.  Scenes
    # with >64 chunks degrade to range-only (ordered path only).
    if nc <= 64:
        bits = hit.astype(jnp.uint32)
        w_lo = jnp.zeros(nt, jnp.uint32)
        w_hi = jnp.zeros(nt, jnp.uint32)
        for c in range(min(nc, 32)):
            w_lo = w_lo | (bits[c] << jnp.uint32(c))
        for c in range(32, nc):
            w_hi = w_hi | (bits[c] << jnp.uint32(c - 32))
    else:
        w_lo = jnp.full(nt, 0xFFFFFFFF, jnp.uint32)
        w_hi = jnp.full(nt, 0xFFFFFFFF, jnp.uint32)
    mask_lo = w_lo.astype(jnp.int32)
    mask_hi = w_hi.astype(jnp.int32)

    # Per-tile GROUP bitmask for the unordered group walk: bit g set iff
    # any chunk in absolute group [g*GROUP, (g+1)*GROUP) may hit.  TWO
    # int32 words (the mlo/mhi pattern) allow ng <= 64, i.e. pages up
    # to 64*GROUP chunks — the fewer-pages configurations (r5e) at
    # unchanged GROUP granularity.
    ng = -(-nc // GROUP)
    assert ng <= 32 * _NW, f"page too large for group mask ({nc} chunks)"
    pad = ng * GROUP - nc
    hit_p = jnp.pad(hit, ((0, pad), (0, 0))) if pad else hit
    ghit = jnp.any(hit_p.reshape(ng, GROUP, nt), axis=1)
    words = [jnp.zeros(nt, jnp.uint32) for _ in range(_NW)]
    for g in range(ng):
        words[g // 32] = words[g // 32] | (
            ghit[g].astype(jnp.uint32) << jnp.uint32(g % 32))
    glo = lo // GROUP
    ghi_g = -(-(lo + n) // GROUP)
    gn = jnp.where(n > 0, ghi_g - glo, 0)
    return (lo.astype(jnp.int32), n.astype(jnp.int32), mask_lo, mask_hi,
            glo.astype(jnp.int32), gn.astype(jnp.int32),
            *[w.astype(jnp.int32) for w in words])


def _sorted_group_plan(chunk_bounds, hulls, t_cap=None):
    """Per-tile near-first COMPACTED group walk plan (ORT_GROUP_SORT).

    The window+bitmask group walk iterates a tile's contiguous window
    [glo, glo+gn) and cond-skips bitmask gaps — close cameras measured
    ~1.7x more scalar window steps than surviving groups (cf_stats,
    272x480: 8,375 steps for 5,004 survivors), every gap step pure
    overhead, and the walk has no within-page occlusion pruning at all
    (the 2.3x fixcap headroom).  This plan gives each tile exactly its
    surviving groups, sorted by the tile's OWN conservative slab entry
    bound (near first):

      sortpos [NT, NG] i32 — k-th nearest surviving group id per tile
      sufnext [NT, NG] f32 — entry lower bound of the NEXT sorted
                             position (INF past the end): ascending
                             sort makes the suffix minimum the next
                             element, so the kernel may stop after
                             position k once every lane's running best
                             t <= sufnext[k] (a later triangle hits at
                             t >= its chunk's tmin_lo >= sufnext — the
                             strict `t < best` update can never win)

    plus the (cull, k_n) fields the drivers need.  Exactness: the
    per-chunk bound tmin_lo is conservative per tile (see
    _chunk_hit_matrix), so early exit never drops a reachable hit; the
    only divergence from the window walk is chunk visit ORDER, which
    can flip the winner between triangles at exactly equal t
    (tie-free scenes are bit-identical — same caveat as the ordered
    walk, see trace_bvh_mxu)."""
    nc = chunk_bounds.shape[0]
    hit, tmin = _chunk_hit_matrix(chunk_bounds, hulls, t_cap)
    cull = _tile_chunk_ranges(chunk_bounds, hulls, t_cap, hit=hit)
    nt = hit.shape[1]
    ng = -(-nc // GROUP)
    pad = ng * GROUP - nc
    if pad:
        hit = jnp.pad(hit, ((0, pad), (0, 0)))
        tmin = jnp.pad(tmin, ((0, pad), (0, 0)),
                       constant_values=INF)
    hit_g = hit.reshape(ng, GROUP, nt)
    ghit = jnp.any(hit_g, axis=1)                       # [NG,NT]
    gmin = jnp.min(jnp.where(hit_g, tmin.reshape(ng, GROUP, nt), INF),
                   axis=1)                              # [NG,NT]
    key = jnp.where(ghit, gmin, INF)
    order = jnp.argsort(key, axis=0).astype(jnp.int32)  # [NG,NT]
    key_sorted = jnp.take_along_axis(key, order, axis=0)
    sufnext = jnp.concatenate(
        [key_sorted[1:], jnp.full((1, nt), INF, jnp.float32)], axis=0)
    k_n = jnp.sum(ghit.astype(jnp.int32), axis=0)       # [NT]
    return cull, k_n, order.T, sufnext.T


def _soa_planes(ro_soa, rd_soa, extra=None):
    """Per-ray flat planes -> list of [NT, 128] kernel inputs (rays on
    lanes): ox, oy, oz, dx, dy, dz (+ tmax when given).  Each plane is a
    free reshape of an already-materialized component stream — the
    kernels assemble the 16 MT feature rows in-register, so the former
    [NT, FDIM, 128] concatenated feature buffer (an extra full write +
    read of the dominant HBM stream) no longer exists."""
    nt = ro_soa[0].shape[0] // TILE_RAYS
    planes = [v.reshape(nt, TILE_RAYS) for v in (*ro_soa, *rd_soa)]
    if extra is not None:
        planes.append(extra.reshape(nt, TILE_RAYS))
    return planes


def _expand_features(rows, s, with_tmax: bool, o_rows=None):
    """Subtile row s of the SoA plane refs -> [16,128] MT feature rows
    (d, o x d, o, 1, tmax, pad) built on the VPU.

    `o_rows` (shared-origin variant): a tiny [8,128] VMEM ref whose rows
    0..2 are the broadcast camera origin — `rows` then carries only the
    3 direction planes, so the kernel never streams origin planes that
    are pure constants (25 MB/frame of broadcasts at 1080p)."""
    if o_rows is not None:
        o = [o_rows[pl.ds(k, 1), :] for k in range(3)]
        d = [r[pl.ds(s, 1), :] for r in rows[0:3]]
        tmax = (rows[3][pl.ds(s, 1), :] if with_tmax
                else jnp.zeros((1, TILE_RAYS), jnp.float32))
    else:
        o = [r[pl.ds(s, 1), :] for r in rows[0:3]]
        d = [r[pl.ds(s, 1), :] for r in rows[3:6]]
        tmax = (rows[6][pl.ds(s, 1), :] if with_tmax
                else jnp.zeros((1, TILE_RAYS), jnp.float32))
    mx = o[1] * d[2] - o[2] * d[1]
    my = o[2] * d[0] - o[0] * d[2]
    mz = o[0] * d[1] - o[1] * d[0]
    ones = jnp.ones((1, TILE_RAYS), jnp.float32)
    zeros = jnp.zeros((KDIM - 11, TILE_RAYS), jnp.float32)
    f = jnp.concatenate([*d, mx, my, mz, *o, ones, tmax, zeros], axis=0)
    if not MT_X3:
        return f
    # bf16_3x feature rows [f_hi; f_lo; f_hi] (see the precision-mode
    # comment at the top): one k=48 bf16 pass = hi*fh + hi*fl + lo*fh
    fh = f.astype(jnp.bfloat16)
    fl = (f - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([fh, fl, fh], axis=0)


# -----------------------------------------------------------------------------
# Pallas kernels
# -----------------------------------------------------------------------------

def _epilogue_inputs(out_uv, out_dt, eps):
    u_num = out_uv[0:128, :]
    v_num = out_uv[128:256, :]
    det = out_dt[0:128, :]
    t_num = out_dt[128:256, :]
    ok_det = jnp.abs(det) >= 1e-8
    if KERN_VARIANT == "nodiv":
        # attribution variant: skip the [128,128] reciprocal (values
        # wrong, dataflow shape identical) — prices the divide alone
        inv = jnp.where(ok_det, det, 1.0)
    else:
        inv = 1.0 / jnp.where(ok_det, det, 1.0)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    acc = (ok_det & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
           & (u + v <= 1.0) & (t >= eps))
    return t, acc


def _gbit(words, g):
    """Bit g of the _NW-word per-tile group mask (scalar-core ops)."""
    word = words[-1]
    for i in reversed(range(len(words) - 1)):
        word = jnp.where(g < 32 * (i + 1), words[i], word)
    sh = jnp.clip(jax.lax.rem(g, 32), 0, 31)
    return (word >> sh) & 1


# Kernel-stage attribution (scripts/kernel_attrib.py): compile-time
# variants of the closest-hit kernel that keep everything else equal —
#   full   : production
#   noepi  : matmuls kept live by a 1-op min-reduce; per-chunk
#            epilogue (accept tests, winner extraction, merges) gone
#   nof    : feature rows replaced by a constant (matmuls + epilogue
#            kept); prices the per-subtile feature expansion
#   nowalk : subtile loop runs, walk body skipped (prices the grid/
#            subtile scan skeleton + init writes)
# Differences between paired timings attribute the kernel exactly.
KERN_VARIANT = os.environ.get("ORT_KERN_VARIANT", "full")


def _closest_kernel(ids_ref, perm_ref, gate_ref, gorder_ref, gbound_ref,
                    meta_ref, *refs,
                    eps: float, subtiles: int, ordered: bool,
                    shared_o: bool = False, defer: bool = False,
                    compact: bool = False, gsort: bool = False):
    i = 0
    sp_ref = sm_ref = None
    if gsort:
        # sorted-group walk plan (original-subtile-order rows):
        # sp = per-tile sorted surviving group ids, sm = next-position
        # entry bound for the early exit (_sorted_group_plan)
        sp_ref, sm_ref = refs[0:2]
        i = 2
    refs = refs[i:]
    i = 0
    if shared_o:
        # planes carry only directions; the origin rides a tiny [8,128]
        # broadcast-constant input (rows 0..2)
        plane_refs = refs[0:3]
        orow_ref = refs[3]
        i = 4
    else:
        plane_refs = refs[0:6]
        orow_ref = None
        i = 6
    cuv_ref, cdt_ref = refs[i:i + 2]
    i += 2
    norms_ref = None
    if not defer:
        norms_ref = refs[i]
        i += 1
    if defer:
        t_ref, it_ref = refs[i:i + 2]
        nx_ref = ny_ref = nz_ref = None
    else:
        t_ref, nx_ref, ny_ref, nz_ref = refs[i:i + 4]
        it_ref = None
    b = pl.program_id(0)
    # Empty-block fast path: a sky block (no candidate chunks anywhere)
    # only writes the miss pattern.
    t_ref[:, :] = jnp.full((subtiles, TILE_RAYS), INF, jnp.float32)
    if defer:
        it_ref[:, :] = jnp.full((subtiles, TILE_RAYS), -1.0, jnp.float32)
    else:
        nx_ref[:, :] = jnp.zeros((subtiles, TILE_RAYS), jnp.float32)
        ny_ref[:, :] = jnp.zeros((subtiles, TILE_RAYS), jnp.float32)
        nz_ref[:, :] = jnp.zeros((subtiles, TILE_RAYS), jnp.float32)

    tri_f = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, TILE_RAYS), 0).astype(jnp.float32)

    # per-step gate: in sparse mode only the first n_active steps carry
    # real blocks (the inactive tail keeps the miss init above — its
    # inputs are repeats of the last active block and are not read); in
    # dense mode the gate is the per-block activity flag, preserving the
    # old skip of fully-inactive (sky) blocks.
    @pl.when(gate_ref[b] > 0)
    def _():
        # All-f32 epilogue (Mosaic mishandles packed-i1 keepdims
        # reductions).  `out_uv`/`out_dt` are 256-row u|v / det|t blocks.
        # `sel` is the per-chunk selection payload: the [128,8] normal
        # rows (in-kernel extraction) or the chunk's first-triangle
        # index as an f32 scalar (deferred extraction).
        def merge_block(out_uv, out_dt, sel, carry, ok=None):
            if KERN_VARIANT == "noepi":
                # attribution variant: matmuls stay live via one
                # reduce; the whole per-chunk epilogue is gone
                keep = jnp.minimum(
                    jnp.min(out_uv, axis=0, keepdims=True),
                    jnp.min(out_dt, axis=0, keepdims=True))
                return (jnp.minimum(carry[0], keep),) + tuple(carry[1:])
            t, acc = _epilogue_inputs(out_uv, out_dt, eps)
            acc = acc & (t < carry[0])     # [128,128] tri x ray
            if ok is not None:
                # ordered-group walk: this chunk's range/interval bit —
                # a masked-out merge carries through unchanged, exactly
                # like the per-chunk walk's cond-skip
                acc = acc & ok
            tc = jnp.where(acc, t, INF)
            cmin = jnp.min(tc, axis=0, keepdims=True)          # [1,128]
            if KERN_VARIANT == "nowin":
                # attribution variant: drop the winner extraction (the
                # [128,128] compare + max-reduce) — t carry stays real,
                # the index/normal payload is wrong
                itri = jnp.zeros((1, TILE_RAYS), jnp.float32)
            else:
                win = jnp.where(tc <= cmin, tri_f + 1.0, 0.0)
                itri = jnp.max(win, axis=0, keepdims=True) - 1.0  # [1,128]
            upd = jnp.where(cmin < carry[0], 1.0, 0.0)
            if defer:
                t_best, it = carry         # [1,128] f32
                # winning tri index within the page; the one-hot normal
                # extraction happens once per frame in XLA instead
                it = upd * (itri + sel) + (1.0 - upd) * it
                # exact 0/1 select (a + upd*(b-a) cancels at INF)
                t_best = upd * cmin + (1.0 - upd) * t_best
                return t_best, it
            t_best, nx, ny, nz = carry     # [1,128] f32
            if KERN_VARIANT == "nowin":
                # (see above) skip the one-hot normal extraction too —
                # nowin prices the whole winner+payload machinery
                nx_w = ny_w = nz_w = jnp.zeros((1, TILE_RAYS), jnp.float32)
            else:
                # one-hot row of the winning triangle per ray
                onehot = jnp.where(tri_f == itri, 1.0, 0.0)    # [128,128]
                nx_w = jnp.sum(onehot * sel[:, 0:1], axis=0, keepdims=True)
                ny_w = jnp.sum(onehot * sel[:, 1:2], axis=0, keepdims=True)
                nz_w = jnp.sum(onehot * sel[:, 2:3], axis=0, keepdims=True)
            # exact 0/1 select (a + upd*(b-a) cancels at INF magnitudes)
            t_best = upd * cmin + (1.0 - upd) * t_best
            nx = upd * nx_w + (1.0 - upd) * nx
            ny = upd * ny_w + (1.0 - upd) * ny
            nz = upd * nz_w + (1.0 - upd) * nz
            return t_best, nx, ny, nz

        # fori over subtiles (dynamic reads/writes) keeps the kernel IR a
        # single copy of the body — a python-unrolled SUBTILES loop blows
        # Mosaic compile time up.
        def subtile_body(s, _):
            lo = meta_ref[s, 0]
            n = meta_ref[s, 1]
            mlo = meta_ref[s, 2]
            mhi = meta_ref[s, 3]
            # compact mode: meta rows are actives-first; col 9 carries
            # the row's ORIGINAL subtile index for plane reads + writes
            so = meta_ref[s, _ORIG_COL] if compact else s

            # Per-subtile empty gate: sky/window-collapsed subtiles skip
            # the feature expansion, the walk, and the row writes (the
            # block-wide miss init already covers them) — mixed blocks
            # at object silhouettes are mostly empty subtiles.  (In
            # compact mode the loop bound already excludes them; the
            # check stays as a zero-cost belt.)
            if ordered:
                st_active = meta_ref[s, 5] > meta_ref[s, 4]   # jhi > jlo
            else:
                st_active = meta_ref[s, 7] > 0                # gn > 0

            if KERN_VARIANT != "nowalk":
                @pl.when(st_active)
                def _work():
                    f = _expand_features(plane_refs, so, with_tmax=False,
                                         o_rows=orow_ref)  # [16,128]
                    if KERN_VARIANT == "nof":
                        # constant features: the expansion above is
                        # dead code (DCE'd); matmuls+epilogue remain
                        f = jnp.full_like(f, 0.5)
                    walk(s, so, f, lo, n, mlo, mhi)

            return 0

        def chunk_sel(ci):
            """merge_block selection payload for page-chunk index ci."""
            if defer:
                return (ci * CHUNK).astype(jnp.float32)
            return norms_ref[ci]

        def walk(s, so, f, lo, n, mlo, mhi):
            def chunk_work(ci, carry):
                out_uv = jnp.dot(cuv_ref[lo + ci], f,       # [256,128]
                                 preferred_element_type=jnp.float32,
                                 precision=MT_PREC_UV)
                out_dt = jnp.dot(cdt_ref[lo + ci], f,
                                 preferred_element_type=jnp.float32,
                                 precision=MT_PREC_DT)
                return merge_block(out_uv, out_dt, chunk_sel(lo + ci),
                                   carry)

            t0 = jnp.full((1, TILE_RAYS), INF, jnp.float32)
            z0 = jnp.zeros((1, TILE_RAYS), jnp.float32)
            i0 = jnp.full((1, TILE_RAYS), -1.0, jnp.float32)
            carry0 = (t0, i0) if defer else (t0, z0, z0, z0)

            if ordered:
                # Global front-to-back chunk order (valid when all rays
                # share one origin, e.g. primary rays): walk chunks by
                # ascending origin distance within the tile's window
                # [jlo, jhi) of order positions (positions outside it
                # cannot hold this tile's range chunks), and stop the
                # whole tile once every ray's best hit is nearer than the
                # next chunk's distance lower bound.
                nc_total = gorder_ref.shape[0]
                jlo = meta_ref[s, 4]
                jhi = meta_ref[s, 5]

                def ord_cond(st):
                    return st[0] < jhi

                if ORDERED_GROUP > 1:
                    g_ord = ORDERED_GROUP

                    def ord_body(st):
                        j, carry = st
                        cis, bits = [], []
                        any_bit = jnp.int32(0)
                        for k in range(g_ord):     # static unroll
                            jj = jnp.minimum(j + k, nc_total - 1)
                            ci = gorder_ref[jj]
                            gi = ci - lo
                            word = jnp.where(ci < 32, mlo, mhi)
                            sh = jnp.clip(
                                jnp.where(ci < 32, ci, ci - 32), 0, 31)
                            bit = jnp.where(
                                (gi >= 0) & (gi < n) & (j + k < jhi),
                                (word >> sh) & 1, 0)
                            cis.append(ci)
                            bits.append(bit)
                            any_bit = any_bit | bit

                        def group(carry):
                            # loads live INSIDE the cond: a skipped
                            # group issues no coef DMA
                            cg_uv = jnp.concatenate(
                                [cuv_ref[c] for c in cis], axis=0)
                            cg_dt = jnp.concatenate(
                                [cdt_ref[c] for c in cis], axis=0)
                            out_uv = jnp.dot(
                                cg_uv, f,
                                preferred_element_type=jnp.float32,
                                precision=MT_PREC_UV)
                            out_dt = jnp.dot(
                                cg_dt, f,
                                preferred_element_type=jnp.float32,
                                precision=MT_PREC_DT)
                            for k in range(g_ord):
                                carry = merge_block(
                                    out_uv[k * 2 * CHUNK:
                                           (k + 1) * 2 * CHUNK],
                                    out_dt[k * 2 * CHUNK:
                                           (k + 1) * 2 * CHUNK],
                                    chunk_sel(cis[k]), carry,
                                    ok=bits[k] > 0)
                            return carry

                        carry = jax.lax.cond(any_bit > 0, group,
                                             lambda cr: cr, carry)
                        nxt = jnp.minimum(j + g_ord, nc_total - 1)
                        t_cap = jnp.max(carry[0])
                        j = jnp.where(t_cap <= gbound_ref[nxt], jhi,
                                      j + g_ord)
                        return j, carry
                else:
                    def ord_body(st):
                        j, carry = st
                        gi = gorder_ref[j] - lo
                        word = jnp.where(gi + lo < 32, mlo, mhi)
                        # clamp: shift >= 32 on int32 is undefined in
                        # XLA/LLVM; only reachable when nc > 64 degrades
                        # the mask to all-ones, where any in-range bit
                        # of -1 reads as 1.
                        sh = jnp.clip(
                            jnp.where(gi + lo < 32, gi + lo, gi + lo - 32),
                            0, 31)
                        bit = jnp.where((gi >= 0) & (gi < n),
                                        (word >> sh) & 1, 0)
                        carry = jax.lax.cond(
                            bit > 0, lambda cr: chunk_work(gi, cr),
                            lambda cr: cr, carry)
                        nxt = jnp.minimum(j + 1, nc_total - 1)
                        t_cap = jnp.max(carry[0])
                        j = jnp.where(t_cap <= gbound_ref[nxt], jhi, j + 1)
                        return j, carry

                _, carry_out = jax.lax.while_loop(
                    ord_cond, ord_body, (jlo, carry0))
            else:
                # Group walk: GROUP consecutive chunks per step — ONE
                # [GROUP*256,16]x[16,128] matmul pair amortizes the ~450ns
                # scalar loop overhead GROUPx; the group bitmask skips
                # all-miss groups.
                glo = meta_ref[s, 6]
                gn = meta_ref[s, 7]   # gsort mode: k_n (survivor count)
                gws = [meta_ref[s, 8 + i] for i in range(_NW)]

                def group_work_abs(gabs, carry):
                    base = gabs * GROUP
                    cg_uv = cuv_ref[pl.ds(base, GROUP)].reshape(
                        GROUP * 2 * CHUNK, K_EFF)
                    cg_dt = cdt_ref[pl.ds(base, GROUP)].reshape(
                        GROUP * 2 * CHUNK, K_EFF)
                    out_uv = jnp.dot(cg_uv, f,
                                     preferred_element_type=jnp.float32,
                                     precision=MT_PREC_UV)
                    out_dt = jnp.dot(cg_dt, f,
                                     preferred_element_type=jnp.float32,
                                     precision=MT_PREC_DT)
                    ng = (None if defer
                          else norms_ref[pl.ds(base, GROUP)])  # [G,128,8]
                    for g in range(GROUP):               # static unroll
                        carry = merge_block(
                            out_uv[g * 256:(g + 1) * 256],
                            out_dt[g * 256:(g + 1) * 256],
                            chunk_sel(base + g) if defer else ng[g],
                            carry)
                    return carry

                if gsort:
                    # Compacted near-first walk: position k visits the
                    # tile's k-th nearest surviving group — no bitmask
                    # gaps, every step does matmul work — and the tile
                    # stops once no remaining group's entry bound can
                    # beat the running best t of any lane.  The plan
                    # rides SMEM, so each step is two direct scalar
                    # reads (a VMEM lane read needs an iota-select +
                    # reduce sync per step — measured +16..82%, r4c).
                    def sort_body(st):
                        k, carry = st
                        carry = group_work_abs(sp_ref[so, k], carry)
                        cap = jnp.max(carry[0])
                        k = jnp.where(cap <= sm_ref[so, k], gn, k + 1)
                        return k, carry

                    _, carry_out = jax.lax.while_loop(
                        lambda st: st[0] < gn, sort_body,
                        (jnp.int32(0), carry0))
                else:
                    def group_body(gi, carry):
                        bit = _gbit(gws, glo + gi)
                        return jax.lax.cond(
                            bit > 0,
                            lambda cr: group_work_abs(glo + gi, cr),
                            lambda cr: cr, carry)

                    carry_out = jax.lax.fori_loop(
                        0, gn, group_body, carry0)
            t_ref[pl.ds(so, 1), :] = carry_out[0]
            if defer:
                it_ref[pl.ds(so, 1), :] = carry_out[1]
            else:
                nx_ref[pl.ds(so, 1), :] = carry_out[1]
                ny_ref[pl.ds(so, 1), :] = carry_out[2]
                nz_ref[pl.ds(so, 1), :] = carry_out[3]

        jax.lax.fori_loop(0, gate_ref[b] if compact else subtiles,
                          subtile_body, 0)


def _shadow_kernel(ids_ref, perm_ref, gate_ref, gorder_ref, gbound_ref,
                   meta_ref, *refs, eps: float, subtiles: int,
                   ordered: bool = False, compact: bool = False,
                   gsort: bool = False):
    sp_ref = None
    if gsort:
        # sorted-group plan rows (original subtile order): near-first
        # order finds occluders sooner, so the all-occluded early exit
        # fires earlier; no bitmask-gap steps (_sorted_group_plan)
        sp_ref = refs[0]
        refs = refs[1:]
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
     cuv_ref, cdt_ref, occ_ref) = refs
    b = pl.program_id(0)
    occ_ref[:, :] = jnp.zeros((subtiles, TILE_RAYS), jnp.float32)

    @pl.when(gate_ref[b] > 0)
    def _():
        def subtile_body(s, _):
            glo = meta_ref[s, 6]
            gn = meta_ref[s, 7]
            gws = [meta_ref[s, 8 + i] for i in range(_NW)]
            so = meta_ref[s, _ORIG_COL] if compact else s

            # Per-subtile empty gate (see _closest_kernel): subtiles whose
            # cull emptied (sky lanes, collapsed windows) keep the
            # block-wide zero init and skip all vector work.  (Compact
            # mode's loop bound already excludes them.)
            if KERN_VARIANT != "nowalk":
                @pl.when(gn > 0)
                def _work():
                    walk(s, so, glo, gn, gws)
            return 0

        def walk(s, so, glo, gn, gws):
            f = _expand_features(
                (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref),
                so, with_tmax=True)
            if KERN_VARIANT == "nof":
                # attribution variant (see _closest_kernel): constant
                # features — the expansion above is DCE'd
                f = jnp.full_like(f, 0.5)
            # exact f32 window (in x3 mode f rows are bf16 splits)
            tmax = tm_ref[pl.ds(so, 1), :]     # [1,128]

            def group_work(gabs, occ):
                base = gabs * GROUP
                cg_uv = cuv_ref[pl.ds(base, GROUP)].reshape(
                    GROUP * 2 * CHUNK, K_EFF)
                cg_dt = cdt_ref[pl.ds(base, GROUP)].reshape(
                    GROUP * 2 * CHUNK, K_EFF)
                out_uv = jnp.dot(cg_uv, f,
                                 preferred_element_type=jnp.float32,
                                 precision=SHADOW_PRECISION)
                out_dt = jnp.dot(cg_dt, f,
                                 preferred_element_type=jnp.float32,
                                 precision=SHADOW_PRECISION)
                if KERN_VARIANT == "noepi":
                    # attribution variant: matmuls stay live via one
                    # reduce; acceptance epilogue gone.  occ stays ~0 so
                    # the walk never early-exits (upper-bounds the cost).
                    keep = jnp.minimum(
                        jnp.min(out_uv, axis=0, keepdims=True),
                        jnp.min(out_dt, axis=0, keepdims=True))
                    return jnp.maximum(occ, keep * 1e-30)
                for g in range(GROUP):         # static unroll
                    b_uv = out_uv[g * 256:(g + 1) * 256]
                    b_dt = out_dt[g * 256:(g + 1) * 256]
                    # Division-free acceptance: any-hit only needs SIGN
                    # tests, so multiply u/v/t numerators by sign(det)
                    # and compare against |det|-scaled bounds (a VPU
                    # divide costs ~10x a multiply).  Semantics identical
                    # to the reference's tests (rt_bvh.glsl:154-170) for
                    # det != 0.
                    det = b_dt[0:128, :]
                    sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                    adet = jnp.abs(det)
                    ok_det = adet >= 1e-8
                    u_n = b_uv[0:128, :] * sgn
                    v_n = b_uv[128:256, :] * sgn
                    t_n = b_dt[128:256, :] * sgn
                    acc = (ok_det & (u_n >= 0.0) & (u_n <= adet)
                           & (v_n >= 0.0) & (u_n + v_n <= adet)
                           & (t_n >= eps * adet) & (t_n <= tmax * adet))
                    acc_f = jnp.where(acc, 1.0, 0.0)
                    occ = jnp.maximum(occ, jnp.max(acc_f, axis=0,
                                                   keepdims=True))
                return occ

            def group_body(gi, occ):
                bit = _gbit(gws, glo + gi)
                return jax.lax.cond(
                    bit > 0, lambda oc: group_work(glo + gi, oc),
                    lambda oc: oc, occ)

            # while-loop with all-occluded early exit
            def sh_cond(st):
                return st[0] < gn

            if gsort:
                # compacted near-first walk: gn carries k_n; every step
                # intersects a real surviving group, nearest first
                # (direct SMEM scalar read — see _closest_kernel)
                def sh_body(st):
                    gi, occ = st
                    occ = group_work(sp_ref[so, gi], occ)
                    gi = jnp.where(jnp.min(occ) >= 1.0, gn, gi + 1)
                    return gi, occ
            elif SHADOW_EXIT_EVERY != 1:
                # Amortized early exit: `jnp.min(occ)` is a VECTOR->
                # SCALAR sync, and the per-step while form pays it on
                # EVERY window step — the per-step bitmask cond is pure
                # scalar-core work, so the sync dominates the step
                # (cf_close: 259k shadow window steps; the suspected
                # bulk of the 520 ms frame).  Run K bitmask-gated steps
                # scalar-only, then ONE all-occluded check.  Exact: occ
                # is monotone, a later exit only repeats no-op maxima.
                # K=0 disables the exit entirely (pure fori, no syncs).
                def sh_body(st):
                    gi, occ = st
                    k = (gn - gi if SHADOW_EXIT_EVERY == 0
                         else jnp.minimum(SHADOW_EXIT_EVERY, gn - gi))
                    occ = jax.lax.fori_loop(
                        0, k, lambda j, oc: group_body(gi + j, oc), occ)
                    gi = jnp.where(jnp.min(occ) >= 1.0, gn, gi + k)
                    return gi, occ
            else:
                def sh_body(st):
                    gi, occ = st
                    occ = group_body(gi, occ)
                    gi = jnp.where(jnp.min(occ) >= 1.0, gn, gi + 1)
                    return gi, occ

            # Dead lanes (collapsed windows: inactive rays, pads) can
            # never occlude, so seed them already-occluded — otherwise
            # one inactive lane blocks the tile's all-occluded early
            # exit forever.  Callers mask outputs with tmax > 0
            # (_shadow_unpack), so the seeded 1.0 never escapes.
            occ0 = jnp.where(tmax <= 0.0, 1.0,
                             jnp.zeros((1, TILE_RAYS), jnp.float32))
            _, occ = jax.lax.while_loop(sh_cond, sh_body,
                                        (jnp.int32(0), occ0))
            occ_ref[pl.ds(so, 1), :] = occ

        jax.lax.fori_loop(0, gate_ref[b] if compact else subtiles,
                          subtile_body, 0)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _union_vma(*xs):
    """Union of the varying-mesh-axes sets of the kernel inputs.

    Under `shard_map(..., check_vma=True)` every pallas_call out_shape
    must declare which mesh axes the output varies over; outside
    shard_map all inputs have empty vma and this reduces to frozenset().
    The union over ALL inputs is exact here: each kernel's outputs are
    per-ray and the ray planes carry the sharded axes."""
    vma = frozenset()
    for x in xs:
        vma |= getattr(jax.typeof(x), "vma", frozenset())
    return vma


def _pvary_to(vma, *xs):
    """Promote every input to the common varying set (replicated scene
    pages meet 'rows'-varying ray planes inside one kernel; interpret
    mode slices them together, so their vma must agree)."""
    if not vma:
        return xs
    return tuple(
        jax.lax.pcast(x, tuple(vma - getattr(jax.typeof(x), "vma",
                                             frozenset())), to="varying")
        for x in xs)


# Direction-sorted tracing (measured negative) lives in
# experiments/bvh_sorted.py — see PERF.md "ray sorting".


# -----------------------------------------------------------------------------
# Paged wrappers: arbitrary scene sizes via sequential page merge
# -----------------------------------------------------------------------------

def _as_pages(mxu):
    # NOTE: MXUBVH is itself a (named) tuple — test for it first.
    return (mxu,) if isinstance(mxu, MXUBVH) else tuple(mxu)


def trace_bvh_mxu_paged(mxu, ro, rd, eps: float = EPS,
                        shared_origin=None, ordered: bool = False,
                        active=None) -> Hit:
    """Closest hit across all pages (min-t merge).

    Ray padding, SoA planes and tile hulls — the passes that read the
    full ray stream — are computed ONCE and shared by every page's
    chunk test; pages merge in flat row space and the Hit assembles
    once (a per-page Hit merge would re-read [.,3] buffers n_pages
    times)."""
    pages = _as_pages(mxu)
    if len(pages) == 1:
        return trace_bvh_mxu(pages[0], ro, rd, eps, shared_origin,
                             ordered, active)
    return _trace_closest_paged(pages, ro, rd, eps, shared_origin,
                                ordered, active)


@functools.partial(jax.jit, static_argnames=("eps", "ordered"))
def _trace_closest_paged(pages, ro, rd, eps, shared_origin, ordered,
                         active):
    shape, n, ro_soa, rd_soa, _, act = _pad_tiles(ro, rd, active=active)
    hulls = _tile_hulls(ro_soa, rd_soa, act, shared_origin=shared_origin)
    if shared_origin is not None and SMEM_ORIGIN:
        nt = ro_soa[0].shape[0] // TILE_RAYS
        planes = [v.reshape(nt, TILE_RAYS) for v in rd_soa]
        o_rows = _origin_rows(shared_origin)
    else:
        planes, o_rows = _soa_planes(ro_soa, rd_soa), None
    if PAGE_ORDER and not DEFER_NORMAL:
        rows = _scan_pages(pages, planes, hulls, act, shared_origin,
                           ordered, eps, o_rows)
        return _assemble_hit(rows, ro, rd, shape, n)
    if DEFER_NORMAL:
        t0, i0 = _closest_page_rows(pages[0], planes, hulls,
                                    shared_origin, ordered, eps,
                                    o_rows=o_rows)
        base = pages[0].norms.shape[0] * CHUNK
        for page in pages[1:]:
            t1, i1 = _closest_page_rows(page, planes, hulls,
                                        shared_origin, ordered, eps,
                                        o_rows=o_rows,
                                        t_cap=_page_cap(t0, act))
            closer = t1 < t0
            t0 = jnp.where(closer, t1, t0)
            # page-local tri index -> offset into the concatenated
            # normal planes (page norms are CHUNK-padded, so the flat
            # base is each page's own padded extent)
            i0 = jnp.where(closer, i1 + float(base), i0)
            base += page.norms.shape[0] * CHUNK
        return _assemble_hit_defer((t0, i0), pages, ro, rd, shape, n)
    t0, x0, y0, z0 = _closest_page_rows(pages[0], planes, hulls,
                                        shared_origin, ordered, eps,
                                        o_rows=o_rows)
    for page in pages[1:]:
        t1, x1, y1, z1 = _closest_page_rows(page, planes, hulls,
                                            shared_origin, ordered, eps,
                                            o_rows=o_rows,
                                            t_cap=_page_cap(t0, act))
        closer = t1 < t0
        t0 = jnp.where(closer, t1, t0)
        x0 = jnp.where(closer, x1, x0)
        y0 = jnp.where(closer, y1, y0)
        z0 = jnp.where(closer, z1, z0)
    return _assemble_hit((t0, x0, y0, z0), ro, rd, shape, n)


def _stack_pages(pages):
    """Tuple of per-page MXUBVH -> ONE MXUBVH of [P,...] stacked slabs,
    short last page padded to the max chunk count with the standard pad
    conventions (zero coefs -> det==0 rejects; inverted bounds -> the
    cull never selects them).  `tris` is not read by the trace kernels
    and stays empty."""
    ncm = max(p.coef_dt.shape[0] for p in pages)
    pad_b = jnp.asarray([1e30, 1e30, 1e30, -1e30, -1e30, -1e30,
                         0.0, 0.0], jnp.float32)

    def pad_to(a, nc, fill=None):
        d = ncm - nc
        if d == 0:
            return a
        tail = (jnp.tile(fill[None], (d, 1)) if fill is not None
                else jnp.zeros((d,) + a.shape[1:], a.dtype))
        return jnp.concatenate([a, tail])

    def stack(field, fill=None):
        return jnp.stack([pad_to(getattr(p, field), p.coef_dt.shape[0],
                                 fill) for p in pages])

    return MXUBVH(stack("coef_uv"), stack("coef_dt"), stack("norms"),
                  stack("chunk_bounds", pad_b),
                  jnp.zeros((0,), jnp.float32))


def _scan_pages(pages, planes, hulls, act, shared_origin, ordered, eps,
                o_rows):
    """Near-first dynamic-order page walk (ORT_PAGE_ORDER): scan the
    stacked pages through an argsort-by-AABB-distance permutation,
    feeding each page the running best-t cap.  Returns flat rows
    (t, nx, ny, nz)."""
    st = _stack_pages(pages)
    nt = planes[0].shape[0]
    if shared_origin is not None:
        org = jnp.asarray(shared_origin, jnp.float32)
    else:
        # per-pixel origins (GI bounce): page distance from the active
        # tiles' origin-hull centroid — exactness is irrelevant, any
        # roughly-near-first order multiplies the cap
        axes, any_act = hulls

        def cmean(k):
            c = 0.5 * (axes[k][0] + axes[k][1])
            if any_act is None:
                return jnp.mean(c)
            w = any_act.astype(jnp.float32)
            return jnp.sum(c * w) / jnp.maximum(jnp.sum(w), 1.0)

        org = jnp.stack([cmean(0), cmean(1), cmean(2)])
    valid = st.chunk_bounds[:, :, 0] <= st.chunk_bounds[:, :, 3]
    bmin = jnp.min(jnp.where(valid[..., None],
                             st.chunk_bounds[:, :, 0:3], INF), axis=1)
    bmax = jnp.max(jnp.where(valid[..., None],
                             st.chunk_bounds[:, :, 3:6], -INF), axis=1)
    nearest = jnp.clip(org[None, :], bmin, bmax)
    perm = jnp.argsort(
        jnp.sum((nearest - org[None, :]) ** 2, axis=1)).astype(jnp.int32)
    no_tris = jnp.zeros((0,), jnp.float32)

    def step(carry, p):
        page = MXUBVH(st.coef_uv[p], st.coef_dt[p], st.norms[p],
                      st.chunk_bounds[p], no_tris)
        t1, x1, y1, z1 = _closest_page_rows(
            page, planes, hulls, shared_origin, ordered, eps,
            o_rows=o_rows, t_cap=_page_cap(carry[0], act))
        t0, x0, y0, z0 = carry
        closer = t1 < t0
        return (jnp.where(closer, t1, t0), jnp.where(closer, x1, x0),
                jnp.where(closer, y1, y0),
                jnp.where(closer, z1, z0)), None

    init = (jnp.full((nt, TILE_RAYS), INF, jnp.float32),
            jnp.zeros((nt, TILE_RAYS), jnp.float32),
            jnp.zeros((nt, TILE_RAYS), jnp.float32),
            jnp.zeros((nt, TILE_RAYS), jnp.float32))
    carry, _ = jax.lax.scan(step, init, perm)
    return carry


def _page_cap(t_rows, act):
    """Per-tile cap on the NEXT page's chunk cull: max running best-t
    over the tile's active lanes ([NT,128] -> [NT]).  Miss lanes hold
    INF (tile keeps full ranges); all-inactive tiles degenerate to
    -INF, which is harmless — the cull's any_act gate kills them
    regardless.  None when the knob is off."""
    if not PAGE_TCAP:
        return None
    if act is None:
        return jnp.max(t_rows, axis=1)
    a = act.reshape(t_rows.shape[0], TILE_RAYS)
    return jnp.max(jnp.where(a, t_rows, -INF), axis=1)


def trace_bvh_shadow_mxu_paged(mxu, ro, rd, t_max, eps: float = EPS,
                               active=None):
    """Any hit across all pages (or merge); prep shared across pages.

    Detects shared-origin wavefronts HERE (outside jit — tuple
    flattening would sever the array identity inside): when every batch
    passes the same origin array, only one copy enters the stream."""
    pages = _as_pages(mxu)
    if (SHADOW_PACK and isinstance(ro, (list, tuple)) and len(rd) > 1):
        # lane-packed wavefront: k batches on lanes, one walk per pixel
        # tile (shared origins detected inside by array identity)
        return _trace_shadow_packed(pages, tuple(ro), tuple(rd),
                                    tuple(t_max), eps, active)
    shared_k = 0
    if (SHARED_SHADOW_ORIGIN and isinstance(ro, (list, tuple))
            and len(ro) > 1 and all(r is ro[0] for r in ro[1:])):
        shared_k = len(ro)
        ro = (ro[0],)
    if len(pages) == 1:
        return trace_bvh_shadow_mxu(pages[0], ro, rd, t_max, eps, active,
                                    shared_k=shared_k)
    return _trace_shadow_paged(pages, ro, rd, t_max, eps, active, shared_k)


def _shadow_stream(ro_soa, rd_soa, tm, act):
    """(t_cap, hulls, planes) of a prepped shadow stream; origin planes
    may hold one batch of a shared-origin wavefront (shorter).

    Collapsed windows (tm <= 0: inactive lanes, pads, ndl-gated rays,
    SPP-dedup duplicates) fold into the HULL mask: those lanes can
    never produce a consumable occlusion (outputs are stripped by the
    tm > 0 mask in _shadow_unpack), so excluding them tightens every
    mixed tile's hull and culls all-dead tiles outright — the window
    collapse machinery becomes a cull-level saving, not just a
    dead-lane seed.  Exact by the same argument as `act` gating."""
    nt = rd_soa[0].shape[0] // TILE_RAYS
    t_cap = jnp.max(tm.reshape(nt, TILE_RAYS), axis=1)
    if os.environ.get("ORT_WINDOW_HULLS", "1") != "1":
        eff = act                      # legacy: act-only hull gating
    else:
        eff = (tm > 0.0) if act is None else (act & (tm > 0.0))
    nt_o = ro_soa[0].shape[0] // TILE_RAYS
    act_o = None
    if nt_o != nt and eff is not None:
        # shared-origin wavefront: per-batch eff rows differ — origin
        # stats reduce under the OR over batches (see _tile_hulls)
        k = nt // nt_o
        act_o = jnp.any(eff.reshape(k, nt_o * TILE_RAYS), axis=0)
    hulls = _tile_hulls(ro_soa, rd_soa, eff, act_origin=act_o)
    if nt_o != nt:
        planes = ([v.reshape(nt_o, TILE_RAYS) for v in ro_soa]
                  + [v.reshape(nt, TILE_RAYS) for v in (*rd_soa, tm)])
    else:
        planes = _soa_planes(ro_soa, rd_soa, tm)
    return t_cap, hulls, planes


def _shadow_unpack(occ_rows, shape, n, layout, tm=None):
    flat = occ_rows.reshape(-1)
    if tm is not None:
        # dead lanes (collapsed windows) are SEEDED occluded in-kernel
        # so they don't block the all-occluded early exit — strip the
        # seed here (a real occlusion needs a positive window)
        flat = jnp.where(tm.reshape(-1) > 0.0, flat, 0.0)
    if layout is None:
        return flat[:n].reshape(shape) > 0.5
    k, L, n_item = layout  # interior per-batch padding
    return flat.reshape(k, L)[:, :n_item].reshape(shape) > 0.5


@functools.partial(jax.jit, static_argnames=("eps", "shared_k"))
def _trace_shadow_paged(pages, ro, rd, t_max, eps, active, shared_k=0):
    shape, n, ro_soa, rd_soa, tm, act, layout = _shadow_prep(
        ro, rd, t_max, active, shared_k)
    t_cap, hulls, planes = _shadow_stream(ro_soa, rd_soa, tm, act)
    occ = _shadow_page_rows(pages[0], planes, hulls, t_cap, eps)
    for page in pages[1:]:
        # inter-page any-hit early-out (the shadow analog of
        # _page_cap): a tile whose active lanes are ALL already
        # occluded poisons its cap to -INF, so the next page's cull
        # drops it entirely.  Lanes with t_max <= 0 (collapsed/
        # inactive windows) count as done; pad lanes are excluded via
        # their negative sentinel t_max.
        if PAGE_TCAP:
            nt = occ.shape[0]
            need = (occ < 0.5) & (tm.reshape(nt, TILE_RAYS) > 0.0)
            if act is not None:
                need = need & act.reshape(nt, TILE_RAYS)
            cap_p = jnp.where(jnp.any(need, axis=1), t_cap, -INF)
        else:
            cap_p = t_cap
        occ = jnp.maximum(occ, _shadow_page_rows(page, planes, hulls,
                                                 cap_p, eps))
    return _shadow_unpack(occ, shape, n, layout, tm)


# -----------------------------------------------------------------------------
# Lane-packed multi-batch shadow wavefronts (ORT_SHADOW_PACK)
# -----------------------------------------------------------------------------

def _union_hulls(hulls_list):
    """Conservative union of per-batch tile hulls: one cull plan covers
    every batch's rays (exact — the union interval contains each
    batch's interval, so no chunk any batch ray can enter is culled)."""
    axes = []
    for kk in range(3):
        o_lo = functools.reduce(
            jnp.minimum, [h[0][kk][0] for h in hulls_list])
        o_hi = functools.reduce(
            jnp.maximum, [h[0][kk][1] for h in hulls_list])
        i_lo = functools.reduce(
            jnp.minimum, [h[0][kk][2] for h in hulls_list])
        i_hi = functools.reduce(
            jnp.maximum, [h[0][kk][3] for h in hulls_list])
        axes.append((o_lo, o_hi, i_lo, i_hi))
    return tuple(axes), hulls_list[0][1]


def _shadow_pack_prep(ro_seq, rd_seq, tm_seq, active):
    """k same-ITEM-shape shadow batches -> ONE pixel-tile stream with
    the k batches on lanes: per-batch SoA planes [NT,128], union hulls,
    per-tile t_cap over all batches, and the [NT, k*128] window matrix
    (lane blocks in batch order) for dead-lane seeding/unpacking."""
    k = len(rd_seq)
    shape0 = jnp.broadcast_shapes(jnp.shape(ro_seq[0])[:-1],
                                  jnp.shape(rd_seq[0])[:-1])
    n_item = int(np.prod(shape0)) if shape0 else 1
    group = TILE_RAYS * _subtiles_for(n_item // TILE_RAYS + 1)
    n_pad = -n_item % group
    nt = (n_item + n_pad) // TILE_RAYS
    shared_o = all(r is ro_seq[0] for r in ro_seq[1:])

    def flat3(a, kk, pad_val):
        v = jnp.broadcast_to(a, shape0 + (3,))[..., kk].reshape(-1)
        if n_pad:
            v = jnp.concatenate(
                [v, jnp.full((n_pad,), pad_val, jnp.float32)])
        return v

    act = act_item = None
    if active is not None:
        act_item = jnp.broadcast_to(active, shape0).reshape(-1)
        act = act_item
        if n_pad:
            act = jnp.concatenate([act, jnp.zeros(n_pad, jnp.bool_)])

    planes, hulls_list, caps, tm_rows = [], [], [], []
    o_soa0 = None
    for j in range(k):
        o_soa = (o_soa0 if (shared_o and o_soa0 is not None) else
                 tuple(flat3(ro_seq[j], kk, 1e8) for kk in range(3)))
        o_soa0 = o_soa0 if o_soa0 is not None else o_soa
        d_soa = tuple(flat3(rd_seq[j], kk, float(kk == 0))
                      for kk in range(3))
        tm_j = jnp.broadcast_to(tm_seq[j], shape0).reshape(-1)
        if act_item is not None:
            tm_j = jnp.where(act_item, tm_j, -1.0)
        if n_pad:
            tm_j = jnp.concatenate([tm_j, jnp.full((n_pad,), -1.0,
                                                   jnp.float32)])
        hulls_list.append(_tile_hulls(o_soa, d_soa, act))
        tm_t = tm_j.reshape(nt, TILE_RAYS)
        caps.append(jnp.max(tm_t, axis=1))
        tm_rows.append(tm_t)
        if j == 0 or not shared_o:
            planes += [v.reshape(nt, TILE_RAYS) for v in o_soa]
        planes += [v.reshape(nt, TILE_RAYS) for v in d_soa]
        planes.append(tm_t)
    hulls = _union_hulls(hulls_list)
    t_cap = functools.reduce(jnp.maximum, caps)
    tm_all = jnp.concatenate(tm_rows, axis=1)       # [NT, k*128]
    return ((k,) + shape0, n_item, nt, shared_o, planes, hulls, t_cap,
            tm_all)


def _shadow_kernel_pack(ids_ref, perm_ref, gate_ref, gorder_ref,
                        gbound_ref, meta_ref, *refs, eps: float,
                        subtiles: int, k: int, shared_o: bool,
                        compact: bool = False, gsort: bool = False):
    """Any-hit over k lane-packed batches: one chunk-group walk per
    PIXEL tile, each group intersected against the [K_EFF, k*128]
    feature block of all k batches at once (one matmul pair; the
    all-occluded early exit spans all k*128 lanes, dead lanes seeded).
    Plane order per _shadow_pack_prep: shared origins once or per
    batch, then (dx, dy, dz, tm) per batch."""
    sp_ref = None
    i = 0
    if gsort:
        sp_ref = refs[0]
        i = 1
    if shared_o:
        o_refs = refs[i:i + 3]
        bat_refs = [refs[i + 3 + 4 * j: i + 7 + 4 * j] for j in range(k)]
        i += 3 + 4 * k
    else:
        bat_refs = [refs[i + 7 * j: i + 7 * (j + 1)] for j in range(k)]
        i += 7 * k
    cuv_ref, cdt_ref = refs[i:i + 2]
    occ_ref = refs[i + 2]
    b = pl.program_id(0)
    w = k * TILE_RAYS
    occ_ref[:, :] = jnp.zeros((subtiles, w), jnp.float32)

    @pl.when(gate_ref[b] > 0)
    def _():
        def subtile_body(s, _):
            glo = meta_ref[s, 6]
            gn = meta_ref[s, 7]
            gws = [meta_ref[s, 8 + i] for i in range(_NW)]
            so = meta_ref[s, _ORIG_COL] if compact else s

            @pl.when(gn > 0)
            def _work():
                walk(s, so, glo, gn, gws)
            return 0

        def walk(s, so, glo, gn, gws):
            fs, tms = [], []
            for j in range(k):
                if shared_o:
                    rows = (*o_refs, *bat_refs[j])
                else:
                    rows = tuple(bat_refs[j])
                fs.append(_expand_features(rows, so, with_tmax=True))
                tms.append(rows[6][pl.ds(so, 1), :])
            f = jnp.concatenate(fs, axis=1)          # [K_EFF, k*128]
            tmax = jnp.concatenate(tms, axis=1)      # [1, k*128]

            def group_work(gabs, occ):
                base = gabs * GROUP
                cg_uv = cuv_ref[pl.ds(base, GROUP)].reshape(
                    GROUP * 2 * CHUNK, K_EFF)
                cg_dt = cdt_ref[pl.ds(base, GROUP)].reshape(
                    GROUP * 2 * CHUNK, K_EFF)
                out_uv = jnp.dot(cg_uv, f,
                                 preferred_element_type=jnp.float32,
                                 precision=SHADOW_PRECISION)
                out_dt = jnp.dot(cg_dt, f,
                                 preferred_element_type=jnp.float32,
                                 precision=SHADOW_PRECISION)
                for g in range(GROUP):               # static unroll
                    b_uv = out_uv[g * 256:(g + 1) * 256]
                    b_dt = out_dt[g * 256:(g + 1) * 256]
                    # division-free sign tests (see _shadow_kernel)
                    det = b_dt[0:128, :]
                    sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                    adet = jnp.abs(det)
                    ok_det = adet >= 1e-8
                    u_n = b_uv[0:128, :] * sgn
                    v_n = b_uv[128:256, :] * sgn
                    t_n = b_dt[128:256, :] * sgn
                    acc = (ok_det & (u_n >= 0.0) & (u_n <= adet)
                           & (v_n >= 0.0) & (u_n + v_n <= adet)
                           & (t_n >= eps * adet) & (t_n <= tmax * adet))
                    acc_f = jnp.where(acc, 1.0, 0.0)
                    occ = jnp.maximum(occ, jnp.max(acc_f, axis=0,
                                                   keepdims=True))
                return occ

            def sh_cond(st):
                return st[0] < gn

            if gsort:
                # direct SMEM scalar read — see _closest_kernel
                def sh_body(st):
                    gi, occ = st
                    occ = group_work(sp_ref[so, gi], occ)
                    gi = jnp.where(jnp.min(occ) >= 1.0, gn, gi + 1)
                    return gi, occ
            else:
                def sh_body(st):
                    gi, occ = st
                    bit = _gbit(gws, glo + gi)
                    occ = jax.lax.cond(
                        bit > 0, lambda oc: group_work(glo + gi, oc),
                        lambda oc: oc, occ)
                    gi = jnp.where(jnp.min(occ) >= 1.0, gn, gi + 1)
                    return gi, occ

            occ0 = jnp.where(tmax <= 0.0, 1.0,
                             jnp.zeros((1, w), jnp.float32))
            _, occ = jax.lax.while_loop(sh_cond, sh_body,
                                        (jnp.int32(0), occ0))
            occ_ref[pl.ds(so, 1), :] = occ

        jax.lax.fori_loop(0, gate_ref[b] if compact else subtiles,
                          subtile_body, 0)


def _shadow_pack_page_rows(mxu: MXUBVH, planes, hulls, t_cap, eps, k,
                           shared_o):
    """One page's packed any-hit kernel: occlusion rows [NT, k*128]."""
    nt = planes[0].shape[0]
    subtiles = _subtiles_for(nt)
    sort_in = ()
    if GROUP_SORT:
        cull, k_n, sortpos, _ = _sorted_group_plan(
            mxu.chunk_bounds, hulls, t_cap)
        cull = cull[:5] + (k_n.astype(jnp.int32),) + cull[6:]
        sort_in = (sortpos,)
    else:
        cull = _tile_chunk_ranges(mxu.chunk_bounds, hulls, t_cap)
    cn = cull[1]
    nc = mxu.coef_dt.shape[0]
    kern = functools.partial(_shadow_kernel_pack, eps=eps,
                             subtiles=subtiles, k=k, shared_o=shared_o,
                             compact=SUBTILE_COMPACT,
                             gsort=bool(sort_in))
    ids_in, perm, gate = _sparse_plan(cn, nt, subtiles)
    meta = _pack_meta(cull)
    if SUBTILE_COMPACT:
        meta, gate = _compact_meta(meta, ids_in, gate, subtiles, False)
    vma = _union_vma(ids_in, perm, gate, *planes)
    return pl.pallas_call(
        kern,
        grid_spec=_grid_specs(nt, 1, n_planes=len(planes),
                              n_full_inputs=2, subtiles=subtiles,
                              n_sorted=len(sort_in),
                              ng=sort_in[0].shape[1] if sort_in else 0,
                              out_width=k * TILE_RAYS),
        out_shape=jax.ShapeDtypeStruct((nt, k * TILE_RAYS), jnp.float32,
                                       vma=vma),
        interpret=_use_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*_pvary_to(vma, ids_in, perm, gate, jnp.arange(nc, dtype=jnp.int32),
                 jnp.zeros(nc, jnp.float32), meta, *sort_in, *planes,
                 mxu.coef_uv, mxu.coef_dt))


@functools.partial(jax.jit, static_argnames=("eps",))
def _trace_shadow_packed(pages, ro, rd, t_max, eps, active):
    """Paged driver for the lane-packed k-batch any-hit wavefront."""
    (shape, n_item, nt, shared_o, planes, hulls, t_cap,
     tm_all) = _shadow_pack_prep(ro, rd, t_max, active)
    k = len(rd)
    occ = _shadow_pack_page_rows(pages[0], planes, hulls, t_cap, eps, k,
                                 shared_o)
    for page in pages[1:]:
        if PAGE_TCAP:
            # tiles whose lanes (all batches) are occluded or dead drop
            # out of later pages entirely
            need = (occ < 0.5) & (tm_all > 0.0)
            cap_p = jnp.where(jnp.any(need, axis=1), t_cap, -INF)
        else:
            cap_p = t_cap
        occ = jnp.maximum(occ, _shadow_pack_page_rows(
            page, planes, hulls, cap_p, eps, k, shared_o))
    occ = jnp.where(tm_all > 0.0, occ, 0.0)         # strip dead seeds
    per_batch = occ.reshape(nt, k, TILE_RAYS).transpose(1, 0, 2)
    return (per_batch.reshape(k, nt * TILE_RAYS)[:, :n_item]
            .reshape(shape) > 0.5)


def _pad_tiles(ro, rd, extra=None, active=None):
    """[...,3] rays -> 1D SoA component planes, padded to a tile-group
    multiple.  Dummy rays point +x from far away (terminate in O(1));
    pad lanes are inactive when an `active` mask is given.

    Thin k=1 wrapper over _pad_tiles_multi (single source of truth for
    pad sentinels and group sizing); the caller shape drops the
    synthetic leading batch axis."""
    shape, n, ro_soa, rd_soa, e, act, _ = _pad_tiles_multi(
        (ro,), (rd,), None if extra is None else (extra,), active)
    return shape[1:], n, ro_soa, rd_soa, e, act


def _pad_tiles_multi(ro_seq, rd_seq, extra_seq, active, shared_k=0):
    """Tuple-of-batches form of _pad_tiles: k same-shape ray batches
    (e.g. the 4-disk + sun + point shadow wavefront) trace as ONE
    concatenated stream WITHOUT materializing the [k,...,3] stacks the
    callers used to build — each batch's component plane is sliced
    straight out of its (fused) producer.  `active` has the per-ITEM
    shape and is reused for every batch.  Returns the _pad_tiles tuple
    with shape == (k,) + item_shape, plus a `layout` field.

    `shared_k > 0` (shared-origin wavefront; ro_seq holds ONE batch):
    every batch is padded to a whole block-group so batch boundaries
    are block-aligned, the origin planes materialize ONCE (length L =
    padded item size; the kernel's index map repeats them per batch),
    and layout = (k, L, n_item) describes the interior padding for
    unpacking.  Otherwise layout is None and only the stream tail pads.
    """
    if shared_k:
        k = shared_k
        shape0 = jnp.broadcast_shapes(jnp.shape(ro_seq[0])[:-1],
                                      jnp.shape(rd_seq[0])[:-1])
        n_item = int(np.prod(shape0)) if shape0 else 1
        group = TILE_RAYS * _subtiles_for(k * n_item // TILE_RAYS + 1)
        item_pad = -n_item % group
        L = n_item + item_pad

        def comp_b(seq, kk, pad_val):
            parts = []
            for a in seq:
                parts.append(jnp.broadcast_to(a, shape0 + (3,))[..., kk]
                             .reshape(-1))
                if item_pad:
                    parts.append(jnp.full((item_pad,), pad_val,
                                          jnp.float32))
            return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

        ro_soa = (comp_b(ro_seq[:1], 0, 1e8), comp_b(ro_seq[:1], 1, 1e8),
                  comp_b(ro_seq[:1], 2, 1e8))          # ONE copy [L]
        rd_soa = (comp_b(rd_seq, 0, 1.0), comp_b(rd_seq, 1, 0.0),
                  comp_b(rd_seq, 2, 0.0))              # full [k*L]
        parts = []
        for x in extra_seq:
            parts.append(jnp.broadcast_to(x, shape0).reshape(-1))
            if item_pad:
                parts.append(jnp.zeros(item_pad, jnp.float32))
        e = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        if active is not None:
            af = jnp.broadcast_to(active, shape0).reshape(-1)
            one = [af] + ([jnp.zeros(item_pad, jnp.bool_)]
                          if item_pad else [])
            one = jnp.concatenate(one) if len(one) > 1 else one[0]
            act = jnp.concatenate([one] * k) if k > 1 else one
        else:
            act = None
        return (k,) + shape0, k * L, ro_soa, rd_soa, e, act, (k, L, n_item)

    k = len(ro_seq)
    shape0 = jnp.broadcast_shapes(jnp.shape(ro_seq[0])[:-1],
                                  jnp.shape(rd_seq[0])[:-1])
    n_item = int(np.prod(shape0)) if shape0 else 1
    n = k * n_item
    group = TILE_RAYS * _subtiles_for(n // TILE_RAYS + 1)
    n_pad = -n % group

    def comp(seq, kk, pad_val):
        flats = [jnp.broadcast_to(a, shape0 + (3,))[..., kk].reshape(-1)
                 for a in seq]
        if n_pad:
            flats.append(jnp.full((n_pad,), pad_val, jnp.float32))
        return jnp.concatenate(flats) if len(flats) > 1 else flats[0]

    ro_soa = (comp(ro_seq, 0, 1e8), comp(ro_seq, 1, 1e8),
              comp(ro_seq, 2, 1e8))
    rd_soa = (comp(rd_seq, 0, 1.0), comp(rd_seq, 1, 0.0),
              comp(rd_seq, 2, 0.0))
    if extra_seq is not None:
        flats = [jnp.broadcast_to(x, shape0).reshape(-1) for x in extra_seq]
        if n_pad:
            flats.append(jnp.zeros(n_pad, flats[0].dtype))
        e = jnp.concatenate(flats) if len(flats) > 1 else flats[0]
    else:
        e = None
    if active is not None:
        af = jnp.broadcast_to(active, shape0).reshape(-1)
        acts = [af] * k
        if n_pad:
            acts.append(jnp.zeros(n_pad, jnp.bool_))
        act = jnp.concatenate(acts) if len(acts) > 1 else acts[0]
    else:
        act = None
    return (k,) + shape0, n, ro_soa, rd_soa, e, act, None


# The GROUP-chunk matmul blocks ([GROUP*256,128] outs + epilogue temps)
# overflows the default 16MB scoped-VMEM stack by a hair; give the
# kernels explicit headroom.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _grid_specs(nt, n_out, n_planes, n_full_inputs=1, subtiles=SUBTILES,
                o_mod_blocks=None, n_sorted=0, ng=0,
                out_width=TILE_RAYS):
    """SPARSE grid plumbing: the grid still runs NB steps, but the
    active blocks are compacted to the FRONT via prefetched dynamic
    index maps (`ids_in` for inputs, `perm` for outputs):

      * steps b < n_active stream+process active block ids_in[b];
      * steps b >= n_active re-map every INPUT to the last active block
        — a repeated block index issues NO new DMA — and write only the
        miss-init rows to their (inactive) output block perm[b].

    Inactive blocks thus stop paying input streaming entirely (their
    init writes are mandatory output either way).  Sky-dominant frames
    and active-masked wavefronts have mostly-inactive blocks, so this
    removes the bulk of the per-step DMA traffic.  Scalar prefetch
    order: (ids_in, perm, gate, gorder, gbound); per-tile metadata
    stays a blocked VMEM operand — huge batched ray streams (NT ~ 100k
    tiles) would otherwise overflow SMEM."""
    def in_map(b, ids, perm, n, go, gb):
        return (ids[b], 0)

    def out_map(b, ids, perm, n, go, gb):
        return (perm[b], 0)

    out_spec = pl.BlockSpec((subtiles, out_width), out_map,
                            memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((subtiles, TILE_RAYS), in_map,
                           memory_space=pltpu.VMEM)
    plane_specs = [in_spec] * n_planes
    if o_mod_blocks is not None:
        # shared-origin wavefront: the 3 origin planes hold ONE batch
        # (o_mod_blocks blocks); batches are block-aligned, so block b
        # of the stream reads origin block ids[b] % o_mod_blocks
        def in_map_o(b, ids, perm, n, go, gb):
            return (ids[b] % o_mod_blocks, 0)
        o_spec = pl.BlockSpec((subtiles, TILE_RAYS), in_map_o,
                              memory_space=pltpu.VMEM)
        plane_specs = [o_spec] * 3 + [in_spec] * (n_planes - 3)
    # sorted-group plan inputs (sortpos/sufnext): per-tile rows blocked
    # like meta, in ORIGINAL subtile order (kernels index them with the
    # pre-compaction subtile id).  SMEM, not VMEM: the walk reads ONE
    # scalar per step with a traced column — direct SMEM indexing,
    # where a VMEM lane would need an iota-select + reduce-to-scalar
    # sync per step (measured r4c: that form was +16..82% vs the
    # window walk).  [subtiles, NG] i32/f32 is ~3 KB per buffer.
    sort_specs = [pl.BlockSpec((subtiles, ng), in_map,
                               memory_space=pltpu.SMEM)] * n_sorted
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nt // subtiles,),
        in_specs=[
            pl.BlockSpec((subtiles, META_W), in_map,
                         memory_space=pltpu.VMEM),
        ] + sort_specs + plane_specs
          + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_full_inputs,
        out_specs=[out_spec] * n_out if n_out > 1 else out_spec,
    )


META_W = 9 + _NW   # lo,n,mlo,mhi,jlo,jhi,glo,gn, _NW mask words, orig


def _pack_meta(cull, jlo=None, jhi=None):
    lo, cn, mlo, mhi, glo, gn, *gws = cull
    z = jnp.zeros_like(lo)
    return jnp.stack([lo, cn, mlo, mhi,
                      z if jlo is None else jlo,
                      z if jhi is None else jhi,
                      glo, gn, *gws, z], axis=1)


# Within-block subtile compaction: the kernels' fori over `subtiles`
# meta rows pays the scalar-core iteration cost (~hundreds of ns) for
# EMPTY subtiles too — at 1080p a silhouette-heavy frame has thousands
# of empty iterations inside otherwise-active blocks (block-level
# sparsity can't see them).  Each block's meta rows are partitioned
# actives-first (col 9 = the row's original subtile index, used for
# plane reads and output writes), and the per-step gate carries the
# ACTIVE COUNT so the kernel loop runs exactly that many iterations.
# ORT_SUBTILE_COMPACT=1 enables (hardware A/B pending).
SUBTILE_COMPACT = os.environ.get("ORT_SUBTILE_COMPACT", "0") == "1"


def _compact_meta(meta, ids_in, gate, subtiles, ordered):
    """(meta actives-first per block, gate as per-STEP active count).

    `ids_in` maps grid step -> data block (sparse plan), so the count
    for step b is the count of block ids_in[b]; inactive tail steps
    keep gate 0.  Activity uses the same per-mode criterion the kernel
    checks (ordered: jhi>jlo; else gn>0)."""
    nt = meta.shape[0]
    nb = nt // subtiles
    act = (meta[:, 5] > meta[:, 4]) if ordered else (meta[:, 7] > 0)
    mb = meta.reshape(nb, subtiles, META_W)
    ab = act.reshape(nb, subtiles)
    order = jnp.argsort(jnp.logical_not(ab), axis=1, stable=True)
    mb = jnp.take_along_axis(mb, order[:, :, None], axis=1)
    orig = jnp.broadcast_to(
        jnp.arange(subtiles, dtype=meta.dtype), (nb, subtiles))
    orig = jnp.take_along_axis(orig, order, axis=1)
    mb = mb.at[:, :, _ORIG_COL].set(orig)
    counts = jnp.sum(ab.astype(jnp.int32), axis=1)
    gate = jnp.where(gate > 0, counts[ids_in], 0).astype(jnp.int32)
    return mb.reshape(nt, META_W), gate


# ORT_SPARSE_GRID=0 reverts to the dense identity mapping: every block
# streams, and fully-inactive blocks skip their body through the
# per-block gate flag (the pre-sparse-grid behavior).
_SPARSE_GRID = os.environ.get("ORT_SPARSE_GRID", "1") == "1"


def _sparse_plan(cn, nt, subtiles=SUBTILES):
    """(ids_in [NB], perm [NB], gate [NB]) for the kernel grid.

    Sparse mode: perm lists active block ids first (stable), then
    inactive ones; ids_in repeats the LAST active id over the inactive
    tail so those steps issue no new input DMAs; gate[b] = 1 iff
    b < n_active.  Dense mode: identity maps with gate = the per-block
    activity flags, so inactive blocks still skip their kernel body."""
    nb = nt // subtiles
    flags = cn.reshape(nb, subtiles).max(axis=1) > 0
    if not _SPARSE_GRID:
        ident = jnp.arange(nb, dtype=jnp.int32)
        return ident, ident, flags.astype(jnp.int32)
    n_active = jnp.sum(flags.astype(jnp.int32))
    steps = jnp.arange(nb, dtype=jnp.int32)
    perm = jnp.argsort(jnp.logical_not(flags), stable=True).astype(
        jnp.int32)
    last = perm[jnp.maximum(n_active - 1, 0)]
    ids_in = jnp.where(steps < n_active, perm, last)
    return ids_in, perm, (steps < n_active).astype(jnp.int32)


def _global_chunk_order(mxu: MXUBVH, origin):
    """Front-to-back chunk permutation + per-position distance lower
    bounds, valid for rays sharing `origin` (dirs normalized => hit t ==
    distance).  Tiny [NC] arrays riding scalar prefetch (SMEM)."""
    bmin = mxu.chunk_bounds[:, 0:3]
    bmax = mxu.chunk_bounds[:, 3:6]
    nearest = jnp.minimum(jnp.maximum(origin, bmin), bmax)
    dist = jnp.sqrt(jnp.sum((nearest - origin) ** 2, axis=1))
    order = jnp.argsort(dist).astype(jnp.int32)
    bounds = jnp.sort(dist).astype(jnp.float32)
    return order, bounds


@functools.partial(jax.jit, static_argnames=("eps", "ordered"))
def trace_bvh_mxu(mxu: MXUBVH, ro, rd, eps: float = EPS,
                  shared_origin=None, ordered: bool = False,
                  active=None) -> Hit:
    """Closest-hit via cull + MXU MT.  Contract matches trace_bvh.

    With `ordered=True` and `shared_origin` (all rays from one point,
    e.g. primary rays), chunks walk front-to-back with tile-wide early
    termination — the closest-hit analog of the reference's near-first +
    t-pruned stack walk (rt_bvh.glsl:224-239).

    Tie caveat: the strict `t < t_best` update rule means two triangles
    in DIFFERENT chunks at exactly equal t resolve to the winner of the
    chunk visited first, and ordered/unordered walks visit chunks in
    different orders — bit-identical output between the two modes is
    guaranteed only for tie-free scenes (any non-degenerate mesh; shared
    edges hit exactly on the edge can differ in the winning normal).

    `active` (bool mask of the ray batch shape or None): inactive lanes
    are excluded from the tile cull hulls — all-inactive tiles are
    skipped block-wise, and their OUTPUT IS GARBAGE (arbitrary finite
    hit/miss); the caller must mask.  The sort-free gating path."""
    shape, n, ro_soa, rd_soa, _, act = _pad_tiles(ro, rd, active=active)
    hulls = _tile_hulls(ro_soa, rd_soa, act, shared_origin=shared_origin)
    if shared_origin is not None and SMEM_ORIGIN:
        nt = ro_soa[0].shape[0] // TILE_RAYS
        planes = [v.reshape(nt, TILE_RAYS) for v in rd_soa]
        o_rows = _origin_rows(shared_origin)
    else:
        planes, o_rows = _soa_planes(ro_soa, rd_soa), None
    rows = _closest_page_rows(mxu, planes, hulls, shared_origin, ordered,
                              eps, o_rows=o_rows)
    if DEFER_NORMAL:
        return _assemble_hit_defer(rows, (mxu,), ro, rd, shape, n)
    return _assemble_hit(rows, ro, rd, shape, n)


def _closest_page_rows(mxu: MXUBVH, planes, hulls, shared_origin, ordered,
                       eps, o_rows=None, t_cap=None):
    """One page's closest-hit kernel: flat rows (t, nx, ny, nz), each
    [NT,128].  `planes`/`hulls` are page-independent (computed once by
    the caller).  With `o_rows` (shared-origin fast path) `planes`
    holds only the 3 direction planes.  `t_cap` [NT] (inter-page
    t-pruning, _page_cap) culls chunks no lane's running best-t can
    reach."""
    nt = planes[0].shape[0]
    subtiles = _subtiles_for(nt)
    gsort = GROUP_SORT and not (ordered and shared_origin is not None)
    sort_in = ()
    if gsort:
        cull, k_n, sortpos, sufnext = _sorted_group_plan(
            mxu.chunk_bounds, hulls, t_cap)
        # gn slot carries the survivor count (walk bound + subtile gate)
        cull = cull[:5] + (k_n.astype(jnp.int32),) + cull[6:]
        sort_in = (sortpos, sufnext)
    else:
        cull = _tile_chunk_ranges(mxu.chunk_bounds, hulls, t_cap)
    lo, cn = cull[0], cull[1]
    nc = mxu.coef_dt.shape[0]
    if ordered and shared_origin is not None:
        gorder, gbound = _global_chunk_order(mxu, shared_origin)
        # Per-tile window of order positions that can hold the tile's
        # range chunks: jlo/jhi = min/max position of chunks in
        # [lo, lo+n) under the global permutation.  Distance order is
        # spatially coherent, so the window is ~n wide — without it the
        # scalar walk would pay nc iterations per subtile even for
        # tiles the cull already narrowed to a few chunks.
        inv = jnp.zeros(nc, jnp.int32).at[gorder].set(
            jnp.arange(nc, dtype=jnp.int32))
        cidx = jnp.arange(nc, dtype=jnp.int32)[None, :]
        in_range = (cidx >= lo[:, None]) & (cidx < (lo + cn)[:, None])
        jlo = jnp.min(jnp.where(in_range, inv[None, :], nc), axis=1)
        jhi = jnp.max(jnp.where(in_range, inv[None, :], -1), axis=1) + 1
    else:
        gorder = jnp.arange(nc, dtype=jnp.int32)
        gbound = jnp.zeros(nc, jnp.float32)
        jlo = jhi = None

    defer = DEFER_NORMAL
    is_ordered = ordered and shared_origin is not None
    kern = functools.partial(_closest_kernel, eps=eps, subtiles=subtiles,
                             ordered=is_ordered,
                             shared_o=o_rows is not None, defer=defer,
                             compact=SUBTILE_COMPACT, gsort=gsort)
    extra = () if o_rows is None else (o_rows,)
    full = (mxu.coef_uv, mxu.coef_dt) if defer else (
        mxu.coef_uv, mxu.coef_dt, mxu.norms)
    n_out = 2 if defer else 4
    ids_in, perm, gate = _sparse_plan(cn, nt, subtiles)
    meta = _pack_meta(cull, jlo, jhi)
    if SUBTILE_COMPACT:
        meta, gate = _compact_meta(meta, ids_in, gate, subtiles,
                                   is_ordered)
    vma = _union_vma(ids_in, perm, gate, gorder, gbound, *planes, *extra)
    return pl.pallas_call(
        kern,
        grid_spec=_grid_specs(nt, n_out, n_planes=len(planes),
                              n_full_inputs=len(full) + len(extra),
                              subtiles=subtiles, n_sorted=len(sort_in),
                              ng=sort_in[0].shape[1] if sort_in else 0),
        out_shape=[jax.ShapeDtypeStruct((nt, TILE_RAYS), jnp.float32,
                                        vma=vma)] * n_out,
        interpret=_use_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*_pvary_to(vma, ids_in, perm, gate, gorder, gbound,
                 meta, *sort_in, *planes, *extra, *full))


def _assemble_hit(rows, ro, rd, shape, n) -> Hit:
    """Flat kernel rows -> caller-shaped Hit (one pass)."""
    t_rows, nx, ny, nz = rows
    t = t_rows.reshape(-1)[:n].reshape(shape)
    hit = t < INF
    nrm = jnp.stack([nx.reshape(-1)[:n].reshape(shape),
                     ny.reshape(-1)[:n].reshape(shape),
                     nz.reshape(-1)[:n].reshape(shape)], axis=-1)
    nrm = jnp.where(hit[..., None], normalize(nrm), 0.0)
    ro_b = jnp.broadcast_to(ro, shape + (3,))
    rd_b = jnp.broadcast_to(rd, shape + (3,))
    return Hit(t, ro_b + rd_b * t[..., None], nrm,
               jnp.ones(shape, jnp.int32))


def _assemble_hit_defer(rows, pages, ro, rd, shape, n) -> Hit:
    """(t, tri-index) kernel rows -> Hit: the deferred normal fetch.

    One flat row-gather per normal component over the concatenated
    per-page normal planes (the fast TPU gather form — one linearized
    index, take along axis 0).  The gathered value is the exact stored
    normal of the winning triangle, so the result is bit-identical to
    the in-kernel one-hot extraction."""
    t_rows, it_rows = rows
    t = t_rows.reshape(-1)[:n].reshape(shape)
    hit = t < INF
    idx = jnp.maximum(
        it_rows.reshape(-1)[:n].reshape(shape).astype(jnp.int32), 0)
    comps = []
    for c in range(3):
        planes = [p.norms[:, :, c].reshape(-1) for p in pages]
        flat = planes[0] if len(planes) == 1 else jnp.concatenate(planes)
        comps.append(jnp.take(flat, idx, axis=0))
    nrm = jnp.stack(comps, axis=-1)
    nrm = jnp.where(hit[..., None], normalize(nrm), 0.0)
    ro_b = jnp.broadcast_to(ro, shape + (3,))
    rd_b = jnp.broadcast_to(rd, shape + (3,))
    return Hit(t, ro_b + rd_b * t[..., None], nrm,
               jnp.ones(shape, jnp.int32))


def _shadow_prep(ro, rd, t_max, active, shared_k=0):
    """Collapse inactive windows and pad: handles both the array form
    and the tuple-of-batches form.  Returns (..., layout); see
    _pad_tiles_multi for the shared_k layout contract."""
    if isinstance(ro, (list, tuple)):
        if active is not None:
            t_max = tuple(jnp.where(active, w, -1.0) for w in t_max)
        return _pad_tiles_multi(tuple(ro), tuple(rd), tuple(t_max), active,
                                shared_k=shared_k)
    if active is not None:
        t_max = jnp.where(active, t_max, -1.0)
    return _pad_tiles(ro, rd, t_max, active=active) + (None,)


@functools.partial(jax.jit, static_argnames=("eps", "shared_k"))
def trace_bvh_shadow_mxu(mxu: MXUBVH, ro, rd, t_max, eps: float = EPS,
                         active=None, shared_k: int = 0):
    """Any-hit with per-ray window via cull + MXU MT.  Returns bool mask.

    `active` tightens the tile cull hulls to real lanes (see
    trace_bvh_mxu); inactive lanes additionally get a collapsed window so
    their output is a guaranteed False rather than garbage.

    ro/rd/t_max may be TUPLES of k same-shape batches (a multi-light
    shadow wavefront): traced as one concatenated stream, result shape
    (k,) + item_shape, with `active` in the per-item shape — this avoids
    materializing [k,...,3] stacks caller-side."""
    shape, n, ro_soa, rd_soa, tm, act, layout = _shadow_prep(
        ro, rd, t_max, active, shared_k)
    t_cap, hulls, planes = _shadow_stream(ro_soa, rd_soa, tm, act)
    occ_rows = _shadow_page_rows(mxu, planes, hulls, t_cap, eps)
    return _shadow_unpack(occ_rows, shape, n, layout, tm)


def _shadow_page_rows(mxu: MXUBVH, planes, hulls, t_cap, eps):
    """One page's any-hit kernel: flat occlusion rows [NT,128] f32.
    Shared-origin wavefronts pass origin planes holding ONE batch
    (shorter than the direction planes); the grid spec repeats them."""
    nt = planes[3].shape[0]  # direction plane = full stream length
    subtiles = _subtiles_for(nt)
    nt_o = planes[0].shape[0]
    o_mod = None
    if nt_o != nt:
        assert nt_o % subtiles == 0, (nt_o, subtiles)
        o_mod = nt_o // subtiles
    sort_in = ()
    if GROUP_SORT:
        cull, k_n, sortpos, _ = _sorted_group_plan(
            mxu.chunk_bounds, hulls, t_cap)
        cull = cull[:5] + (k_n.astype(jnp.int32),) + cull[6:]
        sort_in = (sortpos,)
    else:
        cull = _tile_chunk_ranges(mxu.chunk_bounds, hulls, t_cap)
    cn = cull[1]
    nc = mxu.coef_dt.shape[0]
    kern = functools.partial(_shadow_kernel, eps=eps, subtiles=subtiles,
                             compact=SUBTILE_COMPACT,
                             gsort=bool(sort_in))
    ids_in, perm, gate = _sparse_plan(cn, nt, subtiles)
    meta = _pack_meta(cull)
    if SUBTILE_COMPACT:
        meta, gate = _compact_meta(meta, ids_in, gate, subtiles, False)
    vma = _union_vma(ids_in, perm, gate, *planes)
    return pl.pallas_call(
        kern,
        grid_spec=_grid_specs(nt, 1, n_planes=7, n_full_inputs=2,
                              subtiles=subtiles, o_mod_blocks=o_mod,
                              n_sorted=len(sort_in),
                              ng=sort_in[0].shape[1] if sort_in else 0),
        out_shape=jax.ShapeDtypeStruct((nt, TILE_RAYS), jnp.float32,
                                       vma=vma),
        interpret=_use_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*_pvary_to(vma, ids_in, perm, gate, jnp.arange(nc, dtype=jnp.int32),
                 jnp.zeros(nc, jnp.float32), meta, *sort_in, *planes,
                 mxu.coef_uv, mxu.coef_dt))
