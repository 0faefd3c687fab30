"""Pallas TPU packet-traversal kernels for the skip-link BVH.

This is the performance path replacing the reference's per-thread
stack traversal (reference: shaders/rt/rt_bvh.glsl:193-304), re-designed
for the TPU's scalar+vector split:

  * a *tile* of 8x128 = 1024 rays traverses together;
  * ONE shared scalar cursor walks the preorder skip-link tree
    (`next = any_ray_hit && inner ? cur+1 : skip[cur]`) — traversal
    control is pure scalar-core work, node data comes from scalar VMEM
    loads broadcast to all lanes: ZERO per-lane gathers;
  * AABB slab tests and Moller-Trumbore run on the VPU across the tile;
  * the whole BVH (node bounds/meta + triangles) is VMEM-resident —
    a bunny-scale scene is ~0.3 MB against ~128 MB of VMEM.

Correctness note: the leaf loop tests a leaf's triangles for *all* rays
in the tile, not only rays whose box test passed.  This is exact: a
triangle lies inside its leaf AABB, so a ray that misses the box (or is
t-pruned there) cannot produce an accepted intersection anyway — the
eps/t_max window rejects it.  Results are bit-identical to the per-ray
traversal up to closest-hit tie order.

Tiles inherit image-space coherence from scanline order (an 8x128 block
= a 8-row x 128-col screen tile after the wrapper's reshape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS, INF
from ..scene.bvh import BVHArrays
from ..ops.scene_analytic import Hit
from ..ops.vecmath import normalize

TILE_S, TILE_L = 8, 128
TILE = TILE_S * TILE_L


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _safe_inv(d):
    return 1.0 / jnp.where(d == 0.0, 1e-30, d)


def _slab(b, oxv, oyv, ozv, ixv, iyv, izv):
    """Vectorized slab test of the tile against one node's AABB scalars."""
    t0x = (b[0] - oxv) * ixv
    t1x = (b[3] - oxv) * ixv
    t0y = (b[1] - oyv) * iyv
    t1y = (b[4] - oyv) * iyv
    t0z = (b[2] - ozv) * izv
    t1z = (b[5] - ozv) * izv
    tsm_x, tbg_x = jnp.minimum(t0x, t1x), jnp.maximum(t0x, t1x)
    tsm_y, tbg_y = jnp.minimum(t0y, t1y), jnp.maximum(t0y, t1y)
    tsm_z, tbg_z = jnp.minimum(t0z, t1z), jnp.maximum(t0z, t1z)
    tmin = jnp.maximum(jnp.maximum(tsm_x, tsm_y), jnp.maximum(tsm_z, 0.0))
    tmax = jnp.minimum(jnp.minimum(tbg_x, tbg_y), tbg_z)
    return tmin, tmax


def _tri_scalars(tris_ref, idx):
    t = [tris_ref[idx, k] for k in range(9)]
    return t  # v0(3), e1(3), e2(3)


def _mt_test(tri, oxv, oyv, ozv, dxv, dyv, dzv, t_window, eps):
    """Moller-Trumbore for one (scalar) triangle against the ray tile.

    Returns (t, valid, (cnx, cny, cnz) scalar cross for the normal).
    (reference: shaders/rt/rt_bvh.glsl:154-170)
    """
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = tri
    # pvec = cross(d, e2) — per-lane
    px = dyv * e2z - dzv * e2y
    py = dzv * e2x - dxv * e2z
    pz = dxv * e2y - dyv * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
    tx = oxv - v0x
    ty = oyv - v0y
    tz = ozv - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = cross(tvec, e1)
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dxv * qx + dyv * qy + dzv * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = ((jnp.abs(det) >= 1e-8)
             & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (u + v <= 1.0)
             & (t >= eps) & (t <= t_window))
    # geometric normal cross(e1,e2): scalar (same for the whole tile)
    cnx = e1y * e2z - e1z * e2y
    cny = e1z * e2x - e1x * e2z
    cnz = e1x * e2y - e1y * e2x
    return t, valid, (cnx, cny, cnz)


def _closest_kernel(bounds_ref, meta_ref, tris_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    t_ref, nx_ref, ny_ref, nz_ref, *, leaf_max: int,
                    eps: float):
    n_nodes = bounds_ref.shape[0]
    oxv, oyv, ozv = ox_ref[:], oy_ref[:], oz_ref[:]
    dxv, dyv, dzv = dx_ref[:], dy_ref[:], dz_ref[:]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)

    def cond(st):
        return st[0] < n_nodes

    def body(st):
        cur, t_best, nxv, nyv, nzv = st
        b = [bounds_ref[cur, k] for k in range(6)]
        skip = meta_ref[cur, 0]
        first = meta_ref[cur, 1]
        count = meta_ref[cur, 2]
        tmin, tmax = _slab(b, oxv, oyv, ozv, ixv, iyv, izv)
        hitv = (tmax >= tmin) & (tmin <= t_best)
        any_hit = jnp.any(hitv)
        is_leaf = count > 0

        def do_leaf(st2):
            t_best, nxv, nyv, nzv = st2

            def tri_body(j, st3):
                t_best, nxv, nyv, nzv = st3
                tri = _tri_scalars(tris_ref, first + j)
                t, valid, (cnx, cny, cnz) = _mt_test(
                    tri, oxv, oyv, ozv, dxv, dyv, dzv, t_best, eps)
                upd = valid & (t < t_best)
                t_best = jnp.where(upd, t, t_best)
                nxv = jnp.where(upd, cnx, nxv)
                nyv = jnp.where(upd, cny, nyv)
                nzv = jnp.where(upd, cnz, nzv)
                return t_best, nxv, nyv, nzv

            return jax.lax.fori_loop(0, count, tri_body,
                                     (t_best, nxv, nyv, nzv))

        t_best, nxv, nyv, nzv = jax.lax.cond(
            is_leaf & any_hit, do_leaf, lambda s: s,
            (t_best, nxv, nyv, nzv))

        descend = any_hit & jnp.logical_not(is_leaf)
        cur = jnp.where(descend, cur + 1, skip)
        return cur, t_best, nxv, nyv, nzv

    t0 = jnp.full((TILE_S, TILE_L), INF, jnp.float32)
    z = jnp.zeros((TILE_S, TILE_L), jnp.float32)
    _, t_best, nxv, nyv, nzv = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, z, z, z))
    t_ref[:] = t_best
    nx_ref[:] = nxv
    ny_ref[:] = nyv
    nz_ref[:] = nzv


def _shadow_kernel(bounds_ref, meta_ref, tris_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                   occ_ref, *, leaf_max: int, eps: float):
    n_nodes = bounds_ref.shape[0]
    oxv, oyv, ozv = ox_ref[:], oy_ref[:], oz_ref[:]
    dxv, dyv, dzv = dx_ref[:], dy_ref[:], dz_ref[:]
    tmaxv = tmax_ref[:]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)

    def cond(st):
        cur, occ = st
        return (cur < n_nodes) & jnp.logical_not(jnp.all(occ))

    def body(st):
        cur, occ = st
        b = [bounds_ref[cur, k] for k in range(6)]
        skip = meta_ref[cur, 0]
        first = meta_ref[cur, 1]
        count = meta_ref[cur, 2]
        tmin, tmax = _slab(b, oxv, oyv, ozv, ixv, iyv, izv)
        hitv = (tmax >= tmin) & (tmin <= tmaxv) & jnp.logical_not(occ)
        any_hit = jnp.any(hitv)
        is_leaf = count > 0

        def do_leaf(occ2):
            def tri_body(j, occ3):
                tri = _tri_scalars(tris_ref, first + j)
                _, valid, _ = _mt_test(tri, oxv, oyv, ozv, dxv, dyv, dzv,
                                       tmaxv, eps)
                return occ3 | valid

            return jax.lax.fori_loop(0, count, tri_body, occ2)

        occ = jax.lax.cond(is_leaf & any_hit, do_leaf, lambda s: s, occ)
        descend = any_hit & jnp.logical_not(is_leaf)
        cur = jnp.where(descend, cur + 1, skip)
        return cur, occ

    occ0 = jnp.zeros((TILE_S, TILE_L), bool)
    _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0), occ0))
    occ_ref[:] = occ.astype(jnp.float32)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _tile_spec():
    return pl.BlockSpec((TILE_S, TILE_L), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _flatten_rays(ro, rd, extra=None):
    """[...,3] rays -> padded SoA [S,128] arrays + shape/pad info."""
    shape = jnp.broadcast_shapes(jnp.shape(ro)[:-1], jnp.shape(rd)[:-1],
                                 () if extra is None else jnp.shape(extra))
    ro = jnp.broadcast_to(ro, shape + (3,)).reshape(-1, 3)
    rd = jnp.broadcast_to(rd, shape + (3,)).reshape(-1, 3)
    n = ro.shape[0]
    n_pad = -n % TILE
    if n_pad:
        # dummy rays pointing +x from far away: terminate in O(1) steps
        ro = jnp.concatenate(
            [ro, jnp.broadcast_to(jnp.asarray([1e8, 1e8, 1e8], jnp.float32),
                                  (n_pad, 3))])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                                  (n_pad, 3))])
    s = (n + n_pad) // TILE_L
    cols = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]]
    if extra is not None:
        e = jnp.broadcast_to(extra, shape).reshape(-1)
        if n_pad:
            e = jnp.concatenate([e, jnp.zeros(n_pad, e.dtype)])
        cols.append(e)
    return shape, n, [c.reshape(s, TILE_L) for c in cols], s


@functools.partial(jax.jit, static_argnames=("eps",))
def trace_bvh_packet(bvh: BVHArrays, ro, rd, eps: float = EPS) -> Hit:
    """Closest-hit packet traversal.  Same contract as
    bvh_traverse.trace_bvh (mat=1, normalized geometric normal)."""
    shape, n, (ox, oy, oz, dx, dy, dz), s = _flatten_rays(ro, rd)
    grid = s // TILE_S
    out_shape = [jax.ShapeDtypeStruct((s, TILE_L), jnp.float32)] * 4
    kern = functools.partial(_closest_kernel, leaf_max=8, eps=eps)
    t, nx, ny, nz = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=out_shape,
        in_specs=[_full_spec()] * 3 + [_tile_spec()] * 6,
        out_specs=[_tile_spec()] * 4,
        interpret=_use_interpret(),
    )(bvh.bounds, bvh.meta, bvh.tris, ox, oy, oz, dx, dy, dz)

    t = t.reshape(-1)[:n].reshape(shape)
    nrm = jnp.stack([nx.reshape(-1)[:n], ny.reshape(-1)[:n],
                     nz.reshape(-1)[:n]], axis=-1).reshape(shape + (3,))
    hit = t < INF
    nrm = jnp.where(hit[..., None], normalize(nrm), 0.0)
    ro_b = jnp.broadcast_to(ro, shape + (3,))
    rd_b = jnp.broadcast_to(rd, shape + (3,))
    return Hit(t, ro_b + rd_b * t[..., None], nrm,
               jnp.ones(shape, jnp.int32))


@functools.partial(jax.jit, static_argnames=("eps",))
def trace_bvh_shadow_packet(bvh: BVHArrays, ro, rd, t_max, eps: float = EPS):
    """Any-hit packet traversal with per-ray t_max.  Returns bool mask."""
    shape, n, (ox, oy, oz, dx, dy, dz, tm), s = _flatten_rays(ro, rd, t_max)
    grid = s // TILE_S
    kern = functools.partial(_shadow_kernel, leaf_max=8, eps=eps)
    occ = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((s, TILE_L), jnp.float32),
        in_specs=[_full_spec()] * 3 + [_tile_spec()] * 7,
        out_specs=_tile_spec(),
        interpret=_use_interpret(),
    )(bvh.bounds, bvh.meta, bvh.tris, ox, oy, oz, dx, dy, dz, tm)
    return occ.reshape(-1)[:n].reshape(shape) > 0.5
