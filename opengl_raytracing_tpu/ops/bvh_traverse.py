"""BVH traversal in pure JAX: stackless skip-link walk, vectorized per ray.

TPU-native counterpart of the reference's stack-based traversal
(reference: shaders/rt/rt_bvh.glsl:193-304).  The 64-deep per-thread stack
cannot exist on a vector machine; instead nodes are laid out in DFS
preorder with skip links (see scene/bvh.py) so per-ray traversal state is
a single int32 cursor:

    cur = (aabb_hit and inner) ? cur + 1 : skip[cur]

The whole ray batch advances one node per `while_loop` iteration via HBM
gathers; leaf triangle tests are unrolled to LEAF_MAX with masks.  This is
the portable/correctness path — ops/bvh_mxu.py holds the TPU production
kernels (cull + MXU matmul); experiments/bvh_pallas.py archives the
packet-walk alternative (measured slower on the dev slice).

Parity notes: identical hit criteria (slab test with tmin>=0, Moller-
Trumbore with eps/t_max window, t-pruning `tmin > t_best` skip), identical
results to the reference up to traversal order (closest hit is order-
independent; equal-t ties may differ).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import EPS, INF
from ..scene.bvh import BVHArrays, LEAF_MAX
from .intersect import intersect_aabb, intersect_triangle
from .scene_analytic import Hit
from .vecmath import normalize


def _safe_inv(rd):
    # GLSL computes 1.0/rd and relies on IEEE inf; keep that behavior but
    # avoid 0/0 NaNs by nudging exact zeros.
    z = rd == 0.0
    rd = jnp.where(z, 1e-30, rd)
    return 1.0 / rd


def _leaf_test(bvh: BVHArrays, ro, rd, first, count, is_active_leaf, t_best,
               n_best, eps, any_hit_tmax=None):
    """Unrolled <=LEAF_MAX triangle tests for the current node of each ray."""
    n_t = bvh.tris.shape[0]
    occluded = jnp.zeros(jnp.shape(t_best), bool)
    for j in range(LEAF_MAX):
        idx = jnp.clip(first + j, 0, n_t - 1)
        tri = bvh.tris[idx]  # gather [R,12]
        v0, e1, e2 = tri[..., 0:3], tri[..., 3:6], tri[..., 6:9]
        lane = is_active_leaf & (j < count)
        if any_hit_tmax is None:
            t, cr, v = intersect_triangle(ro, rd, v0, e1, e2, t_best, eps)
            upd = lane & v
            t_best = jnp.where(upd, t, t_best)
            n_best = jnp.where(upd[..., None], cr, n_best)
        else:
            t, _, v = intersect_triangle(ro, rd, v0, e1, e2, any_hit_tmax, eps)
            occluded = occluded | (lane & v)
    return t_best, n_best, occluded


def trace_bvh(bvh: BVHArrays, ro, rd, eps: float = EPS) -> Hit:
    """Closest-hit traversal (reference: shaders/rt/rt_bvh.glsl:193-243).

    ro/rd: [...,3].  Returns Hit with mat=1 (triangles shade as diffuse,
    reference: rt_bvh.glsl:197,221).
    """
    n_nodes = bvh.bounds.shape[0]
    shape = jnp.broadcast_shapes(jnp.shape(ro)[:-1], jnp.shape(rd)[:-1])
    ro = jnp.broadcast_to(ro, shape + (3,))
    rd = jnp.broadcast_to(rd, shape + (3,))
    rd_inv = _safe_inv(rd)

    def cond(state):
        cur, _, _ = state
        return jnp.any(cur < n_nodes)

    def body(state):
        cur, t_best, n_best = state
        active = cur < n_nodes
        ci = jnp.clip(cur, 0, n_nodes - 1)
        b = bvh.bounds[ci]           # [R,8]
        m = bvh.meta[ci]             # [R,4]
        skip, first, count = m[..., 0], m[..., 1], m[..., 2]
        tmin, _, bhit = intersect_aabb(ro, rd_inv, b[..., 0:3], b[..., 3:6])
        bhit = bhit & (tmin <= t_best)   # t-pruning, rt_bvh.glsl:208
        is_leaf = count > 0
        t_best, n_best, _ = _leaf_test(
            bvh, ro, rd, first, count, active & bhit & is_leaf,
            t_best, n_best, eps)
        nxt = jnp.where(bhit & ~is_leaf, cur + 1, skip)
        cur = jnp.where(active, nxt, cur)
        return cur, t_best, n_best

    # carry inits derive from the (possibly sharded) ray stream so their
    # shard_map variance matches the body outputs (constant inits are
    # "unvarying" and the while_loop type check rejects the mix)
    vary0 = 0.0 * rd[..., 0]
    cur0 = vary0.astype(jnp.int32)
    t0 = vary0 + INF
    nb0 = jnp.zeros(shape + (3,), jnp.float32) + vary0[..., None]
    _, t_best, n_best = jax.lax.while_loop(cond, body, (cur0, t0, nb0))

    hit = t_best < INF
    n = jnp.where(hit[..., None], normalize(n_best), 0.0)
    return Hit(t_best, ro + rd * t_best[..., None], n,
               jnp.ones(shape, jnp.int32))


def trace_bvh_shadow(bvh: BVHArrays, ro, rd, t_max, eps: float = EPS):
    """Any-hit traversal with early out
    (reference: shaders/rt/rt_bvh.glsl:260-304).  Returns bool mask."""
    n_nodes = bvh.bounds.shape[0]
    shape = jnp.broadcast_shapes(jnp.shape(ro)[:-1], jnp.shape(rd)[:-1],
                                 jnp.shape(t_max))
    ro = jnp.broadcast_to(ro, shape + (3,))
    rd = jnp.broadcast_to(rd, shape + (3,))
    t_max = jnp.broadcast_to(t_max, shape)
    rd_inv = _safe_inv(rd)

    def cond(state):
        cur, occ = state
        return jnp.any((cur < n_nodes) & ~occ)

    def body(state):
        cur, occ = state
        active = (cur < n_nodes) & ~occ
        ci = jnp.clip(cur, 0, n_nodes - 1)
        b = bvh.bounds[ci]
        m = bvh.meta[ci]
        skip, first, count = m[..., 0], m[..., 1], m[..., 2]
        tmin, _, bhit = intersect_aabb(ro, rd_inv, b[..., 0:3], b[..., 3:6])
        bhit = bhit & (tmin <= t_max)
        is_leaf = count > 0
        _, _, occ_new = _leaf_test(
            bvh, ro, rd, first, count, active & bhit & is_leaf,
            t_max, jnp.zeros(shape + (3,), jnp.float32), eps,
            any_hit_tmax=t_max)
        occ = occ | occ_new
        nxt = jnp.where(bhit & ~is_leaf, cur + 1, skip)
        cur = jnp.where(active & ~occ, nxt, jnp.where(occ, n_nodes, cur))
        return cur, occ

    vary0 = 0.0 * rd[..., 0]  # shard_map-variance-correct zeros (see trace_bvh)
    cur0 = vary0.astype(jnp.int32)
    occ0 = cur0 > 0
    _, occ = jax.lax.while_loop(cond, body, (cur0, occ0))
    return occ


def trace_brute(tris, ro, rd, eps: float = EPS) -> Hit:
    """Brute-force closest hit over all triangles [T,>=9] — the oracle the
    BVH paths are validated against in tests."""
    shape = jnp.broadcast_shapes(jnp.shape(ro)[:-1], jnp.shape(rd)[:-1])
    t_best = jnp.full(shape, INF, jnp.float32)
    n_best = jnp.zeros(shape + (3,), jnp.float32)
    for k in range(tris.shape[0]):
        v0, e1, e2 = tris[k, 0:3], tris[k, 3:6], tris[k, 6:9]
        t, cr, v = intersect_triangle(ro, rd, v0, e1, e2, t_best, eps)
        upd = v
        t_best = jnp.where(upd, t, t_best)
        n_best = jnp.where(upd[..., None], cr, n_best)
    hit = t_best < INF
    n = jnp.where(hit[..., None], normalize(n_best), 0.0)
    return Hit(t_best, ro + rd * t_best[..., None], n,
               jnp.ones(shape, jnp.int32))
