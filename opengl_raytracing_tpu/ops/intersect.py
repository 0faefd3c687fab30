"""Analytic primitive intersections, vectorized over ray batches.

TPU-native counterpart of the reference's per-fragment intersection
routines (reference: shaders/rt/rt_scene_analytic.glsl:71-111 and
rt_bvh.glsl:124-170).  Instead of one invocation per pixel with early
returns, every test runs for the whole ray batch and returns (t, valid)
masks; callers combine hits with `where`-selects.  This maps cleanly onto
the VPU: no divergence, everything fuses.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import EPS
from .vecmath import dot


def intersect_plane(ro, rd, n, d, eps: float = EPS):
    """Ray vs infinite plane dot(n,x)+d=0
    (reference: shaders/rt/rt_scene_analytic.glsl:71-81).

    Returns (t, valid). t is meaningless where ~valid.
    """
    denom = dot(rd, n)
    safe = jnp.where(jnp.abs(denom) < 1e-6, 1.0, denom)
    t = -(dot(ro, n) + d) / safe
    valid = (jnp.abs(denom) >= 1e-6) & (t >= eps)
    return t, valid


def intersect_sphere(ro, rd, center, radius, eps: float = EPS):
    """Ray vs sphere, nearest positive root with the reference's
    front/back fallback (reference: shaders/rt/rt_scene_analytic.glsl:96-111).

    Returns (t, valid).
    """
    oc = ro - center
    b = dot(oc, rd)
    c2 = dot(oc, oc) - radius * radius
    disc = b * b - c2
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = -b - s
    t_far = -b + s
    t = jnp.where(t_near < eps, t_far, t_near)
    valid = (disc >= 0.0) & (t >= eps)
    return t, valid


def intersect_aabb(ro, rd_inv, bmin, bmax):
    """Slab test (reference: shaders/rt/rt_bvh.glsl:124-134).

    Returns (tmin, tmax, hit) with tmin clamped to >= 0.
    """
    t0 = (bmin - ro) * rd_inv
    t1 = (bmax - ro) * rd_inv
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    tmin = jnp.maximum(jnp.maximum(tsm[..., 0], tsm[..., 1]),
                       jnp.maximum(tsm[..., 2], 0.0))
    tmax = jnp.minimum(jnp.minimum(tbg[..., 0], tbg[..., 1]), tbg[..., 2])
    return tmin, tmax, tmax >= tmin


def intersect_triangle(ro, rd, v0, e1, e2, t_max, eps: float = EPS):
    """Moller-Trumbore with precomputed edges
    (reference: shaders/rt/rt_bvh.glsl:154-170).

    Returns (t, n_unnormalized_cross, valid).  The reference normalizes
    cross(e1,e2) at hit time; we return the raw cross so callers can defer
    normalization until after the closest-hit select.
    """
    pvec = jnp.cross(rd, e2)
    det = dot(e1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
    tvec = ro - v0
    u = dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = dot(rd, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    valid = ((jnp.abs(det) >= 1e-8)
             & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (u + v <= 1.0)
             & (t >= eps) & (t <= t_max))
    return t, jnp.cross(e1, e2), valid
