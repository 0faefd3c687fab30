"""Analytic test scene and sky, vectorized over ray batches.

TPU-native counterpart of reference: shaders/rt/rt_scene_analytic.glsl.
The GLSL per-fragment if-chains become closest-hit `where`-selects over
the whole batch — all primitives are tested for all rays (5 cheap
closed-form tests), which is faster on the VPU than any divergence-saving
scheme.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..constants import (EPS, INF, FLOOR_NORMAL, FLOOR_D, SPHERE_LEFT_CENTER,
                         SPHERE_LEFT_RADIUS, GLASS_CENTER, GLASS_RADIUS,
                         MIRROR_CENTER, MIRROR_RADIUS,
                         POINT_LIGHT_MARKER_RADIUS, MAT_FLOOR,
                         MAT_ALBEDO_SPHERE, MAT_GLASS_SPHERE,
                         MAT_MIRROR_SPHERE, MAT_POINTLIGHT_SPHERE)
from ..params import RenderParams
from .intersect import intersect_plane, intersect_sphere
from .vecmath import const3, normalize, mix
from .cubemap import sample_cubemap


class Hit(NamedTuple):
    """Hit payload (reference: shaders/rt/rt_common.glsl:39-44)."""
    t: jnp.ndarray    # [...]
    p: jnp.ndarray    # [..., 3]
    n: jnp.ndarray    # [..., 3]
    mat: jnp.ndarray  # [...] int32

    @property
    def valid(self):
        return self.t < INF


def trace_analytic_core(ro, rd, params: RenderParams, point_light_pos,
                        include_glass: bool, include_point_light: bool,
                        eps: float = EPS) -> Hit:
    """Closest hit against floor + spheres + optional marker
    (reference: shaders/rt/rt_scene_analytic.glsl:132-167).

    `include_glass` / `include_point_light` are static Python bools — the
    specialized trace variants are separate compiled branches, exactly like
    the three GLSL wrappers.
    """
    shape = jnp.broadcast_shapes(jnp.shape(ro)[:-1], jnp.shape(rd)[:-1])
    best_t = jnp.full(shape, INF, jnp.float32)
    best_n = jnp.zeros(shape + (3,), jnp.float32)
    best_mat = jnp.zeros(shape, jnp.int32)

    def consider(t, valid, n, mat, best):
        bt, bn, bm = best
        closer = valid & (t < bt)
        return (jnp.where(closer, t, bt),
                jnp.where(closer[..., None], n, bn),
                jnp.where(closer, mat, bm))

    best = (best_t, best_n, best_mat)

    # Floor
    t, v = intersect_plane(ro, rd, const3(FLOOR_NORMAL), FLOOR_D, eps)
    best = consider(t, v, jnp.broadcast_to(const3(FLOOR_NORMAL), shape + (3,)),
                    MAT_FLOOR, best)

    def sphere(center, radius, mat, best):
        c = const3(center)
        t, v = intersect_sphere(ro, rd, c, radius, eps)
        n = normalize(ro + rd * t[..., None] - c)
        return consider(t, v, n, mat, best)

    best = sphere(SPHERE_LEFT_CENTER, SPHERE_LEFT_RADIUS, MAT_ALBEDO_SPHERE, best)
    # The glass sphere is traced whenever include_glass, independent of the
    # material toggle (a disabled glass material shades as diffuse but still
    # occludes), matching traceAnalyticCore.
    if include_glass:
        best = sphere(GLASS_CENTER, GLASS_RADIUS, MAT_GLASS_SPHERE, best)
    best = sphere(MIRROR_CENTER, MIRROR_RADIUS, MAT_MIRROR_SPHERE, best)

    if include_point_light and params.point_light_enabled:
        t, v = intersect_sphere(ro, rd, point_light_pos,
                                POINT_LIGHT_MARKER_RADIUS, eps)
        n = normalize(ro + rd * t[..., None] - point_light_pos)
        best = consider(t, v, n, MAT_POINTLIGHT_SPHERE, best)

    bt, bn, bm = best
    return Hit(bt, ro + rd * bt[..., None], bn, bm)


def trace_analytic(ro, rd, params, point_light_pos, eps: float = EPS) -> Hit:
    """Full scene (reference: rt_scene_analytic.glsl:175-177)."""
    return trace_analytic_core(ro, rd, params, point_light_pos, True, True, eps)


def trace_analytic_ignore_glass(ro, rd, params, point_light_pos,
                                eps: float = EPS) -> Hit:
    """Skip the glass sphere, for refraction paths
    (reference: rt_scene_analytic.glsl:185-187)."""
    return trace_analytic_core(ro, rd, params, point_light_pos, False, True, eps)


def trace_analytic_ignore_point_light(ro, rd, params, point_light_pos,
                                      eps: float = EPS) -> Hit:
    """Skip the marker sphere, for shadow rays toward the bulb
    (reference: rt_scene_analytic.glsl:195-197)."""
    return trace_analytic_core(ro, rd, params, point_light_pos, True, False, eps)


def sky(d, params: RenderParams, env_map: Optional[jnp.ndarray]):
    """Environment lookup: cubemap if enabled, else analytic gradient
    (reference: shaders/rt/rt_scene_analytic.glsl:211-223)."""
    if params.enable_env_map and env_map is not None:
        return sample_cubemap(env_map, d) * params.env_map_intensity
    t = jnp.clip(0.5 * (d[..., 1] + 1.0), 0.0, 1.0)
    a = const3((0.6, 0.7, 0.9)) * 0.3
    b = const3((0.1, 0.15, 0.3)) * 0.3
    return mix(a, b, (1.0 - t)[..., None])
