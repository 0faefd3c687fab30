"""Raster-preview parity renderer (flat-color visibility pass).

The reference's raster mode draws the same scene with flat uniform colors
as a "reference image for comparison with the ray tracing output"
(reference: src/render/render.cpp:247-295, include/render/render.h:22-27).
On TPU there is no rasterizer; primary-visibility ray casting produces the
identical image (same camera, same depth resolution, same flat colors —
reference: shaders/basic.frag:18-26 outputs the color unshaded).

Scene parity (reference: render.cpp:264-294):
  clear color (0.1, 0, 0.2); ground plane y=0 green (0.1,0.4,0.1);
  bunny mesh at translate(-2,1.5,0)*scale(0.5) white (0.9); sphere at
  translate(2,1,0)*scale(0.5) color (0.3,0.6,1.0); point-light marker
  sphere scale 0.15 at the orbit position, color = pointLightColor*3.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..constants import INF
from ..params import RenderParams
from ..ops.intersect import intersect_plane, intersect_sphere
from ..ops.scene import (SceneCtx, BVHDevice, compute_point_light_world_pos,
                         _tpu)
from ..ops.bvh_traverse import trace_bvh
from ..ops.bvh_mxu import trace_bvh_mxu_paged
from ..ops.vecmath import const3
from .pipeline import FrameInputs, primary_rays

CLEAR_COLOR = (0.1, 0.0, 0.2)
GROUND_COLOR = (0.1, 0.4, 0.1)
MESH_COLOR = (0.9, 0.9, 0.9)
SPHERE_COLOR = (0.3, 0.6, 1.0)
SPHERE_CENTER = (2.0, 1.0, 0.0)
SPHERE_RADIUS = 0.5
MARKER_RADIUS = 0.15


def render_raster(params: RenderParams, fin: FrameInputs,
                  bvh: Optional[BVHDevice], *, height: int, width: int):
    """Flat-shaded visibility image [H,W,3] (GL bottom-up rows)."""
    # the reference raster pass renders with the UNJITTERED view/proj
    # (render.cpp sets plain currView/currProj); zero the TAA jitter so
    # the preview doesn't shimmer frame-to-frame
    fin = dataclasses.replace(fin, jitter=jnp.zeros_like(fin.jitter))
    _, _, rd = primary_rays(height, width, fin, params)
    ro = jnp.broadcast_to(fin.cam_pos, rd.shape)

    best_t = jnp.full((height, width), INF, jnp.float32)
    color = jnp.broadcast_to(const3(CLEAR_COLOR), (height, width, 3))

    def consider(t, valid, col, best_t, color):
        closer = valid & (t < best_t)
        return (jnp.where(closer, t, best_t),
                jnp.where(closer[..., None], const3(col), color))

    # Ground plane (the plane.obj model is finite 2x2 quad scaled by its
    # own geometry; the procedural ground uses a large quad — visually the
    # infinite-floor parity is what matters here)
    t, v = intersect_plane(ro, rd, const3((0.0, 1.0, 0.0)), 0.0)
    best_t, color = consider(t, v, GROUND_COLOR, best_t, color)

    # Mesh (same BVH arrays as ray mode)
    if bvh is not None:
        # bvh.mxu is a tuple of VMEM-sized pages (prepare_bvh ->
        # build_mxu_paged); the paged wrapper handles both forms.
        h = (trace_bvh_mxu_paged(bvh.mxu, ro, rd,
                                 shared_origin=fin.cam_pos, ordered=False)
             if _tpu() else trace_bvh(bvh.arrays, ro, rd))
        best_t, color = consider(h.t, h.valid, MESH_COLOR, best_t, color)

    # Blue sphere
    t, v = intersect_sphere(ro, rd, const3(SPHERE_CENTER), SPHERE_RADIUS)
    best_t, color = consider(t, v, SPHERE_COLOR, best_t, color)

    # Point-light marker
    if params.point_light_enabled:
        plp = compute_point_light_world_pos(params)
        t, v = intersect_sphere(ro, rd, plp, MARKER_RADIUS)
        col = (jnp.asarray(params.point_light_color, jnp.float32) * 3.0)
        closer = v & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        color = jnp.where(closer[..., None],
                          jnp.broadcast_to(col, color.shape), color)

    return jnp.clip(color, 0.0, 1.0)
