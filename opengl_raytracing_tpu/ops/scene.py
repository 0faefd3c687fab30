"""Scene context: unified trace/shadow/sky dispatch for both scene modes.

Plays the role of the reference's uniform block + global trace functions
(reference: shaders/rt/rt_uniforms.glsl, rt_scene_analytic.glsl:132-197,
rt_bvh.glsl:193-304).  Constructed inside the jitted frame function from
pytree inputs; `use_bvh` is a static Python bool so the two scene modes
are separate compiled programs, exactly like the reference's uUseBVH
branches resolve per-draw.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..constants import EPS
from ..params import RenderParams
from ..scene.bvh import BVH, BVHArrays, build_bvh_fast, bvh_to_arrays
from . import scene_analytic as sa
from .bvh_traverse import trace_bvh, trace_bvh_shadow
from .bvh_mxu import (MXUBVH, build_mxu_paged, trace_bvh_mxu_paged,
                      trace_bvh_shadow_mxu_paged)
from .vecmath import normalize, v3


class BVHDevice(NamedTuple):
    """Device-side BVH bundle: skip-link arrays (portable jnp walker) +
    MXU chunk pages (TPU fast path; tuple of MXUBVH, one per VMEM-sized
    page of 128-triangle chunks)."""
    arrays: BVHArrays
    mxu: tuple


def prepare_bvh(tris) -> BVHDevice:
    """Build both device representations from world-space tris [T,9]."""
    host = build_bvh_fast(tris)
    return BVHDevice(
        arrays=jax.tree.map(jnp.asarray, bvh_to_arrays(host)),
        mxu=build_mxu_paged(host),
    )


def _tpu() -> bool:
    """True when the MXU cull+matmul path should be used.

    `ORT_FORCE_MXU=1` forces it on any backend (Pallas falls back to
    interpret mode off-TPU, see bvh_mxu._use_interpret) — this is how the
    test suite exercises MXU-under-shard_map on the 8-device CPU mesh,
    the exact production configuration, before it ever meets multi-chip
    hardware.  Read at trace time so tests can monkeypatch the env."""
    import os
    if os.environ.get("ORT_FORCE_MXU", "") == "1":
        return True
    return jax.default_backend() == "tpu"


# Auto ordered-primary threshold: ordered when the camera is within this
# many scene radii of the AABB.  The r2 kernel-level A/B had the ordered
# walk 1.84x ahead close-up, but the full r3b camera-distance sweep
# (scripts/ordered_sweep.py, 81,920 tris, paired same-session) has the
# UNordered walk ~2x faster at EVERY distance once the multi-page
# shared-origin path and the 8x16 swizzle are in play (d0: 315 vs 590 ms
# ... d5: 43 vs 87 ms, checksum-identical) — the grouped scalar ordered
# loop cannot amortize like the GROUP-fused unordered matmuls
# (ORT_ORDERED_GROUP=4/8/16 measured it slower still, PERF.md).  Auto
# therefore never picks ordered; the walk stays available via
# ordered_primary=1 for cases the sweep didn't cover.
ORDERED_AUTO_FACTOR = 0.0


def resolve_ordered_primary(flag: int, cam_pos, aabb) -> int:
    """Resolve RenderParams.ordered_primary (0/1/2=auto) to 0 or 1.

    Host-side, per frame: `aabb` is an (bmin, bmax) numpy pair of the BVH
    scene bounds (None when no BVH is loaded).  Auto turns the ordered
    front-to-back walk on when the camera is close to the geometry — the
    regime where the interval cull degenerates (every tile's frustum
    overlaps most chunks) and near-first + tile-wide early termination
    pays (the reference's stack walk is always near-first,
    rt_bvh.glsl:224-239)."""
    import numpy as np
    if flag != 2:
        return int(flag)
    if aabb is None:
        return 0
    bmin, bmax = (np.asarray(aabb[0], np.float64),
                  np.asarray(aabb[1], np.float64))
    c = np.asarray(cam_pos, np.float64)
    nearest = np.clip(c, bmin, bmax)
    dist = float(np.linalg.norm(nearest - c))
    radius = 0.5 * float(np.linalg.norm(bmax - bmin))
    return 1 if dist < ORDERED_AUTO_FACTOR * radius else 0


def dir_from_yaw_pitch(yaw_deg, pitch_deg):
    """Direction from yaw/pitch degrees (reference: src/render/render.cpp:35-51)."""
    yaw = jnp.deg2rad(jnp.asarray(yaw_deg, jnp.float32))
    pitch = jnp.deg2rad(jnp.asarray(pitch_deg, jnp.float32))
    d = v3(jnp.cos(pitch) * jnp.cos(yaw), jnp.sin(pitch),
           jnp.cos(pitch) * jnp.sin(yaw))
    small = jnp.sum(d * d) < 1e-6
    fallback = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
    return jnp.where(small, fallback, normalize(d))


def compute_point_light_world_pos(params: RenderParams):
    """Base position + optional orbit offset
    (reference: src/render/render.cpp:8-31).  Orbit yaw/pitch use the
    *camera-style* basis (sy, sp, cy) — distinct from dirFromYawPitch."""
    base = jnp.asarray(params.point_light_pos, jnp.float32)
    if not params.point_light_orbit_enabled:
        return base
    yaw = jnp.deg2rad(jnp.asarray(params.point_light_yaw, jnp.float32))
    pitch = jnp.deg2rad(jnp.asarray(params.point_light_pitch, jnp.float32))
    d = v3(jnp.cos(pitch) * jnp.sin(yaw), jnp.sin(pitch),
           jnp.cos(pitch) * jnp.cos(yaw))
    radius = jnp.asarray(params.point_light_orbit_radius, jnp.float32)
    return base + d * jnp.maximum(radius, 0.0)


@dataclasses.dataclass
class SceneCtx:
    """Bundle of per-frame scene inputs + static mode flags."""
    params: RenderParams
    cam_pos: jnp.ndarray                 # [3]
    point_light_pos: jnp.ndarray         # [3]
    sun_dir: jnp.ndarray                 # [3]
    sky_up: jnp.ndarray                  # [3]
    env_map: Optional[jnp.ndarray]       # [6,F,F,3] or None
    use_bvh: bool = False
    bvh: Optional[BVHDevice] = None

    @staticmethod
    def create(params: RenderParams, cam_pos, env_map=None, use_bvh=False,
               bvh=None) -> "SceneCtx":
        return SceneCtx(
            params=params,
            cam_pos=jnp.asarray(cam_pos, jnp.float32),
            point_light_pos=compute_point_light_world_pos(params),
            sun_dir=dir_from_yaw_pitch(params.sun_yaw, params.sun_pitch),
            sky_up=dir_from_yaw_pitch(params.sky_yaw, params.sky_pitch),
            env_map=env_map,
            use_bvh=use_bvh,
            bvh=bvh,
        )

    # -- trace dispatch --

    def trace(self, ro, rd, eps: float = EPS, coherent: bool = True,
              shared_origin=None, active=None, ordered=None) -> sa.Hit:
        """`active`: optional bool mask — lanes whose hit result the
        caller discards.  On TPU they are excluded from the tile cull
        hulls (all-inactive tiles skip block-wise) and their output is
        garbage; values on inactive lanes are unspecified on TPU, exact
        elsewhere.  The `coherent` flag is kept for call-site
        documentation: both regimes use the pixel-order masked-cull
        kernel — direction sorting measured 10x SLOWER than the work it
        saves (argsort + gathers ~130-145 ms per 2M rays, PERF.md r2)."""
        if self.use_bvh:
            # TPU: cull + MXU Moller-Trumbore (paged for arbitrary scene
            # sizes; front-to-back ordered walk when all rays share one
            # origin); elsewhere: jnp skip-link walk.
            if _tpu():
                # `ordered` defaults to "on when a shared origin is
                # given" for back-compat; callers may pass
                # shared_origin with ordered=False to get just the
                # constant-origin hull fast path (primary rays always
                # share the camera origin, ordered walk or not).
                if ordered is None:
                    ordered = shared_origin is not None
                return trace_bvh_mxu_paged(
                    self.bvh.mxu, ro, rd, eps,
                    shared_origin=shared_origin,
                    ordered=ordered,
                    active=active)
            return trace_bvh(self.bvh.arrays, ro, rd, eps)
        return sa.trace_analytic(ro, rd, self.params, self.point_light_pos,
                                 eps)

    def trace_ignore_glass(self, ro, rd, eps: float = EPS) -> sa.Hit:
        return sa.trace_analytic_ignore_glass(ro, rd, self.params,
                                              self.point_light_pos, eps)

    def trace_ignore_point_light(self, ro, rd, eps: float = EPS) -> sa.Hit:
        return sa.trace_analytic_ignore_point_light(
            ro, rd, self.params, self.point_light_pos, eps)

    def trace_shadow_any(self, ro, rd, t_max, eps: float = EPS,
                         coherent: bool = True, active=None):
        """Any occluder strictly before t_max (BVH mode only path).

        `active` tightens the tile cull hulls AND collapses inactive
        windows (guaranteed False on inactive lanes).

        ro/rd/t_max may be tuples of k same-shape batches (multi-light
        wavefront; `active` then has the per-item shape): on TPU they
        trace as one concatenated stream with no [k,...,3] stack ever
        materialized; elsewhere they are stacked for the jnp walker."""
        if _tpu():
            return trace_bvh_shadow_mxu_paged(self.bvh.mxu, ro, rd,
                                              t_max, eps, active=active)
        if isinstance(ro, (list, tuple)):
            ro, rd, t_max = jnp.stack(ro), jnp.stack(rd), jnp.stack(t_max)
        hit = trace_bvh_shadow(self.bvh.arrays, ro, rd, t_max, eps)
        if active is not None:
            # honor the documented contract on every backend: inactive
            # lanes are guaranteed False (the TPU kernel collapses their
            # windows; mask here so CPU/TPU intermediates bit-match)
            act = (jnp.stack(active) if isinstance(active, (list, tuple))
                   else active)
            hit = hit & act
        return hit

    def sky(self, d):
        return sa.sky(d, self.params, self.env_map)

    def sky_gated(self, d, lane_mask, frac: float):
        """sky() fetched only on the 128-lane tiles where `lane_mask`
        is set; other lanes return 0 and MUST be discarded by the
        caller's own select on the same mask.  Dense fallback whenever
        gating cannot apply (no env map, frac<=0, non-tile-aligned
        stream) or, at runtime, when more tiles qualify than the
        frac capacity (lax.cond inside sample_cubemap_gated) — the
        gate is an optimization, never a source of truth."""
        import numpy as np
        n_px = int(np.prod(jnp.shape(d)[:-1]))
        if not (frac > 0.0 and self.params.enable_env_map
                and self.env_map is not None and n_px % 128 == 0):
            return self.sky(d)
        from .cubemap import sample_cubemap_gated
        out = sample_cubemap_gated(self.env_map, d.reshape(n_px, 3),
                                   jnp.reshape(lane_mask, (n_px,)), frac)
        return (out.reshape(jnp.shape(d))
                * self.params.env_map_intensity)
