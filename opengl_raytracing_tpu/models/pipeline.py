"""The frame function: primary rays -> shading -> TAA -> SVGF present.

TPU-native counterpart of the per-pixel megakernel + present pass
(reference: shaders/rt/rt.frag:50-197, rt_present.frag:231-266,
src/render/render.cpp:55-243).  Differences by design:

  * everything is one jitted array program over the whole [H,W] grid —
    the two GL draw calls collapse into a single XLA computation;
  * the primary hit is traced once and reused across the SPP loop (the
    reference re-traces the identical primary ray every sample,
    rt.frag:84-86; hoisting is observationally identical because tracing
    is deterministic — only the shading RNG varies per sample);
  * ping-pong accumulation becomes functional state with buffer donation
    (reference: src/render/accum.cpp:194-234).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import MAT_POINTLIGHT_SPHERE
from ..params import RenderParams
from ..sampling import ndc_from_world
from ..ops.scene import BVHDevice
from ..ops.scene import SceneCtx
from ..ops.scene_analytic import Hit
from ..ops.materials import get_material, MTYPE_MIRROR, MTYPE_GLASS
from ..ops import lighting as lt
from ..ops.taa import resolve_taa
from ..ops.svgf import present
from ..ops.vecmath import normalize, dot, length


@dataclasses.dataclass(frozen=True)
class FrameInputs:
    """Per-frame camera/motion uniforms (reference: render.cpp:73-167)."""
    cam_pos: jnp.ndarray      # [3]
    cam_right: jnp.ndarray    # [3]
    cam_up: jnp.ndarray       # [3]
    cam_fwd: jnp.ndarray      # [3]
    tan_half_fov: jnp.ndarray  # []
    aspect: jnp.ndarray        # []
    jitter: jnp.ndarray        # [2] pixels, pre-scaled by still/moving scale
    curr_view_proj: jnp.ndarray  # [4,4]
    prev_view_proj: jnp.ndarray  # [4,4]
    camera_moved: jnp.ndarray    # [] int32 (0/1)


jax.tree_util.register_dataclass(
    FrameInputs,
    data_fields=["cam_pos", "cam_right", "cam_up", "cam_fwd", "tan_half_fov",
                 "aspect", "jitter", "curr_view_proj", "prev_view_proj",
                 "camera_moved"],
    meta_fields=[])


def accum_planes() -> bool:
    """ORT_ACCUM_PLANES=1 stores the carried accumulation as [4,H,W]
    channel planes instead of [H,W,4].

    Materialized HBM buffers tile their two minormost dims to (8,128)
    on TPU, so an [H,W,4] boundary buffer pads its 4-wide minor dim to
    128 lanes (~32x bytes; CLAUDE.md SoA rule).  The planes layout pads
    nothing; the moveaxis back to [H,W,4] happens INSIDE the jit where
    it fuses.  Read at trace time so tests/bench can flip it per run;
    measured by scripts/layout_probe.py case `pad`."""
    return os.environ.get("ORT_ACCUM_PLANES", "0") == "1"


def accum_to_hwc(a: jnp.ndarray) -> jnp.ndarray:
    """Boundary accum -> [H,W,4] for the in-jit math.

    Strictly knob-driven (the knob defines the layout of EVERY accum
    boundary buffer): a shape heuristic would misfire on 4-row shard
    bands, whose [4,W,4] is ambiguous."""
    return jnp.moveaxis(a, 0, -1) if accum_planes() else a


def accum_from_hwc(a: jnp.ndarray) -> jnp.ndarray:
    """In-jit [H,W,4] -> the configured boundary layout."""
    return jnp.moveaxis(a, -1, 0) if accum_planes() else a


@dataclasses.dataclass(frozen=True)
class RenderState:
    """Device-resident temporal state (replaces rt::Accum's ping-pong FBO,
    reference: include/render/accum.h:24-163)."""
    accum: jnp.ndarray        # [H,W,4] rgb + M2 ([4,H,W] in planes mode)
    frame_index: jnp.ndarray  # [] int32

    @staticmethod
    def create(height: int, width: int) -> "RenderState":
        shape = ((4, height, width) if accum_planes()
                 else (height, width, 4))
        return RenderState(jnp.zeros(shape, jnp.float32),
                           jnp.zeros((), jnp.int32))

    def reset(self) -> "RenderState":
        """Clear history (reference: src/render/accum.cpp:98-102)."""
        return RenderState(jnp.zeros_like(self.accum), jnp.zeros((), jnp.int32))


jax.tree_util.register_dataclass(
    RenderState, data_fields=["accum", "frame_index"], meta_fields=[])


class FrameOutputs(NamedTuple):
    image: jnp.ndarray    # [H,W,3] sRGB in [0,1]
    motion: jnp.ndarray   # [H,W,2] NDC motion
    gpos: jnp.ndarray     # [H,W,3]
    gnrm: jnp.ndarray     # [H,W,3]


def primary_dirs(px, py, height: int, width: int, fin: FrameInputs,
                 params: RenderParams):
    """Jittered primary ray directions for given pixel centers
    (reference: rt.frag:55-68).  height/width are the FULL image dims
    (px/py may cover only a shard's row band)."""
    if params.enable_jitter:
        jx, jy = fin.jitter[0], fin.jitter[1]
    else:
        jx = jy = jnp.float32(0.0)
    u = (px + jx) / width
    v = (py + jy) / height
    ndc_x = u * 2.0 - 1.0
    ndc_y = v * 2.0 - 1.0
    d = (fin.cam_fwd
         + ndc_x[..., None] * fin.cam_right * (fin.tan_half_fov * fin.aspect)
         + ndc_y[..., None] * fin.cam_up * fin.tan_half_fov)
    return normalize(d)


def pixel_centers(height: int, width: int, row_offset=0):
    """Pixel-center coordinate grids (GL bottom-up rows)."""
    px = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5, (height, width))
    py = jnp.broadcast_to(
        jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
        + jnp.asarray(row_offset, jnp.float32), (height, width))
    return px, py


def primary_rays(height: int, width: int, fin: FrameInputs,
                 params: RenderParams):
    """Full-grid pixel centers + jittered ray directions."""
    px, py = pixel_centers(height, width)
    return px, py, primary_dirs(px, py, height, width, fin, params)


# --- 2D tile swizzle -------------------------------------------------------
# The MT kernels consume rays as consecutive 128-lane tiles of the flat
# stream.  In row-major order one tile is a 128x1 scanline strip — at the
# default camera that strip spans ~4 BVH-chunk widths, so the per-tile
# interval cull keeps far more candidate chunks than the rays need.
# Rendering the whole per-pixel stream in 8x16-block order makes every
# kernel tile a compact 2D pixel block (tight origin/hit-point hulls for
# primary, shadow, GI and AO traces alike).  The swizzle is a pure
# reshape/transpose (no gathers — those measured ~10x the gated trace,
# PERF.md r2); per-ray math is order-independent, so results are exact.
TILE_H, TILE_W = 8, 16  # TILE_H*TILE_W == ops.bvh_mxu.TILE_RAYS
# ORT_SWIZZLE: "1" always, "0" never, "auto" (default) per scene — see
# _swizzle_for_scene.  True/False/None mirrors that tri-state so tests
# can monkeypatch the resolved value directly.
_SWIZZLE_ENV = os.environ.get("ORT_SWIZZLE", "auto")
_SWIZZLE = (_SWIZZLE_ENV == "1") if _SWIZZLE_ENV in ("0", "1") else None


def _swizzle_for_scene(scene) -> bool:
    """Scene-adaptive swizzle default.

    The block order only pays through the BVH interval cull, and only
    when there is enough geometry for coherence to matter.  Measured on
    hardware (r3b, PERF.md): the 81,920-tri multi-page scene runs
    1.5-1.7x FASTER swizzled (cf_close 553 vs 931 ms, cf_far 57.5 vs
    86.9), but the single-page bunny runs ~17% faster UNswizzled
    (26.4 vs 31.2 ms) and the analytic scenes — no BVH, so the swizzle
    is pure reshuffle cost — run up to 3x faster unswizzled
    (an_baseline 12.6 vs 36.4 ms).  Multi-sample frames flip the trade
    back even on one page: the 4spp heavy preset measured 62.9 ms
    swizzled vs 87.1 unswizzled in one r3g session (the jittered
    primary batches + AO/shadow wavefronts all cull tighter in block
    order).  Auto: swizzle multi-page BVH scenes and any BVH scene at
    spp>1.  ORT_SWIZZLE=0/1 forces either way."""
    if _SWIZZLE is not None:
        return _SWIZZLE
    bvh = getattr(scene, "bvh", None)
    if bvh is None:
        return False
    if len(bvh.mxu) > 1:
        return True
    params = getattr(scene, "params", None)
    return params is not None and int(params.spp_per_frame) > 1


def _swizzle_pads(h: int, w: int, enabled=None):
    """(pad_h, pad_w) duplicated edge rows/cols that make the grid
    divisible by the 8x16 tile, or None when the swizzle is disabled.
    Non-divisible grids (e.g. the 135-row shard bands of a 1080p 8-way
    split) trace <1% duplicate edge rays instead of losing the compact
    2D tiles entirely; the duplicates are cropped after unswizzle.

    `enabled=None` (scene-less callers: audits, ablations) resolves the
    env knob only, treating auto as on — the historical kernel-order
    path those scripts price."""
    if enabled is None:
        enabled = _SWIZZLE is not False
    if not enabled:
        return None
    return (-h) % TILE_H, (-w) % TILE_W


def _pad_edge(a, pad_h: int, pad_w: int):
    """Extend [H,W,...] by duplicating the last row/column."""
    if not (pad_h or pad_w):
        return a
    return jnp.pad(a, ((0, pad_h), (0, pad_w)) + ((0, 0),) * (a.ndim - 2),
                   mode="edge")


def swizzle(a, h: int, w: int):
    """[H,W,...] -> flat [H*W,...] in 8x16-pixel-block order
    (h, w must be tile-divisible — pad with _pad_edge first)."""
    rest = a.shape[2:]
    return (a.reshape(h // TILE_H, TILE_H, w // TILE_W, TILE_W, *rest)
            .swapaxes(1, 2).reshape(h * w, *rest))


def unswizzle(a, h: int, w: int):
    """Inverse of swizzle: flat block-order [H*W,...] -> [H,W,...]."""
    rest = a.shape[1:]
    return (a.reshape(h // TILE_H, w // TILE_W, TILE_H, TILE_W, *rest)
            .swapaxes(1, 2).reshape(h, w, *rest))


def swizzled_pixel_centers(grid_h: int, grid_w: int, pad_h: int, pad_w: int,
                           row_offset=0):
    """Flat [N] pixel centers directly in 8x16-block order.

    Bit-identical to `swizzle(_pad_edge(pixel_centers(...)))` but built
    from index math on one iota, so the ray stream is BORN in kernel
    order: no [H,W] plane materialization + pad + transpose per
    component (the audit prices that reshuffle at ~100 MB/frame at
    1080p).  Edge padding duplicates the last row/col via a min-clamp,
    exactly like _pad_edge's mode="edge"."""
    sw_h, sw_w = grid_h + pad_h, grid_w + pad_w
    i = jnp.arange(sw_h * sw_w, dtype=jnp.int32)
    tile = TILE_H * TILE_W
    bi, r = i // tile, i % tile
    ty, tx = r // TILE_W, r % TILE_W
    bpr = sw_w // TILE_W
    by, bx = bi // bpr, bi % bpr
    y = jnp.minimum(by * TILE_H + ty, grid_h - 1)
    x = jnp.minimum(bx * TILE_W + tx, grid_w - 1)
    px = x.astype(jnp.float32) + 0.5
    py = (y.astype(jnp.float32) + 0.5
          + jnp.asarray(row_offset, jnp.float32))
    return px, py


def _analytic_gate_frac() -> float:
    """ORT_ANALYTIC_GATE_FRAC: tile-capacity fraction for the analytic
    glass/mirror secondary-shade gate (0 disables).

    The analytic glass/mirror trees (3-4 secondary traces + full
    direct-light evaluations each) are computed for EVERY lane and
    masked in, like the fragment shader's divergent branches — measured
    153 ms/frame at 1080p baseline-analytic on hardware (r3) vs 31 ms
    for the BVH scene.  The material spheres cover a few percent of the
    screen, so the gated form compacts the 128-lane tiles that contain
    any glass (resp. mirror) lane into a static-capacity stream of
    frac*T tiles, shades those, and scatters back; a lax.cond falls back
    to the dense form when more tiles qualify (exactness never depends
    on the capacity).  Per-lane math is identical, so gated == dense
    bit-for-bit (test_analytic_tile_gate).

    Default 0.15 from the r3b hardware sweep (PERF.md): an_baseline
    37.2 -> 18.7 ms and an_full 422 -> 202 ms, checksum-identical; 0.25
    and 0.4 were no better on the full scene.  0 disables."""
    return float(os.environ.get("ORT_ANALYTIC_GATE_FRAC", "0.15") or "0")


_TILE = TILE_H * TILE_W  # lanes per kernel tile (== bvh_mxu.TILE_RAYS)


def _an_hit_gate_frac() -> float:
    """ORT_AN_HIT_GATE: tile-capacity fraction for the analytic
    HIT-shading gate (DEFAULT 0.8 on TPU since the r4a A/B:
    an_baseline 7.15 -> 5.83 at 0.65 -> 5.26 ms at 0.8, same
    session; dense fallback keeps fuller cameras exact; 0 = off).
    Off-TPU the default stays 0: the lax.cond fallback compiles the
    whole shade tree twice, which tripled per-test XLA-CPU compile
    time in the suite — test_analytic_hit_gate pins gate parity
    explicitly.

    The analytic diffuse stack (direct light + GI + AO) is evaluated on
    EVERY lane and masked by the sky select, but the sky typically
    covers the whole upper image half (the floor spans the lower) —
    ~40% of 128-lane row-major tiles contain no hit at the default
    an_full camera.  This gate compacts the whole _shade_analytic call
    (the inner glass/mirror gates then operate on the compacted
    stream) to tiles containing any primary hit, exactly like
    shade_bvh_auto/ORT_BVH_GATE_FRAC does for the mesh path — and the
    analytic variant is bit-identical (no trace-in-tile regrouping
    caveat: the megakernel and all shading math are per-lane pure).
    Dense fallback via lax.cond when more tiles qualify."""
    default = "0.8" if jax.default_backend() == "tpu" else "0"
    return float(os.environ.get("ORT_AN_HIT_GATE", default) or "0")


def shade_analytic_auto(scene: SceneCtx, h_b: Hit, seeds, frame_index,
                        vdir_b, px_b, py_b, mask_b, ao=None, *,
                        spp: int = 1):
    """_shade_analytic through the hit-occupancy tile gate when enabled.

    Mirrors shade_bvh_auto: [.., H, W] grids flatten to the row-major
    tile stream (the swizzled analytic stream is already flat), the
    gate compacts to occupied tiles, results scatter back.  Garbage on
    sky tiles is discarded by the caller's sky select."""
    gate = _an_hit_gate_frac()
    sw = px_b.ndim - (0 if spp == 1 else 1) == 1
    if sw:
        n_px = px_b.shape[-1]
    else:
        grid_h, grid_w = px_b.shape[-2:]
        n_px = grid_h * grid_w
    if not (gate > 0.0 and n_px % _TILE == 0):
        return _shade_analytic(scene, h_b, seeds, frame_index, vdir_b,
                               px_b, py_b, ao=ao)
    if sw:
        def flat(x, vec=False):
            return x

        def unflat(x):
            return x
        seeds_f = seeds
    else:
        def flat(x, vec=False):
            ax = x.ndim - (3 if vec else 2)
            return x.reshape(x.shape[:ax] + (grid_h * grid_w,)
                             + x.shape[ax + 2:])

        def unflat(x):
            ax = x.ndim - 2  # [..., N, 3]
            return x.reshape(x.shape[:ax] + (grid_h, grid_w)
                             + x.shape[ax + 1:])
        seeds_f = (seeds if spp == 1 else seeds.reshape(spp, 1))
    h_f = Hit(flat(h_b.t), flat(h_b.p, True), flat(h_b.n, True),
              flat(h_b.mat))
    active = flat(mask_b)
    px_f, py_f = flat(px_b), flat(py_b)
    vdir_f = flat(vdir_b, True)
    ao_f = None if ao is None else flat(ao)

    n = px_f.shape[-1]
    t = n // _TILE
    k = max(1, min(t, int(round(gate * t))))

    lane = active
    while lane.ndim > 1:
        lane = lane.any(axis=0)
    tile_sel = lane.reshape(t, _TILE).any(axis=1)
    count = jnp.sum(tile_sel.astype(jnp.int32))
    idx = jnp.argsort(~tile_sel, stable=True)[:k]

    def gtile(x, vec=False):
        ax = x.ndim - (2 if vec else 1)
        xr = x.reshape(x.shape[:ax] + (t, _TILE) + x.shape[ax + 1:])
        g = jnp.take(xr, idx, axis=ax)
        return g.reshape(x.shape[:ax] + (k * _TILE,) + x.shape[ax + 1:])

    def compact(_):
        h_c = Hit(gtile(h_f.t), gtile(h_f.p, True), gtile(h_f.n, True),
                  gtile(h_f.mat))
        out_c = _shade_analytic(
            scene, h_c, seeds_f, frame_index, gtile(vdir_f, True),
            gtile(px_f), gtile(py_f),
            ao=None if ao_f is None else gtile(ao_f))
        ax = out_c.ndim - 2
        outr = out_c.reshape(out_c.shape[:ax] + (k, _TILE, 3))
        full = jnp.zeros(out_c.shape[:ax] + (t, _TILE, 3), out_c.dtype)
        full = full.at[..., idx, :, :].set(outr)
        return full.reshape(out_c.shape[:ax] + (t * _TILE, 3))

    def dense(_):
        return _shade_analytic(scene, h_f, seeds_f, frame_index, vdir_f,
                               px_f, py_f, ao=ao_f)

    return unflat(jax.lax.cond(count <= k, compact, dense, None))


def _tile_gated_shade(fn, lane_mask, h: Hit, vdir, px, py, frac: float):
    """Evaluate `fn(h, vdir, px, py) -> [..., N, 3]` only on the 8x16
    pixel tiles where `lane_mask` has any lane set.

    The flat swizzled stream (length N, tile-aligned) reshapes to
    [T, 128] tiles; the selected tiles' indices (argsort puts them
    first) gather every input down to K = ceil(frac*T) tiles, `fn` runs
    on the compacted stream, and the results scatter back (pad tiles
    scatter garbage into tiles whose lanes the caller's material select
    discards).  When more than K tiles qualify, lax.cond runs the dense
    form instead — the gate is a pure optimization, never a source of
    truth.  Leading batch axes (the SPP axis) pass through."""
    n = px.shape[-1]
    t = n // _TILE
    k = max(1, min(t, int(round(frac * t))))

    lane = lane_mask
    while lane.ndim > 1:
        lane = lane.any(axis=0)
    tile_sel = lane.reshape(t, _TILE).any(axis=1)
    count = jnp.sum(tile_sel.astype(jnp.int32))
    idx = jnp.argsort(~tile_sel, stable=True)[:k]

    def gtile(x, vec=False):
        ax = x.ndim - (2 if vec else 1)
        xr = x.reshape(x.shape[:ax] + (t, _TILE) + x.shape[ax + 1:])
        g = jnp.take(xr, idx, axis=ax)
        return g.reshape(x.shape[:ax] + (k * _TILE,) + x.shape[ax + 1:])

    def compact(_):
        h_c = Hit(gtile(h.t), gtile(h.p, True), gtile(h.n, True),
                  gtile(h.mat))
        out_c = fn(h_c, gtile(vdir, True), gtile(px), gtile(py))
        ax = out_c.ndim - 2
        outr = out_c.reshape(out_c.shape[:ax] + (k, _TILE, 3))
        full = jnp.zeros(out_c.shape[:ax] + (t, _TILE, 3), out_c.dtype)
        full = full.at[..., idx, :, :].set(outr)
        return full.reshape(out_c.shape[:ax] + (t * _TILE, 3))

    def dense(_):
        return fn(h, vdir, px, py)

    return jax.lax.cond(count <= k, compact, dense, None)


def _bvh_gate_frac() -> float:
    """ORT_BVH_GATE_FRAC: tile-capacity fraction for the BVH hit-shading
    gate (0 disables).

    The r3f stage ablation (PERF.md) split the 21 ms baseline bunny
    frame as: primary trace 6.2, shading math + shadow-wavefront
    construction + cull pre-pass 5.3, shadow any-hit kernel 7.45 ms.
    The shadow KERNEL already skips all-sky subtiles, but the XLA-side
    shading math and the 6-batch wavefront/cull construction run over
    every lane while the mesh covers a small fraction of the screen.
    This gate compacts whole 128-lane tiles that contain any primary
    hit — the same machinery as the analytic glass/mirror gate
    (_tile_gated_shade) — so _shade_bvh (direct light + GI + AO
    wavefronts included) sees only occupied tiles.  Per-lane math is
    identical; the scattered-back garbage on unoccupied tiles is
    discarded by the sky select (those lanes have hit_mask False by
    construction).  A lax.cond falls back to the dense form when more
    tiles than the capacity qualify, so exactness never depends on the
    fraction.

    Exactness caveat (BVH only): compaction regroups which lanes share
    a kernel tile for the inner GI/shadow traces, so hulls/cull windows
    differ and the chunk walk's strict t<t_best tie rule can resolve a
    mesh shared-edge hit to the other coincident triangle — a 1-ulp
    wobble on tie lanes only (same caveat as ordered-vs-unordered,
    ops/bvh_mxu.py trace_bvh_mxu docstring).  The analytic gate has no
    trace inside and is exactly bit-identical.

    Default 0.1 from the r3g hardware sweep (PERF.md): baseline bunny
    25.98 -> 20.17 ms and full 56.93 -> 50.52 ms at 1080p,
    checksum-identical; 0.2/0.3 measured worse than 0.1.  0 disables."""
    return float(os.environ.get("ORT_BVH_GATE_FRAC", "0.1") or "0")


def _tile_gated_shade_bvh(scene: SceneCtx, h: Hit, seeds, frame_index,
                          vdir, px, py, active, ao, frac: float,
                          spp: int = 1):
    """_shade_bvh on the 128-lane tiles where `active` has any lane set.

    Inputs are flat tile-aligned streams ([..., N] with N % 128 == 0;
    leading SPP axes pass through).  See _tile_gated_shade for the
    gather/scatter structure; this variant also gathers the `active`
    mask and the hoisted `ao` plane into the compacted stream."""
    n = px.shape[-1]
    t = n // _TILE
    k = max(1, min(t, int(round(frac * t))))

    lane = active
    while lane.ndim > 1:
        lane = lane.any(axis=0)
    tile_sel = lane.reshape(t, _TILE).any(axis=1)
    count = jnp.sum(tile_sel.astype(jnp.int32))
    idx = jnp.argsort(~tile_sel, stable=True)[:k]

    def gtile(x, vec=False):
        ax = x.ndim - (2 if vec else 1)
        xr = x.reshape(x.shape[:ax] + (t, _TILE) + x.shape[ax + 1:])
        g = jnp.take(xr, idx, axis=ax)
        return g.reshape(x.shape[:ax] + (k * _TILE,) + x.shape[ax + 1:])

    def compact(_):
        h_c = Hit(gtile(h.t), gtile(h.p, True), gtile(h.n, True),
                  gtile(h.mat))
        out_c = _shade_bvh(scene, h_c, seeds, frame_index,
                           gtile(vdir, True), gtile(px), gtile(py),
                           active=gtile(active),
                           ao=None if ao is None else gtile(ao), spp=spp)
        ax = out_c.ndim - 2
        outr = out_c.reshape(out_c.shape[:ax] + (k, _TILE, 3))
        full = jnp.zeros(out_c.shape[:ax] + (t, _TILE, 3), out_c.dtype)
        full = full.at[..., idx, :, :].set(outr)
        return full.reshape(out_c.shape[:ax] + (t * _TILE, 3))

    def dense(_):
        return _shade_bvh(scene, h, seeds, frame_index, vdir, px, py,
                          active=active, ao=ao, spp=spp)

    return jax.lax.cond(count <= k, compact, dense, None)


def shade_bvh_auto(scene: SceneCtx, h_b: Hit, seeds, frame_index, vdir_b,
                   px_b, py_b, mask_b, ao=None, *, spp: int = 1):
    """_shade_bvh through the tile-occupancy gate when enabled.

    The PRODUCTION shading dispatch: when ORT_BVH_GATE_FRAC > 0 and the
    pixel stream is tile-aligned, [.., H, W] grids flatten to the
    row-major tile stream, _tile_gated_shade_bvh compacts the shading to
    occupied tiles, and results reshape back; otherwise the dense
    _shade_bvh runs.  `px_b` is either a flat swizzled stream
    ([..., N]) or an [..., H, W] grid.  Used by trace_and_shade and by
    scripts/ablate.py (so the ablation prices this exact path)."""
    gate = _bvh_gate_frac()
    sw = px_b.ndim - (0 if spp == 1 else 1) == 1
    if sw:
        n_px = px_b.shape[-1]
    else:
        grid_h, grid_w = px_b.shape[-2:]
        n_px = grid_h * grid_w
    if not (gate > 0.0 and n_px % _TILE == 0):
        return _shade_bvh(scene, h_b, seeds, frame_index, vdir_b,
                          px_b, py_b, active=mask_b, ao=ao, spp=spp)
    # Flatten [.., H, W] pixel grids to the tile-aligned stream the gate
    # needs (row-major: each tile = 128 consecutive pixels of one row);
    # the swizzled stream is already flat.
    if sw:
        def flat(x, vec=False):
            return x

        def unflat(x):
            return x
        seeds_f = seeds
    else:
        def flat(x, vec=False):
            ax = x.ndim - (3 if vec else 2)
            return x.reshape(x.shape[:ax] + (grid_h * grid_w,)
                             + x.shape[ax + 2:])

        def unflat(x):
            ax = x.ndim - 2  # [..., N, 3]
            return x.reshape(x.shape[:ax] + (grid_h, grid_w)
                             + x.shape[ax + 1:])
        seeds_f = (seeds if spp == 1 else seeds.reshape(spp, 1))
    h_f = Hit(flat(h_b.t), flat(h_b.p, True), flat(h_b.n, True),
              flat(h_b.mat))
    return unflat(_tile_gated_shade_bvh(
        scene, h_f, seeds_f, frame_index, flat(vdir_b, True),
        flat(px_b), flat(py_b), flat(mask_b),
        None if ao is None else flat(ao), gate, spp=spp))


def _sanitize_hit(h: Hit, ro, rd) -> Hit:
    """Clamp miss lanes to finite values so masked shading math stays
    NaN-free (misses are overwritten by the sky select at the end)."""
    v = h.valid
    return Hit(jnp.where(v, h.t, 1.0),
               jnp.where(v[..., None], h.p, ro + rd),
               jnp.where(v[..., None], h.n,
                         jnp.array([0.0, 1.0, 0.0], jnp.float32)),
               h.mat)


def _shade_analytic(scene: SceneCtx, h: Hit, seed, frame_index, vdir, px, py,
                    ao=None):
    """Analytic-scene material dispatch (reference: rt.frag:119-162).

    `ao` may carry a precomputed occlusion term: AO depends only on
    (pixel, frame_index), never the per-sample seed, so the caller hoists
    it out of the SPP batch (one hemisphere wavefront instead of spp)."""
    params = scene.params
    mat = get_material(h.mat, params)

    # diffuse / emissive-marker path.  With GI on, the primary and
    # bounce direct-light evaluations fuse into ONE 2-batch call (one
    # megakernel launch under ORT_AN_PALLAS instead of two full-lane
    # launches) — per-lane math identical to the sequential form.
    if params.enable_gi and lt.AN_LIGHT_BATCH:
        radiance, gi = lt.direct_and_gi_analytic(scene, h, seed,
                                                 frame_index, vdir, px, py)
        radiance = radiance + jnp.float32(params.gi_scale_analytic) * gi
    else:
        radiance = lt.direct_light(scene, h, seed, frame_index, vdir,
                                   px, py)
        if params.enable_gi:
            radiance = radiance + (
                jnp.float32(params.gi_scale_analytic)
                * lt.one_bounce_gi_analytic(scene, h, frame_index, seed,
                                            frame_index, px, py))
    if params.enable_ao:
        if ao is None:
            ao = lt.compute_ao(scene, h, frame_index, px, py)
        radiance = radiance * ao[..., None]

    # emissive point-light marker (reference: rt.frag:137-148)
    base_col = (jnp.asarray(params.point_light_color, jnp.float32)
                * params.point_light_intensity)
    d = length(h.p - scene.cam_pos)
    falloff = 1.0 / jnp.maximum(d * d * 0.25 + 1.0, 1.0)
    emissive = base_col * falloff[..., None]
    is_marker = h.mat == MAT_POINTLIGHT_SPHERE
    radiance = jnp.where(is_marker[..., None], emissive, radiance)

    # Glass/mirror secondary bounces: masked in like the fragment
    # shader's divergent branches.  By default they are computed for all
    # lanes; ORT_ANALYTIC_GATE_FRAC>0 compacts the work to the tiles
    # that contain the material (the spheres cover a few percent of the
    # screen — the dense form measured 153 ms/frame at 1080p baseline on
    # hardware, r3).  A per-LANE compacted variant
    # (experiments/compaction.py) measured slower (157 vs 41 ms) — its
    # scatter/gather lowering dominates; the tile form gathers whole
    # 128-lane rows instead.
    gate = _analytic_gate_frac()
    gated = gate > 0.0 and px.ndim >= 1 and px.shape[-1] % _TILE == 0

    if params.mat_mirror_enabled:
        def mirror_fn(h_c, vdir_c, px_c, py_c):
            mat_c = get_material(h_c.mat, params)
            return lt.shade_mirror(scene, h_c, vdir_c, mat_c, seed,
                                   frame_index, px_c, py_c)
        mirror_mask = mat.mtype == MTYPE_MIRROR
        if gated:
            mirror_r = _tile_gated_shade(mirror_fn, mirror_mask, h, vdir,
                                         px, py, gate)
        else:
            mirror_r = mirror_fn(h, vdir, px, py)
        radiance = jnp.where(mirror_mask[..., None], mirror_r, radiance)
    if params.mat_glass_enabled:
        def glass_fn(h_c, vdir_c, px_c, py_c):
            mat_c = get_material(h_c.mat, params)
            return lt.shade_glass(scene, h_c, vdir_c, mat_c, seed,
                                  frame_index, px_c, py_c)
        glass_mask = mat.mtype == MTYPE_GLASS
        if gated:
            glass_r = _tile_gated_shade(glass_fn, glass_mask, h, vdir,
                                        px, py, gate)
        else:
            glass_r = glass_fn(h, vdir, px, py)
        radiance = jnp.where(glass_mask[..., None], glass_r, radiance)
    return radiance


def _shade_bvh(scene: SceneCtx, h: Hit, seed, frame_index, vdir, px, py,
               active=None, ao=None, spp: int = 1):
    """BVH-scene shading (reference: rt.frag:105-117).

    `active` marks lanes whose radiance survives the final sky select;
    sky lanes skip the shadow/GI/AO wavefront work tile-by-tile (their
    values are unspecified and discarded).  `ao` as in _shade_analytic."""
    params = scene.params
    radiance = lt.direct_light_bvh(scene, h, seed, frame_index, vdir, px, py,
                                   active=active, spp_dup=spp)
    if params.enable_gi:
        radiance = radiance + (
            jnp.float32(params.gi_scale_bvh)
            * lt.one_bounce_gi_bvh(scene, h, frame_index, seed, frame_index,
                                   px, py, active=active))
    if params.enable_ao:
        if ao is None:
            ao = lt.compute_ao(scene, h, frame_index, px, py, active=active)
        radiance = radiance * ao[..., None]
    return radiance


def render_frame(params: RenderParams, fin: FrameInputs, state: RenderState,
                 env_map: Optional[jnp.ndarray] = None,
                 bvh: Optional[BVHDevice] = None,
                 *, height: int, width: int, use_bvh: bool = False,
                 show_motion: bool = False, allow_svgf_pallas: bool = True):
    """One frame: trace + shade + TAA into accum, then present.

    Returns (new_state, FrameOutputs).  `state.accum` is read as history
    and the returned accumulation replaces it (the ping-pong swap,
    reference: src/render/render.cpp:242).
    """
    scene = SceneCtx.create(params, fin.cam_pos, env_map=env_map,
                            use_bvh=use_bvh, bvh=bvh)
    px, py, rd = primary_rays(height, width, fin, params)
    frame_index = state.frame_index
    curr, motion, gpos, gnrm = trace_and_shade(
        scene, params, fin, px, py, rd, frame_index,
        use_bvh=use_bvh, show_motion=show_motion,
        raygen=(height, width, 0))
    moved = fin.camera_moved > 0

    # TAA (reference: rt.frag:184-190): zero motion when camera static.
    taa_motion = jnp.where(moved, motion, jnp.zeros_like(motion))

    # Fusion cut (identity): with the BVH hit-shading gate on at 1080p,
    # the realistic preset trips a 35.69M scoped-vmem loop fusion
    # ("please file a bug against XLA"; SVGF off changes downstream
    # fusion grouping — full is unaffected).  This barrier at the TAA
    # boundary was the first attempt and did NOT remove the fusion
    # (r3i/r3j: same failure with the barrier active); the WORKING fix
    # is the raised per-jit scoped-vmem budget (frame_jit_options).
    # The barrier stays: it is identity, and it pins the stage boundary
    # for the hlo_audit stage attribution.  ORT_TAA_BARRIER forces
    # either way for A/B.
    bar = os.environ.get("ORT_TAA_BARRIER", "")
    if bar == "1" or (bar != "0" and use_bvh and _bvh_gate_frac() > 0):
        curr, taa_motion, hist = jax.lax.optimization_barrier(
            (curr, taa_motion, accum_to_hwc(state.accum)))
    else:
        hist = accum_to_hwc(state.accum)
    accum_new = resolve_taa(curr, taa_motion, hist,
                            frame_index, params, moved=moved)
    if bar == "1" or (bar != "0" and use_bvh and _bvh_gate_frac() > 0):
        accum_new = jax.lax.optimization_barrier(accum_new)

    image = present(accum_new, motion, gpos, gnrm, params,
                    show_motion=show_motion,
                    allow_pallas=allow_svgf_pallas)

    new_state = RenderState(accum_from_hwc(accum_new), frame_index + 1)
    return new_state, FrameOutputs(image, motion, gpos, gnrm)


def trace_and_shade(scene: SceneCtx, params: RenderParams, fin: FrameInputs,
                    px, py, rd, frame_index, *, use_bvh: bool,
                    show_motion: bool, raygen=None):
    """Trace + shade a pixel grid (full image or one shard's row band).

    Returns (curr [.,.,3], motion [.,.,2], gpos, gnrm) — everything up to
    (but excluding) the temporal/present stages.

    `raygen=(full_h, full_w, row_offset)` lets the swizzled path
    REGENERATE px/py/rd directly in block order (values identical — ray
    math is elementwise — but the [H,W] pad+transpose reshuffle of four
    planes never materializes); without it the passed-in grids are
    padded and swizzled as before.
    """
    grid_h, grid_w = px.shape
    pads = _swizzle_pads(grid_h, grid_w, enabled=_swizzle_for_scene(scene))
    sw = pads is not None
    if sw:
        # trace + shade the whole stream in 8x16-block order; only the
        # four [H,W] outputs transpose back at the end.  Non-divisible
        # grids duplicate edge rows/cols (cropped after unswizzle).
        sw_h, sw_w = grid_h + pads[0], grid_w + pads[1]
        if raygen is not None:
            full_h, full_w, row0 = raygen
            px, py = swizzled_pixel_centers(grid_h, grid_w, *pads,
                                            row_offset=row0)
            rd = primary_dirs(px, py, full_h, full_w, fin, params)
        else:
            px = swizzle(_pad_edge(px, *pads), sw_h, sw_w)
            py = swizzle(_pad_edge(py, *pads), sw_h, sw_w)
            rd = swizzle(_pad_edge(rd, *pads), sw_h, sw_w)
    ro = jnp.broadcast_to(fin.cam_pos, rd.shape)
    spp = max(int(params.spp_per_frame), 1) if not show_motion else 1

    # Primary hit: identical for every SPP sample (deterministic trace).
    # All primary rays share the camera origin, so ordered_primary == 1
    # selects the front-to-back chunk walk with tile-wide early
    # termination on the BVH fast path (big win when the camera is close
    # to the geometry and the interval cull degenerates).  The auto value
    # (2) must be resolved to 0/1 by the caller from host-side camera/AABB
    # knowledge (ops.scene.resolve_ordered_primary); unresolved it means
    # "unordered" here.
    h_raw = scene.trace(
        ro, rd, shared_origin=scene.cam_pos,
        ordered=params.ordered_primary == 1)
    hit_mask = h_raw.valid
    h = _sanitize_hit(h_raw, ro, rd)

    # Motion + GBuffer from sample 0 (reference: rt.frag:94-101,168-175).
    ndc_prev = ndc_from_world(h.p, fin.prev_view_proj)
    ndc_curr = ndc_from_world(h.p, fin.curr_view_proj)
    motion = ndc_curr - ndc_prev
    moved = fin.camera_moved > 0
    sky_sentinel = jnp.where(moved, 4.0, 0.0)
    motion = jnp.where(hit_mask[..., None], motion,
                       jnp.full_like(motion, 1.0) * sky_sentinel)
    gpos = jnp.where(hit_mask[..., None], h.p, 0.0)
    gnrm = jnp.where(hit_mask[..., None], normalize(h.n), 0.0)

    # ORT_SKY_MISS_GATE=f fetches the miss-lane environment only on
    # tiles containing a miss (sky_radiance is consumed exclusively
    # through the ~hit_mask select below); the an_full ablation prices
    # full-lane env gathers as a top cost.  0 (default) = dense.
    sky_radiance = scene.sky_gated(
        rd, jnp.logical_not(hit_mask),
        float(os.environ.get("ORT_SKY_MISS_GATE", "0") or "0"))
    vdir = -rd

    # SPP as a leading batch axis: the per-sample RNG is a pure function
    # of (pixel, seed), so all samples shade in ONE evaluation and every
    # light's shadow rays across all samples merge into single kernel
    # calls (the wavefront restructuring of the reference's SPP loop,
    # rt.frag:79).
    def bshape(x):
        return jnp.broadcast_to(x, (spp,) + x.shape)

    # AO depends only on (pixel, frame_index) — hoist it out of the SPP
    # batch so spp>1 traces one hemisphere wavefront, not spp identical
    # ones (the per-sample value in the reference's loop is the same).
    ao = None
    if params.enable_ao and spp > 1:
        ao = lt.compute_ao(scene, h, frame_index, px, py,
                           active=hit_mask if use_bvh else None)

    if spp == 1:
        seeds = frame_index * spp
        h_b, px_b, py_b, vdir_b = h, px, py, vdir
        mask_b = hit_mask
    else:
        # trailing singleton axes must match the pixel rank (2 for [H,W]
        # grids, 1 for the swizzled flat stream)
        seeds = (frame_index * spp
                 + jnp.arange(spp, dtype=jnp.int32)).reshape(
                     (spp,) + (1,) * px.ndim)
        h_b = Hit(bshape(h.t), bshape(h.p), bshape(h.n), bshape(h.mat))
        px_b = bshape(px)
        py_b = bshape(py)
        vdir_b = bshape(vdir)
        mask_b = bshape(hit_mask)

    if use_bvh:
        shaded = shade_bvh_auto(scene, h_b, seeds, frame_index, vdir_b,
                                px_b, py_b, mask_b, ao, spp=spp)
    else:
        shaded = shade_analytic_auto(scene, h_b, seeds, frame_index,
                                     vdir_b, px_b, py_b, mask_b, ao,
                                     spp=spp)

    if spp == 1:
        frame_sum = jnp.where(hit_mask[..., None], shaded, sky_radiance)
    else:
        frame_sum = jnp.sum(
            jnp.where(hit_mask[None, ..., None], shaded,
                      sky_radiance[None]), axis=0)
    curr = frame_sum / float(spp)
    if sw:
        curr = unswizzle(curr, sw_h, sw_w)[:grid_h, :grid_w]
        motion = unswizzle(motion, sw_h, sw_w)[:grid_h, :grid_w]
        gpos = unswizzle(gpos, sw_h, sw_w)[:grid_h, :grid_w]
        gnrm = unswizzle(gnrm, sw_h, sw_w)[:grid_h, :grid_w]
    return curr, motion, gpos, gnrm


def frame_jit_options() -> dict:
    """Extra jax.jit kwargs for frame-level compiles.

    ORT_SCOPED_VMEM_KIB raises XLA's per-fusion scoped-vmem budget via
    per-jit compiler_options (rides the compile request through the
    axon tunnel).  The realistic preset at 1080p trips a 35.69M loop
    fusion against the 16M default ("should not be possible ... please
    file a bug against XLA", r3i/r3j) — the raise only lifts the
    allocation cap; fusion decisions are unchanged.  The r3j probe
    confirmed 49152 KiB compiles the realistic preset, so it is the
    default on TPU; set ORT_SCOPED_VMEM_KIB= (empty) to disable.
    TPU-only: other backends reject the flag."""
    kib = os.environ.get("ORT_SCOPED_VMEM_KIB", "49152")
    if kib and jax.default_backend() == "tpu":
        return {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": kib}}
    return {}


def make_render_fn(height: int, width: int,
                   use_bvh: bool = False, show_motion: bool = False,
                   donate: bool = True):
    """jit-compiled frame function specialized on the static config.

    The accumulation buffer is donated: the TAA output aliases the history
    input, the functional equivalent of the reference's ping-pong FBO flip
    (reference: src/render/accum.cpp:216-234).
    """
    def fn(params, fin, state, env_map, bvh):
        return render_frame(params, fin, state, env_map, bvh,
                            height=height, width=width, use_bvh=use_bvh,
                            show_motion=show_motion)
    return jax.jit(fn, donate_argnums=(2,) if donate else (),
                   **frame_jit_options())
