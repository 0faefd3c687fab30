"""TAA resolve with history variance tracking
(reference: shaders/rt/rt_taa.glsl:47-180).

Operates on whole [H,W] buffers.  History fetches are NEAREST +
CLAMP_TO_EDGE texel gathers, matching the accum texture parameters
(reference: src/render/accum.cpp:11-14).  Array rows follow GL's bottom-up
y so UV math carries over 1:1.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..constants import YCOEFF
from ..params import RenderParams
from .vecmath import smoothstep, luminance


def _sample_nearest(tex, u, v):
    """NEAREST + CLAMP_TO_EDGE fetch of tex [H,W,C] at uv in [0,1].

    One FLAT gather (row-major linear index into [H*W,C]) instead of a
    2D index concatenate: selects the identical element, but XLA neither
    materializes an s32[H,W,2] index buffer nor re-derives the row
    stride — the r2 audit showed the concatenate alone streaming
    16.6 MB/frame at 1080p."""
    h, w = tex.shape[0], tex.shape[1]
    x = jnp.clip(jnp.floor(u * w), 0, w - 1).astype(jnp.int32)
    y = jnp.clip(jnp.floor(v * h), 0, h - 1).astype(jnp.int32)
    idx = y * w + x
    if os.environ.get("ORT_TAA_PLANES", "0") == "1":
        # Channel-plane scalar gathers (four flat [H*W] takes) instead
        # of one [H*W,4] row gather.  The r3 layout probe measured the
        # row form at ~1.2 ms per 1080p moving resolve (XLA does NOT
        # lane-pad it), so the row form stays the default; the plane
        # form is kept for A/B — when the accumulation is carried as
        # [4,H,W] planes (ORT_ACCUM_PLANES) its moveaxis pair cancels
        # and the gathers read the carried buffer directly.
        texp = jnp.moveaxis(tex, -1, 0).reshape(tex.shape[2], h * w)
        return jnp.stack([jnp.take(texp[c], idx)
                          for c in range(tex.shape[2])], axis=-1)
    return tex.reshape(h * w, -1)[idx]


def resolve_taa(curr, motion, prev_accum, frame_index, params: RenderParams,
                row_offset=0, moved=None):
    """Blend current frame with (reprojected) history.

    curr [BH,W,3] linear color (already SPP-averaged); motion [BH,W,2] NDC
    motion (already zeroed by the caller when the camera is static,
    reference: rt.frag:188); prev_accum [H,W,4] rgb+M2 (the FULL history —
    reprojection may read anywhere); frame_index traced int32.  When curr
    is a row band of a sharded image, `row_offset` is its first global
    row.  Returns [BH,W,4] = (color, M2).

    `moved` (scalar bool or None): when the caller knows the camera is
    static it zeroes `motion`, which makes the whole moving path resolve
    to the still path through the motMag<thresh select — but the history
    reprojection GATHER still executes.  Passing the camera-moved scalar
    wraps the moving path in lax.cond so still frames (the common
    interactive state, and the state the reference's published FPS is
    read in) skip the 2M-pixel gather entirely.  None keeps the
    branch-free form (identical output).
    """
    l_curr = luminance(curr, YCOEFF)
    l_curr2 = l_curr * l_curr

    if not params.enable_taa:
        # Still store M2 so SVGF can compute variance (rt_taa.glsl:58-61).
        return jnp.concatenate([curr, l_curr2[..., None]], axis=-1)

    # The whole resolve is computed CHANNELWISE as ([BH,W,3] color,
    # [BH,W] M2) pairs and concatenated exactly once at the end.  The
    # previous form concatenated each case to [BH,W,4] and selected
    # between the concatenations — select distributes over concatenate
    # bit-exactly, and the channelwise form lets XLA fuse the entire
    # resolve around the one history gather instead of materializing
    # passthrough/still/moving planes (r2 audit: 473 MB/frame at 1080p,
    # ~3.4x the stage's true I/O).
    bh, w = curr.shape[0], curr.shape[1]
    h = prev_accum.shape[0]
    ix = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    iy = (jnp.arange(bh, dtype=jnp.float32)[:, None] + 0.5 + row_offset)
    uvx = jnp.broadcast_to(ix / w, (bh, w))
    uvy = jnp.broadcast_to(iy / h, (bh, w))

    mot_mag = jnp.sqrt(jnp.sum(motion * motion, axis=-1))
    min_w = jnp.float32(params.taa_history_min_weight)
    avg_w = jnp.float32(params.taa_history_avg_weight)
    max_w = jnp.float32(params.taa_history_max_weight)
    box = jnp.float32(params.taa_history_box_size)
    fi = jnp.asarray(frame_index, jnp.int32)

    # ---- CASE 1: effectively still (rt_taa.glsl:86-105) ----
    if isinstance(row_offset, int) and row_offset == 0 and bh == h:
        prev_same = prev_accum  # whole image: skip the slice
    else:
        prev_same = jax.lax.dynamic_slice_in_dim(
            prev_accum, jnp.asarray(row_offset, jnp.int32), bh, axis=0)
    w_still = jnp.where(fi < 8, min_w, jnp.where(fi < 32, avg_w, max_w))
    col_still = prev_same[..., :3] * w_still + curr * (1.0 - w_still)
    m2_still = prev_same[..., 3] * w_still + l_curr2 * (1.0 - w_still)

    # ---- CASE 2: moving — reproject (rt_taa.glsl:116-179) ----
    def with_moving(_):
        uv_prev_x = uvx - motion[..., 0] * 0.5
        uv_prev_y = uvy - motion[..., 1] * 0.5
        oob = ((uv_prev_x < 0.0) | (uv_prev_x > 1.0)
               | (uv_prev_y < 0.0) | (uv_prev_y > 1.0))
        # ONE history fetch for both per-pixel cases: pixels under the
        # still threshold read their own texel (identity uv fetches
        # exactly prev_same's pixel — uvx*w floors back to x, uvy*h to
        # row_offset+y), moving pixels read the reprojected one.  The
        # previous form streamed the full history twice (identity read
        # + gather, 33 MB each at 1080p).
        still_px = (mot_mag < params.taa_still_thresh)
        prev = _sample_nearest(prev_accum,
                               jnp.where(still_px, uvx, uv_prev_x),
                               jnp.where(still_px, uvy, uv_prev_y))
        prev_col = prev[..., :3]
        prev_m2 = prev[..., 3]
        col_still_g = prev_col * w_still + curr * (1.0 - w_still)
        m2_still_g = prev_m2 * w_still + l_curr2 * (1.0 - w_still)

        w_hist = 1.0 - smoothstep(0.02, params.taa_hard_moving_thresh,
                                  mot_mag)
        w_hist = jnp.where(mot_mag > params.taa_hard_moving_thresh, 0.0,
                           w_hist)

        l_prev = luminance(prev_col, YCOEFF)
        max_l = jnp.maximum(jnp.maximum(l_curr, l_prev), 1e-3)
        rel_diff = jnp.abs(l_curr - l_prev) / max_l
        color_weight = 1.0 - smoothstep(0.03, 0.25, rel_diff)
        w_hist = w_hist * color_weight
        big_change = (mot_mag > 0.02) & (rel_diff > 0.30)
        w_hist = jnp.where(big_change, 0.0, w_hist)
        w_hist = jnp.clip(w_hist, 0.0, max_w)
        w_curr = 1.0 - w_hist

        hist_col = jnp.clip(prev_col, curr - box, curr + box)
        taa_col = w_hist[..., None] * hist_col + w_curr[..., None] * curr
        m2_new = w_hist * prev_m2 + w_curr * l_curr2
        # out-of-bounds reprojection: passthrough (rt_taa.glsl:124-127)
        col_mov = jnp.where(oob[..., None], curr, taa_col)
        m2_mov = jnp.where(oob, l_curr2, m2_new)

        return (jnp.where(still_px[..., None], col_still_g, col_mov),
                jnp.where(still_px, m2_still_g, m2_mov))

    if moved is None:
        col, m2 = with_moving(None)
    else:
        # zero motion => every pixel takes the still branch of the
        # motMag<thresh select (mot_mag==0 < thresh) — skip the
        # reprojection gather wholesale.  Guard the degenerate
        # taa_still_thresh<=0 configuration, where 0 < thresh is false
        # and the branch-free form would take the moving path.
        need_moving = jnp.logical_or(
            jnp.asarray(moved, jnp.bool_),
            jnp.asarray(params.taa_still_thresh, jnp.float32) <= 0.0)
        col, m2 = jax.lax.cond(need_moving, with_moving,
                               lambda _: (col_still, m2_still), None)
    # First frame: no history yet (rt_taa.glsl:66-68).
    col = jnp.where(fi == 0, curr, col)
    m2 = jnp.where(fi == 0, l_curr2, m2)
    return jnp.concatenate([col, m2[..., None]], axis=-1)
