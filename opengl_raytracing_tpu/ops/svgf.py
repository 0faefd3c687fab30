"""SVGF-lite variance-guided spatial filter + present pass
(reference: shaders/rt/rt_present.frag:126-266).

The 7x7 gather loop becomes 49 statically shifted array slices — XLA
fuses the whole stencil into one pass over VMEM tiles; out-of-bounds taps
are masked out exactly like the GLSL `continue`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import YCOEFF
from ..params import RenderParams
from .vecmath import smoothstep, luminance, normalize
from .tonemap import aces_tonemap, gamma_encode, visualize_motion

_RADIUS = 3          # 7x7 kernel (rt_present.frag:169)
_K_NRM = 2.0         # rt_present.frag:160
_K_POS = 0.02        # rt_present.frag:161


def svgf_filter(accum, motion, gpos, gnrm, params: RenderParams, *,
                halo: int = 0, row_offset=0, full_height=None):
    """Variance/motion/GBuffer-aware 7x7 filter
    (reference: rt_present.frag:126-225).  accum [BH+2*halo,W,4] rgb+M2.

    `halo` rows at top/bottom are REAL neighbor data (sharded row bands
    exchange them explicitly); the output covers only the BH center rows.
    Tap validity is evaluated against the FULL image bounds
    (row_offset/full_height), so shard seams filter identically to the
    single-device image.
    """
    rows, w = accum.shape[0], accum.shape[1]
    bh = rows - 2 * halo
    if full_height is None:
        full_height = bh

    def _padded(a):
        # padded ONCE per input; _shift then takes 49 cheap slices of it
        # (a per-tap pad costs a materialized copy of the plane each tap)
        pad = [(_RADIUS, _RADIUS), (_RADIUS, _RADIUS)] + \
              [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a, pad)

    def _shift(ap, dy, dx):
        r0 = _RADIUS + halo + dy
        c0 = _RADIUS + dx
        return ap[r0:r0 + bh, c0:c0 + w]

    def _center(a):
        return a[halo:halo + bh]

    h = bh
    c_center = _center(accum)[..., :3]
    m2_center = _center(accum)[..., 3]
    motion = _center(motion)
    gpos_c = _center(gpos)
    gnrm_c = _center(gnrm)
    l_center = luminance(c_center, YCOEFF)
    var_center = jnp.clip(m2_center - l_center * l_center, 0.0,
                          jnp.float32(params.svgf_var_max))

    mot_mag = jnp.sqrt(jnp.sum(motion * motion, axis=-1))
    t = smoothstep(0.005, 0.05, mot_mag)
    k_var = params.svgf_k_var + (params.svgf_k_var_motion
                                 - params.svgf_k_var) * t
    k_color = params.svgf_k_color + (params.svgf_k_color_motion
                                     - params.svgf_k_color) * t
    var_boost = 1.0 + var_center * (1.0 + k_var * 0.5)

    # Hoisted out of the 49-tap loop: normals are normalized ONCE on the
    # full plane (normalize is pointwise, so shifting the normalized
    # plane == normalizing the shifted plane), the color-gaussian scale
    # is tap-invariant, and the three per-tap exps fuse into one
    # (exp(a)exp(b)exp(c) == exp(a+b+c)) — 49 exps/pixel instead of 147
    # and one sqrt instead of 49.  Same math as rt_present.frag:154-218
    # up to float rounding.
    gnrm_n = normalize(gnrm)
    n_center = _center(gnrm_n)
    k_col_scale = k_color * 0.3 + 0.05
    w_off_center = var_boost * (1.0 + var_center * 4.0)

    accum_p = _padded(accum)
    gpos_p = _padded(gpos)
    gnrm_p = _padded(gnrm_n)

    ix = jnp.arange(w, dtype=jnp.int32)[None, :]
    iy = jnp.arange(h, dtype=jnp.int32)[:, None] + jnp.asarray(row_offset,
                                                               jnp.int32)

    acc_col = jnp.zeros_like(c_center)
    acc_w = jnp.zeros((h, w), jnp.float32)
    for j in range(-_RADIUS, _RADIUS + 1):
        for i in range(-_RADIUS, _RADIUS + 1):
            valid = ((ix + i >= 0) & (ix + i < w)
                     & (iy + j >= 0) & (iy + j < full_height))
            c = _shift(accum_p, j, i)[..., :3]
            p = _shift(gpos_p, j, i)
            n = _shift(gnrm_p, j, i)

            dc = c - c_center
            dc2 = jnp.sum(dc * dc, axis=-1)
            dp = p - gpos_c
            dist2 = jnp.sum(dp * dp, axis=-1)
            ndot = jnp.clip(jnp.sum(n_center * n, axis=-1), -1.0, 1.0)

            expo = (dc2 * k_col_scale + dist2 * _K_POS
                    + jnp.maximum(0.0, 1.0 - ndot) * _K_NRM)
            base = var_boost if (i == 0 and j == 0) else w_off_center
            wgt = jnp.where(valid, base * jnp.exp(-expo), 0.0)
            acc_col = acc_col + c * wgt[..., None]
            acc_w = acc_w + wgt

    out = acc_col / jnp.maximum(acc_w, 1e-20)[..., None]
    return jnp.where((acc_w <= 0.0)[..., None], c_center, out)


def present(accum, motion, gpos, gnrm, params: RenderParams,
            show_motion: bool = False, allow_pallas: bool = True):
    """Present pass: motion debug | SVGF blend -> ACES -> gamma
    (reference: rt_present.frag:231-266).  Returns sRGB [H,W,3].

    `allow_pallas=False` forces the jnp stencil — required under the
    jit-SPMD multi-chip path (parallel/sharding.py): GSPMD cannot
    partition a Mosaic custom call over a row-sharded image, while the
    jnp shifted-slice form partitions into halo collectives."""
    import os
    if os.environ.get("ORT_PRESENT_HALF_TEXEL", "0") == "1":
        # Reference-quirk compatibility: rt_present.frag:232 samples at
        # uv = (gl_FragCoord.xy + 0.5)/sz — gl_FragCoord is already the
        # pixel center, so with the accum texture's NEAREST filter
        # (accum.cpp:11-14) every fetch in the pass reads texel
        # (x+1, y+1), clamped at the edges.  Shifting ALL pass inputs by
        # one texel reproduces that exactly (every tap in the frag is
        # uv + a neighbor offset, so one input shift covers the whole
        # stencil).  Default renders texel-exact instead (the quirk
        # drops the last row/column of real data); this knob exists so
        # golden-vs-reference comparisons can be made bit-aligned.
        # Caveat: at exact texel boundaries the GPU's (x+1.0)/W * W
        # rounding can land either side in f32 — parity is exact except
        # on that measure-zero set.
        def _shift(a):
            a = jnp.concatenate([a[1:], a[-1:]], axis=0)
            return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        accum, motion, gpos, gnrm = (_shift(accum), _shift(motion),
                                     _shift(gpos), _shift(gnrm))

    if show_motion:
        return visualize_motion(motion, jnp.float32(params.motion_scale))

    raw = accum[..., :3]
    if params.enable_svgf:
        import os
        import jax
        # Pallas banded-halo stencil — default on TPU; ORT_SVGF_PALLAS=0
        # reverts.  Re-paired r4 at current defaults (x3 + 48M scoped
        # vmem): full preset 28.86 vs 41.94 ms jnp, same session
        # (PERF.md r4/r3o); the original r2 pair was 13.8 vs 17.3 for
        # the stage alone.
        use_pallas = (allow_pallas
                      and os.environ.get("ORT_SVGF_PALLAS", "1") == "1"
                      and jax.default_backend() == "tpu")
        if use_pallas:
            from .svgf_pallas import svgf_filter_pallas
            filtered = svgf_filter_pallas(accum, motion, gpos, gnrm, params)
        else:
            filtered = svgf_filter(accum, motion, gpos, gnrm, params)
    else:
        filtered = raw
    return blend_tonemap(raw, filtered, params)


def blend_tonemap(raw, filtered, params: RenderParams):
    """Shared present tail: SVGF strength blend -> ACES -> gamma
    (reference: rt_present.frag:244-266).  `filtered == raw` degrades
    to plain tonemapping.  Also used by the shard_map renderer so the
    two paths cannot drift."""
    s = jnp.clip(jnp.float32(params.svgf_strength), 0.0, 1.0)
    linear = raw + (filtered - raw) * s
    mapped = aces_tonemap(linear, jnp.float32(params.exposure))
    return gamma_encode(mapped)
