"""Cubemap sampling without texture units.

The reference samples a GL cubemap with `texture(uEnvMap, dir)`
(reference: shaders/rt/rt_scene_analytic.glsl:213-215).  Here the
environment lives as a replicated `[6, F, F, 3]` float32 HBM array and we
do the face-select + bilinear CLAMP_TO_EDGE fetch manually — face math per
the GL spec's cubemap selection table, matching the face order the loader
produces (+X,-X,+Y,-Y,+Z,-Z; reference: src/render/cubemap.cpp:86-91).
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def direction_to_face_uv(d):
    """dir [...,3] -> (face int32 [...], s [...], t [...]) in [0,1]."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    x_major = (ax >= ay) & (ax >= az)
    y_major = (~x_major) & (ay >= az)
    # face ids: 0:+X 1:-X 2:+Y 3:-Y 4:+Z 5:-Z
    face = jnp.where(
        x_major, jnp.where(x >= 0, 0, 1),
        jnp.where(y_major, jnp.where(y >= 0, 2, 3),
                  jnp.where(z >= 0, 4, 5))).astype(jnp.int32)

    ma = jnp.where(x_major, ax, jnp.where(y_major, ay, az))
    ma = jnp.maximum(ma, 1e-12)

    sc = jnp.where(
        x_major, jnp.where(x >= 0, -z, z),
        jnp.where(y_major, x, jnp.where(z >= 0, x, -x)))
    tc = jnp.where(
        x_major, -y,
        jnp.where(y_major, jnp.where(y >= 0, z, -z), -y))

    s = 0.5 * (sc / ma + 1.0)
    t = 0.5 * (tc / ma + 1.0)
    return face, s, t


def _env_gather() -> str:
    """ORT_ENV_GATHER selects the bilinear tap lowering: 'flat'
    (default), 'onetake', 'u8', 'planes', or 'multi'.

    'multi' is the naive `env[face, y0, x0]` advanced-indexing form —
    three separate index vectors per tap.  XLA TPU lowers that
    multi-dimensional gather to a serialized slow path: the full
    analytic shade tree (~15 sky call sites x 4 taps) measured
    1544 ms/frame at 1080p on hardware (r3).  'flat' precomputes ONE
    linearized index per tap and row-gathers a [6*F*F, 3] table — the
    same lowering as the TAA history fetch, measured ~1.2 ms per 2M-ray
    gather.  'planes' additionally splits channels into three scalar
    gathers from a [3, 6*F*F] table (more index traffic, pad-proof);
    kept for A/B.

    r4 additions, motivated by the an_full ablation (the `direct`
    stage costs 49 ms with the shading megakernel ON — the remaining
    outside-the-kernel work is dominated by these gathers):
    'onetake' stacks the four bilinear tap indices into ONE [4,N] take
    (identical rows fetched — bit-exact; 1 gather op instead of 4);
    'u8' additionally gathers from a uint8 table and converts AFTER
    the fetch — bit-exact whenever the environment came from 8-bit
    sources (every PNG cross: values are exactly k/255, and
    round(v*255)/255 round-trips them), 4x fewer gathered bytes and
    no f32 row padding.  Do not use 'u8' with float (HDR/EXR) maps.
    'patch' bakes each texel's 2x2 CLAMP_TO_EDGE patch into a [T,12]
    table so ONE take per pixel fetches all four taps (4x fewer
    indices); 'patch_u8' combines both.  All modes bit-match
    (test_image_cubemap).

    'auto' (default since the r4a A/B: an_full 143.15 ms flat /
    113.22 u8 / 57.01 patch / **51.49 patch_u8**) resolves per the
    env array's dtype, which is trace-static: uint8 tables (8-bit
    sources keep their integer texels end-to-end, app/state.py) take
    the patch_u8 lowering with NO re-quantization; float tables
    (HDR/EXR — u8 would clip and quantize) take 'patch'."""
    return os.environ.get("ORT_ENV_GATHER", "auto")


def sample_cubemap(env, d):
    """Bilinear cubemap fetch: env [6,F,F,3], d [...,3] -> rgb [...,3].

    Equivalent to GL_LINEAR + CLAMP_TO_EDGE within a face (the reference
    does not request seamless filtering).  All three gather lowerings
    fetch the same taps and blend in the same per-channel order, so the
    result is bit-identical across ORT_ENV_GATHER settings.
    """
    face, s, t = direction_to_face_uv(d)
    f = env.shape[1]

    xs = s * f - 0.5
    ys = t * f - 0.5
    x0 = jnp.clip(jnp.floor(xs), 0, f - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(ys), 0, f - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, f - 1)
    y1 = jnp.minimum(y0 + 1, f - 1)
    fxs = jnp.clip(xs - x0.astype(jnp.float32), 0.0, 1.0)
    fys = jnp.clip(ys - y0.astype(jnp.float32), 0.0, 1.0)

    mode = _env_gather()
    is_u8 = env.dtype == jnp.uint8
    if mode == "auto":
        mode = "patch_u8" if is_u8 else "patch"
    if is_u8 and mode != "patch_u8":
        # legacy/explicit modes operate on the float table; k/255 by
        # true division matches the float loader bit-exactly
        env = env.astype(jnp.float32) / 255.0
        is_u8 = False
    if mode != "multi":
        row0 = (face * f + y0) * f
        row1 = (face * f + y1) * f
        i00, i01 = row0 + x0, row0 + x1
        i10, i11 = row1 + x0, row1 + x1

    if mode == "flat":
        envf = env.reshape(-1, 3)
        c00 = jnp.take(envf, i00, axis=0)
        c01 = jnp.take(envf, i01, axis=0)
        c10 = jnp.take(envf, i10, axis=0)
        c11 = jnp.take(envf, i11, axis=0)
    elif mode in ("onetake", "u8"):
        envf = env.reshape(-1, 3)
        if mode == "u8":
            # exact for k/255-valued tables (PNG-sourced); the blend
            # below runs in f32 on the identical texel values
            envf = jnp.clip(jnp.round(envf * 255.0), 0.0,
                            255.0).astype(jnp.uint8)
        taps = jnp.take(envf, jnp.stack([i00, i01, i10, i11]), axis=0)
        if mode == "u8":
            # true division: the loader computes k/255 by f32 divide,
            # and k * fl(1/255) can land 1 ulp away
            taps = taps.astype(jnp.float32) / 255.0
        c00, c01, c10, c11 = taps[0], taps[1], taps[2], taps[3]
    elif mode in ("patch", "patch_u8"):
        # Bake each texel's 2x2 CLAMP_TO_EDGE neighborhood into a
        # [T,12] table (built table-side per call — 6F^2 rows, trivial
        # vs the 2M-pixel fetch) so ONE row gather at i00 delivers all
        # four bilinear taps: 4x fewer gathered indices than 'flat'.
        # The baked x/y neighbor clamps reproduce x1=min(x0+1,f-1) /
        # y1=min(y0+1,f-1) exactly, so taps are bit-identical.
        envf = env.reshape(-1, 3)
        t_i = jnp.arange(envf.shape[0], dtype=jnp.int32)
        rem = t_i % (f * f)
        ty, tx = rem // f, rem % f
        dx = jnp.where(tx < f - 1, 1, 0)
        dy = jnp.where(ty < f - 1, f, 0)
        envq = jnp.concatenate(
            [envf, envf[t_i + dx], envf[t_i + dy], envf[t_i + dy + dx]],
            axis=1)                                          # [T,12]
        if mode == "patch_u8" and not is_u8:
            envq = jnp.clip(jnp.round(envq * 255.0), 0.0,
                            255.0).astype(jnp.uint8)
        row = jnp.take(envq, i00, axis=0)                    # [...,12]
        if mode == "patch_u8":
            row = row.astype(jnp.float32) / 255.0
        c00, c01 = row[..., 0:3], row[..., 3:6]
        c10, c11 = row[..., 6:9], row[..., 9:12]
    elif mode == "planes":
        envp = jnp.moveaxis(env, -1, 0).reshape(3, -1)
        out = []
        for c in range(3):
            p = envp[c]
            top = (jnp.take(p, i00)
                   + (jnp.take(p, i01) - jnp.take(p, i00)) * fxs)
            bot = (jnp.take(p, i10)
                   + (jnp.take(p, i11) - jnp.take(p, i10)) * fxs)
            out.append(top + (bot - top) * fys)
        return jnp.stack(out, axis=-1)
    else:
        c00 = env[face, y0, x0]
        c01 = env[face, y0, x1]
        c10 = env[face, y1, x0]
        c11 = env[face, y1, x1]

    fx = fxs[..., None]
    fy = fys[..., None]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def sample_cubemap_gated(env, d, lane_mask, frac: float):
    """sample_cubemap evaluated only on the 128-lane tiles where
    `lane_mask` has any lane set; other lanes return 0 (callers must
    discard them by the same mask).

    `d` is a FLAT [N,3] direction stream with N % 128 == 0; the same
    argsort/compact/scatter machinery as the pipeline tile gates
    (models/pipeline._tile_gated_shade), with the lax.cond dense
    fallback when more tiles qualify than the frac*T capacity.  The
    an_full ablation prices each full-lane 4-tap env gather at a
    two-digit ms share of the frame while its consumers are a masked
    subset (sky: miss lanes; megakernel sky_r: mirror/glass lanes) —
    this fetches only the consuming tiles."""
    import jax

    n = d.shape[0]
    t = n // 128
    k = max(1, min(t, int(round(frac * t))))
    tile_sel = lane_mask.reshape(t, 128).any(axis=1)
    count = jnp.sum(tile_sel.astype(jnp.int32))
    idx = jnp.argsort(~tile_sel, stable=True)[:k]

    def compact(_):
        dg = jnp.take(d.reshape(t, 128, 3), idx, axis=0)
        c = sample_cubemap(env, dg.reshape(k * 128, 3))
        out = jnp.zeros((t, 128, 3), c.dtype)
        out = out.at[idx].set(c.reshape(k, 128, 3))
        return out.reshape(n, 3)

    def dense(_):
        return sample_cubemap(env, d)

    return jax.lax.cond(count <= k, compact, dense, None)


def dummy_cubemap(size: int = 1):
    """1x1 blue-ish fallback cubemap so env samplers are always valid
    (reference: src/render/cubemap.cpp:7-31, pixel (128,128,255)/255)."""
    base = jnp.array([128.0, 128.0, 255.0], jnp.float32) / 255.0
    return jnp.broadcast_to(base, (6, size, size, 3)).astype(jnp.float32)
