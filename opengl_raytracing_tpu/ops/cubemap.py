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


def _env_planes() -> bool:
    """ORT_ENV_PLANES=0 reverts to the [...,3]-row-gather form.

    A gather whose result rows are 3 floats materializes with its minor
    dim padded to 128 lanes on TPU (~42x bytes; CLAUDE.md SoA rule), and
    the full analytic shade tree samples the environment at ~15 call
    sites x 4 bilinear taps — the padded form audits at tens of GB/frame
    at 1080p (measured 1544 ms/frame on hardware, r3).  The plane form
    gathers each channel as a flat scalar stream instead."""
    return os.environ.get("ORT_ENV_PLANES", "1") != "0"


def sample_cubemap(env, d):
    """Bilinear cubemap fetch: env [6,F,F,3], d [...,3] -> rgb [...,3].

    Equivalent to GL_LINEAR + CLAMP_TO_EDGE within a face (the reference
    does not request seamless filtering).
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

    if _env_planes():
        # SoA: one [3, 6*F*F] table (built once per jit — XLA CSEs the
        # transpose across every sky call site), 4 taps x 3 channels of
        # flat SCALAR gathers.  Same taps, same per-channel arithmetic
        # order as the row form -> bit-identical rgb.
        envp = jnp.moveaxis(env, -1, 0).reshape(3, -1)
        i00 = (face * f + y0) * f + x0
        i01 = (face * f + y0) * f + x1
        i10 = (face * f + y1) * f + x0
        i11 = (face * f + y1) * f + x1
        out = []
        for c in range(3):
            p = envp[c]
            c00 = jnp.take(p, i00)
            c01 = jnp.take(p, i01)
            c10 = jnp.take(p, i10)
            c11 = jnp.take(p, i11)
            top = c00 + (c01 - c00) * fxs
            bot = c10 + (c11 - c10) * fxs
            out.append(top + (bot - top) * fys)
        return jnp.stack(out, axis=-1)

    fx = fxs[..., None]
    fy = fys[..., None]
    c00 = env[face, y0, x0]
    c01 = env[face, y0, x1]
    c10 = env[face, y1, x0]
    c11 = env[face, y1, x1]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def dummy_cubemap(size: int = 1):
    """1x1 blue-ish fallback cubemap so env samplers are always valid
    (reference: src/render/cubemap.cpp:7-31, pixel (128,128,255)/255)."""
    base = jnp.array([128.0, 128.0, 255.0], jnp.float32) / 255.0
    return jnp.broadcast_to(base, (6, size, size, 3)).astype(jnp.float32)
