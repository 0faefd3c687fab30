"""RNG, low-discrepancy sequences, and sampling helpers (pure JAX).

Bit-exact vectorized re-implementations of the reference's GLSL sampling
utilities (reference: shaders/rt/rt_common.glsl:57-159) plus the host-side
jitter generator (reference: src/app/application.cpp:28-47).  RNG parity
matters: noise patterns feed TAA/SVGF, so matching the integer hash exactly
keeps temporal behavior comparable.

Everything is elementwise over arbitrary leading batch dims — on TPU these
ops all run on the VPU and fuse with the surrounding shading code.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .constants import PI


# -----------------------------------------------------------------------------
# Integer hash RNG (reference: shaders/rt/rt_common.glsl:57-77)
# -----------------------------------------------------------------------------

def hash2(vx, vy):
    """LCG + xorshift mix of two uint32 lanes -> uint32."""
    vx = vx.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    vy = vy.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    vx = vx ^ (vy >> jnp.uint32(16))
    vy = vy ^ (vx << jnp.uint32(5))
    vx = vx * jnp.uint32(1664525) + jnp.uint32(1013904223)
    vy = vy * jnp.uint32(1664525) + jnp.uint32(1013904223)
    return vx ^ vy


def rand(px, py, frame):
    """float RNG in [0,1): rand(vec2 p, int frame)
    (reference: shaders/rt/rt_common.glsl:75-77).

    px/py are float pixel coordinates (gl_FragCoord-style, i.e. pixel index
    + 0.5 plus any offsets); frame is an int32 scalar or array.  The GLSL
    float->uint conversion truncates toward zero, as does astype here.
    """
    f = jnp.asarray(frame)
    fu = f.astype(jnp.uint32)
    fm = (f * 1663).astype(jnp.uint32)  # int32 wrap == uint32 wrap bits
    ux = jnp.maximum(px, 0.0).astype(jnp.uint32) ^ fu
    uy = jnp.maximum(py, 0.0).astype(jnp.uint32) ^ fm
    h = hash2(ux, uy)
    return h.astype(jnp.float32) / jnp.float32(4294967296.0)


def eps_for_dist(d):
    """Distance-scaled epsilon (reference: shaders/rt/rt_common.glsl:88-90)."""
    return jnp.maximum(1e-4, 1e-3 * d)


# -----------------------------------------------------------------------------
# Halton / low-discrepancy (reference: shaders/rt/rt_common.glsl:106-129)
# -----------------------------------------------------------------------------

_HALTON_ITERS = 31  # covers every positive int32 index in base 2 (the
# smallest base = most digits); callers pass scalar frame indices, so the
# extra iterations are free — matching the reference's unbounded while-loop
# (rt_common.glsl:106-119) even for multi-hour accumulation runs


def halton(i, b: int):
    """i-th sample of the 1D Halton sequence in base b (correct radical
    inverse; the device-side variant).  i may be a traced int array."""
    i = jnp.asarray(i, jnp.int32)
    f = jnp.ones(jnp.shape(i), jnp.float32)
    r = jnp.zeros(jnp.shape(i), jnp.float32)
    n = i
    for _ in range(_HALTON_ITERS):
        active = n > 0
        f_next = f / b
        r = jnp.where(active, r + f_next * (n % b).astype(jnp.float32), r)
        f = jnp.where(active, f_next, f)
        n = jnp.where(active, n // b, n)
    return r


def ld2(i):
    """2D low-discrepancy point: (halton(i+1,2), halton(i+1,3))
    (reference: shaders/rt/rt_common.glsl:127-129)."""
    return halton(i + 1, 2), halton(i + 1, 3)


def host_jitter_halton(index: int, base: int) -> float:
    """The HOST jitter generator's halton variant.

    NOTE: the reference host code halves `f` each iteration regardless of
    base (reference: src/app/application.cpp:28-38), which differs from the
    true radical inverse for base 3.  We reproduce that behavior exactly so
    jitter sequences match frame-for-frame.
    """
    f, r = 1.0, 0.0
    n = int(index)
    while n > 0:
        f *= 0.5
        r += f * float(n % base)
        n //= base
    return r


def generate_jitter2d(frame_index: int) -> np.ndarray:
    """2D jitter in [-0.5,0.5]^2, sequence masked to 1024 entries
    (reference: src/app/application.cpp:41-47)."""
    idx = int(frame_index) & 1023
    return np.array([host_jitter_halton(idx + 1, 2) - 0.5,
                     host_jitter_halton(idx + 1, 3) - 0.5], np.float32)


# -----------------------------------------------------------------------------
# Disk / hemisphere sampling (reference: rt_common.glsl:144-159,
# rt_lighting.glsl:227-266)
# -----------------------------------------------------------------------------

def concentric_sample(ux, uy):
    """Concentric map [0,1]^2 -> unit disk
    (reference: shaders/rt/rt_common.glsl:144-159)."""
    a = 2.0 * ux - 1.0
    b = 2.0 * uy - 1.0
    a_dom = jnp.abs(a) > jnp.abs(b)
    safe_a = jnp.where(jnp.abs(a) > 1e-20, a, 1.0)
    safe_b = jnp.where(jnp.abs(b) > 1e-20, b, 1.0)
    r = jnp.where(a_dom, a, b)
    phi = jnp.where(a_dom,
                    (PI / 4.0) * (b / safe_a),
                    (PI / 2.0) - (PI / 4.0) * (a / safe_b))
    zero = (a == 0.0) & (b == 0.0)
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def build_onb(n):
    """Orthonormal basis (T, B) around normal n [..., 3]
    (reference: shaders/rt/rt_lighting.glsl:227-231)."""
    up_is_y = jnp.abs(n[..., 1]) < 0.99
    up = jnp.where(up_is_y[..., None],
                   jnp.array([0.0, 1.0, 0.0], n.dtype),
                   jnp.array([1.0, 0.0, 0.0], n.dtype))
    t = jnp.cross(up, n)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    b = jnp.cross(n, t)
    return t, b


def sample_hemisphere_cosine(n, ux, uy):
    """Cosine-weighted hemisphere sample around n
    (reference: shaders/rt/rt_lighting.glsl:251-266)."""
    phi = 2.0 * PI * ux
    r = jnp.sqrt(uy)
    x = r * jnp.cos(phi)
    z = r * jnp.sin(phi)
    y = jnp.sqrt(jnp.maximum(0.0, 1.0 - uy))
    nn = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    t, b = build_onb(nn)
    d = x[..., None] * t + z[..., None] * b + y[..., None] * nn
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def cp_offset(px, py, frame):
    """Per-pixel rotation offset for disk-light sampling
    (reference: shaders/rt/rt_lighting.glsl:280-289)."""
    hx = rand(px, py, frame * 911)
    hy = rand(py, px, frame * 577)
    lx, ly = ld2(frame)
    return jnp.mod(hx + lx, 1.0), jnp.mod(hy + ly, 1.0)


# -----------------------------------------------------------------------------
# Motion helpers (reference: shaders/rt/rt_common.glsl:175-179)
# -----------------------------------------------------------------------------

def ndc_from_world(p, vp):
    """Project world positions [...,3] by VP [4,4] -> NDC xy [...,2].

    precision=HIGHEST: motion vectors are DIFFERENCES of two such
    projections, compared against taa_still_thresh=1e-5 and the SVGF
    smoothstep(0.005, 0.05) band — the MXU's default bf16 rounding
    (~4e-3 at NDC scale) would drown them (CLAUDE.md precision rule)."""
    hp = jax.lax.Precision.HIGHEST
    clip = jnp.matmul(p, vp[:3, :3].T, precision=hp) + vp[:3, 3]
    w = jnp.matmul(p, vp[3, :3], precision=hp) + vp[3, 3]
    return clip[..., :2] / jnp.maximum(w, 1e-6)[..., None]
