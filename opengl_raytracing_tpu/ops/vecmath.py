"""Small vec3 helpers over [..., 3] arrays (GLSL built-in equivalents)."""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a, eps: float = 1e-12):
    return a / jnp.maximum(length(a), eps)[..., None]


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n,i)*n (i points toward the surface)."""
    return i - 2.0 * dot(n, i)[..., None] * n


def refract(i, n, eta):
    """GLSL refract. eta may be a scalar or a per-lane [...] array.
    Returns (dir, k) where k<0 means total internal reflection (dir is
    zero there, as in GLSL)."""
    eta = jnp.asarray(eta, jnp.float32)
    cosi = dot(n, i)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    t = (eta[..., None] * i
         - (eta * cosi + jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n)
    return jnp.where((k < 0.0)[..., None], 0.0, t), k


def mix(a, b, t):
    return a + (b - a) * t


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def luminance(c, coeff):
    return (c[..., 0] * coeff[0] + c[..., 1] * coeff[1] + c[..., 2] * coeff[2])


def v3(x, y, z):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(z, jnp.float32)), axis=-1)


def const3(t):
    return jnp.asarray(t, jnp.float32)
