"""Tonemapping and debug color mapping
(reference: shaders/rt/rt_present.frag:65-104, 262-264).
"""

from __future__ import annotations

import jax.numpy as jnp


def aces_tonemap(x, exposure):
    """ACES approximation (Narkowicz 2015) with exposure pre-multiply
    (reference: rt_present.frag:65-69)."""
    x = x * exposure
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def gamma_encode(x, gamma: float = 2.2):
    """sRGB-ish gamma (reference: rt_present.frag:263)."""
    return jnp.power(jnp.maximum(x, 0.0), 1.0 / gamma)


def hsv2rgb(h, s, v):
    """(reference: rt_present.frag:74-77)."""
    def chan(offset):
        p = jnp.abs(jnp.mod(h + offset, 1.0) * 6.0 - 3.0)
        return v * (1.0 + s * (jnp.clip(p - 1.0, 0.0, 1.0) - 1.0))
    return jnp.stack([chan(0.0), chan(2.0 / 3.0), chan(1.0 / 3.0)], axis=-1)


def visualize_motion(motion, scale):
    """HSV motion wheel: hue = direction, value = magnitude; deadband black
    (reference: rt_present.frag:92-104)."""
    m = motion * scale
    mag = jnp.sqrt(jnp.sum(m * m, axis=-1))
    hue = jnp.arctan2(m[..., 1], m[..., 0]) / (2.0 * 3.1415926535) + 0.5
    val = jnp.clip(mag, 0.0, 1.0)
    rgb = hsv2rgb(hue, jnp.ones_like(hue), val)
    return jnp.where((mag < 1e-4)[..., None], 0.0, rgb)
