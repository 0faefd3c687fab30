"""Pallas SVGF stencil vs the jnp reference implementation."""

import numpy as np
import jax.numpy as jnp

from opengl_raytracing_tpu import RenderParams
from opengl_raytracing_tpu.ops.svgf import svgf_filter
from opengl_raytracing_tpu.ops.svgf_pallas import svgf_filter_pallas


def test_pallas_svgf_matches_jnp():
    rng = np.random.RandomState(0)
    H, W = 24, 64
    col = 0.5 + 0.2 * rng.randn(H, W, 3).astype(np.float32)
    l = col @ np.asarray([0.299, 0.587, 0.114], np.float32)
    accum = jnp.asarray(np.concatenate([col, (l**2 + 0.03)[..., None]], -1))
    motion = jnp.asarray(0.01 * rng.randn(H, W, 2).astype(np.float32))
    gpos = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))
    n = rng.randn(H, W, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    gnrm = jnp.asarray(n)
    p = RenderParams()
    a = np.asarray(svgf_filter(accum, motion, gpos, gnrm, p))
    b = np.asarray(svgf_filter_pallas(accum, motion, gpos, gnrm, p))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_pallas_svgf_sky_normals_zero():
    H, W = 16, 64
    accum = jnp.ones((H, W, 4)) * 0.3
    out = np.asarray(svgf_filter_pallas(
        accum, jnp.zeros((H, W, 2)), jnp.zeros((H, W, 3)),
        jnp.zeros((H, W, 3)), RenderParams()))
    assert np.isfinite(out).all()
