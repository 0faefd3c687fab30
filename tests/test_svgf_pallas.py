"""Pallas SVGF stencil vs the jnp reference implementation."""

import pytest
import numpy as np
import jax.numpy as jnp

from opengl_raytracing_tpu import RenderParams
from opengl_raytracing_tpu.ops.svgf import svgf_filter
from opengl_raytracing_tpu.ops.svgf_pallas import svgf_filter_pallas


def _inputs(H, W, seed=0):
    rng = np.random.RandomState(seed)
    col = 0.5 + 0.2 * rng.randn(H, W, 3).astype(np.float32)
    l = col @ np.asarray([0.299, 0.587, 0.114], np.float32)
    accum = jnp.asarray(np.concatenate([col, (l**2 + 0.03)[..., None]], -1))
    motion = jnp.asarray(0.01 * rng.randn(H, W, 2).astype(np.float32))
    gpos = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))
    n = rng.randn(H, W, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return accum, motion, gpos, jnp.asarray(n)


def test_pallas_svgf_matches_jnp():
    accum, motion, gpos, gnrm = _inputs(24, 64)
    p = RenderParams()
    a = np.asarray(svgf_filter(accum, motion, gpos, gnrm, p))
    b = np.asarray(svgf_filter_pallas(accum, motion, gpos, gnrm, p))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_pallas_svgf_band_configs_match(monkeypatch):
    """Every (band height, buffering) config is bit-identical: the r3
    restructure (BH=32 slabs + cross-grid-step prefetch) only changes
    the DMA schedule, never the math.  40 rows forces multiple bands at
    bh=8/16 so the prefetch pipeline actually runs.  (Comparison is a
    tight allclose vs the jnp reference, not bitwise across configs:
    interpret-mode lowering fuses per band shape, which moves the last
    float bit.)"""
    accum, motion, gpos, gnrm = _inputs(40, 96, seed=3)
    p = RenderParams()
    ref = np.asarray(svgf_filter(accum, motion, gpos, gnrm, p))
    for bh, db in [("8", "0"), ("8", "1"), ("16", "1"), ("32", "1"),
                   ("64", "0")]:
        monkeypatch.setenv("ORT_SVGF_BH", bh)
        monkeypatch.setenv("ORT_SVGF_DB", db)
        out = np.asarray(svgf_filter_pallas(accum, motion, gpos, gnrm, p))
        np.testing.assert_allclose(ref, out, atol=2e-5, rtol=1e-4,
                                   err_msg=f"bh={bh} db={db}")


def test_pallas_svgf_sky_normals_zero():
    H, W = 16, 64
    accum = jnp.ones((H, W, 4)) * 0.3
    out = np.asarray(svgf_filter_pallas(
        accum, jnp.zeros((H, W, 2)), jnp.zeros((H, W, 3)),
        jnp.zeros((H, W, 3)), RenderParams()))
    assert np.isfinite(out).all()
