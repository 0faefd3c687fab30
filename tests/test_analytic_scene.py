"""Analytic scene intersections vs closed-form expectations
(reference geometry: shaders/rt/rt_scene_analytic.glsl:37-54)."""

import numpy as np
import jax.numpy as jnp

from opengl_raytracing_tpu import RenderParams
from opengl_raytracing_tpu.ops.scene_analytic import (
    trace_analytic, trace_analytic_ignore_glass,
    trace_analytic_ignore_point_light, sky)
from opengl_raytracing_tpu.constants import (
    MAT_FLOOR, MAT_ALBEDO_SPHERE, MAT_GLASS_SPHERE, MAT_POINTLIGHT_SPHERE)

PARAMS = RenderParams()
PLP = jnp.asarray(PARAMS.point_light_pos, jnp.float32)


def _trace(ro, rd, fn=trace_analytic):
    return fn(jnp.asarray([ro], jnp.float32),
              jnp.asarray([rd], jnp.float32), PARAMS, PLP)


def test_floor_hit():
    h = _trace([0, 2, 8], [0, -1, 0])
    assert bool(h.valid[0])
    assert int(h.mat[0]) == MAT_FLOOR
    np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.n[0]), [0, 1, 0], atol=1e-6)


def test_albedo_sphere_hit():
    # aim at sphere center (-1.2, 1, -3.5) from origin-ish camera
    ro = np.array([-1.2, 1.0, 2.0])
    h = _trace(ro, [0, 0, -1])
    assert int(h.mat[0]) == MAT_ALBEDO_SPHERE
    np.testing.assert_allclose(float(h.t[0]), 4.5, atol=1e-4)  # 5.5 - r


def test_glass_sphere_respected_and_ignored():
    # approach from behind the scene so the mirror sphere isn't in the way
    ro = np.array([0.7, 1.0, -8.0])
    h = _trace(ro, [0, 0, 1])
    assert int(h.mat[0]) == MAT_GLASS_SPHERE
    np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-4)
    h2 = _trace(ro, [0, 0, 1], trace_analytic_ignore_glass)
    assert int(h2.mat[0]) != MAT_GLASS_SPHERE


def test_marker_sphere_toggle():
    plp = np.asarray(PARAMS.point_light_pos)
    ro = plp + np.array([0, 0, 2.0])
    h = _trace(ro, [0, 0, -1])
    assert int(h.mat[0]) == MAT_POINTLIGHT_SPHERE
    h2 = _trace(ro, [0, 0, -1], trace_analytic_ignore_point_light)
    assert int(h2.mat[0]) != MAT_POINTLIGHT_SPHERE


def test_ray_inside_sphere_uses_far_root():
    ro = np.array([-1.2, 1.0, -3.5])  # center of albedo sphere
    h = _trace(ro, [0, 0, 1])
    assert int(h.mat[0]) == MAT_ALBEDO_SPHERE
    np.testing.assert_allclose(float(h.t[0]), 1.0, atol=1e-5)


def test_miss_goes_to_sky():
    h = _trace([0, 2, 8], [0, 1, 0])
    assert not bool(h.valid[0])


def test_gradient_sky_values():
    p = RenderParams(enable_env_map=0)
    up = sky(jnp.asarray([[0.0, 1.0, 0.0]]), p, None)
    np.testing.assert_allclose(np.asarray(up[0]),
                               np.array([0.6, 0.7, 0.9]) * 0.3, atol=1e-6)
    down = sky(jnp.asarray([[0.0, -1.0, 0.0]]), p, None)
    np.testing.assert_allclose(np.asarray(down[0]),
                               np.array([0.1, 0.15, 0.3]) * 0.3, atol=1e-6)
