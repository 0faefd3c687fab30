"""Lighting-term unit tests against closed-form expectations
(reference: shaders/rt/rt_lighting.glsl)."""

import numpy as np
import jax.numpy as jnp

from opengl_raytracing_tpu import RenderParams
from opengl_raytracing_tpu.constants import PI
from opengl_raytracing_tpu.ops.scene import SceneCtx
from opengl_raytracing_tpu.ops.scene_analytic import Hit
from opengl_raytracing_tpu.ops.materials import get_material
from opengl_raytracing_tpu.ops import lighting as lt


def make_scene(**kw):
    params = RenderParams(enable_env_map=0, **kw)
    return SceneCtx.create(params, jnp.asarray([0.0, 2.0, 8.0]))


def floor_hit(x=0.0, z=0.0):
    p = jnp.asarray([[x, 0.0, z]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    return Hit(jnp.asarray([5.0]), p, n, jnp.asarray([0], jnp.int32))


def test_lambert_phong_values():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    v = jnp.asarray([[0.0, 1.0, 0.0]])
    l = jnp.asarray([[0.0, 1.0, 0.0]])
    li = jnp.ones((1, 3))
    albedo = jnp.full((1, 3), 0.5)
    out = np.asarray(lt.shade_lambert_phong(
        n, v, l, li, albedo, jnp.asarray([0.2]), jnp.asarray([16.0])))
    # diffuse 0.5/pi + spec 0.2*1^16
    np.testing.assert_allclose(out[0], 0.5 / PI + 0.2, rtol=1e-5)


def test_lambert_phong_backface_zero():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    l = jnp.asarray([[0.0, -1.0, 0.0]])
    out = np.asarray(lt.shade_lambert_phong(
        n, n, l, jnp.ones((1, 3)), jnp.ones((1, 3)),
        jnp.asarray([0.5]), jnp.asarray([8.0])))
    assert (out == 0).all()


def test_sky_direct_cosine_dome():
    scene = make_scene()
    h = floor_hit()
    mat = get_material(h.mat, scene.params)
    out = np.asarray(lt.sky_direct(scene, h, mat))
    # floor albedo 0.7, up-facing normal, sky up (yaw 0, pitch 90) = +y
    want = 0.7 * (1.0 / PI) * np.asarray(scene.params.sky_color) \
        * float(np.asarray(scene.params.sky_intensity))
    np.testing.assert_allclose(out[0], want, rtol=1e-4)


def test_sky_direct_disabled():
    scene = make_scene(sky_enabled=0)
    h = floor_hit()
    mat = get_material(h.mat, scene.params)
    assert np.asarray(lt.sky_direct(scene, h, mat)).sum() == 0.0


def test_point_light_inverse_square():
    # unoccluded point straight above a floor point far from the spheres
    scene = make_scene(point_light_pos=(30.0, 2.0, 30.0))
    h = floor_hit(30.0, 30.0)
    mat = get_material(h.mat, scene.params)
    out = np.asarray(lt.point_direct(scene, h, mat, jnp.asarray([[0., 1., 0.]])))
    dist2 = 4.0
    li = np.asarray(scene.params.point_light_color) * 20.0 / dist2
    want = (0.7 * (1.0 / PI) + 0.1 * 1.0) * li  # ndl=1, phong ndh=1
    np.testing.assert_allclose(out[0], want, rtol=1e-4)


def test_sun_blocked_by_sphere():
    # point under the albedo sphere: sun ray toward the sky must be blocked
    # when it passes through the sphere.  Use a sun directly overhead.
    scene = make_scene(sun_yaw=0.0, sun_pitch=-90.0)  # dir = (0,-1,0), L=+y
    h = floor_hit(-1.2, -3.5)  # directly under sphere center (r=1 at y=1)
    mat = get_material(h.mat, scene.params)
    out = np.asarray(lt.sun_direct(scene, h, mat, jnp.asarray([[0., 1., 0.]])))
    assert out.sum() == 0.0
    # far away: not blocked
    h2 = floor_hit(50.0, 50.0)
    out2 = np.asarray(lt.sun_direct(scene, h2, mat,
                                    jnp.asarray([[0., 1., 0.]])))
    assert out2.sum() > 0.0


def test_ao_open_vs_blocked():
    scene = make_scene()
    px = jnp.asarray([100.5])
    py = jnp.asarray([100.5])
    # open floor far from everything -> ao == 1
    h = floor_hit(200.0, 200.0)
    ao = float(np.asarray(lt.compute_ao(scene, h, jnp.asarray(0), px, py))[0])
    assert ao > 0.99
    # next to the sphere contact point (surface ~0.12 away) -> darker
    h2 = floor_hit(-1.7, -3.5)
    ao2 = float(np.asarray(lt.compute_ao(scene, h2, jnp.asarray(0),
                                         px, py))[0])
    assert ao2 < ao
    assert ao2 >= float(np.asarray(scene.params.ao_min)) - 1e-6


def test_gi_nonnegative_and_bounded():
    scene = make_scene()
    h = floor_hit(0.5, -2.0)
    px = jnp.asarray([10.5])
    py = jnp.asarray([20.5])
    gi = np.asarray(lt.one_bounce_gi_analytic(scene, h, jnp.asarray(3),
                                              jnp.asarray(7), jnp.asarray(3),
                                              px, py))
    assert (gi >= 0).all() and np.isfinite(gi).all()


def test_glass_fresnel_limits():
    scene = make_scene()
    # grazing view: fresnel -> 1 -> reflection dominates; head-on -> F0 small
    p = jnp.asarray([[0.7, 1.0, -4.0]])  # front of glass sphere
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    h = Hit(jnp.asarray([5.0]), p, n, jnp.asarray([2], jnp.int32))
    mat = get_material(h.mat, scene.params)
    px = jnp.asarray([5.5])
    py = jnp.asarray([6.5])
    head_on = np.asarray(lt.shade_glass(scene, h, jnp.asarray([[0., 0., 1.]]),
                                        mat, jnp.asarray(0), jnp.asarray(0),
                                        px, py))
    assert np.isfinite(head_on).all()


def test_mirror_tint_applied():
    scene = make_scene(mat_mirror_color=(1.0, 0.0, 0.0))
    p = jnp.asarray([[1.2, 0.7, -1.8]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    h = Hit(jnp.asarray([4.0]), p, n, jnp.asarray([3], jnp.int32))
    mat = get_material(h.mat, scene.params)
    out = np.asarray(lt.shade_mirror(scene, h, jnp.asarray([[0., 0., 1.]]),
                                     mat, jnp.asarray(0), jnp.asarray(0),
                                     jnp.asarray([1.5]), jnp.asarray([2.5])))
    assert out[0, 1] == 0.0 and out[0, 2] == 0.0  # pure red tint
