"""The analytic direct-lighting megakernel must match the jnp path.

Interpret mode runs the kernel body as jnp ops, so differences here are
transcription bugs, not backend rounding (reference semantics:
rt_lighting.glsl:313-395 via the oracle-pinned jnp path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opengl_raytracing_tpu import Camera
from opengl_raytracing_tpu.models import FrameInputs, preset
from opengl_raytracing_tpu.models.pipeline import primary_rays, _sanitize_hit
from opengl_raytracing_tpu.ops.scene import SceneCtx
from opengl_raytracing_tpu.ops import lighting as lt
from opengl_raytracing_tpu.ops import an_pallas


H, W = 96, 128


def _frame(params, env=None):
    cam = Camera()
    cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))
    scene = SceneCtx.create(params, fin.cam_pos, env_map=env, use_bvh=False)
    px, py, rd = primary_rays(H, W, fin, params)
    ro = jnp.broadcast_to(fin.cam_pos, rd.shape)
    h = _sanitize_hit(scene.trace(ro, rd), ro, rd)
    return scene, h, -rd, px, py


@pytest.mark.parametrize("preset_name", ["baseline", "full"])
def test_direct_light_pallas_matches_jnp(preset_name, monkeypatch):
    params = preset(preset_name)
    scene, h, vdir, px, py = _frame(params)
    seed, fi = jnp.int32(3), jnp.int32(3)
    want = np.asarray(lt.direct_light(scene, h, seed, fi, vdir, px, py))
    got = np.asarray(an_pallas.direct_light_pallas(
        scene, h, seed, fi, vdir, px, py))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_direct_light_pallas_pow_exp_fallback(monkeypatch):
    """ORT_AN_POW=exp (the Mosaic escape hatch for jnp.power) must stay
    within BRDF tolerance of the pow form."""
    monkeypatch.setattr(an_pallas, "_POW_EXP", True)
    params = preset("baseline")
    scene, h, vdir, px, py = _frame(params)
    seed, fi = jnp.int32(5), jnp.int32(5)
    want = np.asarray(lt.direct_light(scene, h, seed, fi, vdir, px, py))
    got = np.asarray(an_pallas.direct_light_pallas(
        scene, h, seed, fi, vdir, px, py))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_direct_light_pallas_light_toggles():
    params = preset("full").replace(sun_enabled=0, point_light_enabled=0)
    scene, h, vdir, px, py = _frame(params)
    seed, fi = jnp.int32(7), jnp.int32(7)
    want = np.asarray(lt.direct_light(scene, h, seed, fi, vdir, px, py))
    got = np.asarray(an_pallas.direct_light_pallas(
        scene, h, seed, fi, vdir, px, py))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_bvh_brdf_pallas_matches_jnp(monkeypatch):
    """ORT_BVH_BRDF_PALLAS: the fused BRDF tail of direct_light_bvh must
    match the jnp path, occlusion bits included."""
    from opengl_raytracing_tpu.scene import (make_bunny, gather_triangles,
                                             build_bvh)
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.scene import prepare_bvh

    params = preset("full")
    cam = Camera()
    cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))
    tris = gather_triangles(make_bunny(2), model_transform((0, 1.0, -3.0),
                                                           1.0))
    bvh = prepare_bvh(tris)
    scene = SceneCtx.create(params, fin.cam_pos, use_bvh=True, bvh=bvh)
    px, py, rd = primary_rays(H, W, fin, params)
    ro = jnp.broadcast_to(fin.cam_pos, rd.shape)
    h = _sanitize_hit(scene.trace(ro, rd), ro, rd)
    act = scene.trace(ro, rd).valid
    seed, fi = jnp.int32(2), jnp.int32(2)

    # FORCE_MXU for BOTH sides so the occlusion inputs are identical
    # and only the BRDF path differs
    monkeypatch.setenv("ORT_FORCE_MXU", "1")
    want = np.asarray(lt.direct_light_bvh(scene, h, seed, fi, -rd,
                                          px, py, active=act))
    monkeypatch.setattr(an_pallas, "BVH_BRDF_PALLAS", True)
    got = np.asarray(lt.direct_light_bvh(scene, h, seed, fi, -rd,
                                         px, py, active=act))
    m = np.asarray(act)
    np.testing.assert_allclose(got[m], want[m], rtol=2e-5, atol=2e-6)
    assert m.any()


def test_direct_light_pallas_ragged_tail():
    """Non-tile-multiple pixel counts pad and slice correctly."""
    params = preset("baseline")
    scene, h, vdir, px, py = _frame(params)
    import jax
    sl = (slice(0, 13), slice(0, 97))
    h2 = jax.tree.map(lambda a: a[sl], h)
    want = np.asarray(lt.direct_light(scene, h2, jnp.int32(1), jnp.int32(1),
                                      vdir[sl], px[sl], py[sl]))
    got = np.asarray(an_pallas.direct_light_pallas(
        scene, h2, jnp.int32(1), jnp.int32(1), vdir[sl], px[sl], py[sl]))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
