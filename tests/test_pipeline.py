"""End-to-end frame function smoke + temporal behavior."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from opengl_raytracing_tpu import Camera, RenderParams
from opengl_raytracing_tpu.models import (FrameInputs, RenderState,
                                          render_frame, preset)
from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
from opengl_raytracing_tpu.ops.scene import prepare_bvh
from opengl_raytracing_tpu.scene.geometry import model_transform

H, W = 48, 64


def make_inputs(cam=None, jitter=(0.0, 0.0), moved=0):
    cam = cam or Camera()
    cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    return FrameInputs(
        cam_pos=jnp.asarray(cam.position), cam_right=jnp.asarray(right),
        cam_up=jnp.asarray(up), cam_fwd=jnp.asarray(fwd),
        tan_half_fov=jnp.float32(thf), aspect=jnp.float32(cam.aspect),
        jitter=jnp.asarray(jitter, jnp.float32),
        curr_view_proj=jnp.asarray(vp), prev_view_proj=jnp.asarray(vp),
        camera_moved=jnp.int32(moved))


def test_analytic_frame_finite_and_shaped():
    params = preset("full")
    state = RenderState.create(H, W)
    st, out = render_frame(params, make_inputs(), state,
                           height=H, width=W)
    img = np.asarray(out.image)
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()
    assert int(st.frame_index) == 1
    # scene has visible variation (floor vs sky vs spheres)
    assert img.std() > 0.02


def test_accumulation_converges_when_still():
    params = preset("realistic")
    state = RenderState.create(H, W)
    fin = make_inputs()
    imgs = []
    for _ in range(4):
        state, out = render_frame(params, fin, state, height=H, width=W)
        imgs.append(np.asarray(out.image))
    # frame-to-frame delta should shrink as history accumulates
    d01 = np.abs(imgs[1] - imgs[0]).mean()
    d23 = np.abs(imgs[3] - imgs[2]).mean()
    assert d23 <= d01 + 1e-4


def test_baseline_preset_deterministic():
    params = preset("baseline")
    state = RenderState.create(H, W)
    _, o1 = render_frame(params, make_inputs(), state, height=H, width=W)
    _, o2 = render_frame(params, make_inputs(), state, height=H, width=W)
    np.testing.assert_array_equal(np.asarray(o1.image), np.asarray(o2.image))


def test_bvh_frame_smoke():
    mesh = make_bunny(2)
    tris = gather_triangles(mesh, model_transform((-2, 1.5, 0), 0.5))
    arrs = prepare_bvh(tris)
    params = preset("baseline").replace(enable_gi=0, enable_ao=0)
    state = RenderState.create(H, W)
    st, out = render_frame(params, make_inputs(), state, bvh=arrs,
                           height=H, width=W, use_bvh=True)
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    # mesh sits left of center at (-2,1.5,0) scaled 0.5; *some* pixels hit
    assert np.asarray(out.gnrm).any()


@pytest.mark.slow
def test_bvh_tile_gate_bit_identical(monkeypatch):
    """ORT_BVH_GATE_FRAC compacts hit-tile shading (direct light + GI +
    AO wavefronts) the way the analytic gate compacts glass/mirror; the
    frame must match the dense form in the compact branch, the count>K
    dense fallback, AND with an SPP batch axis (the hoisted-AO path).

    Tolerance as test_analytic_tile_gate_bit_identical but wider: the
    lax.cond branches fuse separately, a handful of lanes flip last-bit
    roundings, and the SVGF 7x7 filter mixes a flipped lane into its
    neighbors (observed 2/9216 lanes at 3.6e-7)."""
    mesh = make_bunny(2)
    tris = gather_triangles(mesh, model_transform((-2, 1.5, 0), 0.5))
    arrs = prepare_bvh(tris)
    fin = make_inputs()

    def frame(frac, spp=1):
        monkeypatch.setenv("ORT_BVH_GATE_FRAC", str(frac))
        params = preset("full").replace(spp_per_frame=spp)
        state = RenderState.create(H, W)
        _, out = render_frame(params, fin, state, bvh=arrs,
                              height=H, width=W, use_bvh=True)
        return np.asarray(out.image)

    dense = frame(0)
    gated = frame(0.6)
    tiny = frame(1e-6)  # K=1 < occupied tiles -> runtime dense fallback
    np.testing.assert_allclose(gated, dense, rtol=0, atol=6e-7)
    np.testing.assert_allclose(tiny, dense, rtol=0, atol=6e-7)

    dense2 = frame(0, spp=2)
    gated2 = frame(0.6, spp=2)
    np.testing.assert_allclose(gated2, dense2, rtol=0, atol=6e-7)


def test_motion_debug_mode():
    params = preset("full")
    state = RenderState.create(H, W)
    _, out = render_frame(params, make_inputs(moved=1), state,
                          height=H, width=W, show_motion=True)
    img = np.asarray(out.image)
    assert np.isfinite(img).all()


def test_spp_loop_changes_noise():
    p1 = preset("realistic").replace(spp_per_frame=1, enable_taa=0)
    p4 = preset("realistic").replace(spp_per_frame=4, enable_taa=0)
    state = RenderState.create(H, W)
    _, o1 = render_frame(p1, make_inputs(), state, height=H, width=W)
    _, o4 = render_frame(p4, make_inputs(), state, height=H, width=W)
    a, b = np.asarray(o1.image), np.asarray(o4.image)
    assert not np.array_equal(a, b)
    assert abs(a.mean() - b.mean()) < 0.05  # same exposure scale


def test_compact_masked_eval_edges():
    # archived experiment (PERF.md negative result); kept runnable for
    # full-HBM hardware where the tradeoff may flip
    from opengl_raytracing_tpu.experiments.compaction import (
        compact_masked_eval as _compact_masked_eval)
    shape = (8, 16)
    rad = jnp.zeros(shape + (3,))
    lanes = {"v": jnp.arange(128, dtype=jnp.float32)}

    def fn(sub):
        v = sub["v"]  # [b//128, 128]
        return jnp.stack([v, v, v], axis=-1)

    # zero-count: radiance unchanged
    out = _compact_masked_eval(fn, jnp.zeros(shape, bool), rad, lanes)
    assert float(jnp.sum(out)) == 0.0
    # full-count: every lane replaced with its own index
    out = _compact_masked_eval(fn, jnp.ones(shape, bool), rad, lanes)
    np.testing.assert_allclose(np.asarray(out[..., 0]).reshape(-1),
                               np.arange(128, dtype=np.float32))
    # sparse pattern
    mask = (jnp.arange(128) % 17 == 0).reshape(shape)
    out = _compact_masked_eval(fn, mask, rad, lanes)
    want = np.where(np.arange(128) % 17 == 0,
                    np.arange(128, dtype=np.float32), 0.0)
    np.testing.assert_allclose(np.asarray(out[..., 0]).reshape(-1), want)


def test_compact_masked_eval_tiny_non_lane_multiple():
    """A 10x10 debug image (100 lanes, not a 128 multiple) must work:
    the batch rounds UP to a lane-tile multiple and clamped gathers /
    dropped scatters handle the tail (regression)."""
    from opengl_raytracing_tpu.experiments.compaction import (
        compact_masked_eval as _compact_masked_eval)
    shape = (10, 10)
    rad = jnp.zeros(shape + (3,))
    lanes = {"v": jnp.arange(100, dtype=jnp.float32)}

    def fn(sub):
        v = sub["v"]
        return jnp.stack([v + 1.0, v, v], axis=-1)

    mask = (jnp.arange(100) % 7 == 0).reshape(shape)
    out = _compact_masked_eval(fn, mask, rad, lanes)
    want = np.where(np.arange(100) % 7 == 0,
                    np.arange(100, dtype=np.float32) + 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(out[..., 0]).reshape(-1), want)


def test_analytic_tile_gate_bit_identical(monkeypatch):
    """ORT_ANALYTIC_GATE_FRAC compacts glass/mirror shading to occupied
    tiles; the frame must match the dense form, in both the compact
    branch (ample capacity) and the count>K dense fallback (frac so
    small the cond rejects the gate).

    Tolerance: per-lane math is identical, but XLA fuses the gathered-
    input graph differently and flips last-bit roundings on a handful of
    glass/mirror lanes (observed 17/9216 pixels at 1 ulp; same compiler-
    numerics effect documented for shard_map, commit 144daef).  Both
    gate branches live inside a lax.cond, which XLA compiles as a
    separate computation with its own fusion decisions — so even the
    dense fallback shows the same handful of 1-ulp flips.  Allow 2
    ulps on both."""
    params = preset("full")  # glass + mirror + GI + AO on
    fin = make_inputs()

    def frame(frac):
        # "0" pins the dense form explicitly (the production default is
        # now 0.15, measured r3b — delenv would no longer mean dense)
        monkeypatch.setenv("ORT_ANALYTIC_GATE_FRAC", str(frac))
        state = RenderState.create(H, W)
        _, out = render_frame(params, fin, state, height=H, width=W)
        return np.asarray(out.image)

    dense = frame(0)
    gated = frame(0.5)
    tiny = frame(1e-6)  # K=1 < occupied tiles -> runtime dense fallback
    np.testing.assert_allclose(gated, dense, rtol=0, atol=2.4e-7)
    np.testing.assert_allclose(tiny, dense, rtol=0, atol=2.4e-7)


@pytest.mark.slow
def test_analytic_hit_gate_matches_dense(monkeypatch):
    """ORT_AN_HIT_GATE compacts the WHOLE analytic shade (direct + GI +
    AO + the nested glass/mirror gates) to tiles containing a primary
    hit; sky-tile garbage is discarded by the sky select.  Must match
    the dense form in the compact branch, the count>K fallback, and at
    spp>1.

    Tolerance: per-lane math is identical, but the flattened stream
    changes array SHAPES, and XLA's transcendental lowering (pow in the
    phong term) takes shape-dependent SIMD paths — measured in EAGER
    mode (no fusion involved): 6/9216 lanes differ, max 8.6e-6 on a
    5.9-magnitude radiance lane = ~1.4e-6 relative (a few ulps through
    pow amplification), q99 6e-8.  Same compiler-numerics class as the
    glass-gate flips documented above, so: q99 at the 2-ulp bound and
    max at 1e-5 absolute post-tonemap."""
    params = preset("full")
    fin = make_inputs()

    def frame(frac, spp=1):
        monkeypatch.setenv("ORT_AN_HIT_GATE", str(frac))
        state = RenderState.create(H, W)
        _, out = render_frame(params, fin, state, height=H, width=W,
                              use_bvh=False)
        return np.asarray(out.image)

    def frame_spp(frac):
        monkeypatch.setenv("ORT_AN_HIT_GATE", str(frac))
        state = RenderState.create(H, W)
        p2 = params.replace(spp_per_frame=2)
        _, out = render_frame(p2, fin, state, height=H, width=W,
                              use_bvh=False)
        return np.asarray(out.image)

    def close(a, b):
        diff = np.abs(a - b)
        assert np.quantile(diff, 0.99) < 2.4e-7, np.quantile(diff, 0.99)
        assert diff.max() < 1e-5, diff.max()

    dense = frame(0)
    gated = frame(0.9)
    tiny = frame(1e-6)  # K=1 < occupied tiles -> runtime dense fallback
    close(gated, dense)
    close(tiny, dense)

    dense2 = frame_spp(0)
    gated2 = frame_spp(0.9)
    close(gated2, dense2)


def test_frame_jit_options_plumbing(monkeypatch):
    """ORT_SCOPED_VMEM_KIB reaches jax.jit as compiler_options on TPU
    and stays empty elsewhere (the realistic-preset scoped-vmem fix,
    PERF.md r3j; the flag must ride the compile request because env
    XLA_FLAGS may not reach the remote axon compiler)."""
    import jax
    from opengl_raytracing_tpu.models.pipeline import frame_jit_options

    # CPU backend (the test env): always empty, whatever the env says
    monkeypatch.setenv("ORT_SCOPED_VMEM_KIB", "12345")
    assert frame_jit_options() == {}

    # TPU backend: default budget applies, env overrides, empty disables
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert frame_jit_options() == {
        "compiler_options": {"xla_tpu_scoped_vmem_limit_kib": "12345"}}
    monkeypatch.delenv("ORT_SCOPED_VMEM_KIB")
    assert frame_jit_options() == {
        "compiler_options": {"xla_tpu_scoped_vmem_limit_kib": "49152"}}
    monkeypatch.setenv("ORT_SCOPED_VMEM_KIB", "")
    assert frame_jit_options() == {}


def test_an_light_batch_matches_sequential(monkeypatch):
    """ORT_AN_LIGHT_BATCH=0 (sequential direct_light calls) and the
    default batched form must agree — identical per-lane math, same
    shape-dependent transcendental-ulp class as the hit gate."""
    import opengl_raytracing_tpu.ops.lighting as lt
    params = preset("full")
    fin = make_inputs()

    def frame(batch):
        monkeypatch.setattr(lt, "AN_LIGHT_BATCH", batch)
        state = RenderState.create(H, W)
        _, out = render_frame(params, fin, state, height=H, width=W,
                              use_bvh=False)
        return np.asarray(out.image)

    a = frame(True)
    b = frame(False)
    diff = np.abs(a - b)
    assert np.quantile(diff, 0.99) < 2.4e-7, np.quantile(diff, 0.99)
    assert diff.max() < 1e-5, diff.max()


def _rand_env(seed=3, f=8):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        rng.randint(0, 256, (6, f, f, 3)).astype(np.float32) / 255.0)


def test_sky_miss_gate_matches_dense(monkeypatch):
    """ORT_SKY_MISS_GATE fetches the miss-lane environment only on
    miss tiles; the frame must match the dense fetch (hit lanes never
    read sky_radiance).  Same fusion-ulp tolerance class as the other
    tile gates."""
    params = preset("full").replace(enable_env_map=1)
    fin = make_inputs()
    env = _rand_env()

    def frame(frac):
        monkeypatch.setenv("ORT_SKY_MISS_GATE", str(frac))
        state = RenderState.create(H, W)
        _, out = render_frame(params, fin, state, env_map=env,
                              height=H, width=W)
        return np.asarray(out.image)

    dense = frame(0)
    gated = frame(0.9)
    tiny = frame(1e-6)  # count > K -> runtime dense fallback
    for got in (gated, tiny):
        diff = np.abs(got - dense)
        assert np.quantile(diff, 0.99) < 2.4e-7, np.quantile(diff, 0.99)
        assert diff.max() < 1e-5, diff.max()


def test_an_skyr_gate_matches_dense(monkeypatch):
    """ORT_AN_SKYR_GATE fetches the megakernel's env reflection only on
    mirror/glass tiles (the only consumers of sky_r)."""
    monkeypatch.setenv("ORT_FORCE_MXU", "1")  # megakernel via interpret
    params = preset("baseline").replace(enable_env_map=1)
    fin = make_inputs()
    env = _rand_env(5)

    def frame(frac):
        monkeypatch.setenv("ORT_AN_SKYR_GATE", str(frac))
        state = RenderState.create(H, W)
        _, out = render_frame(params, fin, state, env_map=env,
                              height=H, width=W)
        return np.asarray(out.image)

    dense = frame(0)
    gated = frame(0.5)
    diff = np.abs(gated - dense)
    assert np.quantile(diff, 0.99) < 2.4e-7, np.quantile(diff, 0.99)
    assert diff.max() < 1e-5, diff.max()


def test_spp_shadow_dedup_bit_identical(monkeypatch):
    """ORT_SPP_SHADOW_DEDUP collapses the duplicate sun/point shadow
    rays of an SPP batch (samples share the hoisted primary hit, so
    those rays are identical) and broadcasts sample 0's occlusion —
    must be bit-identical to tracing every duplicate."""
    mesh = make_bunny(2)
    tris = gather_triangles(mesh, model_transform((-2, 1.5, 0), 0.5))
    arrs = prepare_bvh(tris)
    fin = make_inputs()

    def frame(dedup, mxu="0"):
        monkeypatch.setenv("ORT_SPP_SHADOW_DEDUP", dedup)
        monkeypatch.setenv("ORT_FORCE_MXU", mxu)
        params = preset("heavy").replace(spp_per_frame=3)
        state = RenderState.create(H, W)
        _, out = render_frame(params, fin, state, bvh=arrs,
                              height=H, width=W, use_bvh=True)
        return np.asarray(out.image)

    np.testing.assert_array_equal(frame("1"), frame("0"))
    # the production TPU path: dead-lane (collapsed-window) handling in
    # the any-hit kernel wavefront (interpret mode off-TPU)
    np.testing.assert_array_equal(frame("1", mxu="1"), frame("0", mxu="1"))


def test_ndl_shadow_gate_bit_identical(monkeypatch):
    """ORT_NDL_SHADOW_GATE collapses shadow windows the reference never
    consumes (backfacing ndl<=0 / light-backside cosThetaL<=0 — the
    GLSL returns before the trace or multiplies by geom==0); output
    must be bit-identical on the jnp and MXU kernel paths."""
    mesh = make_bunny(2)
    tris = gather_triangles(mesh, model_transform((-2, 1.5, 0), 0.5))
    arrs = prepare_bvh(tris)
    fin = make_inputs()

    def frame(gate, mxu="0"):
        monkeypatch.setenv("ORT_NDL_SHADOW_GATE", gate)
        monkeypatch.setenv("ORT_FORCE_MXU", mxu)
        params = preset("realistic")
        state = RenderState.create(H, W)
        _, out = render_frame(params, fin, state, bvh=arrs,
                              height=H, width=W, use_bvh=True)
        return np.asarray(out.image)

    np.testing.assert_array_equal(frame("1"), frame("0"))
    np.testing.assert_array_equal(frame("1", mxu="1"), frame("0", mxu="1"))
