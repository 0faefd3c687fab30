"""Explicit-collective renderer vs single-device reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from opengl_raytracing_tpu.models import RenderState, render_frame, preset
from opengl_raytracing_tpu.parallel import make_mesh, shard_image_rows
from opengl_raytracing_tpu.parallel.shardmap import make_shardmap_render_fn
from tests.test_pipeline import make_inputs

H, W = 32, 64

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _slim(params):
    """Trim the compile surface (CPU shard_map compiles of the full preset
    take tens of minutes); keep TAA+SVGF which are the collective paths."""
    return params.replace(enable_gi=0, enable_ao=0, mat_glass_enabled=0,
                          mat_mirror_enabled=0)


# Tolerance provenance: band-vs-full trace_and_shade is bit-exact OUTSIDE
# shard_map (verified directly), but XLA lowers the same math differently
# INSIDE the shard_map body (fusion/FMA contraction), and an ulp-level
# shift can flip a discrete visibility test on isolated pixels (measured:
# ~5 px with one 0.02 outlier at a shadow edge on a 32x64 baseline
# frame).  Hence q99 ~1e-3 with a 2e-2 max, not array_equal.
def _run_pair(params, frames=3, moved=0):
    params = _slim(params)
    fin = make_inputs(moved=moved)
    mesh = make_mesh(jax.devices()[:8])

    st_a = RenderState.create(H, W)
    st_b = shard_image_rows(mesh, RenderState.create(H, W))
    fn = make_shardmap_render_fn(mesh, H, W, donate=False)
    out_a = out_b = lum = None
    for _ in range(frames):
        st_a, out_a = render_frame(params, fin, st_a, height=H, width=W)
        st_b, out_b, lum = fn(params, fin, st_b, None, None)
    return out_a, out_b, lum


def test_shardmap_matches_single_device_full_preset():
    out_a, out_b, lum = _run_pair(preset("full"))
    diff = np.abs(np.asarray(out_a.image) - np.asarray(out_b.image))
    assert np.quantile(diff, 0.99) < 1e-3 and diff.max() < 2e-2
    # psum'd mean luminance agrees with a host-side reduction
    host_lum = float(np.asarray(out_b.image @ np.asarray(
        [0.299, 0.587, 0.114], np.float32)).mean())
    assert abs(float(lum) - host_lum) < 1e-4


def test_shardmap_taa_reprojection_with_motion():
    """Camera-moved path exercises the all-gathered history reads."""
    params = preset("realistic")
    out_a, out_b, _ = _run_pair(params, frames=3, moved=1)
    diff = np.abs(np.asarray(out_a.image) - np.asarray(out_b.image))
    assert np.quantile(diff, 0.99) < 2e-3 and diff.max() < 5e-2


def test_shardmap_svgf_seams_match():
    """The halo exchange must make shard seams identical to unsharded."""
    params = preset("full").replace(enable_svgf=1, svgf_strength=1.0)
    out_a, out_b, _ = _run_pair(params, frames=2)
    a = np.asarray(out_a.image)
    b = np.asarray(out_b.image)
    # check the rows around each shard boundary specifically
    bh = H // 8
    for k in range(1, 8):
        seam = slice(k * bh - 2, k * bh + 2)
        diff = np.abs(a[seam] - b[seam])
        assert diff.max() < 2e-2, f"seam {k} max diff {diff.max()}"


def test_shardmap_bvh_mxu_forced(monkeypatch):
    """MXU Pallas kernels (interpret mode) under shard_map — the exact
    production configuration (multi-chip x MXU), never otherwise reached
    off-TPU because SceneCtx.trace dispatches on the backend.  Compares
    against the single-device MXU render (same forced path)."""
    monkeypatch.setenv("ORT_FORCE_MXU", "1")
    params = _slim(preset("baseline"))
    fin = make_inputs()
    mesh = make_mesh(jax.devices()[:8])
    from opengl_raytracing_tpu.scene import make_icosphere
    from opengl_raytracing_tpu.scene.geometry import (gather_triangles,
                                                      model_transform)
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    tris = gather_triangles(make_icosphere(1.0, 1),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    bvh = prepare_bvh(tris)
    st = shard_image_rows(mesh, RenderState.create(H, W))
    # check_vma=False: Pallas interpret mode's internal dynamic_slice
    # trips the vma checker (see shardmap.py) — compiled TPU is unaffected
    fn = make_shardmap_render_fn(mesh, H, W, use_bvh=True, donate=False,
                                 check_vma=False)
    st, out, _ = fn(params, fin, st, None, bvh)
    img = np.asarray(out.image)
    assert img.shape == (H, W, 3) and np.isfinite(img).all()
    st1 = RenderState.create(H, W)
    _, ref = render_frame(params, fin, st1, None, bvh, height=H, width=W,
                          use_bvh=True)
    diff = np.abs(img - np.asarray(ref.image))
    assert diff.max() < 2e-2 and np.quantile(diff, 0.99) < 1e-3


@pytest.mark.slow
def test_shardmap_shade_megakernels_forced(monkeypatch):
    """The r3 shading megakernels (analytic direct_light + BVH BRDF
    tail) under shard_map — multi-chip x Pallas, exercised before they
    ever meet hardware (same rationale as the MXU-forced test)."""
    import opengl_raytracing_tpu.ops.an_pallas as anp
    monkeypatch.setenv("ORT_FORCE_MXU", "1")
    monkeypatch.setattr(anp, "AN_PALLAS", True)
    monkeypatch.setattr(anp, "BVH_BRDF_PALLAS", True)
    fin = make_inputs()
    mesh = make_mesh(jax.devices()[:8])

    # analytic frame (direct_light megakernel)
    params = _slim(preset("baseline"))
    st = shard_image_rows(mesh, RenderState.create(H, W))
    fn = make_shardmap_render_fn(mesh, H, W, use_bvh=False, donate=False,
                                 check_vma=False)
    st, out, _ = fn(params, fin, st, None, None)
    img = np.asarray(out.image)
    assert img.shape == (H, W, 3) and np.isfinite(img).all()
    st1 = RenderState.create(H, W)
    _, ref = render_frame(params, fin, st1, None, None, height=H, width=W,
                          use_bvh=False)
    diff = np.abs(img - np.asarray(ref.image))
    assert diff.max() < 2e-2 and np.quantile(diff, 0.99) < 1e-3

    # BVH frame (BRDF-tail megakernel downstream of the any-hit kernel)
    from opengl_raytracing_tpu.scene import make_icosphere
    from opengl_raytracing_tpu.scene.geometry import (gather_triangles,
                                                      model_transform)
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    tris = gather_triangles(make_icosphere(1.0, 1),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    bvh = prepare_bvh(tris)
    st = shard_image_rows(mesh, RenderState.create(H, W))
    fnb = make_shardmap_render_fn(mesh, H, W, use_bvh=True, donate=False,
                                  check_vma=False)
    st, outb, _ = fnb(params, fin, st, None, bvh)
    imgb = np.asarray(outb.image)
    assert imgb.shape == (H, W, 3) and np.isfinite(imgb).all()
    st1 = RenderState.create(H, W)
    _, refb = render_frame(params, fin, st1, None, bvh, height=H, width=W,
                           use_bvh=True)
    diffb = np.abs(imgb - np.asarray(refb.image))
    assert diffb.max() < 2e-2 and np.quantile(diffb, 0.99) < 1e-3


def test_shardmap_bvh_scene_runs():
    """shard_map + BVH walker: the while_loop carries must be
    shard-variance-correct (regression — constant inits tripped the
    vma type check, caught by dryrun_multichip phase 2)."""
    params = _slim(preset("baseline"))
    fin = make_inputs()
    mesh = make_mesh(jax.devices()[:8])
    from opengl_raytracing_tpu.scene import build_bvh, make_icosphere
    from opengl_raytracing_tpu.scene.geometry import (gather_triangles,
                                                      model_transform)
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    tris = gather_triangles(make_icosphere(1.0, 1),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    bvh = prepare_bvh(tris)
    st = shard_image_rows(mesh, RenderState.create(H, W))
    fn = make_shardmap_render_fn(mesh, H, W, use_bvh=True, donate=False)
    st, out, _ = fn(params, fin, st, None, bvh)
    img = np.asarray(out.image)
    assert img.shape == (H, W, 3) and np.isfinite(img).all()
    # single-device reference
    st1 = RenderState.create(H, W)
    _, ref = render_frame(params, fin, st1, None, bvh, height=H, width=W,
                          use_bvh=True)
    diff = np.abs(img - np.asarray(ref.image))
    assert diff.max() < 2e-2 and np.quantile(diff, 0.99) < 1e-3


def test_shardmap_accum_planes_matches(monkeypatch):
    """ORT_ACCUM_PLANES=1 ([4,H,W] boundary accum, the TPU HBM-tiling-
    friendly layout) must be an exact relayout: same images as the
    default [H,W,4] run, shard_map and single-device alike."""
    params = _slim(preset("full"))
    fin = make_inputs(moved=1)

    st = RenderState.create(H, W)
    outs = []
    for _ in range(3):
        st, out = render_frame(params, fin, st, height=H, width=W)
        outs.append(np.asarray(out.image))

    monkeypatch.setenv("ORT_ACCUM_PLANES", "1")
    st_p = RenderState.create(H, W)
    assert st_p.accum.shape == (4, H, W)
    for i in range(3):
        st_p, out_p = render_frame(params, fin, st_p, height=H, width=W)
        np.testing.assert_array_equal(np.asarray(out_p.image), outs[i])

    mesh = make_mesh(jax.devices()[:8])
    st_s = shard_image_rows(mesh, RenderState.create(H, W))
    fn = make_shardmap_render_fn(mesh, H, W, donate=False)
    for i in range(3):
        st_s, out_s, _ = fn(params, fin, st_s, None, None)
    diff = np.abs(np.asarray(out_s.image) - outs[-1])
    assert np.quantile(diff, 0.99) < 1e-3 and diff.max() < 2e-2


def test_shardmap_bvh_walk_knobs_forced(monkeypatch):
    """The r4 walk kernels (ORT_GROUP_SORT sorted-group walk +
    ORT_SHADOW_PACK lane-packed shadow wavefronts) under shard_map —
    their extra kernel inputs (sortpos/sufnext rows, packed planes)
    must carry the sharded-axis vma like every other per-ray input."""
    monkeypatch.setenv("ORT_FORCE_MXU", "1")
    from opengl_raytracing_tpu.ops import bvh_mxu as bm
    monkeypatch.setattr(bm, "GROUP_SORT", True)
    monkeypatch.setattr(bm, "SHADOW_PACK", True)
    params = _slim(preset("baseline"))
    fin = make_inputs()
    mesh = make_mesh(jax.devices()[:8])
    from opengl_raytracing_tpu.scene import make_icosphere
    from opengl_raytracing_tpu.scene.geometry import (gather_triangles,
                                                      model_transform)
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    tris = gather_triangles(make_icosphere(1.0, 1),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    bvh = prepare_bvh(tris)
    st = shard_image_rows(mesh, RenderState.create(H, W))
    fn = make_shardmap_render_fn(mesh, H, W, use_bvh=True, donate=False,
                                 check_vma=False)
    st, out, _ = fn(params, fin, st, None, bvh)
    img = np.asarray(out.image)
    assert img.shape == (H, W, 3) and np.isfinite(img).all()
    st1 = RenderState.create(H, W)
    _, ref = render_frame(params, fin, st1, None, bvh, height=H, width=W,
                          use_bvh=True)
    diff = np.abs(img - np.asarray(ref.image))
    assert diff.max() < 2e-2 and np.quantile(diff, 0.99) < 1e-3


@pytest.mark.slow
def test_shardmap_full_materials_unslimmed():
    """The FULL material surface (glass+mirror+GI+AO) through the
    collectives path.  Every other case _slim()s these away to keep CPU
    shard_map compiles tractable; this one slow case covers the glass
    tree + GI/AO wavefronts under the 8-device mesh so the pytest-side
    collectives path exercises what the dryrun covers on the virtual
    mesh (VERDICT r4 weak #6)."""
    params = preset("full")  # deliberately NOT slimmed
    fin = make_inputs()
    mesh = make_mesh(jax.devices()[:8])
    st_a = RenderState.create(H, W)
    st_b = shard_image_rows(mesh, RenderState.create(H, W))
    fn = make_shardmap_render_fn(mesh, H, W, donate=False)
    out_a = out_b = None
    for _ in range(2):
        st_a, out_a = render_frame(params, fin, st_a, height=H, width=W)
        st_b, out_b, _ = fn(params, fin, st_b, None, None)
    diff = np.abs(np.asarray(out_a.image) - np.asarray(out_b.image))
    assert np.quantile(diff, 0.99) < 2e-3 and diff.max() < 5e-2
