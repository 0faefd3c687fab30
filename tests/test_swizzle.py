"""2D-tile swizzle: block-order tracing must be observationally exact.

The swizzle (models/pipeline.py) reorders the per-pixel stream into 8x16
pixel blocks so each 128-lane kernel tile gets a compact cull hull; the
per-ray math is order-independent, so outputs must be BIT-identical with
it on or off.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from opengl_raytracing_tpu import Camera
from opengl_raytracing_tpu.models import (FrameInputs, RenderState,
                                          render_frame, pipeline, presets)
from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
from opengl_raytracing_tpu.scene.geometry import model_transform
from opengl_raytracing_tpu.ops.scene import prepare_bvh
from opengl_raytracing_tpu.constants import (DEFAULT_BVH_TRANSLATE,
                                             DEFAULT_BVH_SCALE)

H, W = 48, 64


def test_swizzle_roundtrip():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    s = pipeline.swizzle(a, H, W)
    assert s.shape == (H * W, 3)
    back = pipeline.unswizzle(s, H, W)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))
    # consecutive 128 rays == one 8x16 pixel block
    blk = np.asarray(s[:128, 0]).reshape(8, 16)
    np.testing.assert_array_equal(blk, np.asarray(a[0:8, 0:16, 0]))


@pytest.mark.slow
def test_swizzled_frame_bit_identical(monkeypatch):
    tris = gather_triangles(make_bunny(2),
                            model_transform(DEFAULT_BVH_TRANSLATE,
                                            DEFAULT_BVH_SCALE))
    bvh = prepare_bvh(tris)
    params = presets.preset("full")
    cam = Camera()
    cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))

    def run():
        st = RenderState.create(H, W)
        st, out = render_frame(params, fin, st, None, bvh,
                               height=H, width=W, use_bvh=True)
        return out

    monkeypatch.setattr(pipeline, "_SWIZZLE", True)
    on = run()
    monkeypatch.setattr(pipeline, "_SWIZZLE", False)
    off = run()
    for k in ("image", "motion", "gpos", "gnrm"):
        np.testing.assert_array_equal(np.asarray(getattr(on, k)),
                                      np.asarray(getattr(off, k)))


@pytest.mark.slow
def test_swizzled_frame_nondivisible_grid(monkeypatch):
    """Non-tile-divisible grids (like the 135-row shard bands) swizzle
    via duplicated edge rays and must still be bit-identical.

    The BVH hit-shading gate is pinned OFF: it regroups which lanes
    share a kernel tile, and the chunk-walk's strict t<t_best tie rule
    (ops/bvh_mxu.py trace_bvh_mxu docstring) may then resolve mesh
    shared-edge hits to the other triangle — a 1-ulp shading wobble
    that is orthogonal to the duplicated-edge-ray mechanism under
    test."""
    monkeypatch.setenv("ORT_BVH_GATE_FRAC", "0")
    h, w = 45, 56  # 45 % 8 != 0, 56 % 16 != 0
    tris = gather_triangles(make_bunny(2),
                            model_transform(DEFAULT_BVH_TRANSLATE,
                                            DEFAULT_BVH_SCALE))
    bvh = prepare_bvh(tris)
    params = presets.preset("realistic")
    cam = Camera()
    cam.aspect = w / h
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))

    def run():
        st = RenderState.create(h, w)
        st, out = render_frame(params, fin, st, None, bvh,
                               height=h, width=w, use_bvh=True)
        return out

    monkeypatch.setattr(pipeline, "_SWIZZLE", True)
    on = run()
    assert on.image.shape == (h, w, 3)
    monkeypatch.setattr(pipeline, "_SWIZZLE", False)
    off = run()
    for k in ("image", "motion", "gpos", "gnrm"):
        np.testing.assert_array_equal(np.asarray(getattr(on, k)),
                                      np.asarray(getattr(off, k)))


def test_swizzled_pixel_centers_bit_identical():
    """Direct block-order generation must equal pad+swizzle of the
    [H,W] grids exactly, including edge-duplicate padding and row
    offsets (the production raygen fast path)."""
    import numpy as np
    import jax.numpy as jnp
    from opengl_raytracing_tpu.models.pipeline import (
        pixel_centers, swizzle, _pad_edge, _swizzle_pads,
        swizzled_pixel_centers, primary_dirs, FrameInputs)

    for gh, gw, off in ((48, 64, 0), (45, 60, 0), (135, 1920 // 8, 135)):
        pads = _swizzle_pads(gh, gw)
        sh, sw = gh + pads[0], gw + pads[1]
        px, py = pixel_centers(gh, gw, row_offset=off)
        px_ref = swizzle(_pad_edge(px, *pads), sh, sw)
        py_ref = swizzle(_pad_edge(py, *pads), sh, sw)
        px_new, py_new = swizzled_pixel_centers(gh, gw, *pads,
                                                row_offset=off)
        np.testing.assert_array_equal(np.asarray(px_ref),
                                      np.asarray(px_new))
        np.testing.assert_array_equal(np.asarray(py_ref),
                                      np.asarray(py_new))


def test_raygen_regeneration_matches_swizzled_rays():
    """primary_dirs over the flat block-order centers == swizzle of the
    [H,W] direction grid (elementwise math, order-independent)."""
    import numpy as np
    import jax.numpy as jnp
    from opengl_raytracing_tpu.camera import Camera
    from opengl_raytracing_tpu.params import RenderParams
    from opengl_raytracing_tpu.models.pipeline import (
        pixel_centers, swizzle, _pad_edge, _swizzle_pads,
        swizzled_pixel_centers, primary_dirs, FrameInputs)

    H, W = 96, 128
    cam = Camera()
    cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect),
                      jnp.asarray([0.13, -0.21], jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))
    params = RenderParams()
    gh, gw = 45, 60  # non-divisible: exercises the edge-duplicate pads
    pads = _swizzle_pads(gh, gw)
    sh, sw = gh + pads[0], gw + pads[1]
    px, py = pixel_centers(gh, gw, row_offset=17)
    rd_ref = swizzle(_pad_edge(
        primary_dirs(px, py, H, W, fin, params), *pads), sh, sw)
    fx, fy = swizzled_pixel_centers(gh, gw, *pads, row_offset=17)
    rd_new = primary_dirs(fx, fy, H, W, fin, params)
    np.testing.assert_array_equal(np.asarray(rd_ref), np.asarray(rd_new))
