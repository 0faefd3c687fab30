"""Native C++ components vs numpy oracles."""

import os
import tempfile

import numpy as np
import pytest

from opengl_raytracing_tpu import native
from opengl_raytracing_tpu.scene import (build_bvh, make_bunny, make_icosphere,
                                         gather_triangles, save_obj, load_obj)
from opengl_raytracing_tpu.scene.bvh import validate_bvh
from opengl_raytracing_tpu.scene.geometry import model_transform
from opengl_raytracing_tpu.utils.image import slice_cubemap_cross

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _tris():
    mesh = make_bunny(3)
    return gather_triangles(mesh, model_transform((-2, 1.5, 0), 0.5))


def test_native_bvh_valid_and_equivalent():
    tris = _tris()
    bvh_c = native.build_bvh(tris)
    validate_bvh(bvh_c, tris)
    bvh_py = build_bvh(tris)
    # Same node count (median split -> identical partition sizes) and same
    # skip-link structure class; tie order may differ so trees need not be
    # byte-identical — traversal results are compared in test_bvh paths.
    assert bvh_c.n_nodes == bvh_py.n_nodes
    assert bvh_c.n_tris == bvh_py.n_tris
    assert (bvh_c.count[bvh_c.count > 0] <= 8).all()


def test_native_bvh_traversal_matches_bruteforce():
    import jax.numpy as jnp
    from opengl_raytracing_tpu.scene.bvh import bvh_to_arrays
    from opengl_raytracing_tpu.ops.bvh_traverse import trace_bvh, trace_brute
    tris = gather_triangles(make_icosphere(1.0, 2),
                            model_transform((0, 1, -3), 1.0))
    bvh_c = native.build_bvh(tris)
    arrs = bvh_to_arrays(bvh_c)
    arrs = type(arrs)(*[jnp.asarray(a) for a in arrs])
    rng = np.random.RandomState(5)
    ro = jnp.asarray(rng.uniform(-3, 3, (256, 3)).astype(np.float32))
    rd = rng.randn(256, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    h = trace_bvh(arrs, ro, jnp.asarray(rd))
    h_ref = trace_brute(jnp.asarray(bvh_c.tris), ro, jnp.asarray(rd))
    np.testing.assert_array_equal(np.asarray(h.valid), np.asarray(h_ref.valid))
    hit = np.asarray(h_ref.valid)
    np.testing.assert_allclose(np.asarray(h.t)[hit], np.asarray(h_ref.t)[hit],
                               rtol=1e-4, atol=1e-4)


def test_native_obj_roundtrip():
    mesh = make_icosphere(1.0, 1)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ico.obj")
        save_obj(path, mesh)
        got = native.load_obj(path)
        assert got is not None
        verts, faces = got
        pv, pf = load_obj(path)  # python fallback parser
        np.testing.assert_allclose(verts, pv, atol=1e-5)
        np.testing.assert_array_equal(faces, pf)


def test_native_gather_matches_numpy():
    mesh = make_icosphere(1.0, 1)
    m = model_transform((1, 2, 3), 0.7)
    got = native.gather_triangles(mesh, m)
    want = gather_triangles(mesh, m)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_native_cubemap_slice_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (3 * 8, 4 * 8, 3), dtype=np.uint8)
    got = native.slice_cubemap_cross(img)
    want = slice_cubemap_cross(img)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_cubemap_rejects_bad_dims():
    img = np.zeros((10, 13, 3), np.uint8)
    with pytest.raises(ValueError):
        native.slice_cubemap_cross(img)


def test_native_png_unfilter_matches_numpy():
    """All five filter types on arbitrary raw bytes (the filters are
    total functions of the stream, so random input is a full oracle)."""
    from opengl_raytracing_tpu.utils.image import _unfilter_numpy
    rng = np.random.RandomState(7)
    h, w, c = 23, 17, 3
    raw = rng.randint(0, 256, h * (1 + w * c), dtype=np.uint8)
    for y in range(h):
        raw[y * (1 + w * c)] = y % 5  # cycle filters 0..4
    got = native.png_unfilter(raw, h, w, c)
    assert got is not None
    want = _unfilter_numpy(raw, h, w, c)
    np.testing.assert_array_equal(got, want)
    bad = raw.copy()
    bad[0] = 9
    with pytest.raises(ValueError):
        native.png_unfilter(bad, h, w, c)


def test_native_png_decode_roundtrip(tmp_path):
    from opengl_raytracing_tpu.utils.image import write_png, read_png
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (20, 33, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_native_hdr_unrle_matches_numpy():
    """RLE stream with runs, literals, and an old-style flat scanline."""
    from opengl_raytracing_tpu.utils.image import _hdr_unrle_numpy
    rng = np.random.RandomState(11)
    h, w = 3, 16
    parts = []
    # two new-style RLE scanlines
    for _ in range(2):
        parts.append(bytes([2, 2, w >> 8, w & 0xFF]))
        for _c in range(4):
            # run of 10 + literal of 6
            parts.append(bytes([128 + 10, int(rng.randint(256))]))
            parts.append(bytes([6]) + rng.randint(
                0, 256, 6, dtype=np.uint8).tobytes())
    # one old-style flat scanline (w RGBE quads; first byte != 2)
    flat = rng.randint(0, 256, w * 4, dtype=np.uint8)
    flat[0] = 1
    parts.append(flat.tobytes())
    buf = np.frombuffer(b"".join(parts), np.uint8)
    got = native.hdr_unrle(buf, 0, h, w)
    assert got is not None
    want = _hdr_unrle_numpy(buf, h, w)
    np.testing.assert_array_equal(got, want)


def test_native_hdr_read_roundtrip(tmp_path):
    from opengl_raytracing_tpu.utils.image import write_hdr, read_hdr
    rng = np.random.RandomState(5)
    img = (rng.rand(9, 16, 3) * 4.0).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    write_hdr(p, img)
    got = read_hdr(p)
    # RGBE shares one exponent per pixel: absolute step = max/256
    np.testing.assert_allclose(got, img, rtol=0.01, atol=4.0 / 256.0)


def test_native_obj_rejects_malformed_vertex(tmp_path=None):
    """A malformed 'v' line must fail the parse (silently dropping it
    would shift every later face index); the load_obj_fast dispatcher
    then raises via the python oracle."""
    from opengl_raytracing_tpu.scene.geometry import load_obj_fast
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "bad.obj")
        with open(p, "w") as fh:
            fh.write("v 0 0 0\nv 1 2 abc\nv 0 1 0\nf 1 2 3\n")
        assert native.load_obj(p) is None
        with pytest.raises(ValueError):
            load_obj_fast(p)


def test_gather_triangles_fast_matches_and_bounds_checks():
    from opengl_raytracing_tpu.scene.geometry import (gather_triangles,
                                                      gather_triangles_fast)
    mesh = make_icosphere(1.0, 1)
    m = model_transform((0.5, -1.0, 2.0), 0.75)
    np.testing.assert_allclose(gather_triangles_fast(mesh, m),
                               gather_triangles(mesh, m), atol=1e-6)
    verts, faces = mesh
    bad = faces.copy()
    bad[0, 0] = len(verts) + 7  # out of range
    with pytest.raises(IndexError):
        gather_triangles_fast((verts, bad), m)
