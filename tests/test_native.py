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
