"""BVH build invariants + traversal vs brute-force oracle
(property tests per SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from opengl_raytracing_tpu.scene import (build_bvh, bvh_to_arrays,
                                         make_bunny, make_icosphere,
                                         gather_triangles)
from opengl_raytracing_tpu.scene.geometry import model_transform
from opengl_raytracing_tpu.scene.bvh import validate_bvh
from opengl_raytracing_tpu.ops.bvh_traverse import (trace_bvh,
                                                    trace_bvh_shadow,
                                                    trace_brute)


def _small_tris(subdiv=1):
    mesh = make_icosphere(1.0, subdiv)
    return gather_triangles(mesh, model_transform((0, 1.0, -3.0), 1.0))


def test_build_invariants_sphere():
    tris = _small_tris(2)
    bvh = build_bvh(tris)
    validate_bvh(bvh, tris)
    assert bvh.n_tris == tris.shape[0]
    # leaf sizes bounded
    assert (bvh.count[bvh.count > 0] <= 8).all()


def test_build_invariants_bunny():
    mesh = make_bunny(3)
    tris = gather_triangles(mesh, model_transform((-2, 1.5, 0), 0.5))
    bvh = build_bvh(tris)
    validate_bvh(bvh, tris)


def _random_rays(n, seed=0):
    rng = np.random.RandomState(seed)
    ro = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    ro[:, 2] += 3.0
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_traversal_matches_bruteforce():
    tris = _small_tris(2)
    bvh = build_bvh(tris)
    arrs = jax.tree.map(jnp.asarray, bvh_to_arrays(bvh))
    ro, rd = _random_rays(512)
    h_bvh = trace_bvh(arrs, ro, rd)
    # brute force over the *remapped* tris (same set, validated above)
    h_ref = trace_brute(jnp.asarray(bvh.tris), ro, rd)
    np.testing.assert_array_equal(np.asarray(h_bvh.valid),
                                  np.asarray(h_ref.valid))
    hit = np.asarray(h_ref.valid)
    np.testing.assert_allclose(np.asarray(h_bvh.t)[hit],
                               np.asarray(h_ref.t)[hit], rtol=1e-4, atol=1e-4)
    # normals agree up to sign conventions? both use cross(e1,e2) of the
    # SAME winning triangle -> must agree exactly when ts match
    np.testing.assert_allclose(np.asarray(h_bvh.n)[hit],
                               np.asarray(h_ref.n)[hit], atol=1e-3)


def test_shadow_matches_bruteforce_anyhit():
    tris = _small_tris(2)
    bvh = build_bvh(tris)
    arrs = jax.tree.map(jnp.asarray, bvh_to_arrays(bvh))
    ro, rd = _random_rays(512, seed=3)
    t_max = jnp.full(ro.shape[:1], 6.0)
    occ = np.asarray(trace_bvh_shadow(arrs, ro, rd, t_max))
    h_ref = trace_brute(jnp.asarray(bvh.tris), ro, rd)
    want = np.asarray(h_ref.valid) & (np.asarray(h_ref.t) < 6.0)
    np.testing.assert_array_equal(occ, want)


def test_camera_rays_hit_mesh():
    """Primary-ray style coherent batch must produce a plausible silhouette."""
    mesh = make_bunny(3)
    tris = gather_triangles(mesh, model_transform((0, 0, -4), 1.0))
    bvh = build_bvh(tris)
    arrs = jax.tree.map(jnp.asarray, bvh_to_arrays(bvh))
    # 32x32 grid of rays toward the blob
    xs = np.linspace(-0.4, 0.4, 32, dtype=np.float32)
    ys = np.linspace(-0.4, 0.4, 32, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    rd = np.stack([gx, gy, -np.ones_like(gx)], axis=-1)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.zeros_like(rd)
    h = trace_bvh(arrs, jnp.asarray(ro), jnp.asarray(rd))
    frac = float(np.asarray(h.valid).mean())
    assert 0.2 < frac < 0.95  # silhouette fills part of the frame
    # center ray definitely hits, t ~ distance to surface (~2.5..4)
    tc = float(np.asarray(h.t)[16, 16])
    assert 2.0 < tc < 4.5


def test_empty_bvh_returns_no_hits():
    bvh = build_bvh(np.zeros((0, 9), np.float32))
    arrs = jax.tree.map(jnp.asarray, bvh_to_arrays(bvh))
    ro, rd = _random_rays(16)
    h = trace_bvh(arrs, ro, rd)
    assert not bool(np.asarray(h.valid).any())


def test_resolve_ordered_primary_auto():
    """Auto mode (2) applies the ORDERED_AUTO_FACTOR camera-distance
    threshold (0.0 since the r3b sweep: unordered wins at every measured
    distance, so auto never picks ordered); explicit 0/1 pass through;
    no BVH -> unordered."""
    from opengl_raytracing_tpu.ops import scene as sc
    aabb = (np.array([-1.0, 0.0, -1.0]), np.array([1.0, 2.0, 1.0]))
    radius = 0.5 * float(np.linalg.norm(aabb[1] - aabb[0]))
    inside = (0.0, 1.0, 0.0)
    near = (0.0, 1.0, 1.0 + 0.5 * radius)
    far = (0.0, 1.0, 1.0 + 10.0 * radius)
    # production default: auto == never ordered (measured, PERF.md r3b)
    assert sc.ORDERED_AUTO_FACTOR == 0.0
    for pos in (inside, near, far):
        assert sc.resolve_ordered_primary(2, pos, aabb) == 0
    assert sc.resolve_ordered_primary(2, far, None) == 0
    # the threshold math itself (a future sweep may re-raise the factor)
    try:
        sc.ORDERED_AUTO_FACTOR = 1.5
        assert sc.resolve_ordered_primary(2, inside, aabb) == 1
        assert sc.resolve_ordered_primary(2, near, aabb) == 1
        assert sc.resolve_ordered_primary(2, far, aabb) == 0
    finally:
        sc.ORDERED_AUTO_FACTOR = 0.0
    for flag in (0, 1):
        for pos in (inside, far):
            assert sc.resolve_ordered_primary(flag, pos, aabb) == flag
