"""MXU intersection path vs brute-force oracle (interpret mode on CPU).

The same comparisons run on real TPU hardware via scripts/tpu_checks.py;
interpret mode here guards the kernel logic (cull, bitmask skip, epilogue
selects) in CI.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opengl_raytracing_tpu.scene import build_bvh, make_icosphere, \
    gather_triangles
from opengl_raytracing_tpu.scene.geometry import model_transform
from opengl_raytracing_tpu.ops.bvh_mxu import (build_mxu_arrays,
                                               trace_bvh_mxu,
                                               trace_bvh_shadow_mxu)
from opengl_raytracing_tpu.ops.bvh_traverse import trace_brute

N_RAYS = 4096  # one pallas grid step in interpret mode


@pytest.fixture(scope="module")
def scene():
    tris = gather_triangles(make_icosphere(1.0, 2),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    bvh = build_bvh(tris)
    return build_mxu_arrays(bvh), jnp.asarray(bvh.tris)


def _rays(seed, n=N_RAYS):
    rng = np.random.RandomState(seed)
    ro = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_mxu_closest_matches_bruteforce(scene):
    mxu, tris = scene
    ro, rd = _rays(0)
    h = trace_bvh_mxu(mxu, ro, rd)
    h_ref = trace_brute(tris, ro, rd)
    np.testing.assert_array_equal(np.asarray(h.valid), np.asarray(h_ref.valid))
    hit = np.asarray(h_ref.valid)
    np.testing.assert_allclose(np.asarray(h.t)[hit], np.asarray(h_ref.t)[hit],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h.n)[hit], np.asarray(h_ref.n)[hit],
                               atol=1e-3)


def test_mxu_shadow_matches_bruteforce(scene):
    mxu, tris = scene
    ro, rd = _rays(1)
    t_max = jnp.full((N_RAYS,), 4.0)
    occ = np.asarray(trace_bvh_shadow_mxu(mxu, ro, rd, t_max))
    h_ref = trace_brute(tris, ro, rd)
    want = np.asarray(h_ref.valid) & (np.asarray(h_ref.t) < 4.0)
    np.testing.assert_array_equal(occ, want)


def test_mxu_coherent_camera_rays(scene):
    mxu, tris = scene
    # camera-style coherent grid at the sphere
    xs = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs)
    rd = np.stack([gx, gy, -np.ones_like(gx)], -1).reshape(-1, 3)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro = np.tile(np.array([0, 1, 0], np.float32), (rd.shape[0], 1))
    h = trace_bvh_mxu(mxu, jnp.asarray(ro), jnp.asarray(rd))
    h_ref = trace_brute(tris, jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_array_equal(np.asarray(h.valid),
                                  np.asarray(h_ref.valid))
    assert np.asarray(h.valid).mean() > 0.1


def test_sorted_variants_match_unsorted(scene):
    from opengl_raytracing_tpu.experiments.bvh_sorted import (
        trace_bvh_mxu_sorted, trace_bvh_shadow_mxu_sorted)
    mxu, tris = scene
    ro, rd = _rays(2)
    a = trace_bvh_mxu(mxu, ro, rd)
    b = trace_bvh_mxu_sorted(mxu, ro, rd)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    hit = np.asarray(a.valid)
    np.testing.assert_allclose(np.asarray(a.t)[hit], np.asarray(b.t)[hit],
                               rtol=1e-5)
    t_max = jnp.full((N_RAYS,), 5.0)
    oa = np.asarray(trace_bvh_shadow_mxu(mxu, ro, rd, t_max))
    ob = np.asarray(trace_bvh_shadow_mxu_sorted(mxu, ro, rd, t_max))
    np.testing.assert_array_equal(oa, ob)


@pytest.mark.slow
def test_paged_tracing_matches_single_page():
    """Force tiny pages and confirm the merge is exact."""
    import opengl_raytracing_tpu.ops.bvh_mxu as bm
    from opengl_raytracing_tpu.scene import build_bvh, make_bunny
    tris = gather_triangles(make_bunny(3),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    bvh = build_bvh(tris)
    single = (bm.build_mxu_arrays(bvh),)
    old = bm.PAGE_CHUNKS
    try:
        bm.PAGE_CHUNKS = 4   # ~10 pages for this mesh
        paged = bm.build_mxu_paged(bvh)
    finally:
        bm.PAGE_CHUNKS = old
    assert len(paged) > 2
    ro, rd = _rays(5)
    a = bm.trace_bvh_mxu_paged(single, ro, rd)
    b = bm.trace_bvh_mxu_paged(paged, ro, rd)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    hit = np.asarray(a.valid)
    np.testing.assert_allclose(np.asarray(a.t)[hit], np.asarray(b.t)[hit],
                               rtol=1e-5)
    t_max = jnp.full((N_RAYS,), 5.0)
    oa = np.asarray(bm.trace_bvh_shadow_mxu_paged(single, ro, rd, t_max))
    ob = np.asarray(bm.trace_bvh_shadow_mxu_paged(paged, ro, rd, t_max))
    np.testing.assert_array_equal(oa, ob)

    # shared-origin (SMEM o_rows) + ordered on the MULTI-page path:
    # regression for the r3 cf_close crash — _trace_closest_paged built
    # direction-only planes but dropped o_rows on the way to the kernel,
    # so any multi-page scene crashed whenever a primary trace ran with
    # default knobs (single-page scenes took trace_bvh_mxu and hid it).
    origin = jnp.asarray(np.array([0.0, 1.0, 2.5], np.float32))
    ro_s = jnp.broadcast_to(origin, rd.shape)
    ref = bm.trace_bvh_mxu_paged(single, ro_s, rd)
    for ordered in (False, True):
        got = bm.trace_bvh_mxu_paged(paged, ro_s, rd,
                                     shared_origin=origin, ordered=ordered)
        np.testing.assert_array_equal(np.asarray(ref.valid),
                                      np.asarray(got.valid))
        hit = np.asarray(ref.valid)
        np.testing.assert_allclose(np.asarray(ref.t)[hit],
                                   np.asarray(got.t)[hit], rtol=1e-5)

    # inter-page t-pruning (ORT_PAGE_TCAP): the capped multi-page walk
    # must match the uncapped one bit-for-bit on ACTIVE lanes, incl.
    # with an active mask whose garbage lanes must not poison the cap
    ro5, rd5 = _rays(7)
    act = np.zeros(N_RAYS, bool)
    act[:: 2] = True
    act = jnp.asarray(act)
    old_cap = bm.PAGE_TCAP
    try:
        bm.PAGE_TCAP = False
        bm._trace_closest_paged.clear_cache()
        a = bm.trace_bvh_mxu_paged(paged, ro5, rd5, active=act)
        bm.PAGE_TCAP = True
        bm._trace_closest_paged.clear_cache()
        b = bm.trace_bvh_mxu_paged(paged, ro5, rd5, active=act)
    finally:
        bm.PAGE_TCAP = old_cap
        bm._trace_closest_paged.clear_cache()
    m = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(a.valid)[m],
                                  np.asarray(b.valid)[m])
    np.testing.assert_array_equal(np.asarray(a.t)[m], np.asarray(b.t)[m])

    # near-first dynamic page order (ORT_PAGE_ORDER): the lax.scan walk
    # over stacked pages must match the static unrolled walk on every
    # flavor — per-pixel origins, shared-origin SMEM fast path, and an
    # active mask (hull-centroid distance source)
    old_ord = bm.PAGE_ORDER
    try:
        bm.PAGE_ORDER = True
        bm._trace_closest_paged.clear_cache()
        for kw, mref in (
                (dict(), None),
                (dict(shared_origin=origin), None),
                (dict(active=act), m)):
            ro_k = ro_s if "shared_origin" in kw else ro
            want = bm.trace_bvh_mxu_paged(single, ro_k, rd, **kw)
            got = bm.trace_bvh_mxu_paged(paged, ro_k, rd, **kw)
            sl = slice(None) if mref is None else mref
            np.testing.assert_array_equal(np.asarray(want.valid)[sl],
                                          np.asarray(got.valid)[sl])
            hitm = np.asarray(want.valid) & (np.ones(N_RAYS, bool)
                                             if mref is None else mref)
            np.testing.assert_allclose(np.asarray(want.t)[hitm],
                                       np.asarray(got.t)[hitm], rtol=1e-5)
    finally:
        bm.PAGE_ORDER = old_ord
        bm._trace_closest_paged.clear_cache()


def test_ordered_shared_origin_matches_unordered(scene):
    """Front-to-back ordered walk (shared camera origin) must produce the
    identical closest hit as the unordered walk — the early-out only skips
    chunks that provably cannot improve any ray in the tile."""
    mxu, tris = scene
    origin = jnp.asarray(np.array([0.0, 1.0, 0.5], np.float32))
    xs = np.linspace(-0.7, 0.7, 64, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs)
    rd = np.stack([gx, gy, -np.ones_like(gx)], -1).reshape(-1, 3)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)
    ro = jnp.broadcast_to(origin, rd.shape)
    h0 = trace_bvh_mxu(mxu, ro, rd)
    h1 = trace_bvh_mxu(mxu, ro, rd, shared_origin=origin, ordered=True)
    np.testing.assert_array_equal(np.asarray(h0.valid), np.asarray(h1.valid))
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h1.t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h0.n), np.asarray(h1.n), atol=1e-6)


def test_ordered_paged_matches(scene):
    from opengl_raytracing_tpu.ops.bvh_mxu import trace_bvh_mxu_paged
    mxu, tris = scene
    origin = jnp.asarray(np.array([0.0, 1.0, 0.5], np.float32))
    ro, rd = _rays(7)
    ro = jnp.broadcast_to(origin, rd.shape)
    h0 = trace_bvh_mxu_paged(mxu, ro, rd)
    h1 = trace_bvh_mxu_paged(mxu, ro, rd, shared_origin=origin, ordered=True)
    np.testing.assert_array_equal(np.asarray(h0.valid), np.asarray(h1.valid))
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h1.t),
                               rtol=1e-6, atol=1e-6)


def test_masked_cull_closest_matches_on_active_lanes(scene):
    """Active-masked trace must equal the unmasked trace on ACTIVE lanes
    (inactive lanes are garbage by contract — excluded from the check).
    Covers the sort-free gating path used for GI rays."""
    mxu, tris = scene
    ro, rd = _rays(11)
    rng = np.random.RandomState(3)
    act = jnp.asarray(rng.rand(N_RAYS) > 0.6)
    h0 = trace_bvh_mxu(mxu, ro, rd)
    h1 = trace_bvh_mxu(mxu, ro, rd, active=act)
    sel = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(h0.valid)[sel],
                                  np.asarray(h1.valid)[sel])
    hit = sel & np.asarray(h0.valid)
    np.testing.assert_allclose(np.asarray(h0.t)[hit], np.asarray(h1.t)[hit],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h0.n)[hit], np.asarray(h1.n)[hit],
                               atol=1e-6)


def test_masked_cull_shadow_matches_and_inactive_false(scene):
    """Masked any-hit: equals unmasked on active lanes AND guarantees
    False on inactive lanes (collapsed window)."""
    mxu, tris = scene
    ro, rd = _rays(13)
    win = jnp.full((N_RAYS,), 5.0, jnp.float32)
    rng = np.random.RandomState(5)
    act = jnp.asarray(rng.rand(N_RAYS) > 0.5)
    s0 = trace_bvh_shadow_mxu(mxu, ro, rd, win)
    s1 = trace_bvh_shadow_mxu(mxu, ro, rd, win, active=act)
    sel = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(s0)[sel], np.asarray(s1)[sel])
    assert not np.asarray(s1)[~sel].any()


def test_masked_cull_all_inactive_tile_skips(scene):
    """A fully inactive batch must return all-False / all-miss (the +/-INF
    hull degeneracy is gated off explicitly)."""
    mxu, tris = scene
    ro, rd = _rays(17)
    act = jnp.zeros((N_RAYS,), jnp.bool_)
    h = trace_bvh_mxu(mxu, ro, rd, active=act)
    assert not np.asarray(h.valid).any()
    win = jnp.full((N_RAYS,), 5.0, jnp.float32)
    s = trace_bvh_shadow_mxu(mxu, ro, rd, win, active=act)
    assert not np.asarray(s).any()


def test_shadow_tuple_of_batches_matches_stacked(scene):
    """The tuple-of-batches wavefront form (no [k,...,3] stack) must be
    bit-identical to tracing the equivalent stacked arrays, including
    per-item active gating (inactive lanes guaranteed False)."""
    mxu, tris = scene
    k = 3
    batches = [_rays(20 + i) for i in range(k)]
    wins = [jnp.full((N_RAYS,), 3.0 + i, jnp.float32) for i in range(k)]
    rng = np.random.RandomState(7)
    act = jnp.asarray(rng.rand(N_RAYS) > 0.4)

    s_tuple = trace_bvh_shadow_mxu(
        mxu, tuple(b[0] for b in batches), tuple(b[1] for b in batches),
        tuple(wins), active=act)
    assert s_tuple.shape == (k, N_RAYS)
    s_stack = trace_bvh_shadow_mxu(
        mxu, jnp.stack([b[0] for b in batches]),
        jnp.stack([b[1] for b in batches]), jnp.stack(wins),
        active=jnp.broadcast_to(act[None], (k, N_RAYS)))
    np.testing.assert_array_equal(np.asarray(s_tuple), np.asarray(s_stack))
    sel = np.asarray(act)
    assert not np.asarray(s_tuple)[:, ~sel].any()


@pytest.mark.slow
def test_sparse_grid_matches_dense(scene, monkeypatch):
    """The sparse grid (active blocks compacted to the front via
    prefetched dynamic index maps; inactive tail streams nothing) must be
    bit-identical to the dense identity mapping, for closest-hit and
    any-hit, with and without an active mask.  Uses 4 grid blocks with a
    mostly-inactive mask so the inactive TAIL is actually exercised."""
    from opengl_raytracing_tpu.ops import bvh_mxu
    mxu, tris = scene
    n = 4 * bvh_mxu.SUBTILES * bvh_mxu.TILE_RAYS  # 4 grid steps
    ro, rd = _rays(31, n)
    win = jnp.full((n,), 5.0, jnp.float32)
    rng = np.random.RandomState(9)
    # concentrate active lanes in the first quarter -> blocks 2-4 are
    # fully inactive under the block swizzle's ray order
    act = jnp.asarray((rng.rand(n) > 0.3) & (np.arange(n) < n // 4))

    runs = {}
    for mode in (True, False):
        monkeypatch.setattr(bvh_mxu, "_SPARSE_GRID", mode)
        # trace_bvh_mxu/trace_bvh_shadow_mxu are jax.jit-cached and the
        # mode toggle is invisible to the cache key — clear so the dense
        # arm actually retraces instead of replaying the sparse program
        jax.clear_caches()
        h = trace_bvh_mxu(mxu, ro, rd)
        hm = trace_bvh_mxu(mxu, ro, rd, active=act)
        s = trace_bvh_shadow_mxu(mxu, ro, rd, win, active=act)
        runs[mode] = (np.asarray(h.valid), np.asarray(h.t),
                      np.asarray(h.n), np.asarray(hm.valid),
                      np.asarray(hm.t), np.asarray(s))
    jax.clear_caches()

    sel = np.asarray(act)
    a, b = runs[True], runs[False]
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])
    # masked results compare on active lanes only (inactive = garbage)
    np.testing.assert_array_equal(a[3][sel], b[3][sel])
    np.testing.assert_array_equal(a[4][sel & a[3]], b[4][sel & b[3]])
    np.testing.assert_array_equal(a[5], b[5])  # shadow: inactive==False
    assert not a[5][~sel].any()


def test_pad_chunks_fail_cull():
    """Group-pad chunks (inverted +/-1e30 bounds) must NOT pass the
    interval cull: min/max interval products are insensitive to the bound
    swap, so without the explicit validity mask a sky tile on any padded
    page looked occupied — defeating the sparse-grid block skip and the
    ordered walk window (regression test)."""
    from opengl_raytracing_tpu.ops.bvh_mxu import (_tile_hulls,
                                                   _tile_chunk_ranges)
    tris = gather_triangles(make_icosphere(1.0, 1),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    mxu = build_mxu_arrays(build_bvh(tris))
    nc = mxu.chunk_bounds.shape[0]
    assert nc % 8 == 0 and float(mxu.chunk_bounds[-1, 0]) > 1e29  # has pads

    def ranges(ro_row, rd_row, n_rays=256):
        ro = np.tile(np.asarray(ro_row, np.float32), (n_rays, 1))
        rd = np.tile(np.asarray(rd_row, np.float32), (n_rays, 1))
        soa_o = tuple(jnp.asarray(ro[:, k]) for k in range(3))
        soa_d = tuple(jnp.asarray(rd[:, k]) for k in range(3))
        lo, n, _, _, _, gn, *_gw = _tile_chunk_ranges(
            mxu.chunk_bounds, _tile_hulls(soa_o, soa_d))
        return np.asarray(n), np.asarray(gn)

    # sky tile: rays point away from all geometry -> nothing survives
    n_sky, gn_sky = ranges([0.0, 10.0, 0.0], [0.0, 1.0, 0.0])
    assert (n_sky == 0).all() and (gn_sky == 0).all()

    # control: rays at the sphere still select its real chunk
    n_hit, gn_hit = ranges([0.0, 1.0, 3.0], [0.0, 0.0, -1.0])
    assert (n_hit >= 1).all() and (gn_hit >= 1).all()


def test_shared_origin_hulls_match_reduced():
    """The constant-origin hull fast path (primary rays: one camera
    origin) must produce the same cull output as the reduced form."""
    from opengl_raytracing_tpu.ops.bvh_mxu import (_tile_hulls,
                                                   _tile_chunk_ranges)
    tris = gather_triangles(make_icosphere(1.0, 2),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    mxu = build_mxu_arrays(build_bvh(tris))
    rng = np.random.RandomState(7)
    n = 512
    origin = np.asarray([0.3, 1.7, 4.2], np.float32)
    ro = np.tile(origin, (n, 1))
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    soa_o = tuple(jnp.asarray(ro[:, k]) for k in range(3))
    soa_d = tuple(jnp.asarray(rd[:, k]) for k in range(3))
    act = jnp.asarray(rng.rand(n) > 0.3)  # mixed active gating

    for a in (None, act):
        ref = _tile_chunk_ranges(mxu.chunk_bounds,
                                 _tile_hulls(soa_o, soa_d, a))
        fast = _tile_chunk_ranges(
            mxu.chunk_bounds,
            _tile_hulls(soa_o, soa_d, a,
                        shared_origin=jnp.asarray(origin)))
        for r, f in zip(ref, fast):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(f))


def test_shared_origin_kernel_matches_plane_form(scene, monkeypatch):
    """The shared-origin kernel variant (origin as a broadcast-constant
    input, direction-only planes) must be bit-identical to the plane
    form — the feature rows it expands are the same values."""
    import opengl_raytracing_tpu.ops.bvh_mxu as bm
    mxu, _ = scene
    rng = np.random.RandomState(11)
    n = 4096
    origin = jnp.asarray([0.4, 2.1, 3.0], jnp.float32)
    ro = jnp.broadcast_to(origin, (n, 3))
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)

    # SMEM_ORIGIN is read at trace time: clear the jit cache between
    # modes or the second call would reuse the first trace
    monkeypatch.setattr(bm, "SMEM_ORIGIN", True)
    jax.clear_caches()
    fast = bm.trace_bvh_mxu(mxu, ro, rd, shared_origin=origin,
                            ordered=False)
    fast = jax.tree.map(np.asarray, fast)
    monkeypatch.setattr(bm, "SMEM_ORIGIN", False)
    jax.clear_caches()
    ref = bm.trace_bvh_mxu(mxu, ro, rd, shared_origin=origin,
                           ordered=False)
    ref = jax.tree.map(np.asarray, ref)
    np.testing.assert_array_equal(np.asarray(fast.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(fast.n), np.asarray(ref.n))
    # and the ordered walk composes with it
    monkeypatch.setattr(bm, "SMEM_ORIGIN", True)
    jax.clear_caches()
    fo = bm.trace_bvh_mxu(mxu, ro, rd, shared_origin=origin, ordered=True)
    np.testing.assert_array_equal(np.asarray(fo.t), np.asarray(ref.t))
    jax.clear_caches()


def test_shared_shadow_origin_wavefront_matches(scene, monkeypatch):
    """AO-style wavefront: k batches passing the SAME origin array must
    produce identical occlusion through the deduplicated layout (one
    origin copy + block-aligned batches + modulo index map) as through
    the plain concatenated form — including a non-group-multiple item
    size (interior padding) and active gating."""
    import opengl_raytracing_tpu.ops.bvh_mxu as bm
    mxu, _ = scene
    rng = np.random.RandomState(23)
    n_item = 5000  # NOT a multiple of the 4096-ray block group
    org = jnp.asarray(rng.uniform(-2, 2, (n_item, 3)).astype(np.float32))
    dirs = []
    for _ in range(4):
        d = rng.randn(n_item, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        dirs.append(jnp.asarray(d))
    win = jnp.full((n_item,), 6.0, jnp.float32)
    active = jnp.asarray(rng.rand(n_item) > 0.25)

    def run():
        return np.asarray(bm.trace_bvh_shadow_mxu_paged(
            (mxu,), (org,) * 4, tuple(dirs), (win,) * 4, active=active))

    monkeypatch.setattr(bm, "SHARED_SHADOW_ORIGIN", True)
    jax.clear_caches()
    shared = run()
    monkeypatch.setattr(bm, "SHARED_SHADOW_ORIGIN", False)
    jax.clear_caches()
    plain = run()
    jax.clear_caches()
    assert shared.shape == plain.shape == (4, n_item)
    a = np.asarray(active)
    np.testing.assert_array_equal(shared[:, a], plain[:, a])
    # inactive lanes are contract-False on both paths
    assert not shared[:, ~a].any() and not plain[:, ~a].any()


def test_ordered_group_walk_bit_matches_per_chunk(scene, monkeypatch):
    """ORT_ORDERED_GROUP>1 processes G order positions per scalar step
    (one fused matmul, bit-masked merges in ascending position order) —
    must be bit-identical to the per-chunk ordered walk: a masked-out
    merge carries through unchanged, and merge order is preserved."""
    import jax as _jax
    from opengl_raytracing_tpu.ops import bvh_mxu
    mxu, tris = scene
    origin = jnp.asarray(np.array([0.0, 1.0, 0.5], np.float32))
    ro, rd = _rays(11)
    ro = jnp.broadcast_to(origin, rd.shape)

    out = {}
    for g in (1, 4):
        monkeypatch.setattr(bvh_mxu, "ORDERED_GROUP", g)
        _jax.clear_caches()  # the module knob is not a jit cache key
        h = trace_bvh_mxu(mxu, ro, rd, shared_origin=origin, ordered=True)
        out[g] = (np.asarray(h.t), np.asarray(h.n), np.asarray(h.valid))
    np.testing.assert_array_equal(out[1][2], out[4][2])
    np.testing.assert_array_equal(
        np.where(out[1][2], out[1][0], 0.0),
        np.where(out[4][2], out[4][0], 0.0))
    np.testing.assert_array_equal(out[1][1], out[4][1])


@pytest.mark.slow
def test_defer_normal_bit_matches_inkernel(scene, monkeypatch):
    """ORT_DEFER_NORMAL=1 (kernel returns winning-tri indices; normals
    fetched by one flat XLA row-gather) must be bit-identical to the
    in-kernel one-hot extraction: the winner selection logic is shared,
    and the gathered value is the same stored normal.  Covers unordered,
    ordered+shared-origin (SMEM o_rows), active masking, and the
    multi-page merge (page-base index offsets)."""
    import opengl_raytracing_tpu.ops.bvh_mxu as bm
    from opengl_raytracing_tpu.scene import build_bvh, make_bunny
    mxu, _ = scene
    rng = np.random.RandomState(7)
    ro, rd = _rays(7)
    origin = jnp.asarray([0.2, 1.3, 2.0], jnp.float32)
    ro_s = jnp.broadcast_to(origin, rd.shape)
    active = jnp.asarray(rng.rand(N_RAYS) > 0.3)

    tris_b = gather_triangles(make_bunny(3),
                              model_transform((0.0, 1.0, -3.0), 1.0))
    bvh_b = build_bvh(tris_b)
    old = bm.PAGE_CHUNKS
    try:
        bm.PAGE_CHUNKS = 4
        paged = bm.build_mxu_paged(bvh_b)
    finally:
        bm.PAGE_CHUNKS = old

    def runs():
        out = [bm.trace_bvh_mxu(mxu, ro, rd),
               bm.trace_bvh_mxu(mxu, ro_s, rd, shared_origin=origin,
                                ordered=True),
               bm.trace_bvh_mxu(mxu, ro, rd, active=active),
               bm.trace_bvh_mxu_paged(paged, ro_s, rd,
                                      shared_origin=origin)]
        return [jax.tree.map(np.asarray, h) for h in out]

    monkeypatch.setattr(bm, "DEFER_NORMAL", False)
    jax.clear_caches()
    want = runs()
    monkeypatch.setattr(bm, "DEFER_NORMAL", True)
    jax.clear_caches()
    got = runs()
    jax.clear_caches()
    act = np.asarray(active)
    for k, (a, b) in enumerate(zip(want, got)):
        sel = act if k == 2 else slice(None)  # masked lanes are garbage
        np.testing.assert_array_equal(a.t[sel], b.t[sel], err_msg=str(k))
        np.testing.assert_array_equal(a.n[sel], b.n[sel], err_msg=str(k))
        np.testing.assert_array_equal(a.p[sel], b.p[sel], err_msg=str(k))


@pytest.mark.slow
def test_subtile_compact_bit_matches(scene, monkeypatch):
    """ORT_SUBTILE_COMPACT=1 (meta rows actives-first per block, loop
    bound = active count, plane reads/writes via the original-index
    column) must be bit-identical to the dense subtile loop: the same
    per-subtile work runs, just without the empty iterations.  Covers
    unordered, ordered+shared-origin, active masking, the shadow
    wavefront (tuple of batches + interior padding), and composition
    with the deferred-normal epilogue."""
    import opengl_raytracing_tpu.ops.bvh_mxu as bm
    mxu, _ = scene
    rng = np.random.RandomState(13)
    ro, rd = _rays(13)
    origin = jnp.asarray([0.1, 1.0, 2.2], jnp.float32)
    ro_s = jnp.broadcast_to(origin, rd.shape)
    active = jnp.asarray(rng.rand(N_RAYS) > 0.4)
    n_item = 3000  # non-block-multiple: interior padding
    org = jnp.asarray(rng.uniform(-2, 2, (n_item, 3)).astype(np.float32))
    dirs = []
    for _ in range(3):
        d = rng.randn(n_item, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        dirs.append(jnp.asarray(d))
    win = jnp.full((n_item,), 6.0, jnp.float32)
    act_w = jnp.asarray(rng.rand(n_item) > 0.3)

    def runs():
        hits = [bm.trace_bvh_mxu(mxu, ro, rd),
                bm.trace_bvh_mxu(mxu, ro_s, rd, shared_origin=origin,
                                 ordered=True),
                bm.trace_bvh_mxu(mxu, ro, rd, active=active)]
        occ = bm.trace_bvh_shadow_mxu_paged(
            (mxu,), (org,) * 3, tuple(dirs), (win,) * 3, active=act_w)
        return ([jax.tree.map(np.asarray, h) for h in hits],
                np.asarray(occ))

    for defer in (False, True):
        monkeypatch.setattr(bm, "DEFER_NORMAL", defer)
        monkeypatch.setattr(bm, "SUBTILE_COMPACT", False)
        jax.clear_caches()
        want_h, want_o = runs()
        monkeypatch.setattr(bm, "SUBTILE_COMPACT", True)
        jax.clear_caches()
        got_h, got_o = runs()
        jax.clear_caches()
        act = np.asarray(active)
        for k, (a, b) in enumerate(zip(want_h, got_h)):
            sel = act if k == 2 else slice(None)
            np.testing.assert_array_equal(a.t[sel], b.t[sel],
                                          err_msg=f"defer={defer} k={k}")
            np.testing.assert_array_equal(a.n[sel], b.n[sel],
                                          err_msg=f"defer={defer} k={k}")
        aw = np.asarray(act_w)
        np.testing.assert_array_equal(want_o[:, aw], got_o[:, aw],
                                      err_msg=f"defer={defer} shadow")
        assert not got_o[:, ~aw].any()


@pytest.mark.slow
def test_x3_precision_matches_highest(monkeypatch):
    """ORT_MT_PRECISION=x3 (single k=48 bf16_3x pass) vs the 6-pass
    HIGHEST form: identical winning triangles/occlusion on a generic
    ray set, t within the bf16_3x error bound (~2^-13 relative).

    x3 packs the error-compensated split into the contraction dim
    (coef cols [hi|hi|lo] against feature rows [fh;fl;fh]) — see the
    precision-mode comment in ops/bvh_mxu.py."""
    import opengl_raytracing_tpu.ops.bvh_mxu as bm

    tris = gather_triangles(make_icosphere(1.0, 2),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    bvh = build_bvh(tris)
    ro, rd = _rays(7, n=1024)
    # shared origin exercises the o_rows fast path too
    org = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 2.0]), ro.shape)
    win = jnp.full(ro.shape[:1], 8.0, jnp.float32)

    def run():
        mxu = bm.build_mxu_arrays(bvh)
        h = bm.trace_bvh_mxu(mxu, ro, rd)
        hs = bm.trace_bvh_mxu(mxu, org, rd,
                              shared_origin=jnp.asarray([0.0, 1.0, 2.0]))
        occ = bm.trace_bvh_shadow_mxu(mxu, ro, rd, win)
        return (jax.tree.map(np.asarray, h), jax.tree.map(np.asarray, hs),
                np.asarray(occ))

    want_h, want_hs, want_o = run()
    monkeypatch.setattr(bm, "MT_X3", True)
    monkeypatch.setattr(bm, "K_EFF", 48)
    monkeypatch.setattr(bm, "MT_PREC_UV", jax.lax.Precision.DEFAULT)
    monkeypatch.setattr(bm, "MT_PREC_DT", jax.lax.Precision.DEFAULT)
    jax.clear_caches()
    got_h, got_hs, got_o = run()
    jax.clear_caches()

    for a, b in ((want_h, got_h), (want_hs, got_hs)):
        hit_a = np.isfinite(a.t)
        agree = hit_a == np.isfinite(b.t)
        assert agree.mean() > 0.999  # knife-edge accepts may flip
        sel = hit_a & np.isfinite(b.t)
        rel = np.abs(a.t[sel] - b.t[sel]) / np.maximum(a.t[sel], 1e-6)
        assert rel.max() < 3e-4, rel.max()
        # winning triangle (via its stored normal) identical wherever
        # both forms accept
        assert (np.abs(a.n[sel] - b.n[sel]).max(axis=-1) < 1e-6).mean() \
            > 0.999
    assert (want_o == got_o).mean() > 0.999


def test_group_sort_walk_matches_window_walk(scene, monkeypatch):
    """ORT_GROUP_SORT replaces the window+bitmask group walk with a
    per-tile near-first compacted walk + early exit (_sorted_group_plan).
    Every pruned group's entry bound exceeds every lane's running best
    t, so closest/shadow results are bit-identical on tie-free scenes —
    random incoherent rays, coherent camera rays, active-masked lanes,
    and the paged walk with inter-page t-caps all pin that here."""
    from opengl_raytracing_tpu.ops import bvh_mxu as bm
    mxu, tris = scene
    ro, rd = _rays(13)
    origin = jnp.asarray(np.array([0.0, 1.0, 0.5], np.float32))
    org = jnp.broadcast_to(origin, rd.shape)
    rng = np.random.RandomState(7)
    act = jnp.asarray(rng.rand(rd.shape[0]) > 0.4)
    win = jnp.full((rd.shape[0],), 4.0)

    # multi-page build of a bigger mesh exercises the per-page plans +
    # inter-page t-cap/early-out interaction
    big = gather_triangles(make_icosphere(1.0, 3),
                           model_transform((0.0, 1.0, -3.0), 1.0))
    monkeypatch.setattr(bm, "PAGE_CHUNKS", 8)
    pages = bm.build_mxu_paged(build_bvh(big))
    assert len(pages) > 1

    def run():
        h = trace_bvh_mxu(mxu, ro, rd)
        hs = trace_bvh_mxu(mxu, org, rd, shared_origin=origin)
        ha = trace_bvh_mxu(mxu, ro, rd, active=act)
        occ = trace_bvh_shadow_mxu(mxu, ro, rd, win, active=act)
        hp = bm.trace_bvh_mxu_paged(pages, org, rd, shared_origin=origin)
        op = bm.trace_bvh_shadow_mxu_paged(pages, ro, rd, win)
        am = np.asarray(act)
        return (np.asarray(h.t), np.asarray(h.n),
                np.asarray(hs.t), np.asarray(hs.n),
                np.where(am, np.asarray(ha.t), 0.0),
                np.where(am, np.asarray(occ), 0.0),
                np.asarray(hp.t), np.asarray(hp.n), np.asarray(op))

    want = run()
    monkeypatch.setattr(bm, "GROUP_SORT", True)
    jax.clear_caches()  # the module knob is not a jit cache key
    got = run()
    jax.clear_caches()
    for i, (a, b) in enumerate(zip(want, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"output {i}")


def test_shadow_pack_matches_batched(scene, monkeypatch):
    """ORT_SHADOW_PACK traces a k-batch shadow wavefront with the
    batches on LANES (one union-hull walk per pixel tile, [K,k*128]
    matmuls) — results must match the concatenated-stream form exactly,
    for per-batch origins (disk lights), shared origins (AO), active
    masks, multi-page walks, and composed with ORT_GROUP_SORT."""
    from opengl_raytracing_tpu.ops import bvh_mxu as bm
    mxu, tris = scene
    big = gather_triangles(make_icosphere(1.0, 3),
                           model_transform((0.0, 1.0, -3.0), 1.0))
    monkeypatch.setattr(bm, "PAGE_CHUNKS", 8)
    pages = bm.build_mxu_paged(build_bvh(big))
    assert len(pages) > 1

    rng = np.random.RandomState(3)
    n = N_RAYS
    hp = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32) \
        + np.array([0, 1, -3], np.float32)
    act = jnp.asarray(rng.rand(n) > 0.35)
    light = np.array([0.5, 5.0, -1.0], np.float32)
    oris, dirs, wins = [], [], []
    for j in range(4):
        xl = light + rng.randn(3).astype(np.float32) * 0.4
        d = xl[None] - hp
        w = np.linalg.norm(d, axis=1)
        d /= w[:, None]
        oris.append(jnp.asarray(hp + d * 1e-3))
        dirs.append(jnp.asarray(d))
        wins.append(jnp.asarray(w - 1e-3))

    def run():
        o1 = bm.trace_bvh_shadow_mxu_paged(
            pages, tuple(oris), tuple(dirs), tuple(wins), active=act)
        o2 = bm.trace_bvh_shadow_mxu_paged(
            pages, (oris[0],) * 4, tuple(dirs), tuple(wins), active=act)
        o3 = bm.trace_bvh_shadow_mxu_paged(
            (pages[0],), tuple(oris), tuple(dirs), tuple(wins))
        am = np.asarray(act)[None]
        return (np.where(am, np.asarray(o1), 0),
                np.where(am, np.asarray(o2), 0), np.asarray(o3))

    want = run()
    monkeypatch.setattr(bm, "SHADOW_PACK", True)
    jax.clear_caches()
    got = run()
    monkeypatch.setattr(bm, "GROUP_SORT", True)
    jax.clear_caches()
    got_s = run()
    jax.clear_caches()
    for i, (a, b, c) in enumerate(zip(want, got, got_s)):
        np.testing.assert_array_equal(a, b, err_msg=f"pack output {i}")
        np.testing.assert_array_equal(a, c,
                                      err_msg=f"pack+gsort output {i}")


def test_shadow_exit_cadence_bit_identical(scene, monkeypatch):
    """ORT_SHADOW_EXIT_EVERY amortizes the all-occluded early-exit's
    vector->scalar sync over K bitmask steps (8), or removes the exit
    (0) — occlusion is monotone, so every cadence is bit-identical to
    the legacy per-step form (1)."""
    import opengl_raytracing_tpu.ops.bvh_mxu as bm
    mxu, tris = scene
    ro, rd = _rays(31)
    win = jnp.full((N_RAYS,), 6.0, jnp.float32)

    outs = {}
    for ev in (1, 8, 0):
        monkeypatch.setattr(bm, "SHADOW_EXIT_EVERY", ev)
        jax.clear_caches()
        outs[ev] = np.asarray(trace_bvh_shadow_mxu(mxu, ro, rd, win))
    jax.clear_caches()
    np.testing.assert_array_equal(outs[1], outs[8])
    np.testing.assert_array_equal(outs[1], outs[0])
    assert outs[1].any()  # non-degenerate scene


def test_window_aware_hulls_shared_origin_differing_windows(scene):
    """Window-collapsed lanes fold into the hull mask; on a SHARED-
    origin wavefront the per-batch masks may differ (ndl gating), and
    the single origin-plane copy must reduce under the OR over batches
    — a lane collapsed in batch 0 but live in batch 1 keeps its origin
    in the hull.  Each batch must match its solo trace exactly."""
    mxu, tris = scene
    ro, rd1 = _rays(41)
    _, rd2 = _rays(42)
    rng = np.random.RandomState(3)
    tm1 = jnp.where(jnp.asarray(rng.rand(N_RAYS) > 0.5),
                    jnp.float32(6.0), jnp.float32(-1.0))
    tm2 = jnp.full((N_RAYS,), 6.0, jnp.float32)

    s_pair = trace_bvh_shadow_mxu(mxu, (ro, ro), (rd1, rd2), (tm1, tm2))
    s1 = trace_bvh_shadow_mxu(mxu, ro, rd1, tm1)
    s2 = trace_bvh_shadow_mxu(mxu, ro, rd2, tm2)
    np.testing.assert_array_equal(np.asarray(s_pair[0]), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(s_pair[1]), np.asarray(s2))
    assert np.asarray(s2).any()
