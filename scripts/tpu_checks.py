"""Run the MXU kernel oracle comparisons on REAL TPU hardware.

tests/test_bvh_mxu.py guards the kernel logic in interpret mode on CPU;
this script runs the same comparisons compiled by Mosaic on the actual
chip (where layout/miscompile bugs live).  Exit code 0 = all checks pass.

Usage: timeout 600 python scripts/tpu_checks.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def brute_force_closest(tris, ro, rd, eps=1e-4):
    """NumPy Moller-Trumbore closest hit over all triangles."""
    v0, e1, e2 = tris[:, 0:3], tris[:, 3:6], tris[:, 6:9]
    ro = np.asarray(ro, np.float64)[:, None, :]
    rd = np.asarray(rd, np.float64)[:, None, :]
    p = np.cross(rd, e2[None])
    det = np.sum(e1[None] * p, axis=-1)
    ok = np.abs(det) >= 1e-8
    inv = 1.0 / np.where(ok, det, 1.0)
    tv = ro - v0[None]
    u = np.sum(tv * p, axis=-1) * inv
    q = np.cross(tv, e1[None])
    v = np.sum(rd * q, axis=-1) * inv
    t = np.sum(e2[None] * q, axis=-1) * inv
    acc = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= eps)
    t = np.where(acc, t, np.inf)
    return t.min(axis=1)


def main():
    from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    from opengl_raytracing_tpu.ops.bvh_mxu import (
        trace_bvh_mxu_paged, trace_bvh_shadow_mxu_paged)

    if jax.default_backend() != "tpu":
        print("WARNING: backend is", jax.default_backend(),
              "- checks exercise interpret mode, not Mosaic")

    tris = np.asarray(gather_triangles(
        make_bunny(3), model_transform((-2, 1.5, 0), 0.5)))
    bvh = prepare_bvh(tris)

    rng = np.random.default_rng(7)
    n = 4096
    ro = np.array([0.0, 2.0, 8.0], np.float32) + rng.normal(
        0, 0.5, (n, 3)).astype(np.float32)
    target = np.array([-2.0, 1.5, 0.0], np.float32) + rng.normal(
        0, 1.5, (n, 3)).astype(np.float32)
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    failures = 0

    # closest hit vs brute force
    h = trace_bvh_mxu_paged(bvh.mxu, jnp.asarray(ro), jnp.asarray(rd))
    t_ref = brute_force_closest(tris, ro, rd)
    t_got = np.asarray(h.t, np.float64)
    t_got = np.where(np.asarray(h.valid), t_got, np.inf)
    both_hit = np.isfinite(t_ref) & np.isfinite(t_got)
    agree = (np.isfinite(t_ref) == np.isfinite(t_got))
    ok_t = np.allclose(t_ref[both_hit], t_got[both_hit], rtol=2e-4,
                       atol=2e-4)
    print(f"closest-hit: hit-agreement {agree.mean():.4f}, "
          f"t match {ok_t} ({both_hit.sum()} hits)")
    if agree.mean() < 0.999 or not ok_t:
        failures += 1

    # ordered walk (shared origin) == unordered, up to t ties
    org = np.array([0.0, 2.0, 8.0], np.float32)
    ro1 = np.broadcast_to(org, rd.shape)
    h_u = trace_bvh_mxu_paged(bvh.mxu, jnp.asarray(ro1), jnp.asarray(rd))
    h_o = trace_bvh_mxu_paged(bvh.mxu, jnp.asarray(ro1), jnp.asarray(rd),
                              shared_origin=jnp.asarray(org), ordered=True)
    t_same = np.allclose(np.asarray(h_u.t), np.asarray(h_o.t),
                         rtol=1e-6, atol=1e-6, equal_nan=True)
    print(f"ordered vs unordered t: {t_same}")
    if not t_same:
        failures += 1

    # shadow any-hit vs closest-hit-derived occlusion
    t_max = jnp.full((n,), 6.0, jnp.float32)
    occ = np.asarray(trace_bvh_shadow_mxu_paged(
        bvh.mxu, jnp.asarray(ro), jnp.asarray(rd), t_max))
    occ_ref = t_ref <= 6.0
    shadow_agree = (occ == occ_ref).mean()
    print(f"shadow any-hit agreement: {shadow_agree:.4f}")
    if shadow_agree < 0.999:
        failures += 1

    # masked culls: active lanes must match the unmasked result exactly
    act_np = rng.random(n) > 0.5
    act = jnp.asarray(act_np)
    h_m = trace_bvh_mxu_paged(bvh.mxu, jnp.asarray(ro), jnp.asarray(rd),
                              active=act)
    t_m = np.where(np.asarray(h_m.valid), np.asarray(h_m.t, np.float64),
                   np.inf)
    m_ok = np.allclose(t_got[act_np], t_m[act_np], rtol=1e-6, atol=1e-6,
                       equal_nan=True)
    occ_m = np.asarray(trace_bvh_shadow_mxu_paged(
        bvh.mxu, jnp.asarray(ro), jnp.asarray(rd), t_max, active=act))
    s_ok = (occ_m[act_np] == occ[act_np]).all() and not occ_m[~act_np].any()
    print(f"masked cull closest match: {m_ok}, shadow match+gate: {s_ok}")
    if not (m_ok and s_ok):
        failures += 1

    # tuple-of-batches wavefront == stacked arrays (multi-light form)
    k = 3
    ros = [jnp.asarray(ro + i * 0.01) for i in range(k)]
    rds = [jnp.asarray(rd) for _ in range(k)]
    wins = [jnp.full((n,), 4.0 + i, jnp.float32) for i in range(k)]
    s_tup = np.asarray(trace_bvh_shadow_mxu_paged(
        bvh.mxu, tuple(ros), tuple(rds), tuple(wins), active=act))
    s_stk = np.asarray(trace_bvh_shadow_mxu_paged(
        bvh.mxu, jnp.stack(ros), jnp.stack(rds), jnp.stack(wins),
        active=jnp.broadcast_to(act[None], (k, n))))
    tup_ok = (s_tup == s_stk).all() and not s_tup[:, ~act_np].any()
    print(f"tuple-of-batches == stacked: {tup_ok}")
    if not tup_ok:
        failures += 1

    # shared-origin wavefront dedup (AO form: SAME origin array per
    # batch -> one origin copy + modulo block map) == plain concat
    from opengl_raytracing_tpu.ops import bvh_mxu as _bm
    org_shared = jnp.asarray(ro)
    s_shared = np.asarray(trace_bvh_shadow_mxu_paged(
        bvh.mxu, (org_shared,) * k, tuple(rds), tuple(wins), active=act))
    prev_sso = _bm.SHARED_SHADOW_ORIGIN
    try:
        _bm.SHARED_SHADOW_ORIGIN = False
        jax.clear_caches()
        s_plain = np.asarray(trace_bvh_shadow_mxu_paged(
            bvh.mxu, (org_shared,) * k, tuple(rds), tuple(wins),
            active=act))
    finally:
        _bm.SHARED_SHADOW_ORIGIN = prev_sso
        jax.clear_caches()
    sso_ok = ((s_shared[:, act_np] == s_plain[:, act_np]).all()
              and not s_shared[:, ~act_np].any())
    print(f"shared-origin wavefront == plain concat: {sso_ok}")
    if not sso_ok:
        failures += 1

    # sparse grid (dynamic prefetched index maps) == dense identity,
    # with a concentrated mask so whole blocks land on the inactive tail
    from opengl_raytracing_tpu.ops import bvh_mxu
    conc = jnp.asarray(act_np & (np.arange(n) < n // 4))
    prev_mode = bvh_mxu._SPARSE_GRID
    try:
        h_s = trace_bvh_mxu_paged(bvh.mxu, jnp.asarray(ro),
                                  jnp.asarray(rd), active=conc)
        occ_s = np.asarray(trace_bvh_shadow_mxu_paged(
            bvh.mxu, jnp.asarray(ro), jnp.asarray(rd), t_max, active=conc))
        bvh_mxu._SPARSE_GRID = not prev_mode
        # the traces are jit-cached and the mode toggle is invisible to
        # the cache key — clear so the second arm actually recompiles
        jax.clear_caches()
        h_d = trace_bvh_mxu_paged(bvh.mxu, jnp.asarray(ro),
                                  jnp.asarray(rd), active=conc)
        occ_d = np.asarray(trace_bvh_shadow_mxu_paged(
            bvh.mxu, jnp.asarray(ro), jnp.asarray(rd), t_max, active=conc))
    finally:
        bvh_mxu._SPARSE_GRID = prev_mode
        jax.clear_caches()
    csel = np.asarray(conc)
    sg_ok = (np.array_equal(np.asarray(h_s.valid)[csel],
                            np.asarray(h_d.valid)[csel])
             and np.array_equal(np.asarray(h_s.t)[csel],
                                np.asarray(h_d.t)[csel])
             and np.array_equal(occ_s, occ_d))
    print(f"sparse grid == dense grid: {sg_ok}")
    if not sg_ok:
        failures += 1

    # accum planes layout: small full-pipeline frame, both layouts,
    # checksums must match exactly on hardware (r3: ORT_ACCUM_PLANES)
    from opengl_raytracing_tpu.models import (FrameInputs, RenderState,
                                              render_frame, preset)
    from opengl_raytracing_tpu import Camera
    params = preset("baseline")
    cam = Camera()
    hh, ww = 96, 128
    cam.aspect = ww / hh
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))

    def frames3():
        st = RenderState.create(hh, ww)
        out = None
        for _ in range(3):
            st, out = render_frame(params, fin, st, None, bvh,
                                   height=hh, width=ww, use_bvh=True)
        return np.asarray(out.image)

    img_default = frames3()
    os.environ["ORT_ACCUM_PLANES"] = "1"
    try:
        jax.clear_caches()
        img_planes = frames3()
    finally:
        del os.environ["ORT_ACCUM_PLANES"]
        jax.clear_caches()
    pl_ok = np.array_equal(img_default, img_planes)
    print(f"accum planes layout == default: {pl_ok}")
    if not pl_ok:
        failures += 1

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
