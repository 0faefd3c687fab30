"""Per-component TPU performance report -> PERF.md.

Each measurement runs in a timed child process (the tunneled worker can
wedge on big compiles); results accumulate in PERF.md so a partial sweep
still records what it got.

Usage: python scripts/perf_report.py             # full sweep
       python scripts/perf_report.py --child KEY # one measurement
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

H, W = 1080, 1920

CASES = [
    "trace_primary", "trace_shadow6", "frame_baseline_bvh",
    "frame_full_bvh", "frame_baseline_analytic", "frame_full_analytic",
    "svgf_jnp", "svgf_pallas",
]

# PERF.md is curated prose + ONE auto-generated table; the sweep only
# rewrites the text between these markers.
MARK_S = "<!-- perf-report:start -->"
MARK_E = "<!-- perf-report:end -->"


from benchscene import bunny_bvh as _scene  # shared scene/camera


def _rays():
    from benchscene import camera_rays
    ro, d, _ = camera_rays(H, W)
    return ro, d


def _time(jfn, *args):
    import jax
    s = jfn(*args)
    float(jax.tree.leaves(s)[0])
    t0 = time.time()
    s = jfn(*args)
    float(jax.tree.leaves(s)[0])
    return (time.time() - t0)


def child(key: str) -> None:
    import jax
    import jax.numpy as jnp
    from opengl_raytracing_tpu.models import (FrameInputs, RenderState,
                                              render_frame, preset)
    from opengl_raytracing_tpu import Camera, RenderParams

    if key.startswith("trace"):
        bvh = _scene()
        ro, d = _rays()
        from opengl_raytracing_tpu.ops.bvh_mxu import (
            trace_bvh_mxu_paged, trace_bvh_shadow_mxu_paged)
        if key == "trace_primary":
            @jax.jit
            def fn(d):
                s = 0.
                for i in range(8):
                    s = s + jnp.sum(trace_bvh_mxu_paged(
                        bvh.mxu, ro, d + i * 1e-7).t.clip(0, 1e3))
                return s
            dt = _time(fn, d) / 8
            rays = H * W
        else:  # 6-ray batched shadow (the direct-light wavefront shape)
            @jax.jit
            def fn(d):
                s = 0.
                ro6 = jnp.broadcast_to(ro, (6,) + ro.shape)
                tm = jnp.full((6, H, W), 8.0)
                for i in range(4):
                    d6 = jnp.stack([d + k * 1e-4 for k in range(6)])
                    s = s + jnp.sum(trace_bvh_shadow_mxu_paged(
                        bvh.mxu, ro6, d6 + i * 1e-7, tm))
                return s
            dt = _time(fn, d) / 4
            rays = H * W * 6
        print(json.dumps({"key": key, "ms": round(dt * 1e3, 2),
                          "mrays": round(rays / dt / 1e6, 1)}))
        return

    if key.startswith("frame"):
        _, pname, scene_kind = key.split("_")
        params = preset(pname)
        bvh = _scene() if scene_kind == "bvh" else None
        cam = Camera()
        cam.aspect = W / H
        right, up, fwd, thf = cam.basis()
        vp = cam.view_projection()
        fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                          jnp.asarray(up), jnp.asarray(fwd),
                          jnp.float32(thf), jnp.float32(cam.aspect),
                          jnp.zeros(2, jnp.float32), jnp.asarray(vp),
                          jnp.asarray(vp), jnp.int32(0))

        @jax.jit
        def fn(fin, state):
            s = 0.
            for i in range(4):
                f2 = FrameInputs(fin.cam_pos, fin.cam_right, fin.cam_up,
                                 fin.cam_fwd, fin.tan_half_fov, fin.aspect,
                                 fin.jitter + i * 1e-5, fin.curr_view_proj,
                                 fin.prev_view_proj, fin.camera_moved)
                state, out = render_frame(
                    params, f2, state, None, bvh, height=H, width=W,
                    use_bvh=scene_kind == "bvh")
                s = s + jnp.sum(out.image)
            return s
        dt = _time(fn, fin, RenderState.create(H, W)) / 4
        print(json.dumps({"key": key, "ms": round(dt * 1e3, 2),
                          "fps": round(1000 / (dt * 1e3), 1)}))
        return

    if key.startswith("svgf"):
        import numpy as np
        from opengl_raytracing_tpu.ops.svgf import svgf_filter
        from opengl_raytracing_tpu.ops.svgf_pallas import svgf_filter_pallas
        rng = np.random.RandomState(0)
        accum = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
        motion = jnp.asarray(0.01 * rng.randn(H, W, 2).astype(np.float32))
        gpos = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))
        gnrm = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))
        p = RenderParams()
        impl = svgf_filter if key == "svgf_jnp" else svgf_filter_pallas

        @jax.jit
        def fn(accum):
            s = 0.
            for i in range(4):
                s = s + jnp.sum(impl(accum + i * 1e-6, motion, gpos, gnrm, p))
            return s
        dt = _time(fn, accum) / 4
        print(json.dumps({"key": key, "ms": round(dt * 1e3, 2)}))
        return

    raise SystemExit(f"unknown case {key}")


def _write_report(results) -> None:
    """Patch the marked table into PERF.md (prose preserved)."""
    perf_path = os.path.join(os.path.dirname(_SCRIPTS), "PERF.md")
    table = ("| case | result |\n|---|---|\n"
             + "".join(f"| {k} | `{json.dumps(v)}` |\n"
                       for k, v in results.items()))
    block = f"{MARK_S}\n{table}{MARK_E}"
    try:
        with open(perf_path) as fh:
            doc = fh.read()
    except FileNotFoundError:
        doc = ("# PERF — per-component timings (1 TPU v5e chip, "
               f"{W}x{H})\n\nGenerated by scripts/perf_report.py.\n\n")
    if MARK_S in doc and MARK_E in doc:
        pre, rest = doc.split(MARK_S, 1)
        _, post = rest.split(MARK_E, 1)
        doc = pre + block + post
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    with open(perf_path, "w") as fh:
        fh.write(doc)


def main() -> int:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return 0
    from childproc import run_child, probe_alive
    # liveness pre-gate: a wedged worker fails each case in 180s instead
    # of burning 8 x 540s of timeouts (it can stay down for hours)
    timeout_s = 540 if probe_alive() else 180
    if timeout_s == 180:
        print(json.dumps({"note": "liveness probe failed; "
                          "shortening per-case timeouts"}), flush=True)
    results = {}
    for key in CASES:
        results[key] = run_child(
            [sys.executable, os.path.abspath(__file__), "--child", key],
            timeout_s)
        print(key, results[key], flush=True)
        # write after EVERY case: an outer wall-clock kill mid-sweep
        # still leaves the completed measurements in PERF.md
        _write_report(results)
    print("wrote PERF.md (marked table only; prose preserved)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
