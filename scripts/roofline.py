"""Measured device ceilings + kernel work accounting (VERDICT r2 #3).

Turns the PERF.md roofline from projection into measurement:

  gemm_bf16   achieved MXU TFLOP/s, 1-pass bf16 (the kernel's default
              matmul mode) — chained [N,N]x[N,N] scan
  gemm_f32    achieved TFLOP/s at HIGHEST (6-pass) — effective flops
              counted as 1x (what f32-precision work actually yields)
  stream      achieved HBM GB/s — chained elementwise scan over a
              256 MB array (scan carries materialize per step, so
              fusion cannot collapse the chain)
  noop        dispatch + readback floor of the same scan harness
  mt_work     the bench-scene primary trace's exact kernel work per
              frame (chunk merges, matmul FLOPs, coef DMA bytes),
              counted from the cull plan on host — divide by the
              ablation's measured primary-kernel ms and the ceilings
              above for the utilization split.

Each case prints one JSON line; run on TPU (any backend works for
mt_work).  ROOFLINE_STEPS/ROOFLINE_N override sizes.
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))

if os.environ.get("ROOFLINE_CPU") == "1":
    # the axon plugin overrides JAX_PLATFORMS; jax.config is authoritative
    import jax
    jax.config.update("jax_platforms", "cpu")

STEPS = int(os.environ.get("ROOFLINE_STEPS", "32"))
N = int(os.environ.get("ROOFLINE_N", "4096"))


def _timed(run, *args):
    import numpy as np
    _ = float(np.asarray(run(*args)))          # warmup/compile + readback
    t0 = time.time()
    s = float(np.asarray(run(*args)))
    return time.time() - t0, s


def case_gemm(precision_name):
    import jax
    import jax.numpy as jnp
    prec = {"bf16": jax.lax.Precision.DEFAULT,
            "f32": jax.lax.Precision.HIGHEST}[precision_name]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, N), jnp.float32)
    w = jax.random.normal(key, (N, N), jnp.float32) / (N ** 0.5)

    @jax.jit
    def run(x, w):
        def body(y, _):
            return jnp.dot(y, w, precision=prec), None
        y, _ = jax.lax.scan(body, x, None, length=STEPS)
        return jnp.sum(jnp.abs(y))

    dt, _ = _timed(run, x, w)
    flops = 2.0 * N * N * N * STEPS
    return {"case": f"gemm_{precision_name}", "n": N, "steps": STEPS,
            "ms": round(dt * 1e3, 2),
            "tflops": round(flops / dt / 1e12, 2)}


def case_stream():
    import jax
    import jax.numpy as jnp
    m = 8192
    x = jnp.ones((m, m), jnp.float32)

    @jax.jit
    def run(x):
        def body(y, _):
            return y * 1.000001 + 1e-6, None
        y, _ = jax.lax.scan(body, x, None, length=STEPS)
        return jnp.sum(y[0])

    dt, _ = _timed(run, x)
    gb = 2.0 * m * m * 4 * STEPS / 1e9       # read + write per step
    return {"case": "stream", "mb_array": m * m * 4 // 2 ** 20,
            "steps": STEPS, "ms": round(dt * 1e3, 2),
            "gbps": round(gb / dt, 1)}


def case_noop():
    import jax
    import jax.numpy as jnp
    x = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def run(x):
        def body(y, _):
            return y, None
        y, _ = jax.lax.scan(body, x, None, length=STEPS)
        return jnp.sum(y)

    dt, _ = _timed(run, x)
    return {"case": "noop", "ms": round(dt * 1e3, 2)}


def case_vpu():
    """Elementwise f32 op ceiling (the VPU roofline the analytic
    megakernel an_pallas lives against): K fused mul-adds per element
    on a VMEM-resident block, chained so HBM traffic is negligible."""
    import jax
    import jax.numpy as jnp
    m = 1024           # 4 MB block: fits VMEM, HBM-traffic-free loop
    k = 64             # fused ops per scan step
    x = jnp.full((m, m), 1.0000001, jnp.float32)

    @jax.jit
    def run(x):
        def body(y, _):
            for _ in range(k):
                y = y * 1.0000001 + 1e-9
            return y, None
        y, _ = jax.lax.scan(body, x, None, length=STEPS)
        return jnp.sum(y[0])

    dt, _ = _timed(run, x)
    gops = 2.0 * m * m * k * STEPS / 1e9     # mul+add per fused op
    return {"case": "vpu", "ms": round(dt * 1e3, 2),
            "gops": round(gops / dt, 1)}


def case_mt_work():
    """Exact per-frame kernel work of the bench primary trace, counted
    from the cull plan (no kernel launch): what the unordered GROUP walk
    actually multiplies and streams."""
    import numpy as np
    import jax.numpy as jnp
    import bench
    from opengl_raytracing_tpu import Camera
    from opengl_raytracing_tpu.ops import bvh_mxu as bm

    H, W = 1080, 1920
    tris, bvh = bench._scene(4)
    cam = Camera()
    cam.aspect = W / H
    from opengl_raytracing_tpu.models.pipeline import primary_rays
    from opengl_raytracing_tpu.ops.scene import SceneCtx
    from opengl_raytracing_tpu.models import preset
    params = preset("baseline")
    fin = bench._fin(cam)
    scene = SceneCtx.create(params, fin.cam_pos, env_map=None,
                            use_bvh=True, bvh=bvh)
    # the 1-page bunny auto-selects the unswizzled row-major stream, so
    # the full-grid flatten below IS the production tile order
    _, _, rd = primary_rays(H, W, fin, params)
    rd = rd.reshape(-1, 3)
    ro = jnp.broadcast_to(jnp.asarray(fin.cam_pos), rd.shape)
    shape, n, ro_soa, rd_soa, _, act = bm._pad_tiles(ro, rd)
    hulls = bm._tile_hulls(ro_soa, rd_soa, act,
                           shared_origin=fin.cam_pos)
    merges = 0
    for page in bm._as_pages(scene.bvh.mxu):
        cull = bm._tile_chunk_ranges(page.chunk_bounds, hulls)
        gn = np.asarray(cull[5])
        merges += int(gn.sum()) * bm.GROUP
    flops = merges * 2 * (2 * 256 * bm.KDIM * 128)   # two matmuls/merge
    # the merge epilogue is ~18 (11 with ORT_DEFER_NORMAL) elementwise
    # [128,128] f32 passes per chunk (t/acc/select/winner extraction)
    epi = merges * 18 * 128 * 128
    rays = int(np.prod(np.asarray(shape)))
    return {"case": "mt_work", "rays": rays, "chunk_merges": merges,
            "matmul_gflop_per_frame": round(flops / 1e9, 2),
            "epilogue_gvpu_ops": round(epi / 1e9, 2),
            # coef blocks are whole-array VMEM inputs: HBM cost is one
            # upload per launch, the per-merge rereads are VMEM-side
            "coef_hbm_mb_per_launch": round(
                sum(p.coef_uv.nbytes + p.coef_dt.nbytes
                    for p in bm._as_pages(scene.bvh.mxu)) / 2 ** 20, 1),
            "ray_plane_mb": round(rays * 3 * 4 / 2 ** 20, 1)}


def main():
    import jax
    which = os.environ.get("ROOFLINE_CASES",
                           "noop,stream,gemm_bf16,gemm_f32,mt_work,vpu")
    for case in which.split(","):
        case = case.strip()
        try:
            if case == "noop":
                rec = case_noop()
            elif case == "stream":
                rec = case_stream()
            elif case == "gemm_bf16":
                rec = case_gemm("bf16")
            elif case == "gemm_f32":
                rec = case_gemm("f32")
            elif case == "mt_work":
                rec = case_mt_work()
            elif case == "vpu":
                rec = case_vpu()
            else:
                rec = {"case": case, "error": "unknown"}
        except Exception as exc:  # record, keep sweeping
            rec = {"case": case, "error": repr(exc)[:200]}
        rec["backend"] = jax.default_backend()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
