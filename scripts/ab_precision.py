"""A/B the closest-hit MT matmul precision modes on TPU.

Runs trace_primary (1080p bunny, 8-rep chained) and one baseline BVH
frame per mode in child processes (ORT_MT_PRECISION read at import), and
reports timing, hit parity vs the `highest` reference, and tonemapped
image deltas.  Decides whether `mixed` (bf16 u/v + f32 det/t; 58% of the
MXU passes) can become the production default.

Usage: python scripts/ab_precision.py            # all modes
       python scripts/ab_precision.py --child M  # one mode
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

H = int(os.environ.get("AB_HEIGHT", "1080"))
W = int(os.environ.get("AB_WIDTH", "1920"))
MODES = ["highest", "mixed", "default"]


def child(mode: str) -> None:
    os.environ["ORT_MT_PRECISION"] = mode
    import numpy as np
    import jax
    if os.environ.get("AB_FORCE_CPU") == "1":
        # smoke-testing the harness off-TPU: the axon plugin overrides
        # JAX_PLATFORMS, so force the backend before first use
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from opengl_raytracing_tpu.ops.bvh_mxu import trace_bvh_mxu_paged
    from benchscene import bunny_bvh, camera_rays

    bvh = bunny_bvh()
    ro, d, _ = camera_rays(H, W)

    @jax.jit
    def fn(d):
        s = 0.
        for i in range(8):
            s = s + jnp.sum(trace_bvh_mxu_paged(
                bvh.mxu, ro, d + i * 1e-7).t.clip(0, 1e3))
        return s

    float(fn(d))  # compile
    t0 = time.time()
    chk = float(fn(d))
    dt = (time.time() - t0) / 8

    h = trace_bvh_mxu_paged(bvh.mxu, ro, d)
    t_np = np.asarray(h.t)
    valid = np.asarray(h.valid)
    np.save(f"/tmp/ab_prec_{mode}_t.npy",
            np.where(valid, t_np, np.inf).astype(np.float32))
    np.save(f"/tmp/ab_prec_{mode}_n.npy", np.asarray(h.n, np.float32))
    print(json.dumps({
        "mode": mode, "ms": round(dt * 1e3, 2),
        "mrays": round(H * W / dt / 1e6, 1),
        "checksum": round(chk, 1), "hits": int(valid.sum())}))


def main() -> int:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return 0
    import numpy as np
    from childproc import run_child
    # stale .npy files from a previous run (possibly at another
    # resolution) must never masquerade as this run's reference
    for mode in MODES:
        for sfx in ("t", "n"):
            try:
                os.remove(f"/tmp/ab_prec_{mode}_{sfx}.npy")
            except FileNotFoundError:
                pass
    results = {}
    for mode in MODES:
        results[mode] = run_child(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            480)
        print(mode, results[mode], flush=True)

    if "error" in results.get("highest", {"error": "missing"}):
        print("compare skipped: highest-precision reference failed")
        return 0
    try:
        ref_t = np.load("/tmp/ab_prec_highest_t.npy")
        ref_n = np.load("/tmp/ab_prec_highest_n.npy")
        for mode in MODES[1:]:
            if "error" in results.get(mode, {"error": 1}):
                continue
            t = np.load(f"/tmp/ab_prec_{mode}_t.npy")
            n = np.load(f"/tmp/ab_prec_{mode}_n.npy")
            both = np.isfinite(ref_t) & np.isfinite(t)
            flips = int((np.isfinite(ref_t) != np.isfinite(t)).sum())
            dt_rel = (np.abs(t[both] - ref_t[both])
                      / np.maximum(ref_t[both], 1e-6))
            dn = np.abs(n - ref_n).max(axis=-1)[both]
            print(json.dumps({
                "mode": mode, "hit_flips": flips,
                "flip_ppm": round(flips / ref_t.size * 1e6, 1),
                "t_rel_max": float(dt_rel.max()) if both.any() else 0.0,
                "t_rel_p999": (float(np.quantile(dt_rel, 0.999))
                               if both.any() else 0.0),
                "n_absdiff_p999": (float(np.quantile(dn, 0.999))
                                   if both.any() else 0.0)}))
    except FileNotFoundError as e:
        print(f"compare skipped: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
