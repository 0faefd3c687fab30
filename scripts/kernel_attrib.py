"""Closest-hit kernel stage attribution on hardware.

Times the PRIMARY trace alone (the bench camera, production swizzle
order) under the ORT_KERN_VARIANT compile-time kernel variants:

  full -> noepi   = per-chunk VPU epilogue cost
  noepi -> nof    = (nothing: nof keeps the epilogue; see below)
  full -> nof     = per-subtile feature-expansion cost
  nof/noepi -> nowalk = matmul issue + loop-over-window cost
  nowalk          = grid/subtile scan skeleton + init writes + launch

Each variant is a separate CHILD process (KERN_VARIANT binds at
import).  Frames chain device-side; time via checksum readback
(CLAUDE.md: block_until_ready lies on axon).

Usage: python scripts/kernel_attrib.py            # parent, all variants
       ORT_KERN_VARIANT=noepi python scripts/kernel_attrib.py --child
"""

import json
import os
import subprocess
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))

H, W = 1080, 1920
REPS = int(os.environ.get("KA_REPS", "16"))


def child():
    import jax
    if os.environ.get("KA_CPU") == "1":
        # the axon plugin overrides JAX_PLATFORMS (CLAUDE.md) — force
        # before any backend init
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from bench import _scene
    from scripts.benchscene import camera_rays
    from opengl_raytracing_tpu.models.pipeline import swizzle
    from opengl_raytracing_tpu.ops import bvh_mxu as bm

    subdiv = int(os.environ.get("KA_SUBDIV", "4"))
    pos = ((-2.0, 1.6, 1.2) if os.environ.get("KA_CLOSE") == "1"
           else (0.0, 2.0, 8.0))
    tris, bvh = _scene(subdiv)
    ro, rd, origin = camera_rays(H, W, pos=pos, look=(-2.0, 1.5, 0.0))
    multi = len(bvh.mxu) > 1
    if multi:  # production swizzle policy
        ro = swizzle(ro, H, W)
        rd = swizzle(rd, H, W)
    ro = jnp.asarray(ro).reshape(-1, 3)
    rd = jnp.asarray(rd).reshape(-1, 3)

    def chain(ro, rd):
        # REPS dependent traces in one dispatch: each iteration
        # perturbs rd infinitesimally from the previous checksum so
        # the compiler cannot CSE the traces
        acc = jnp.float32(0.0)
        d = rd
        for _ in range(REPS):
            h = bm.trace_bvh_mxu_paged(bvh.mxu, ro, d,
                                       shared_origin=origin)
            s = jnp.sum(jnp.where(jnp.isfinite(h.t), h.t, 0.0))
            acc = acc + s
            # serialize with a BOUNDED, representable perturbation: the
            # previous `s * 1e-30` exploded once s grew (reps 2+ traced
            # garbage rays that missed everything — r4d/r5b absolute
            # numbers are ~REPS-times understated; deltas survive)
            d = d + jnp.clip(s, -1.0, 1.0) * 1e-7
        return acc

    fn = jax.jit(chain)
    out = float(fn(ro, rd))  # compile + warm
    t0 = time.time()
    out = float(fn(ro, rd))
    dt = time.time() - t0
    print(json.dumps({
        "variant": os.environ.get("ORT_KERN_VARIANT", "full"),
        "ms_per_trace": round(dt / REPS * 1e3, 3),
        "reps": REPS, "pages": len(bvh.mxu), "tris": int(tris.shape[0]),
        "checksum": out,
        "gsort": os.environ.get("ORT_GROUP_SORT", "0"),
    }))


def main():
    if "--child" in sys.argv:
        child()
        return
    variants = os.environ.get("KA_VARIANTS",
                              "full,noepi,nof,nowalk").split(",")
    for v in variants:
        env = dict(os.environ, ORT_KERN_VARIANT=v)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--child"], env=env, timeout=900, check=False)


if __name__ == "__main__":
    main()
