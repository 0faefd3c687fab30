"""Close-up vs far BVH-heavy timing: ordered front-to-back walk vs
unordered chunk walk (run on the real TPU chip).

The close-up camera defeats the interval cull (every tile's frustum
overlaps most of the BVH), so the unordered walk intersects nearly all
chunks for every tile.  The ordered walk visits chunks front-to-back in
camera distance and stops a tile once every ray's best-t is closer than
the next chunk's AABB — the fix for the 264ms close-up case.

Usage: python scripts/close_far.py [--case KEY]   (child per case)
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

H, W = 1080, 1920

CASES = ["close_unordered", "close_ordered", "far_unordered", "far_ordered"]


from benchscene import bunny_bvh as _scene  # shared scene/camera


def _rays(pos, look):
    from benchscene import camera_rays
    return camera_rays(H, W, pos=pos, look=look)


def child(key: str) -> None:
    import jax
    import jax.numpy as jnp
    from opengl_raytracing_tpu.ops.bvh_mxu import trace_bvh_mxu_paged
    bvh = _scene()
    dist, ordered = key.split("_")
    # bunny centred near (-2, 1.5, 0), radius ~0.6 after scale 0.5
    pos = (-2.0, 1.6, 1.0) if dist == "close" else (0.0, 2.0, 8.0)
    ro, d, origin = _rays(pos, (-2.0, 1.5, 0.0))
    kw = (dict(shared_origin=origin, ordered=True)
          if ordered == "ordered" else {})

    @jax.jit
    def fn(d):
        s = 0.
        for i in range(4):
            h = trace_bvh_mxu_paged(bvh.mxu, ro, d + i * 1e-7, **kw)
            s = s + jnp.sum(h.t.clip(0, 1e3)) + jnp.sum(h.valid)
        return s
    s = fn(d); chk = float(s)
    t0 = time.time(); s = fn(d); float(s)
    dt = (time.time() - t0) / 4
    print(json.dumps({"key": key, "ms": round(dt * 1e3, 2),
                      "mrays": round(H * W / dt / 1e6, 1),
                      "checksum": chk}))


def main() -> int:
    # run_child: a wedged/crashed child records an error row instead of
    # raising TimeoutExpired and killing the remaining cases
    from childproc import run_child
    for key in CASES:
        rec = run_child([sys.executable, os.path.abspath(__file__),
                         "--case", key], 900)
        rec.setdefault("key", key)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    if "--case" in sys.argv:
        child(sys.argv[sys.argv.index("--case") + 1])
    else:
        sys.exit(main())
