"""Camera-distance sweep for the ordered-primary auto threshold.

VERDICT r2 weak #2: ORDERED_AUTO_FACTOR=1.5 (ops/scene.py) was derived
from ONE close/far pair; this sweep measures {ordered, unordered} at 6
camera distances on the BVH-heavy scene (81,920 tris, 1080p) so the
threshold can be picked from data.  For each distance it also prints the
distance/diagonal ratio the auto heuristic compares against, so the
crossover point reads directly off the output.

Usage: python scripts/ordered_sweep.py              # full sweep
       python scripts/ordered_sweep.py --case d2_ordered   # one child
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

H, W = 1080, 1920

# Bunny-blob centred near (-2, 1.5, 0) with AABB diagonal ~1.2 after
# scale 0.5 — distances step from "inside the silhouette" to "whole
# scene in a few tiles".
LOOK = (-2.0, 1.5, 0.0)
DISTS = [0.8, 1.2, 1.8, 2.7, 4.0, 8.0]


def _pos(dist):
    # back off along +z/+y like the bench close/far cameras
    import numpy as np
    d = np.asarray([0.35, 0.25, 0.9])
    d = d / np.linalg.norm(d)
    return tuple(np.asarray(LOOK) + d * dist)


def child(key: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from benchscene import bunny_bvh, camera_rays
    from opengl_raytracing_tpu.app.state import _tris_aabb

    idx, mode = key.split("_")
    dist = DISTS[int(idx[1:])]
    bvh = bunny_bvh(subdiv=6)  # BVH-heavy rows use the 81,920-tri blob
    pos = _pos(dist)
    ro, d, origin = camera_rays(H, W, pos=pos, look=LOOK)
    from opengl_raytracing_tpu.ops.bvh_mxu import trace_bvh_mxu_paged
    kw = (dict(shared_origin=origin, ordered=True)
          if mode == "ordered" else {})

    @jax.jit
    def fn(d):
        s = 0.
        for i in range(4):
            h = trace_bvh_mxu_paged(bvh.mxu, ro, d + i * 1e-7, **kw)
            s = s + jnp.sum(h.t.clip(0, 1e3)) + jnp.sum(h.valid)
        return s

    chk = float(fn(d))
    t0 = time.time()
    float(fn(d))
    dt = (time.time() - t0) / 4

    # the ratio resolve_ordered_primary compares to ORDERED_AUTO_FACTOR
    from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.constants import (DEFAULT_BVH_TRANSLATE,
                                                 DEFAULT_BVH_SCALE)
    tris = gather_triangles(make_bunny(6),
                            model_transform(DEFAULT_BVH_TRANSLATE,
                                            DEFAULT_BVH_SCALE))
    aabb = _tris_aabb(tris)
    lo, hi = np.asarray(aabb[0]), np.asarray(aabb[1])
    diag = float(np.linalg.norm(hi - lo))
    center = (lo + hi) / 2
    ratio = float(np.linalg.norm(np.asarray(pos) - center)) / max(diag, 1e-6)

    print(json.dumps({"key": key, "dist": dist, "ratio": round(ratio, 3),
                      "ms": round(dt * 1e3, 2),
                      "mrays": round(H * W / dt / 1e6, 1),
                      "checksum": chk}))


def main() -> int:
    from childproc import run_child
    for i in range(len(DISTS)):
        for mode in ("ordered", "unordered"):
            key = f"d{i}_{mode}"
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
