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
import math
import subprocess
import sys
import time

sys.path.insert(0, ".")

H, W = 1080, 1920

CASES = ["close_unordered", "close_ordered", "far_unordered", "far_ordered"]


def _scene():
    from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    tris = gather_triangles(make_bunny(4),
                            model_transform((-2, 1.5, 0), 0.5))
    return prepare_bvh(tris)


def _rays(pos, look):
    import numpy as np
    import jax.numpy as jnp
    fwd = np.asarray(look, np.float32) - np.asarray(pos, np.float32)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0., 1., 0.]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    ys = (jnp.arange(H)[:, None] + 0.5) / H * 2 - 1
    xs = (jnp.arange(W)[None, :] + 0.5) / W * 2 - 1
    thf = math.tan(math.radians(30))
    d = (jnp.asarray(fwd)
         + xs[..., None] * jnp.asarray(right) * (thf * W / H)
         + ys[..., None] * jnp.asarray(up) * thf)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.broadcast_to(jnp.asarray(pos, jnp.float32), d.shape)
    return ro, d, jnp.asarray(pos, jnp.float32)


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
    for key in CASES:
        r = subprocess.run([sys.executable, __file__, "--case", key],
                           capture_output=True, text=True, timeout=900)
        line = (r.stdout.strip().splitlines() or ["(no output)"])[-1]
        print(line, flush=True)
        if r.returncode != 0:
            print(r.stderr[-800:], file=sys.stderr)
    return 0


if __name__ == "__main__":
    if "--case" in sys.argv:
        child(sys.argv[sys.argv.index("--case") + 1])
    else:
        sys.exit(main())
