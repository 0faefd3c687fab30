"""A/B tuning harness for the MXU trace kernels on real TPU hardware.

Runs the bare primary-ray trace and the full baseline-preset frame at
1080p for each variant (spawned as child processes so env-var knobs take
effect and a wedged TPU doesn't kill the sweep).

Usage: python scripts/tpu_tune.py            # sweep
       python scripts/tpu_tune.py --child trace|frame
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

VARIANTS = [
    {"name": "subtiles32", "ORT_SUBTILES": "32"},
    {"name": "subtiles64", "ORT_SUBTILES": "64"},
    {"name": "subtiles16", "ORT_SUBTILES": "16"},
]


def child(mode: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from opengl_raytracing_tpu.scene import build_bvh, make_bunny, \
        gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.bvh_mxu import build_mxu_arrays, \
        trace_bvh_mxu

    H, W = 1080, 1920
    tris = gather_triangles(make_bunny(4),
                            model_transform((-2, 1.5, 0), 0.5))
    mxu = build_mxu_arrays(build_bvh(tris))

    import math
    ys = (jnp.arange(H)[:, None] + 0.5) / H * 2 - 1
    xs = (jnp.arange(W)[None, :] + 0.5) / W * 2 - 1
    thf = math.tan(math.radians(30))
    d = (jnp.asarray([0., 0., -1.])
         + xs[..., None] * jnp.asarray([1., 0., 0.]) * (thf * W / H)
         + ys[..., None] * jnp.asarray([0., 1., 0.]) * thf)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.broadcast_to(jnp.asarray([0., 2., 8.]), d.shape)

    if mode == "trace":
        @jax.jit
        def many(d):
            s = 0.
            for i in range(8):
                s = s + jnp.sum(trace_bvh_mxu(mxu, ro, d + i * 1e-7)
                                .t.clip(0, 1e3))
            return s
        float(many(d))
        t0 = time.time()
        float(many(d))
        dt = (time.time() - t0) / 8
        print(json.dumps({"ms": round(dt * 1e3, 2),
                          "mrays": round(H * W / dt / 1e6, 1)}))
    else:  # frame
        from opengl_raytracing_tpu.models import (FrameInputs, RenderState,
                                                  render_frame, preset)
        from opengl_raytracing_tpu.ops.scene import prepare_bvh
        from opengl_raytracing_tpu import Camera
        params = preset("baseline")
        bvh = prepare_bvh(tris)
        cam = Camera()
        cam.aspect = W / H
        right, up, fwd, thf2 = cam.basis()
        vp = cam.view_projection()
        fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                          jnp.asarray(up), jnp.asarray(fwd),
                          jnp.float32(thf2), jnp.float32(cam.aspect),
                          jnp.zeros(2, jnp.float32), jnp.asarray(vp),
                          jnp.asarray(vp), jnp.int32(0))

        @jax.jit
        def many(fin, state):
            s = 0.
            for i in range(4):
                f2 = FrameInputs(fin.cam_pos, fin.cam_right, fin.cam_up,
                                 fin.cam_fwd, fin.tan_half_fov, fin.aspect,
                                 fin.jitter + i * 1e-5, fin.curr_view_proj,
                                 fin.prev_view_proj, fin.camera_moved)
                state, out = render_frame(params, f2, state, None, bvh,
                                          height=H, width=W, use_bvh=True)
                s = s + jnp.sum(out.image)
            return state, s
        st = RenderState.create(H, W)
        st, s = many(fin, st)
        float(s)
        st = RenderState.create(H, W)
        t0 = time.time()
        st, s = many(fin, st)
        float(s)
        dt = (time.time() - t0) / 4
        print(json.dumps({"ms": round(dt * 1e3, 2)}))


def main() -> int:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return 0
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from childproc import run_child
    for mode in ("trace", "frame"):
        for var in VARIANTS:
            env = dict(os.environ)
            env.update({k: v for k, v in var.items() if k != "name"})
            # run_child records a timeout as an error row — a wedged TPU
            # must not abort the remaining variants
            rec = run_child([sys.executable, os.path.abspath(__file__),
                             "--child", mode], 540, env=env)
            print(mode, var["name"], json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
