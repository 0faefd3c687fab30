"""Why does the close-camera primary trace cost ~13 ms in
kernel_attrib but ~48 ms in the ablate prefix?  Runs BOTH formulations
in ONE child on identical scene/camera so the delta is attributable:

  ka    — kernel_attrib's form: benchscene.camera_rays + swizzle +
          trace_bvh_mxu_paged(shared_origin)
  ab    — ablate's form: SceneCtx + swizzled_pixel_centers +
          primary_dirs + scene.trace(shared_origin, ordered=False)
  ab_kr — ablate's pipeline plumbing but kernel_attrib's RAYS
          (isolates ray-stream construction vs trace dispatch)

Usage: python scripts/diag_primary.py   (TPU; DP_* env knobs below)
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

H = int(os.environ.get("DP_H", "1080"))
W = int(os.environ.get("DP_W", "1920"))
REPS = int(os.environ.get("DP_REPS", "4"))
SUBDIV = int(os.environ.get("DP_SUBDIV", "6"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _scene, CLOSE_POS, LOOK_AT
    from benchscene import camera_rays
    from opengl_raytracing_tpu import Camera
    from opengl_raytracing_tpu.models import preset
    from opengl_raytracing_tpu.models.pipeline import (
        swizzle, swizzled_pixel_centers, _swizzle_pads,
        _swizzle_for_scene, primary_dirs, FrameInputs)
    from opengl_raytracing_tpu.ops.scene import SceneCtx
    from opengl_raytracing_tpu.ops import bvh_mxu as bm

    tris, bvh = _scene(SUBDIV)
    params = preset("baseline")

    # --- ka rays ---
    ro_ka, rd_ka, origin = camera_rays(H, W, pos=CLOSE_POS, look=LOOK_AT)
    multi = len(bvh.mxu) > 1
    if multi:
        ro_ka = swizzle(ro_ka, H, W)
        rd_ka = swizzle(rd_ka, H, W)
    ro_ka = jnp.asarray(ro_ka).reshape(-1, 3)
    rd_ka = jnp.asarray(rd_ka).reshape(-1, 3)

    # --- ab rays (the ablate/_setup path) ---
    cam = Camera(position=np.asarray(CLOSE_POS, np.float32))
    cam.aspect = W / H
    cam.point_at(LOOK_AT)
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))
    scene0 = SceneCtx.create(params, fin.cam_pos, env_map=None,
                             use_bvh=True, bvh=bvh)
    pads = _swizzle_pads(H, W, enabled=_swizzle_for_scene(scene0))

    def ab_rays():
        if pads is not None:
            px, py = swizzled_pixel_centers(H, W, *pads)
            rd = primary_dirs(px, py, H, W, fin, params)
        else:
            from opengl_raytracing_tpu.models.pipeline import primary_rays
            px, py, rd = primary_rays(H, W, fin, params)
        ro = jnp.broadcast_to(fin.cam_pos, rd.shape)
        return ro, rd

    def chain(body):
        def fn(x):
            acc = jnp.float32(0.0)
            d = x
            for _ in range(REPS):
                t = body(d)
                s = jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
                acc = acc + s
                d = d + jnp.clip(s, -1.0, 1.0) * 1e-7
            return acc
        return jax.jit(fn)

    def ka_body(dperturb):
        h = bm.trace_bvh_mxu_paged(bvh.mxu, ro_ka, rd_ka + dperturb,
                                   shared_origin=origin)
        return h.t

    def ab_body(dperturb):
        scene = SceneCtx.create(params, fin.cam_pos, env_map=None,
                                use_bvh=True, bvh=bvh)
        ro, rd = ab_rays()
        h = scene.trace(ro, rd + dperturb,
                        shared_origin=scene.cam_pos, ordered=False)
        return h.t

    def ab_kr_body(dperturb):
        scene = SceneCtx.create(params, fin.cam_pos, env_map=None,
                                use_bvh=True, bvh=bvh)
        h = scene.trace(ro_ka, rd_ka + dperturb,
                        shared_origin=scene.cam_pos, ordered=False)
        return h.t

    for name, body, z in (("ka", ka_body, jnp.zeros_like(rd_ka)),
                          ("ab", ab_body, jnp.zeros((1,), jnp.float32)),
                          ("ab_kr", ab_kr_body, jnp.zeros_like(rd_ka))):
        fn = chain(body)
        out = float(fn(z))
        t0 = time.time()
        out = float(fn(z))
        dt = time.time() - t0
        print(json.dumps({"variant": name,
                          "ms_per_trace": round(dt / REPS * 1e3, 3),
                          "reps": REPS, "checksum": out}), flush=True)


if __name__ == "__main__":
    main()
