"""Render demo frames on the available backend and dump PNGs.

Usage: python scripts/render_demo.py [outdir] [--bvh] [--frames N]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from opengl_raytracing_tpu import Camera, FrameState
from opengl_raytracing_tpu.models import (FrameInputs, RenderState,
                                          make_render_fn, preset)
from opengl_raytracing_tpu.sampling import generate_jitter2d
from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
from opengl_raytracing_tpu.ops.scene import prepare_bvh
from opengl_raytracing_tpu.scene.geometry import model_transform
from opengl_raytracing_tpu.utils import write_png
from opengl_raytracing_tpu.utils.log import log


def frame_inputs(cam: Camera, fs: FrameState, moved: bool):
    right, up, fwd, thf = cam.basis()
    return FrameInputs(
        cam_pos=jnp.asarray(cam.position), cam_right=jnp.asarray(right),
        cam_up=jnp.asarray(up), cam_fwd=jnp.asarray(fwd),
        tan_half_fov=jnp.float32(thf), aspect=jnp.float32(cam.aspect),
        jitter=jnp.asarray(fs.jitter),
        curr_view_proj=jnp.asarray(fs.curr_view_proj),
        prev_view_proj=jnp.asarray(fs.prev_view_proj),
        camera_moved=jnp.int32(1 if moved else 0))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else "out"
    use_bvh = "--bvh" in sys.argv
    frames = 8
    for i, a in enumerate(sys.argv):
        if a == "--frames":
            if i + 1 >= len(sys.argv):
                raise SystemExit("--frames needs a value")
            frames = int(sys.argv[i + 1])
    frames = max(frames, 1)  # the final PNG needs at least one frame
    import os
    os.makedirs(outdir, exist_ok=True)

    H, W = 600, 800
    params = preset("full")
    cam = Camera()
    cam.aspect = W / H
    state = RenderState.create(H, W)

    bvh = None
    if use_bvh:
        t0 = time.time()
        mesh = make_bunny(4)
        tris = gather_triangles(mesh, model_transform((-2, 1.5, 0), 0.5))
        bvh = prepare_bvh(tris)
        log("BVH", "built %d chunks (%d pages) / %d tris in %.2fs",
            sum(p.coef_dt.shape[0] for p in bvh.mxu), len(bvh.mxu),
            tris.shape[0], time.time() - t0)

    render = make_render_fn(H, W, use_bvh=use_bvh, donate=False)
    fs = FrameState.initial(cam.view_projection(), cam.position)

    for f in range(frames):
        jit = generate_jitter2d(f) * params.jitter_still_scale
        fs = fs.begin_frame(cam.view_projection(), cam.position, jit)
        fin = frame_inputs(cam, fs, fs.camera_moved())
        t0 = time.time()
        state, out = render(params, fin, state, None, bvh)
        # CLAUDE.md: block_until_ready does NOT block on the axon
        # platform — force completion with a scalar readback so the
        # logged time is render time, not dispatch time
        chk = float(jnp.sum(out.image))
        log("BENCH", "frame %d: %.1f ms (mean %.4f)", f,
            (time.time() - t0) * 1e3, chk / (H * W * 3))
        fs = fs.end_frame()

    img = np.asarray(out.image)
    tag = "bvh" if use_bvh else "analytic"
    # GL rows are bottom-up; PNG rows are top-down
    write_png(f"{outdir}/demo_{tag}.png", img[::-1])
    log("INIT", "wrote %s/demo_%s.png  mean=%.3f std=%.3f", outdir, tag,
        img.mean(), img.std())


if __name__ == "__main__":
    main()
