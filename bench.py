"""Headline benchmark: primary-ray throughput on the bunny BVH scene.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/s", "vs_baseline": N}

Matches the reference's headline measurement (1920x1080, 1 SPP, FPS after
TAA stabilization — OpenGL_RTGP_RayTracing.pdf §8; see BASELINE.md).
`vs_baseline` is relative to the reference's best derived primary-ray
throughput, ~300 Mrays/s on the display-capped RTX 5090.

Timing notes (see .claude/skills/verify/SKILL.md): block_until_ready is
unreliable on the axon platform and single-dispatch roundtrips cost ~30ms
over the tunnel, so frames are chained device-side with lax.scan and a
scalar checksum forces completion.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from opengl_raytracing_tpu import Camera
from opengl_raytracing_tpu.models import (FrameInputs, RenderState,
                                          render_frame, preset)
from opengl_raytracing_tpu.sampling import generate_jitter2d
from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
from opengl_raytracing_tpu.ops.scene import prepare_bvh
from opengl_raytracing_tpu.scene.geometry import model_transform
from opengl_raytracing_tpu.constants import (DEFAULT_BVH_TRANSLATE,
                                             DEFAULT_BVH_SCALE)

BASELINE_MRAYS = 300.0  # reference RTX 5090 derived primary throughput

H = int(os.environ.get("BENCH_HEIGHT", "1080"))
W = int(os.environ.get("BENCH_WIDTH", "1920"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "4"))
PRESET = os.environ.get("BENCH_PRESET", "baseline")


def main():
    params = preset(PRESET)
    spp = params.spp_per_frame

    mesh = make_bunny(4)
    tris = gather_triangles(mesh, model_transform(DEFAULT_BVH_TRANSLATE,
                                                  DEFAULT_BVH_SCALE))
    bvh = prepare_bvh(tris)

    cam = Camera()
    cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()

    jitters = jnp.asarray(
        np.stack([generate_jitter2d(i) * params.jitter_still_scale
                  for i in range(FRAMES)]), jnp.float32)

    base_fin = FrameInputs(
        cam_pos=jnp.asarray(cam.position), cam_right=jnp.asarray(right),
        cam_up=jnp.asarray(up), cam_fwd=jnp.asarray(fwd),
        tan_half_fov=jnp.float32(thf), aspect=jnp.float32(cam.aspect),
        jitter=jnp.zeros(2, jnp.float32), curr_view_proj=jnp.asarray(vp),
        prev_view_proj=jnp.asarray(vp), camera_moved=jnp.int32(0))

    def one_frame(state, jitter):
        fin = FrameInputs(
            base_fin.cam_pos, base_fin.cam_right, base_fin.cam_up,
            base_fin.cam_fwd, base_fin.tan_half_fov, base_fin.aspect,
            jitter, base_fin.curr_view_proj, base_fin.prev_view_proj,
            base_fin.camera_moved)
        st, out = render_frame(params, fin, state, None, bvh,
                               height=H, width=W, use_bvh=True)
        return st, jnp.sum(out.image)

    @jax.jit
    def run(state, jitters):
        st, sums = jax.lax.scan(one_frame, state, jitters)
        return st, jnp.sum(sums)

    # Warmup / compile.
    state = RenderState.create(H, W)
    state, s = run(state, jitters)
    _ = float(s)

    state = RenderState.create(H, W)
    t0 = time.time()
    state, s = run(state, jitters)
    checksum = float(s)  # forced readback
    dt = time.time() - t0

    rays = H * W * spp * FRAMES
    mrays = rays / dt / 1e6
    ms_per_frame = dt / FRAMES * 1e3
    result = {
        "metric": (f"primary Mrays/s/chip, bunny BVH scene, "
                   f"{W}x{H} {spp}spp, preset={PRESET}"),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "ms_per_frame": round(ms_per_frame, 2),
        "frames": FRAMES,
        "checksum": round(checksum, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
