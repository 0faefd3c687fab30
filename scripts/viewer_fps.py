"""Interactive-loop frame rate probe (the viewer's dispatch path, no
HTTP): Application.step() in a loop with a look action each step —
the moving-camera regime — and with none (idle turbo).  Reports
frames/second counting device-rendered frames (turbo chains k per
dispatch; the accounting matches the viewer's turbo FPS display).

Usage: python scripts/viewer_fps.py  [VF_W/VF_H/VF_TURBO/VF_STEPS env]
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))

if os.environ.get("VF_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

W = int(os.environ.get("VF_W", "640"))
H = int(os.environ.get("VF_H", "360"))
TURBO = int(os.environ.get("VF_TURBO", "8"))
STEPS = int(os.environ.get("VF_STEPS", "40"))


def run(mode: str) -> dict:
    import numpy as np
    from opengl_raytracing_tpu.app.application import Application
    from opengl_raytracing_tpu.app.state import AppState

    from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    from opengl_raytracing_tpu.app.state import _tris_aabb

    app = Application(AppState(H, W), height=H, width=W)
    app.turbo = TURBO
    tris = gather_triangles(make_bunny(int(os.environ.get("VF_SUBDIV",
                                                          "4"))),
                            model_transform((-2, 1.5, 0), 0.5))
    app.app.bvh = prepare_bvh(tris)
    app.app.scene_aabb = _tris_aabb(tris)
    app.app.use_bvh = True
    app.app.ray_mode = True
    app.want_u8 = True

    # warm: one moving + one still step so both chains compile outside
    # the timed loop
    app.act("look 3 0")
    app.step()
    app.step()

    frames0 = app.app.host_frame_index
    t0 = time.time()
    last = None
    for i in range(STEPS):
        if mode == "moving":
            app.act("look 3 0" if i % 2 == 0 else "look -3 0")
        app.step()
        last = app.last_u8
    # force completion of the last dispatch (block_until_ready lies on
    # axon — readback is the only reliable barrier, CLAUDE.md)
    np.asarray(last if last is not None else app.last_output.image)
    dt = time.time() - t0
    frames = app.app.host_frame_index - frames0
    return {"mode": mode, "size": f"{W}x{H}", "turbo": TURBO,
            "steps": STEPS, "frames": int(frames),
            "fps": round(frames / dt, 1),
            "dispatch_per_s": round(STEPS / dt, 1)}


def main():
    for mode in ("moving", "still"):
        print(json.dumps(run(mode)), flush=True)


if __name__ == "__main__":
    main()
