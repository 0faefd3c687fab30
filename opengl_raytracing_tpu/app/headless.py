"""Headless CLI: render frames, param sweeps, frame dumps, checkpoints.

The TPU equivalent of the reference's interactive window (which has no
TPU analog): drives the exact same Application loop without a display and
writes tonemapped PNGs + structured logs.

Examples:
  python -m opengl_raytracing_tpu.app.headless --preset full --frames 16
  python -m opengl_raytracing_tpu.app.headless --scene bvh --size 960x540 \\
      --frames 8 --dump-every 4 --out out/
  python -m opengl_raytracing_tpu.app.headless --raster --out out/
  python -m opengl_raytracing_tpu.app.headless --sweep exposure=0.5,1,2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ..models.presets import preset, PRESETS
from ..scene.geometry import (make_bunny, gather_triangles_fast,
                              model_transform)
from ..constants import DEFAULT_BVH_TRANSLATE, DEFAULT_BVH_SCALE
from ..utils import write_png
from ..utils.log import log
from ..utils.checkpoint import (save_snapshot, load_snapshot, save_preset,
                                load_preset)
from .application import Application
from .state import AppState


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="opengl_raytracing_tpu.app.headless",
                                description=__doc__)
    p.add_argument("--preset", choices=PRESETS, default="full")
    p.add_argument("--preset-file", help="JSON param preset to load")
    p.add_argument("--scene", choices=("analytic", "bvh"), default="analytic")
    p.add_argument("--model", help="OBJ path for the BVH scene "
                                   "(default: procedural bunny)")
    p.add_argument("--env", help="4x3-cross PNG environment map")
    p.add_argument("--size", default="800x600", help="WxH")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--dump-every", type=int, default=0,
                   help="write a PNG every N frames (0 = last only)")
    p.add_argument("--out", default="out")
    p.add_argument("--raster", action="store_true",
                   help="raster-preview parity mode (F2 equivalent)")
    p.add_argument("--motion-debug", action="store_true",
                   help="motion vector debug view (F6 equivalent)")
    p.add_argument("--orbit", action="store_true",
                   help="animate the point light orbit")
    p.add_argument("--camera-anim", choices=("none", "dolly", "pan"),
                   default="none",
                   help="move the camera each frame (exercises TAA "
                        "reprojection; BASELINE config 5)")
    p.add_argument("--set", action="append", default=[],
                   metavar="FIELD=VALUE",
                   help="override a RenderParams field, e.g. exposure=2")
    p.add_argument("--sweep", metavar="FIELD=V1,V2,...",
                   help="render one image per value of FIELD")
    p.add_argument("--resume", help="snapshot .npz to resume from")
    p.add_argument("--snapshot", help="write a snapshot .npz at the end")
    p.add_argument("--save-preset", help="write current params as JSON")
    p.add_argument("--jit", action=argparse.BooleanOptionalAction,
               default=True,
               help="jit the frame function (--no-jit for eager debug tracebacks)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin "
                        "overrides JAX_PLATFORMS, so an env var is not "
                        "enough)")
    p.add_argument("--turbo", type=int, default=None,
                   help="frames chained device-side per dispatch: N "
                        "while idle (camera still, orbit off), min(N,6) "
                        "while the camera moves (the move frame + "
                        "settling frames).  Recovers the reference "
                        "loop's free-running frame rate over the ~26 ms"
                        "-per-dispatch tunneled link; 1 disables.  "
                        "Default: 8 in the viewer, 1 headless (--frames "
                        "counts step() calls)")
    return p


def _apply_overrides(params, pairs):
    for pair in pairs:
        field, value = pair.split("=", 1)
        cur = getattr(params, field)
        if isinstance(cur, tuple):
            vals = tuple(float(x) for x in value.split(","))
            params = params.replace(**{field: vals})
        elif isinstance(cur, int) and not isinstance(cur, bool):
            params = params.replace(**{field: int(value)})
        else:
            params = params.replace(**{field: float(value)})
    return params


def make_app(args) -> Application:
    # --cpu must act before ANY backend init (the axon TPU plugin
    # overrides JAX_PLATFORMS); handled here rather than in main() so
    # every make_app caller (viewer included) honors the flag
    if getattr(args, "cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")
    w, h = (int(x) for x in args.size.lower().split("x"))
    params = (load_preset(args.preset_file) if args.preset_file
              else preset(args.preset))
    params = _apply_overrides(params, args.set)
    if args.orbit:
        params = params.replace(point_light_orbit_enabled=1)
    state = AppState(height=h, width=w, params=params)
    application = Application(state=state, jit=args.jit)
    turbo = getattr(args, "turbo", None)
    if turbo is None:
        # viewer defaults to 8 (the reference loop free-runs); headless
        # keeps 1 so --frames still counts rendered frames exactly
        turbo = 8 if getattr(args, "_viewer", False) else 1
    application.turbo = max(1, int(turbo))

    if args.resume:
        p, cam, frame, rs = load_snapshot(args.resume)
        # CLI overrides win over the snapshot: re-apply --set/--sweep on
        # the restored params (otherwise a sweep over a resumed run
        # would silently render identical images)
        p = _apply_overrides(p, args.set)
        state.params = state.prev_params = p
        state.camera = cam
        state.frame = frame
        state.restore_render_state(rs)
        # keep the hotkey mirrors in sync with the restored params (the
        # viewer's /set maintains the same invariant)
        application.input.exposure = float(np.asarray(p.exposure))
        application.input.spp_per_frame = int(p.spp_per_frame)
        log("CKPT", "resumed from %s at frame %d", args.resume,
            int(np.asarray(rs.frame_index)))

    if args.scene == "bvh":
        state.use_bvh = True
        if args.model:
            state.load_bvh_model(args.model)
        else:
            tris = gather_triangles_fast(
                make_bunny(4), model_transform(DEFAULT_BVH_TRANSLATE,
                                               DEFAULT_BVH_SCALE))
            state.set_bvh_from_tris(tris)
            log("BVH", "procedural bunny: %d tris, %d nodes",
                state.bvh_tri_count, state.bvh_node_count)
    if args.env:
        state.load_env_map(args.env)
    if args.raster:
        state.ray_mode = False
    if args.motion_debug:
        state.show_motion = True
    return application


def _dump(img, path):
    arr = np.asarray(img)
    write_png(path, arr[::-1])  # GL bottom-up rows -> PNG top-down
    log("INIT", "wrote %s (mean %.3f)", path, arr.mean())


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")  # also for non-make_app paths
    os.makedirs(args.out, exist_ok=True)

    if args.sweep:
        field, values = args.sweep.split("=", 1)
        base_set = list(args.set)
        for v in values.split(","):
            # fresh Namespace per value: aliasing args would accumulate
            # every previous sweep override into later iterations
            sweep_args = argparse.Namespace(**vars(args))
            sweep_args.set = base_set + [f"{field}={v}"]
            application = make_app(sweep_args)
            img = application.run(args.frames)
            _dump(img, os.path.join(args.out, f"sweep_{field}_{v}.png"))
        return 0

    application = make_app(args)
    t0 = time.time()
    img = None
    for f in range(args.frames):
        if args.camera_anim == "dolly":
            application.act("move_w")
        elif args.camera_anim == "pan":
            application.act("look 8 0")
        img = application.step()
        if args.dump_every and (f + 1) % args.dump_every == 0:
            _dump(img, os.path.join(args.out, f"frame_{f:04d}.png"))
    if img is not None:
        # force completion BEFORE reading the clock: dispatch is async
        # and block_until_ready is unreliable on the axon platform
        # (CLAUDE.md) — without the readback the BENCH line would time
        # queueing, not rendering
        img = np.asarray(img)
    wall = time.time() - t0
    if img is not None:
        _dump(img, os.path.join(args.out, "frame_last.png"))
    app = application.app
    log("BENCH", "%d frames in %.2fs (%.1f ms/frame avg, loop fps %.1f)",
        args.frames, wall, wall / max(args.frames, 1) * 1e3, app.fps)

    if args.snapshot:
        save_snapshot(args.snapshot, app.params, app.camera, app.frame,
                      app.render_state)
        log("CKPT", "snapshot -> %s", args.snapshot)
    if args.save_preset:
        save_preset(args.save_preset, app.params)
        log("CKPT", "preset -> %s", args.save_preset)
    return 0


if __name__ == "__main__":
    sys.exit(main())
