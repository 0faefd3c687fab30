"""Stage-by-stage ablation of the baseline BVH frame on TPU.

Finds where the frame time actually goes: each case jits a pipeline
prefix chained REPS times device-side (one dispatch), so the ~30ms
tunnel dispatch cost amortizes to ~2ms/rep.  Run cases in child
processes (the worker can wedge); each prints one JSON line.

Usage: python scripts/ablate.py [--case KEY]
"""

import functools
import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

H = int(os.environ.get("ABLATE_HEIGHT", "1080"))
W = int(os.environ.get("ABLATE_WIDTH", "1920"))
REPS = int(os.environ.get("ABLATE_REPS", "16"))

CASES = [
    "noop",            # dispatch + readback floor
    "raygen",          # primary ray directions only
    "primary",         # + MXU closest-hit trace
    "gbuffer",         # + motion/gbuffer/sky selects
    "shade_noshadow",  # + direct light math with shadows forced visible
    "shade_occ0",      # gated shade, trace_shadow_any skipped entirely
    "shade_win0",      # gated shade, kernel launches but windows -1
    "shade",           # + real shadow wavefront (full trace_and_shade)
    "taa",             # + TAA resolve
    "frame",           # + present (= render_frame)
]


def _setup():
    """Scene + camera.  Env knobs (attributing the BVH-heavy cf cases):
    ABLATE_SUBDIV=6 builds the 81,920-tri stress scene (bench.py
    HEAVY_SUBDIV); ABLATE_CAM=close|far uses the bench cf camera pair
    (CLOSE_POS/FAR_POS) instead of the default framing."""
    import numpy as np
    import jax.numpy as jnp
    from opengl_raytracing_tpu import Camera
    from opengl_raytracing_tpu.models import FrameInputs, RenderState, preset
    from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.scene import prepare_bvh

    params = preset("baseline")
    subdiv = int(os.environ.get("ABLATE_SUBDIV", "4"))
    tris = gather_triangles(make_bunny(subdiv),
                            model_transform((-2, 1.5, 0), 0.5))
    bvh = prepare_bvh(tris)
    cam_key = os.environ.get("ABLATE_CAM", "")
    if cam_key in ("close", "far"):
        import bench
        pos = bench.CLOSE_POS if cam_key == "close" else bench.FAR_POS
        cam = Camera(position=np.asarray(pos, np.float32))
        cam.aspect = W / H
        cam.point_at(bench.LOOK_AT)
    else:
        cam = Camera()
        cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))
    return params, bvh, fin, RenderState.create(H, W)


def child(key: str) -> None:
    # the shade_* split cases ride the ORT_ABLATE_SHADOW knob in
    # ops/lighting.py (env read at trace time; set BEFORE importing)
    if key.startswith("shade_") and key != "shade_noshadow":
        os.environ["ORT_ABLATE_SHADOW"] = key.split("_", 1)[1]
    import jax
    import jax.numpy as jnp
    from opengl_raytracing_tpu.models import pipeline as pl
    from opengl_raytracing_tpu.models.pipeline import (
        RenderState, primary_rays, primary_dirs, swizzled_pixel_centers,
        _swizzle_pads, _swizzle_for_scene, unswizzle)
    from opengl_raytracing_tpu.ops.scene import SceneCtx
    from opengl_raytracing_tpu.ops import lighting as lt
    from opengl_raytracing_tpu.ops.taa import resolve_taa
    from opengl_raytracing_tpu.ops.svgf import present
    from opengl_raytracing_tpu.sampling import ndc_from_world
    from opengl_raytracing_tpu.ops.vecmath import normalize

    params, bvh, fin, state = _setup()
    # resolve the swizzle exactly as trace_and_shade does for THIS scene
    # (auto: off for the 1-page bunny) so the ablation prices the
    # production kernel order, not the historical always-on one
    _scene0 = SceneCtx.create(params, fin.cam_pos, env_map=None,
                              use_bvh=True, bvh=bvh)
    pads = _swizzle_pads(H, W, enabled=_swizzle_for_scene(_scene0))

    def prefix(i, upto: str):
        """One iteration of the pipeline prefix; returns a scalar.

        Mirrors the PRODUCTION trace path (trace_and_shade): block-order
        ray stream + shared-origin trace — a row-major unshared prefix
        would measure a slower kernel path than render_frame executes
        and misattribute the frame time."""
        scene = SceneCtx.create(params, fin.cam_pos, env_map=None,
                                use_bvh=True, bvh=bvh)
        if pads is not None:
            px, py = swizzled_pixel_centers(H, W, *pads)
            rd = primary_dirs(px, py, H, W, fin, params)
        else:
            px, py, rd = primary_rays(H, W, fin, params)
        rd = rd + i * 1e-7  # defeat CSE across reps
        if upto == "raygen":
            return jnp.sum(rd)
        ro = jnp.broadcast_to(fin.cam_pos, rd.shape)
        h_raw = scene.trace(ro, rd, shared_origin=scene.cam_pos,
                            ordered=False)
        if upto == "primary":
            return jnp.sum(h_raw.t.clip(0, 1e3))
        hit_mask = h_raw.valid
        h = pl._sanitize_hit(h_raw, ro, rd)
        ndc_prev = ndc_from_world(h.p, fin.prev_view_proj)
        ndc_curr = ndc_from_world(h.p, fin.curr_view_proj)
        motion = ndc_curr - ndc_prev
        sky_radiance = scene.sky(rd)
        if upto == "gbuffer":
            return (jnp.sum(motion) + jnp.sum(sky_radiance)
                    + jnp.sum(h.p.clip(-1e3, 1e3)))
        seeds = jnp.int32(i)
        if upto == "shade_noshadow":
            # direct light with all shadow windows collapsed: the any-hit
            # kernel sees empty tiles everywhere -> measures pure shading
            # math + wavefront construction + cull pre-pass
            shaded = lt.direct_light_bvh(
                scene, h, seeds, jnp.int32(i), -rd, px, py,
                active=jnp.zeros_like(hit_mask))
            return jnp.sum(jnp.where(hit_mask[..., None], shaded,
                                     sky_radiance))
        shaded = pl.shade_bvh_auto(scene, h, seeds, jnp.int32(i), -rd,
                                   px, py, hit_mask)
        curr = jnp.where(hit_mask[..., None], shaded, sky_radiance)
        if upto in ("shade", "shade_occ0", "shade_win0"):
            # occ0/win0 run the identical prefix; the knob set in child()
            # changes what direct_light_bvh does inside shade_bvh_auto
            return jnp.sum(curr)

        def grid(a):  # flat block-order -> [H,W] like trace_and_shade
            if pads is None:
                return a
            sw_h, sw_w = H + pads[0], W + pads[1]
            return unswizzle(a, sw_h, sw_w)[:H, :W]

        curr, motion = grid(curr), grid(motion)
        accum = resolve_taa(curr, motion * 0, pl.accum_to_hwc(state.accum),
                            jnp.int32(i), params)
        if upto == "taa":
            return jnp.sum(accum)
        gpos = grid(jnp.where(hit_mask[..., None], h.p, 0.0))
        gnrm = grid(jnp.where(hit_mask[..., None], normalize(h.n), 0.0))
        img = present(accum, motion, gpos, gnrm, params, show_motion=False)
        return jnp.sum(img)

    from opengl_raytracing_tpu.models.pipeline import frame_jit_options
    if key == "noop":
        @functools.partial(jax.jit, **frame_jit_options())
        def fn(x):
            return jnp.sum(x) * 1e-9
        arg = state.accum
    else:
        # frame_jit_options: the close-camera shade prefix trips an
        # 18.16M scoped-vmem loop fusion against the 16M default (the
        # same class the realistic preset hits, CLAUDE.md) — the raised
        # per-jit budget is how the production frame compiles
        @functools.partial(jax.jit, **frame_jit_options())
        def fn(x):
            s = 0.
            for i in range(REPS):
                s = s + prefix(x + i, key)
            return s
        arg = jnp.float32(0.0)

    s = fn(arg)
    chk = float(s)
    t0 = time.time()
    float(fn(arg))
    dt = time.time() - t0
    per = dt / (1 if key == "noop" else REPS)
    print(json.dumps({"key": key, "ms": round(per * 1e3, 2),
                      "total_ms": round(dt * 1e3, 1), "reps": REPS,
                      "checksum": chk}))


def main() -> int:
    from childproc import run_child
    results = {}
    for key in CASES:
        results[key] = run_child(
            [sys.executable, os.path.abspath(__file__), "--case", key], 560)
        print(key, results[key], flush=True)
    return 0


if __name__ == "__main__":
    if "--case" in sys.argv:
        child(sys.argv[sys.argv.index("--case") + 1])
    else:
        sys.exit(main())
