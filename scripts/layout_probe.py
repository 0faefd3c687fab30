"""TPU layout probe: does a materialized [H,W,4] carried state pad its
minor dim to 128 lanes in HBM (32x), and what does the TAA history
gather actually cost on hardware?

Three measurements (each a child-boundable single case):

  pad      memory_analysis + timed scan of an [H,W,4]-carried elementwise
           update vs the same computation carried as [4,H,W] planes.
           If HBM tiling pads minor-dim-4 to 128 lanes, the AoS form
           reads/writes ~32x the bytes and the plane form wins big; if
           XLA picks a sane layout the two match.
  taa      resolve_taa at 1080p, still vs moving (the 2M-pixel history
           gather) — first hardware number for the gather's lowering.
  frame_layout  whole baseline BVH frame ms (context row so the probe
           log is self-contained).

Usage: python scripts/layout_probe.py [--case pad|taa|frame_layout]
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

H = int(os.environ.get("LAYOUT_H", "1080"))
W = int(os.environ.get("LAYOUT_W", "1920"))
STEPS = int(os.environ.get("LAYOUT_STEPS", "64"))

if os.environ.get("LAYOUT_FORCE_CPU") == "1":
    # the axon plugin overrides JAX_PLATFORMS (CLAUDE.md); only
    # jax.config forces CPU before backend init — harness smoke only
    import jax
    jax.config.update("jax_platforms", "cpu")


def _time(fn, *args):
    import jax
    s = fn(*args)
    float(jax.tree.leaves(s)[0])
    t0 = time.time()
    s = fn(*args)
    float(jax.tree.leaves(s)[0])
    return time.time() - t0


def case_pad() -> dict:
    import jax
    import jax.numpy as jnp

    def step_aos(accum, _):
        # elementwise history blend, the accum access pattern TAA uses
        return accum * 0.97 + 0.01, jnp.float32(0)

    def step_soa(accum, _):
        return accum * 0.97 + 0.01, jnp.float32(0)

    @jax.jit
    def run_aos(accum):
        out, _ = jax.lax.scan(step_aos, accum, None, length=STEPS)
        return jnp.sum(out)

    @jax.jit
    def run_soa(accum):
        out, _ = jax.lax.scan(step_soa, accum, None, length=STEPS)
        return jnp.sum(out)

    aos = jnp.zeros((H, W, 4), jnp.float32)
    soa = jnp.zeros((4, H, W), jnp.float32)

    rec = {"key": "pad", "steps": STEPS}
    ma = jax.jit(lambda x: x * 2.0).lower(aos).compile().memory_analysis()
    if ma is not None:
        rec["aos_arg_bytes"] = int(getattr(ma, "argument_size_in_bytes", 0))
        rec["aos_out_bytes"] = int(getattr(ma, "output_size_in_bytes", 0))
    ma = jax.jit(lambda x: x * 2.0).lower(soa).compile().memory_analysis()
    if ma is not None:
        rec["soa_arg_bytes"] = int(getattr(ma, "argument_size_in_bytes", 0))
        rec["soa_out_bytes"] = int(getattr(ma, "output_size_in_bytes", 0))

    dt_aos = _time(run_aos, aos)
    dt_soa = _time(run_soa, soa)
    rec["aos_ms_per_step"] = round(dt_aos / STEPS * 1e3, 3)
    rec["soa_ms_per_step"] = round(dt_soa / STEPS * 1e3, 3)
    rec["aos_over_soa"] = round(dt_aos / max(dt_soa, 1e-9), 2)
    # ideal step = 2 * H*W*4*4B at HBM bandwidth
    rec["ideal_ms_819GBps"] = round(2 * H * W * 4 * 4 / 819e9 * 1e3, 3)
    return rec


def case_taa() -> dict:
    import jax
    import jax.numpy as jnp
    from opengl_raytracing_tpu.ops.taa import resolve_taa
    from opengl_raytracing_tpu.models import preset

    params = preset("full")
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    curr = jax.random.uniform(k[0], (H, W, 3))
    motion = (jax.random.uniform(k[1], (H, W, 2)) - 0.5) * 0.1
    prev = jax.random.uniform(k[2], (H, W, 4))
    fi = jnp.int32(40)

    def mk(moved):
        @jax.jit
        def fn(curr, motion, prev):
            s = 0.
            for i in range(8):
                s = s + jnp.sum(resolve_taa(curr + i * 1e-6, motion, prev,
                                            fi, params, moved=moved))
            return s
        return fn

    rec = {"key": "taa"}
    rec["moving_ms"] = round(_time(mk(True), curr, motion, prev) / 8 * 1e3, 2)
    rec["still_ms"] = round(_time(mk(False), curr, motion, prev) / 8 * 1e3, 2)
    return rec


def case_frame_layout() -> dict:
    import jax
    import jax.numpy as jnp
    from benchscene import bunny_bvh
    from opengl_raytracing_tpu.models import (FrameInputs, RenderState,
                                              render_frame, preset)
    from opengl_raytracing_tpu import Camera

    params = preset("baseline")
    bvh = bunny_bvh()
    cam = Camera()
    cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))

    import dataclasses

    @jax.jit
    def fn(fin, state):
        s = 0.
        for i in range(4):
            f2 = dataclasses.replace(fin, jitter=fin.jitter + i * 1e-5)
            state, out = render_frame(params, f2, state, None, bvh,
                                      height=H, width=W, use_bvh=True)
            s = s + jnp.sum(out.image)
        return s

    dt = _time(fn, fin, RenderState.create(H, W)) / 4
    return {"key": "frame_layout", "ms": round(dt * 1e3, 2)}


def case_frame_planes() -> dict:
    """Same baseline frame as frame_layout but with the [4,H,W]
    planes-layout accum boundary (ORT_ACCUM_PLANES=1) — the direct
    end-to-end A/B for the minor-dim padding question."""
    os.environ["ORT_ACCUM_PLANES"] = "1"
    rec = case_frame_layout()
    rec["key"] = "frame_planes"
    return rec


CASES = {"pad": case_pad, "taa": case_taa, "frame_layout": case_frame_layout,
         "frame_planes": case_frame_planes}


def main() -> int:
    if "--case" in sys.argv:
        key = sys.argv[sys.argv.index("--case") + 1]
        print(json.dumps(CASES[key]()))
        return 0
    from childproc import run_child
    for key in CASES:
        rec = run_child([sys.executable, os.path.abspath(__file__),
                         "--case", key], 600)
        rec.setdefault("key", key)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
