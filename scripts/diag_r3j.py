"""Compile-only bisection of the two broken-default TPU presets (r3j).

r3i facts (same session, healthy slice):
  - realistic preset: compile fails with "Scoped allocation with size
    35.69M and limit 16.00M exceeded scoped vmem limit" even WITH the
    a2adba1 TAA optimization_barrier (default-on via the BVH gate).
  - full preset at DEFAULT SVGF env (BH=32, DB=1) fails rc=1 while
    ORT_SVGF_BH=8 ORT_SVGF_DB=0 runs at 43.5 ms — and in r3h the jnp
    SVGF also failed once, so the error is uncaptured.

This script AOT-compiles (never runs) bench.py's exact frame scan for a
bisection table of configs, one config per invocation (argv[1]) so a
wedged worker only eats one bounded child.  Env knobs are read at trace
time, so each child sets them before tracing.  Prints ONE JSON line.

`xla_tpu_scoped_vmem_limit_kib` is passed via compiler_options, which
rides the compile request through the axon tunnel (process env may not
reach the remote compiler).
"""

from __future__ import annotations

import json
import os
import sys
import time

# config name -> (preset, env overrides, params overrides, compiler opts)
CONFIGS = {
    # -- the realistic scoped-vmem crash ---------------------------------
    "realistic_default": ("realistic", {}, {}, None),
    "realistic_vmem48": ("realistic", {}, {},
                         {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    "realistic_nogate": ("realistic", {"ORT_BVH_GATE_FRAC": "0.0"}, {}, None),
    "realistic_nobar": ("realistic", {"ORT_TAA_BARRIER": "0"}, {}, None),
    "realistic_noswz": ("realistic", {"ORT_SWIZZLE": "0"}, {}, None),
    "realistic_no_taa": ("realistic", {}, {"enable_taa": 0}, None),
    "realistic_no_ao": ("realistic", {}, {"enable_ao": 0}, None),
    "realistic_no_gi": ("realistic", {}, {"enable_gi": 0}, None),
    # -- the full-preset default-SVGF crash ------------------------------
    "full_default": ("full", {}, {}, None),
    "full_svgf_db0": ("full", {"ORT_SVGF_BH": "32", "ORT_SVGF_DB": "0"},
                      {}, None),
    "full_svgf_bh16": ("full", {"ORT_SVGF_BH": "16", "ORT_SVGF_DB": "1"},
                       {}, None),
    "full_svgf_old": ("full", {"ORT_SVGF_BH": "8", "ORT_SVGF_DB": "0"},
                      {}, None),
    "full_svgf_jnp": ("full", {"ORT_SVGF_PALLAS": "0"}, {}, None),
    "full_vmem48": ("full", {}, {},
                    {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    # -- never sampled green this round ----------------------------------
    "heavy_default": ("heavy", {}, {}, None),
    "heavy_vmem48": ("heavy", {}, {},
                     {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
}


def main() -> int:
    name = sys.argv[1]
    preset_name, env, povr, copts = CONFIGS[name]
    os.environ.update(env)
    os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench  # repo-root bench harness; reuses its scene/fin builders
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from opengl_raytracing_tpu.models import (RenderState, preset,
                                              render_frame)
    from opengl_raytracing_tpu.sampling import generate_jitter2d

    h, w, frames = bench.H, bench.W, 2
    params = preset(preset_name)
    if povr:
        params = params.replace(**povr)
    from opengl_raytracing_tpu import Camera
    cam = Camera()
    cam.aspect = w / h
    fin = bench._fin(cam)
    _, bvh = bench._scene()
    fins = bench._stack_fins([
        dataclasses.replace(
            fin, jitter=jnp.asarray(
                generate_jitter2d(i)
                * float(np.asarray(params.jitter_still_scale)), jnp.float32))
        for i in range(frames)])

    def one_frame(state, f):
        st, out = render_frame(params, f, state, None, bvh,
                               height=h, width=w, use_bvh=True)
        return st, jnp.sum(out.image)

    def run(state, fins):
        st, sums = jax.lax.scan(one_frame, state, fins)
        return st, jnp.sum(sums)

    state = RenderState.create(h, w)
    t0 = time.time()
    rec = {"config": name, "preset": preset_name, "env": env,
           "params": povr, "copts": copts,
           "backend": jax.default_backend()}
    try:
        lowered = jax.jit(run).lower(state, fins)
        t_lower = time.time()
        try:
            lowered.compile(compiler_options=copts) if copts \
                else lowered.compile()
        except TypeError:  # older Lowered.compile signature
            lowered.compile(copts) if copts else lowered.compile()
        rec.update(ok=True, lower_s=round(t_lower - t0, 1),
                   compile_s=round(time.time() - t_lower, 1))
    except Exception as e:  # noqa: BLE001 — report, don't crash the queue
        msg = str(e)
        # keep the informative tail (XLA prepends a huge fusion dump)
        key = "Scoped allocation"
        at = msg.find(key)
        head = msg[:300]
        rec.update(ok=False, err_type=type(e).__name__,
                   err=(msg[at:at + 300] if at >= 0 else head),
                   err_head=head[:200],
                   total_s=round(time.time() - t0, 1))
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
