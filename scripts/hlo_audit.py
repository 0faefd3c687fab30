"""HBM-traffic audit of the compiled frame program, per preset.

Compiles the production frame function (CPU backend — no TPU needed)
and reports, per preset: XLA's bytes-accessed estimate, temp-buffer
footprint, Pallas/custom-call count, and the number of materialized
full-image planes (fusion results of at least one [H,W] f32 plane).

Why this matters: the non-kernel share of the frame is pure
HBM-bandwidth streaming of [H,W] planes (PERF.md roofline).  Bytes
accessed / bandwidth is a lower bound on that share's wall-clock:
~16 ms/GB on the 61 GB/s dev slice, ~1.2 ms/GB on a full v5e.  This
makes "cut a pass" work measurable without TPU access: the delta shows
up in bytes-accessed immediately.

Usage: python scripts/hlo_audit.py [--preset baseline,...] [--height H]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def audit_case(name: str, height: int, width: int, use_bvh: bool = True):
    import jax.numpy as jnp
    from opengl_raytracing_tpu.models import (FrameInputs, RenderState,
                                              preset)
    from opengl_raytracing_tpu.models.pipeline import make_render_fn
    from opengl_raytracing_tpu.camera import Camera
    from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.scene import prepare_bvh

    params = preset(name)
    tris = gather_triangles(make_bunny(4),
                            model_transform((-2, 1.5, 0), 0.5))
    bvh = prepare_bvh(tris)
    cam = Camera()
    cam.aspect = width / height
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))
    state = RenderState.create(height, width)
    fn = make_render_fn(params, height, width, use_bvh=True, donate=False)
    lowered = fn.lower(params, fin, state, None, bvh)
    compiled = lowered.compile()

    out = {"preset": name, "h": height, "w": width}
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    if ca:
        for k in ("bytes accessed", "flops", "transcendentals"):
            if k in ca:
                out[k.replace(" ", "_")] = float(ca[k])
    ma = compiled.memory_analysis()
    if ma is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                out[k] = int(v)
    txt = compiled.as_text()
    plane = height * width  # elements in one [H,W] f32 plane
    out["custom_calls"] = txt.count("custom-call")
    # fusion ROOT results big enough to hold a full-image plane
    big = 0
    for m in re.finditer(r"^\s*(?:ROOT )?%?fusion[^=]*= "
                         r"((?:\([^)]*\))|(?:[a-z0-9]+\[[0-9,]*\]))",
                         txt, re.M):
        shapes = re.findall(r"f32\[([0-9,]+)\]", m.group(1))
        for s in shapes:
            els = 1
            for d in s.split(","):
                els *= int(d)
            if els >= plane:
                big += 1
                break
    out["materialized_plane_fusions"] = big
    if "bytes_accessed" in out:
        gb = out["bytes_accessed"] / 1e9
        out["ms_at_61GBps"] = round(gb / 61 * 1e3, 2)
        out["ms_at_819GBps"] = round(gb / 819 * 1e3, 2)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="baseline,realistic,full,heavy")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()
    for name in args.preset.split(","):
        try:
            print(json.dumps(audit_case(name, args.height, args.width)),
                  flush=True)
        except Exception as e:  # keep sweeping on a failed case
            print(json.dumps({"preset": name,
                              "error": repr(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
