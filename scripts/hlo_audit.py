"""HBM-traffic audit of the frame's pure-XLA stages (no TPU needed).

Compiles each non-kernel stage of the frame standalone on the CPU
backend and reports XLA's bytes-accessed estimate — a lower bound on
that stage's HBM wall-clock: ~16.4 ms/GB on the 61 GB/s dev slice,
~1.2 ms/GB on a full v5e.  The Pallas kernels are excluded on purpose:
their CPU (interpret) lowering unrolls the grid and reports meaningless
traffic; their real DMA is accounted exactly by the sparse-grid
statistics in PERF.md.

Stages audited (1080p defaults):
  raygen_cull  primary ray gen + SoA padding + tile hulls + chunk
               ranges + sparse plan (everything before the kernel)
  taa          resolve_taa, moving camera (worst case: reproj gather)
  svgf         jnp 49-slice filter
  present      SVGF off: ACES + gamma only

Usage: python scripts/hlo_audit.py [--stage a,b,...] [--height H]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the axon plugin overrides JAX_PLATFORMS; jax.config is authoritative
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")


def _measure(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    out = {}
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    if ca:
        for k in ("bytes accessed", "flops", "transcendentals"):
            if k in ca:
                out[k.replace(" ", "_")] = float(ca[k])
    ma = compiled.memory_analysis()
    if ma is not None:
        v = getattr(ma, "temp_size_in_bytes", None)
        if v is not None:
            out["temp_bytes"] = int(v)
    if "bytes_accessed" in out:
        gb = out["bytes_accessed"] / 1e9
        out["ms_at_61GBps"] = round(gb / 61 * 1e3, 2)
        out["ms_at_819GBps"] = round(gb / 819 * 1e3, 3)
    return out


def _ctx(height, width, build_scene=True):
    """params always; bvh/fin only when the stage traces (taa/svgf need
    just the params — building the BVH three times per audit run would
    triple the wall-clock on the single-CPU dev box for no output)."""
    import jax.numpy as jnp
    from opengl_raytracing_tpu.models import FrameInputs, preset
    from opengl_raytracing_tpu.camera import Camera

    params = preset("full")
    if not build_scene:
        return params, None, None
    from benchscene import bunny_bvh
    bvh = bunny_bvh()
    cam = Camera()
    cam.aspect = width / height
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(1))
    return params, bvh, fin


def stage_raygen_cull(height, width):
    import jax.numpy as jnp
    from opengl_raytracing_tpu.models.pipeline import (
        primary_rays, primary_dirs, swizzled_pixel_centers, _swizzle_pads)
    from opengl_raytracing_tpu.ops import bvh_mxu as bm

    params, bvh, fin = _ctx(height, width)
    pages = bm._as_pages(bvh.mxu)
    pads = _swizzle_pads(height, width)  # honors ORT_SWIZZLE like production

    def fn(fin):
        if pads is not None:
            # production fast path: the ray stream is generated directly
            # in block order (models/pipeline.py trace_and_shade raygen)
            px, py = swizzled_pixel_centers(height, width, *pads)
            rd = primary_dirs(px, py, height, width, fin, params)
        else:
            px, py, rd = primary_rays(height, width, fin, params)
        ro = jnp.broadcast_to(fin.cam_pos, rd.shape)
        _, _, ro_soa, rd_soa, _, act = bm._pad_tiles(ro, rd, active=None)
        hulls = bm._tile_hulls(ro_soa, rd_soa, act,
                               shared_origin=fin.cam_pos)
        outs = []
        nt = ro_soa[0].shape[0] // bm.TILE_RAYS
        for pg in pages:
            cull = bm._tile_chunk_ranges(pg.chunk_bounds, hulls)
            outs.append(bm._sparse_plan(cull[1], nt))
        # production shared-origin kernels stream direction planes only
        # (the origin rides a [8,128] broadcast-constant input)
        if bm.SMEM_ORIGIN:
            return (outs, [v.reshape(nt, bm.TILE_RAYS) for v in rd_soa],
                    bm._origin_rows(fin.cam_pos))
        return outs, bm._soa_planes(ro_soa, rd_soa)

    return _measure(fn, fin)


def _taa_args(height, width):
    import jax.numpy as jnp
    k1 = jax.random.PRNGKey(1)
    ks = jax.random.split(k1, 3)
    curr = jax.random.uniform(ks[0], (height, width, 3))
    motion = (jax.random.uniform(ks[1], (height, width, 2)) - 0.5) * 0.1
    prev = jax.random.uniform(ks[2], (height, width, 4))
    return curr, motion, prev, jnp.int32(40)


def stage_taa(height, width):
    from opengl_raytracing_tpu.ops.taa import resolve_taa
    params, _, _ = _ctx(height, width, build_scene=False)
    curr, motion, prev, fi = _taa_args(height, width)

    def fn(curr, motion, prev, fi):
        return resolve_taa(curr, motion, prev, fi, params,
                           moved=True)

    return _measure(fn, curr, motion, prev, fi)


def stage_svgf(height, width):
    import jax.numpy as jnp
    from opengl_raytracing_tpu.ops.svgf import svgf_filter
    params, _, _ = _ctx(height, width, build_scene=False)
    curr, motion, prev, _ = _taa_args(height, width)
    gpos = curr * 3.0
    gnrm = curr - 0.5

    def fn(prev, motion, gpos, gnrm):
        return svgf_filter(prev, motion, gpos, gnrm, params)

    return _measure(fn, prev, motion, gpos, gnrm)


def stage_present(height, width):
    from opengl_raytracing_tpu.ops.svgf import present
    from opengl_raytracing_tpu.models import preset
    params = preset("baseline")  # SVGF off: ACES + gamma only
    curr, motion, prev, _ = _taa_args(height, width)
    gpos = curr * 3.0
    gnrm = curr - 0.5

    def fn(prev, motion, gpos, gnrm):
        return present(prev, motion, gpos, gnrm, params)

    return _measure(fn, prev, motion, gpos, gnrm)


def stage_frame(height, width):
    """Whole render_frame (baseline preset, bunny BVH) — end-to-end
    bytes/flops AFTER XLA fusion + DCE.  CPU-lowering caveats apply
    (Pallas interpret-mode unrolling, unfused gathers), so use this for
    RELATIVE A/Bs of pipeline restructurings, not absolute ms claims."""
    import jax.numpy as jnp
    from opengl_raytracing_tpu.models import RenderState, render_frame, preset

    params, bvh, fin = _ctx(height, width)
    params = preset("baseline")
    state = RenderState.create(height, width)

    def fn(fin, state):
        st, out = render_frame(params, fin, state, None, bvh,
                               height=height, width=width, use_bvh=True)
        return st.accum, out.image

    return _measure(fn, fin, state)


STAGES = {
    "raygen_cull": stage_raygen_cull,
    "taa": stage_taa,
    "svgf": stage_svgf,
    "present": stage_present,
    "frame": stage_frame,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=",".join(STAGES))
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()
    for name in args.stage.split(","):
        try:
            out = {"stage": name, "h": args.height, "w": args.width}
            out.update(STAGES[name](args.height, args.width))
            print(json.dumps(out), flush=True)
        except Exception as e:  # keep sweeping on a failed case
            print(json.dumps({"stage": name, "error": repr(e)[:200]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
