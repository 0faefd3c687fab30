"""Probe: incoherent-ray (GI/AO) tracing strategies on TPU at 1080p.

The full preset spends nearly all its time tracing hemisphere-sampled
GI/AO rays and GI-hit shadow rays — the regimes where the per-tile MXU
cull degrades (random directions widen the tile's direction intervals
until every chunk passes).  Each case times one strategy on realistic
ray distributions (built from an actual primary-hit wavefront) chained
REPS times device-side.  Child processes per case (the worker can
wedge); one JSON line each.

Usage: python scripts/probe_incoherent.py [--case KEY]
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

H, W = 1080, 1920
REPS = int(os.environ.get("PROBE_REPS", "8"))

CASES = [
    "ao_sorted",        # any-hit, direction-sorted (round-2 interim)
    "ao_coherent",      # any-hit, pixel order, masked cull (production)
    "gi_sorted",        # closest-hit, direction-sorted
    "gi_coherent",      # closest-hit, pixel order, ungated
    "gi_masked",        # closest-hit, pixel order, masked cull (production)
    "gi_walk",          # closest-hit, jnp skip-link walk (gather-based)
    "gishadow_sorted",    # GI bounce + 4 disk shadows, direction-sorted
    "gishadow_coherent",  # same rays, pixel order, masked cull (production)
]


def _setup():
    import jax.numpy as jnp
    from opengl_raytracing_tpu import Camera
    from opengl_raytracing_tpu.models import FrameInputs, preset
    from opengl_raytracing_tpu.models.pipeline import primary_rays, _sanitize_hit
    from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.scene import prepare_bvh, SceneCtx

    params = preset("full")
    tris = gather_triangles(make_bunny(4), model_transform((-2, 1.5, 0), 0.5))
    bvh = prepare_bvh(tris)
    cam = Camera()
    cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))
    return params, bvh, fin


def child(key: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from opengl_raytracing_tpu.models.pipeline import (primary_rays,
                                                       _sanitize_hit)
    from opengl_raytracing_tpu.ops.scene import SceneCtx
    from opengl_raytracing_tpu.ops import lighting as lt
    from opengl_raytracing_tpu.ops.bvh_mxu import (
        trace_bvh_mxu_paged, trace_bvh_shadow_mxu_paged)
    from opengl_raytracing_tpu.experiments.bvh_sorted import (
        trace_bvh_mxu_sorted, trace_bvh_shadow_mxu_sorted)
    from opengl_raytracing_tpu.ops.bvh_traverse import trace_bvh
    from opengl_raytracing_tpu.sampling import rand, sample_hemisphere_cosine
    from opengl_raytracing_tpu.ops.vecmath import normalize, dot

    params, bvh, fin = _setup()

    def prep(seed):
        """Primary wavefront -> (hit mask, GI ray batch, AO windows)."""
        scene = SceneCtx.create(params, fin.cam_pos, use_bvh=True, bvh=bvh)
        px, py, rd = primary_rays(H, W, fin, params)
        if os.environ.get("PROBE_SWIZZLE", "1") == "1":
            # match production: the pipeline traces in 8x16-block order,
            # so the probe's hit points / GI rays inherit that order
            from opengl_raytracing_tpu.models.pipeline import swizzle
            px = swizzle(px, H, W)
            py = swizzle(py, H, W)
            rd = swizzle(rd, H, W)
        ro = jnp.broadcast_to(fin.cam_pos, rd.shape)
        h_raw = scene.trace(ro, rd, shared_origin=scene.cam_pos)
        act = h_raw.valid
        h = _sanitize_hit(h_raw, ro, rd)
        n0 = normalize(h.n)
        ux = rand(px + seed, py + seed, jnp.int32(0))
        uy = rand(py + seed * 2 + 1.0, px + seed, jnp.int32(0))
        wi = sample_hemisphere_cosine(n0, ux, uy)
        org = h.p + n0 * 1e-3
        return scene, h, n0, act, org, wi, px, py

    def run_case(seed):
        scene, h, n0, act, org, wi, px, py = prep(seed)
        if key.startswith("ao"):
            win = jnp.where(act, jnp.float32(params.ao_radius), -1.0)
            if key == "ao_sorted":
                occ = trace_bvh_shadow_mxu_sorted(bvh.mxu, org, wi, win,
                                                  active=act)
            else:
                occ = trace_bvh_shadow_mxu_paged(bvh.mxu, org, wi, win,
                                                 active=act)
            return jnp.sum(jnp.where(act & occ, 1.0, 0.0))
        if key.startswith("gishadow"):
            h1 = trace_bvh_mxu_paged(bvh.mxu, org, wi, active=act)
            act1 = act & h1.valid
            # real per-pixel px/py: production's cp_offset decorrelates
            # the disk targets per pixel — a shared target point would
            # make the probe's shadow rays artificially coherent
            xls = lt._disk_samples(jnp.int32(0), jnp.int32(0), px, py)
            origins, dirs, wins = [], [], []
            for xl in xls:
                o, d, w = lt._segment_shadow_query(h1.p, xl)
                origins.append(o)
                dirs.append(d)
                wins.append(jnp.where(act1, w, -1.0))
            o_all = jnp.stack(origins)
            d_all = jnp.stack(dirs)
            w_all = jnp.stack(wins)
            act_b = jnp.broadcast_to(act1[None], w_all.shape)
            if key == "gishadow_sorted":
                occ = trace_bvh_shadow_mxu_sorted(
                    bvh.mxu, o_all, d_all, w_all, active=act_b)
            else:
                occ = trace_bvh_shadow_mxu_paged(bvh.mxu, o_all, d_all,
                                                 w_all, active=act_b)
            return jnp.sum(jnp.where(act_b & occ, 1.0, 0.0))
        # gi closest-hit variants
        if key == "gi_sorted":
            h1 = trace_bvh_mxu_sorted(bvh.mxu, org, wi, active=act)
        elif key == "gi_coherent":
            h1 = trace_bvh_mxu_paged(bvh.mxu, org, wi)
        elif key == "gi_masked":
            h1 = trace_bvh_mxu_paged(bvh.mxu, org, wi, active=act)
        else:  # gi_walk
            h1 = trace_bvh(bvh.arrays, org, wi)
        return jnp.sum(jnp.where(h1.valid & act, h1.t, 0.0))

    @jax.jit
    def run_scan(seeds):
        def step(c, s):
            return c + run_case(s), 0.0
        c, _ = jax.lax.scan(step, jnp.float32(0.0), seeds)
        return c

    seeds = jnp.arange(REPS, dtype=jnp.float32) * 17.0
    _ = float(run_scan(seeds))  # compile+warm
    t0 = time.time()
    cs = float(run_scan(seeds))
    dt = (time.time() - t0) / REPS
    # gishadow's timed region traces 1 GI bounce + SOFT_SHADOW_SAMPLES
    # disk shadows per pixel (sun/point omitted here)
    from opengl_raytracing_tpu.constants import SOFT_SHADOW_SAMPLES
    rays = H * W * ((1 + SOFT_SHADOW_SAMPLES)
                    if key.startswith("gishadow") else 1)
    print(json.dumps({"key": key, "ms": round(dt * 1e3, 2),
                      "mrays": round(rays / dt / 1e6, 1),
                      "checksum": round(cs, 1)}))


def main() -> int:
    if "--case" in sys.argv:
        child(sys.argv[sys.argv.index("--case") + 1])
        return 0
    from childproc import run_child
    for key in CASES:
        rec = run_child([sys.executable, os.path.abspath(__file__),
                         "--case", key], 900)
        rec.setdefault("key", key)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
