"""Stage-by-stage ablation of the an_full frame on TPU.

an_full (analytic scene, full preset, cubemap env, 1080p) is the worst
bench case (147 ms at the r3d defaults) and its cost composition has
never been measured.  Same methodology as scripts/ablate.py: each case
jits a pipeline PREFIX chained REPS times device-side (one dispatch)
so the tunnel dispatch cost amortizes; prefixes mirror the production
path in models/pipeline.py:_shade_analytic (unswizzled — the analytic
auto resolves to off — with the tile gate at its default).

Usage: python scripts/ablate_analytic.py [--case KEY]
Env: ABLATE_REPS (default 16), AN_H/AN_W (default 1080x1920).
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

if os.environ.get("AN_CPU") == "1":
    # the axon plugin overrides JAX_PLATFORMS; jax.config is authoritative
    import jax
    jax.config.update("jax_platforms", "cpu")

H = int(os.environ.get("AN_H", "1080"))
W = int(os.environ.get("AN_W", "1920"))
REPS = int(os.environ.get("ABLATE_REPS", "16"))

CASES = [
    "noop",       # dispatch + readback floor
    "raygen",     # primary ray directions
    "trace",      # + analytic closest-hit (spheres + floor)
    "direct",     # + direct light (disk/sun/sky/point, 6-query batch)
    "gi",         # + one-bounce GI
    "ao",         # + AO hemisphere wavefront
    "marker",     # + emissive marker select (diffuse path complete)
    "mirror",     # + gated mirror tree
    "glass",      # + gated glass tree (= full shade)
    "taa",        # + TAA resolve
    "frame",      # + SVGF + present (= render_frame)
]


def _setup():
    import jax.numpy as jnp
    from opengl_raytracing_tpu import Camera
    from opengl_raytracing_tpu.models import FrameInputs, RenderState, preset
    from opengl_raytracing_tpu.utils.image import load_cubemap_cross

    params = preset("full")
    env = None
    cross = os.path.join(os.path.dirname(_SCRIPTS), "cubemaps",
                         "sky_day.png")
    # BENCH_AN_ENV=0 ablates the cubemap itself (procedural sky)
    if (os.path.exists(cross)
            and os.environ.get("BENCH_AN_ENV", "1") == "1"):
        import numpy as np
        faces = load_cubemap_cross(cross)
        # integer texels -> the default 'auto' gather = patch_u8,
        # matching bench.py and the app loader
        env = jnp.asarray(np.clip(np.round(faces * 255.0), 0.0,
                                  255.0).astype(np.uint8))
    cam = Camera()
    cam.aspect = W / H
    right, up, fwd, thf = cam.basis()
    vp = cam.view_projection()
    fin = FrameInputs(jnp.asarray(cam.position), jnp.asarray(right),
                      jnp.asarray(up), jnp.asarray(fwd), jnp.float32(thf),
                      jnp.float32(cam.aspect), jnp.zeros(2, jnp.float32),
                      jnp.asarray(vp), jnp.asarray(vp), jnp.int32(0))
    return params, env, fin, RenderState.create(H, W)


def child(key: str) -> None:
    import jax
    import jax.numpy as jnp
    from opengl_raytracing_tpu.models import pipeline as pl
    from opengl_raytracing_tpu.models.pipeline import (
        primary_rays, _tile_gated_shade, _analytic_gate_frac)
    from opengl_raytracing_tpu.ops.scene import SceneCtx
    from opengl_raytracing_tpu.ops.materials import (get_material,
                                                     MTYPE_MIRROR,
                                                     MTYPE_GLASS)
    from opengl_raytracing_tpu.ops import lighting as lt
    from opengl_raytracing_tpu.ops.taa import resolve_taa
    from opengl_raytracing_tpu.ops.svgf import present
    from opengl_raytracing_tpu.ops.vecmath import normalize, length
    from opengl_raytracing_tpu.sampling import ndc_from_world
    from opengl_raytracing_tpu.constants import MAT_POINTLIGHT_SPHERE

    params, env, fin, state = _setup()

    def prefix(i, upto: str):
        scene = SceneCtx.create(params, fin.cam_pos, env_map=env,
                                use_bvh=False)
        px, py, rd = primary_rays(H, W, fin, params)
        rd = rd + i * 1e-7  # defeat CSE across reps
        if upto == "raygen":
            return jnp.sum(rd)
        ro = jnp.broadcast_to(fin.cam_pos, rd.shape)
        h_raw = scene.trace(ro, rd)
        if upto == "trace":
            return jnp.sum(h_raw.t.clip(0, 1e3))
        hit_mask = h_raw.valid
        h = pl._sanitize_hit(h_raw, ro, rd)
        sky_radiance = scene.sky(rd)
        seed = jnp.int32(i)
        fi = jnp.int32(i)
        vdir = -rd
        mat = get_material(h.mat, params)

        radiance = lt.direct_light(scene, h, seed, fi, vdir, px, py)
        if upto == "direct":
            return jnp.sum(jnp.where(hit_mask[..., None], radiance,
                                     sky_radiance))
        if params.enable_gi:
            radiance = radiance + (
                jnp.float32(params.gi_scale_analytic)
                * lt.one_bounce_gi_analytic(scene, h, fi, seed, fi,
                                            px, py))
        if upto == "gi":
            return jnp.sum(jnp.where(hit_mask[..., None], radiance,
                                     sky_radiance))
        if params.enable_ao:
            ao = lt.compute_ao(scene, h, fi, px, py)
            radiance = radiance * ao[..., None]
        if upto == "ao":
            return jnp.sum(jnp.where(hit_mask[..., None], radiance,
                                     sky_radiance))
        base_col = (jnp.asarray(params.point_light_color, jnp.float32)
                    * params.point_light_intensity)
        d = length(h.p - scene.cam_pos)
        falloff = 1.0 / jnp.maximum(d * d * 0.25 + 1.0, 1.0)
        is_marker = h.mat == MAT_POINTLIGHT_SPHERE
        radiance = jnp.where(is_marker[..., None],
                             base_col * falloff[..., None], radiance)
        if upto == "marker":
            return jnp.sum(jnp.where(hit_mask[..., None], radiance,
                                     sky_radiance))

        gate = _analytic_gate_frac()
        gated = gate > 0.0 and px.shape[-1] % pl._TILE == 0

        def run_tree(fn, mask):
            if gated:
                return _tile_gated_shade(fn, mask, h, vdir, px, py, gate)
            return fn(h, vdir, px, py)

        if params.mat_mirror_enabled:
            def mirror_fn(h_c, vdir_c, px_c, py_c):
                mat_c = get_material(h_c.mat, params)
                return lt.shade_mirror(scene, h_c, vdir_c, mat_c, seed,
                                       fi, px_c, py_c)
            mm = mat.mtype == MTYPE_MIRROR
            radiance = jnp.where(mm[..., None], run_tree(mirror_fn, mm),
                                 radiance)
        if upto == "mirror":
            return jnp.sum(jnp.where(hit_mask[..., None], radiance,
                                     sky_radiance))
        if params.mat_glass_enabled:
            def glass_fn(h_c, vdir_c, px_c, py_c):
                mat_c = get_material(h_c.mat, params)
                return lt.shade_glass(scene, h_c, vdir_c, mat_c, seed,
                                      fi, px_c, py_c)
            gm = mat.mtype == MTYPE_GLASS
            radiance = jnp.where(gm[..., None], run_tree(glass_fn, gm),
                                 radiance)
        curr = jnp.where(hit_mask[..., None], radiance, sky_radiance)
        if upto == "glass":
            return jnp.sum(curr)

        ndc_prev = ndc_from_world(h.p, fin.prev_view_proj)
        ndc_curr = ndc_from_world(h.p, fin.curr_view_proj)
        motion = (ndc_curr - ndc_prev) * 0.0
        accum = resolve_taa(curr, motion, pl.accum_to_hwc(state.accum),
                            fi, params)
        if upto == "taa":
            return jnp.sum(accum)
        gpos = jnp.where(hit_mask[..., None], h.p, 0.0)
        gnrm = jnp.where(hit_mask[..., None], normalize(h.n), 0.0)
        img = present(accum, motion, gpos, gnrm, params,
                      show_motion=False)
        return jnp.sum(img)

    if key == "noop":
        @jax.jit
        def fn(x):
            return jnp.sum(x) * 1e-9
        arg = state.accum
    else:
        @jax.jit
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
