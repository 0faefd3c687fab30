"""CPU cull statistics for the cf_close/cf_far cameras: where the
~510 ms cf_close frame goes and how much exact improvements recover.

For each page (ORT_PAGE_CHUNKS honored) and each cull variant, counts
the surviving (tile, chunk) and (tile, group) pairs the unordered
group-walk kernel would grind through, plus the scalar window steps:

  nocap   — the production cull with no t-cap (what the first page in
            the near-first page walk actually admits)
  fixcap  — fixed point of t-capping at tile granularity: cap = final
            per-tile max best-t over lanes (miss lanes INF).  Lower
            bound for ANY within-page front-to-back walk at the
            current tile/hull granularity.
  rootcap — fixcap with miss lanes bounded by their root-AABB exit t
            (a ray can only hit inside the scene AABB) and lanes that
            miss the root AABB entirely excluded from the hulls.
            Both are exact; prices the "miss lanes poison the tile
            cap with INF" effect.

MXU cost is priced at the measured 80.4 bf16 TFLOP/s ceiling; scalar
steps at the measured ~450ns/step.  Ground-truth t comes from the
skip-link walker (exact, same hit selection as production).

Usage: python scripts/cf_stats.py [--case close|far] [--res HxW]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="close", choices=["close", "far"])
    ap.add_argument("--res", default="1080x1920")
    ap.add_argument("--subdiv", type=int, default=6)
    args = ap.parse_args()
    h, w = map(int, args.res.split("x"))

    from bench import CLOSE_POS, FAR_POS, LOOK_AT, _scene
    from scripts.benchscene import camera_rays
    from opengl_raytracing_tpu.models.pipeline import swizzle
    from opengl_raytracing_tpu.ops import bvh_mxu as bm
    from opengl_raytracing_tpu.ops.bvh_traverse import trace_bvh

    t0 = time.time()
    tris, bvh = _scene(args.subdiv)
    pos = CLOSE_POS if args.case == "close" else FAR_POS
    ro, rd, origin = camera_rays(h, w, pos=pos, look=LOOK_AT)
    print(f"# scene {tris.shape[0]} tris, {len(bvh.mxu)} pages "
          f"(PAGE_CHUNKS={bm.PAGE_CHUNKS}), {h}x{w} rays, "
          f"build {time.time()-t0:.1f}s", flush=True)

    # production order: 8x16 block swizzle (multi-page scene => on)
    ro_s = swizzle(ro, h, w).reshape(-1, 3)
    rd_s = swizzle(rd, h, w).reshape(-1, 3)
    n = ro_s.shape[0]
    nt = n // bm.TILE_RAYS
    ro_soa = tuple(jnp.asarray(ro_s[:, k]) for k in range(3))
    rd_soa = tuple(jnp.asarray(rd_s[:, k]) for k in range(3))

    # ground truth best-t (skip-link walker, exact production kernel
    # semantics for hit selection)
    t0 = time.time()
    hit = trace_bvh(bvh.arrays, jnp.asarray(ro_s), jnp.asarray(rd_s))
    t_true = np.asarray(hit.t).reshape(nt, bm.TILE_RAYS)
    hit_mask = np.isfinite(t_true) & (t_true < 1e29)
    print(f"# walker ground truth in {time.time()-t0:.1f}s, "
          f"hit fraction {hit_mask.mean():.3f}", flush=True)

    # root AABB slab test per lane: entry/exit of the scene box
    bmin = np.asarray(tris.reshape(-1, 3, 3).reshape(-1, 3).min(0)
                      if False else tris[:, 0:3])
    # world AABB over all three vertices
    v0 = np.asarray(tris[:, 0:3]); e1 = np.asarray(tris[:, 3:6])
    e2 = np.asarray(tris[:, 6:9])
    pts = np.concatenate([v0, v0 + e1, v0 + e2])
    rmin, rmax = pts.min(0), pts.max(0)
    inv = 1.0 / np.where(np.asarray(rd_s) == 0, 1e-30, np.asarray(rd_s))
    a = (rmin[None, :] - np.asarray(ro_s)) * inv
    b = (rmax[None, :] - np.asarray(ro_s)) * inv
    t_in = np.minimum(a, b).max(1)
    t_out = np.maximum(a, b).min(1)
    root_hit = (t_out >= np.maximum(t_in, 0.0)).reshape(nt, bm.TILE_RAYS)
    t_exit = np.where(root_hit, np.maximum(t_out, 0.0).reshape(
        nt, bm.TILE_RAYS), 0.0)
    print(f"# root-AABB lane hit fraction {root_hit.mean():.3f}",
          flush=True)

    caps = {
        "nocap": None,
        "fixcap": np.where(hit_mask, t_true, np.inf).max(1),
        "rootcap": np.where(root_hit,
                            np.where(hit_mask, t_true, t_exit),
                            -np.inf).max(1),
    }

    # hull variants: production (all lanes) and root-masked
    hull_all = bm._tile_hulls(ro_soa, rd_soa, None,
                              shared_origin=jnp.asarray(origin))
    act = jnp.asarray(root_hit.reshape(-1))
    hull_root = bm._tile_hulls(ro_soa, rd_soa, act,
                               shared_origin=jnp.asarray(origin))

    ms_scalar = 450e-9 * 1e3          # per window step
    flop_group = 2 * 2 * bm.GROUP * 256 * bm.K_EFF * 128
    ms_group = flop_group / 80.4e12 * 1e3

    def report(tag, hulls, cap_j):
        tot_pairs = tot_groups = tot_steps = 0
        per_page = []
        for page in bvh.mxu:
            lo, nn, _, _, glo, gn, *_gw = bm._tile_chunk_ranges(
                page.chunk_bounds, hulls, t_cap=cap_j)
            gm = np.asarray(gmask).astype(np.uint32)
            pop = np.array([bin(x).count("1") for x in gm],
                           np.int64).sum()
            steps = int(np.asarray(gn, np.int64).sum())
            pairs = int(np.asarray(nn, np.int64).sum())
            per_page.append(int(pop))
            tot_pairs += pairs
            tot_groups += int(pop)
            tot_steps += steps
        print(json.dumps({
            "variant": tag,
            "chunk_pairs": tot_pairs,
            "group_survivors": tot_groups,
            "window_steps": tot_steps,
            "mxu_ms": round(tot_groups * ms_group, 2),
            "scalar_ms": round(tot_steps * ms_scalar, 2),
            "per_page_groups": per_page,
        }), flush=True)

    for name, cap in caps.items():
        hulls = hull_root if name == "rootcap" else hull_all
        cap_j = None if cap is None else jnp.asarray(
            np.where(np.isfinite(cap), cap, bm.INF).astype(np.float32))
        report("primary_" + name, hulls, cap_j)

    # ---- shadow stream: the 6 any-hit batches of direct_light_bvh ----
    # (4 disk samples + sun + point), exactly as the pipeline builds
    # them, with active = primary hit lanes.  For LIT lanes the any-hit
    # must scan every surviving chunk (no t to cap with), so these
    # counts are near-irreducible at the current hull granularity —
    # they price the shadow share of the frame.
    from opengl_raytracing_tpu.ops import lighting as lt
    from opengl_raytracing_tpu.ops.lighting import LIGHT_T, LIGHT_B
    from opengl_raytracing_tpu.constants import LIGHT_CENTER, LIGHT_RADIUS
    from opengl_raytracing_tpu.ops.scene import dir_from_yaw_pitch

    hp = np.asarray(ro_s) + np.asarray(rd_s) * np.where(
        hit_mask.reshape(-1, 1), t_true.reshape(-1, 1), 0.0)
    nrm = np.asarray(hit.n)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True),
                           1e-12)
    hpj = jnp.asarray(hp)
    # frame-0 disk offsets at pixel grid (swizzled px/py irrelevant for
    # counting: use zeros -> deterministic offsets)
    zero = jnp.zeros((n,), jnp.float32)
    offs = lt._disk_offsets(jnp.float32(0.0), jnp.int32(0), zero, zero)
    center = jnp.asarray(LIGHT_CENTER)
    t_axis = jnp.asarray(LIGHT_T)
    b_axis = jnp.asarray(LIGHT_B)
    batches = []
    for dx, dy in offs:
        xl = (center + t_axis * (dx * LIGHT_RADIUS)[..., None]
              + b_axis * (dy * LIGHT_RADIUS)[..., None])
        o, d, wn = lt._segment_shadow_query(hpj, xl)
        batches.append((o, d, wn))
    o, d, wn = lt._sun_shadow_query(
        type("S", (), {"sun_dir": dir_from_yaw_pitch(45.0, -35.0)})(),
        type("H", (), {"p": hpj, "t": hpj[:, 0]})(), jnp.asarray(nrm))
    batches.append((o, d, wn))

    act_flat = hit_mask.reshape(-1)
    tot = {"groups": 0, "steps": 0}
    for bi, (o, d, wn) in enumerate(batches):
        o_soa = tuple(jnp.asarray(o[:, k]) for k in range(3))
        d_soa = tuple(jnp.asarray(d[:, k]) for k in range(3))
        hulls_b = bm._tile_hulls(o_soa, d_soa, jnp.asarray(act_flat))
        wn_t = np.where(act_flat, np.asarray(wn), -1.0).reshape(
            nt, bm.TILE_RAYS)
        cap_b = jnp.asarray(wn_t.max(1).astype(np.float32))
        g = s = 0
        for page in bvh.mxu:
            _, nn, _, _, _, gn, *_gw = bm._tile_chunk_ranges(
                page.chunk_bounds, hulls_b, t_cap=cap_b)
            gm = np.asarray(gmask).astype(np.uint32)
            g += int(np.array([bin(x).count("1") for x in gm],
                              np.int64).sum())
            s += int(np.asarray(gn, np.int64).sum())
        tot["groups"] += g
        tot["steps"] += s
        print(json.dumps({"variant": f"shadow_batch{bi}",
                          "group_survivors": g, "window_steps": s,
                          "mxu_ms": round(g * ms_group, 2)}), flush=True)
    # point light shares the segment form; approximate as one more disk
    print(json.dumps({
        "variant": "shadow_total(5batches)",
        "group_survivors": tot["groups"], "window_steps": tot["steps"],
        "mxu_ms": round(tot["groups"] * ms_group, 2),
        "scalar_ms": round(tot["steps"] * ms_scalar, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
