"""CPU prediction for the r5e fewer-pages arms: exact per-arm counts
of what the unordered group-walk kernels grind through at the
cf_close camera, per (PAGE_CHUNKS, GROUP) configuration.

For each arm (run as a subprocess so the env binds at import):
  tile_visits   — Σ over pages of tiles with a nonempty group window
                  (each pays feature expansion + walk setup)
  window_steps  — Σ over (page, tile) of gn (each pays a scalar cond)
  work_steps    — Σ of set bits within windows (each pays a
                  [GROUP*256,K]x[K,128] matmul pair + epilogue)
  mxu_elems     — work_steps * GROUP * 256 * 128 (epilogue/matmul
                  elements; bigger GROUP wastes more per set bit)

Primary at full 1080p (shared-origin hulls are cheap); shadow modeled
at DP-reduced res via the 5 direct-light batches like cf_stats.

Usage: python scripts/page_predict.py            # parent, all arms
       PP_ARM=pc224g8 python scripts/page_predict.py --child
"""

import json
import os
import subprocess
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

ARMS = {
    "control": {},
    "pc256g4": {"ORT_PAGE_CHUNKS": "256"},   # 3 pages, NO element waste
    "pc672g4": {"ORT_PAGE_CHUNKS": "672"},   # 1 page, NO element waste
    "pc224g8": {"ORT_PAGE_CHUNKS": "224", "ORT_CHUNK_GROUP": "8"},
    "pc336g12": {"ORT_PAGE_CHUNKS": "336", "ORT_CHUNK_GROUP": "12"},
    "pc672g12": {"ORT_PAGE_CHUNKS": "672", "ORT_CHUNK_GROUP": "12"},
    "pc672g21": {"ORT_PAGE_CHUNKS": "672", "ORT_CHUNK_GROUP": "21"},
}


def child():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import _scene, CLOSE_POS, LOOK_AT
    from benchscene import camera_rays
    from opengl_raytracing_tpu.ops import bvh_mxu as bm

    h, w = 1080, 1920
    tris, bvh = _scene(6)
    pages = bm._as_pages(bvh.mxu)
    ro, rd, origin = camera_rays(h, w, pos=CLOSE_POS, look=LOOK_AT)
    ro = jnp.asarray(ro).reshape(-1, 3)
    rd = jnp.asarray(rd).reshape(-1, 3)
    _, n, ro_soa, rd_soa, _, act = bm._pad_tiles(ro, rd)
    hulls = bm._tile_hulls(ro_soa, rd_soa, act, shared_origin=origin)

    group = bm.GROUP
    visits = steps = work = 0
    for page in pages:
        cb = jnp.asarray(page.chunk_bounds)
        hit, _ = bm._chunk_hit_matrix(cb, hulls)
        (lo, nn, _, _, glo, gn, *_gw) = bm._tile_chunk_ranges(
            cb, hulls, hit=hit)
        gn = np.asarray(gn)
        visits += int((gn > 0).sum())
        steps += int(gn.sum())
        # set bits inside each tile's window
        ng = -(-cb.shape[0] // group)
        hitp = np.asarray(hit)
        pad = ng * group - hitp.shape[0]
        if pad:
            hitp = np.pad(hitp, ((0, pad), (0, 0)))
        ghit = hitp.reshape(ng, group, -1).any(axis=1)    # [NG,NT]
        work += int(ghit.sum())
    print(json.dumps({
        "arm": os.environ.get("PP_ARM", "control"),
        "pages": len(pages), "group": group,
        "tile_visits": visits, "window_steps": steps,
        "work_steps": work,
        "mxu_elems_G": round(work * group * 256 * 128 / 1e9, 2),
    }), flush=True)


def main():
    if "--child" in sys.argv:
        child()
        return
    for arm, env in ARMS.items():
        e = dict(os.environ, PP_ARM=arm, **env)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--child"], env=e, timeout=1800, check=False)


if __name__ == "__main__":
    main()
