"""Host-side study: exact-cull candidate triangles per tile for chunk
size x triangle-order variants of the MXU page layout (no TPU needed).

The MXU kernels never walk the BVH tree — they walk CHUNKS (fixed-size
runs of the leaf-remapped triangle array) gated by the per-tile interval
cull, so re-ordering triangles / resizing chunks is parity-free apart
from hit-tie resolution (the documented 1-ulp wobble class).  This
script prices the cull for each variant on the bench camera; the winner
justifies an ORT_CHUNK_ORDER / CHUNK-size experiment on hardware.

Usage: python scripts/chunk_study.py [subdiv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def morton_order(c):
    q = ((c - c.min(0)) / (np.ptp(c, axis=0) + 1e-20) * 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << np.uint64(16))) & np.uint64(0x30000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x9249249)
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))
    return np.argsort(code, kind="stable")


def main():
    import bench
    from opengl_raytracing_tpu import Camera
    from opengl_raytracing_tpu.ops import bvh_mxu as bm
    from opengl_raytracing_tpu.models.pipeline import primary_rays
    from opengl_raytracing_tpu.ops.scene import SceneCtx
    from opengl_raytracing_tpu.models import preset

    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    H, W = 1080, 1920
    tris_j, bvh = bench._scene(subdiv)
    cam = Camera()
    cam.aspect = W / H
    fin = bench._fin(cam)
    params = preset("baseline")
    scene = SceneCtx.create(params, fin.cam_pos, env_map=None,
                            use_bvh=True, bvh=bvh)
    _, _, rd = primary_rays(H, W, fin, params)
    rd = rd.reshape(-1, 3)
    ro = jnp.broadcast_to(jnp.asarray(fin.cam_pos), rd.shape)
    shape, n, ro_soa, rd_soa, _e, act = bm._pad_tiles(ro, rd)
    axes, any_act = bm._tile_hulls(ro_soa, rd_soa, act,
                                   shared_origin=fin.cam_pos)
    nt = int(ro_soa[0].shape[0]) // bm.TILE_RAYS
    # primary rays: every lane is live (act is None) -> no sky gating;
    # "active" tiles for the per-tile average are those whose interval
    # cull passes anything (matches the earlier gn>0 count)
    any_act = (np.ones(nt, bool) if any_act is None
               else np.asarray(any_act))
    axes = [[np.broadcast_to(np.asarray(a, np.float32), (nt,))
             for a in ax] for ax in axes]

    # triangle AABBs in kernel (leaf-remapped) order, pads stripped
    parts = []
    for page in scene.bvh.mxu:
        tp = np.asarray(page.tris, np.float32)
        parts.append(tp[np.abs(tp[:, 0:9]).sum(1) > 0][:, :9])
    T = np.concatenate(parts)
    w0 = T[:, 0:3]
    w1 = w0 + T[:, 3:6]
    w2 = w0 + T[:, 6:9]
    tmin = np.minimum(w0, np.minimum(w1, w2))
    tmax = np.maximum(w0, np.maximum(w1, w2))
    cent = (tmin + tmax) / 2
    print(f"tris {T.shape[0]}, tiles {nt}")

    def cand(order, csz):
        lo_ = tmin[order]
        hi_ = tmax[order]
        t = len(order)
        nc = (t + csz - 1) // csz
        bmin = np.zeros((nc, 3), np.float32)
        bmax = np.zeros((nc, 3), np.float32)
        for ci in range(nc):
            s = slice(ci * csz, min((ci + 1) * csz, t))
            bmin[ci] = lo_[s].min(0)
            bmax[ci] = hi_[s].max(0)
        tmin_lo = np.zeros((nc, nt), np.float32)
        tmax_hi = np.full((nc, nt), np.inf, np.float32)
        for k in range(3):
            o_lo, o_hi, i_lo, i_hi = axes[k]

            def interval(bval):
                a_lo = bval - o_hi[None, :]
                a_hi = bval - o_lo[None, :]
                ps = [a_lo * i_lo[None, :], a_lo * i_hi[None, :],
                      a_hi * i_lo[None, :], a_hi * i_hi[None, :]]
                return np.minimum.reduce(ps), np.maximum.reduce(ps)

            lo0, hi0 = interval(bmin[:, k:k + 1])
            lo1, hi1 = interval(bmax[:, k:k + 1])
            tmin_lo = np.maximum(tmin_lo, np.minimum(lo0, lo1))
            tmax_hi = np.minimum(tmax_hi, np.maximum(hi0, hi1))
        hit = (tmax_hi >= tmin_lo) & any_act[None, :]
        cand.active = int(hit.any(axis=0).sum())
        chunks = int(hit.sum())
        # group chunks so one matmul stays ~1024 rows (= GROUP=4 at 128)
        g = max(1, 512 // (2 * csz))
        gh = np.add.reduceat(hit, np.arange(0, nc, g), axis=0) > 0
        return chunks, chunks * csz, int(gh.sum()) * g * csz, g

    base = None
    for name, order, csz in [
            ("preorder128", np.arange(len(T)), 128),
            ("preorder64", np.arange(len(T)), 64),
            ("preorder32", np.arange(len(T)), 32),
            ("morton128", morton_order(cent), 128),
            ("morton64", morton_order(cent), 64),
            ("morton32", morton_order(cent), 32)]:
        ch, tc, gtris, g = cand(order, csz)
        if base is None:
            base = gtris
        print(f"{name}: exact-chunks {ch}, exact-tris {tc} "
              f"({tc / max(cand.active, 1):.0f}/tile of {cand.active}), "
              f"grouped-rows-tris {gtris} (g={g}, "
              f"{gtris / base:.2f}x of base)")


if __name__ == "__main__":
    main()
