"""On-device microbench of resolve_taa alone (the moving-penalty
suspect: full-preset still-mode moving attribution r4c measured the
TAA block at +9.4 ms/frame while its XLA audit says 332 MB ~ 1 ms).

Times three lowerings, REPS chained per dispatch (CLAUDE.md timing
rules):
  moving   — production moving resolve (lax.cond taken, reproj gather)
  still    — moved=False branch (history blend, no gather)
  gather   — ONLY the history gather at reprojected uvs (isolates it)

Usage: python scripts/taa_micro.py  (runs on the default backend — the
TPU under axon; KA_CPU=1 forces CPU for a smoke test)
"""

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))

import jax
if os.environ.get("KA_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

H = int(os.environ.get("TM_H", "1080"))
W = int(os.environ.get("TM_W", "1920"))
REPS = int(os.environ.get("TM_REPS", "32"))


def main():
    from opengl_raytracing_tpu.models import preset
    from opengl_raytracing_tpu.ops.taa import resolve_taa, _sample_nearest

    params = preset("full")
    rng = np.random.RandomState(0)
    curr = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    motion = jnp.asarray(
        (rng.rand(H, W, 2).astype(np.float32) - 0.5) * 0.02)
    prev = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))

    def chain(body):
        def fn(curr, motion, prev):
            acc = prev
            c = curr
            for i in range(REPS):
                out = body(c, motion, acc, i)
                if out.shape[-1] == 3:
                    out = jnp.concatenate(
                        [out, jnp.ones((H, W, 1), jnp.float32)], -1)
                acc = out
                c = curr + acc[..., :1] * 1e-12  # serialize iterations
            return jnp.sum(acc)
        return jax.jit(fn)

    def moving(c, m, a, i):
        return resolve_taa(c, m, a, jnp.int32(40 + i), params,
                           moved=jnp.bool_(True))

    def still(c, m, a, i):
        return resolve_taa(c, jnp.zeros_like(m), a, jnp.int32(40 + i),
                           params, moved=jnp.bool_(False))

    def _uv(m):
        ix = (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5) / W
        iy = (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5) / H
        u = jnp.broadcast_to(ix, (H, W)) - m[..., 0] * 0.5
        v = jnp.broadcast_to(iy, (H, W)) - m[..., 1] * 0.5
        x = jnp.clip(jnp.floor(u * W), 0, W - 1).astype(jnp.int32)
        y = jnp.clip(jnp.floor(v * H), 0, H - 1).astype(jnp.int32)
        return u, v, x, y

    def gather(c, m, a, i):
        u, v, _, _ = _uv(m)
        return _sample_nearest(a, u, v) + c[..., :1] * 0.0

    # --- r5 lowering probes: the r4d isolation priced the row gather
    # at ~5 ns/row (10 ms / 2M rows) — these probe whether the cost is
    # per-row or per-byte, and whether AXIS-ALIGNED take_along_axis
    # (sublane gather, lanes kept) is a different, faster class.
    def patch8(c, m, a, i):
        # same row COUNT, 8x the row bytes: if this is ~10 ms too, the
        # serialization is per row and patch-widening is useless
        _, _, x, y = _uv(m)
        wp = W // 8
        flat = a.reshape(H * wp, 32)
        rows = jnp.take(flat, y * wp + x // 8, axis=0)     # [H,W,32]
        sub = (x % 8)[..., None, None]
        lane = jnp.arange(8, dtype=jnp.int32)[None, None, :, None]
        return (jnp.sum(jnp.where(lane == sub,
                                  rows.reshape(H, W, 8, 4), 0.0), axis=2)
                + c[..., :1] * 0.0)

    def vgather(c, m, a, i):
        # vertical-only reprojection: per-element index along SUBLANES,
        # lanes aligned (out[y,x] = a[yp(y,x), x]) — the lowering class
        # a banded/separable scheme would ride on
        _, _, _, y = _uv(m)
        y4 = jnp.broadcast_to(y[:, :, None], (H, W, 4)).reshape(H, W * 4)
        out = jnp.take_along_axis(a.reshape(H, W * 4), y4, axis=0)
        return out.reshape(H, W, 4) + c[..., :1] * 0.0

    def tgather(c, m, a, i):
        # horizontal-only reprojection via transpose + sublane gather +
        # transpose back (out[y,x] = a[y, xp(y,x)])
        _, _, x, _ = _uv(m)
        at = jnp.transpose(a, (1, 0, 2)).reshape(W, H * 4)
        xt = jnp.broadcast_to(x.T[:, :, None], (W, H, 4)).reshape(W, H * 4)
        out = jnp.take_along_axis(at, xt, axis=0)
        return (jnp.transpose(out.reshape(W, H, 4), (1, 0, 2))
                + c[..., :1] * 0.0)

    def transp(c, m, a, i):
        # double-transpose alone: isolates tgather's transpose share
        at = jnp.transpose(a, (1, 0, 2))
        return jnp.transpose(at + c[0, 0, 0] * 0.0, (1, 0, 2))

    for name, body in (("moving", moving), ("still", still),
                       ("gather", gather), ("patch8", patch8),
                       ("vgather", vgather), ("tgather", tgather),
                       ("transp", transp)):
        fn = chain(body)
        out = float(fn(curr, motion, prev))  # compile + warm
        t0 = time.time()
        out = float(fn(curr, motion, prev))
        dt = time.time() - t0
        print(json.dumps({"variant": name,
                          "ms_per_resolve": round(dt / REPS * 1e3, 3),
                          "reps": REPS, "checksum": out}), flush=True)


if __name__ == "__main__":
    main()
