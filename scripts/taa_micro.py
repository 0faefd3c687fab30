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

    def gather(c, m, a, i):
        ix = (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5) / W
        iy = (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5) / H
        u = jnp.broadcast_to(ix, (H, W)) - m[..., 0] * 0.5
        v = jnp.broadcast_to(iy, (H, W)) - m[..., 1] * 0.5
        return _sample_nearest(a, u, v) + c[..., :1] * 0.0

    for name, body in (("moving", moving), ("still", still),
                       ("gather", gather)):
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
