"""Compacted-wavefront masked shading (measured, reverted — see PERF.md).

The reference shades glass/mirror inline per fragment (reference:
shaders/rt/rt.frag:125-131); under vectorized masking every pixel would
pay for the 3-4 nested secondary direct-light evaluations.  This variant
compacts the masked lane indices, then a `while_loop` processes
fixed-size chunks until the (data-dependent) count is covered —
identical values (the RNG is a pure function of pixel/seed), a fraction
of the work when the branch covers few pixels, the same worst case when
it covers all of them.

On the tunneled dev slice its scatter/gather lowering costs more than
the masked over-compute it saves (157ms vs 41ms at 1080p baseline), so
production shades masked (models/pipeline.py).  Revisit on full-HBM
hardware.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

TILE = 128  # lane width for compacted sub-batches


def compact_masked_eval(shade_fn, mask, radiance, lanes, budget_div=8):
    """Evaluate an expensive shading branch only on masked lanes.

    shade_fn(sub_lanes: dict of [B//128,128] comps) -> [B//128,128,3];
    lanes: dict of flat 1D [R] component planes (NEVER [R,3] — flat
    rank-2 vec3 arrays lane-pad 43x on TPU).
    """
    shape = mask.shape
    r = int(np.prod(shape))
    b = max(1024, -(-r // budget_div // 1024) * 1024)
    # b must stay a TILE multiple: min(b, r) with a small non-128-
    # multiple r (tiny debug images) would make the in-loop reshape
    # (b//TILE, TILE) fail — round r UP instead (the safe gather clamps
    # indices, and .set(mode="drop") discards out-of-range writes)
    b = min(b, -(-r // TILE) * TILE)

    mask_f = mask.reshape(r)
    count = jnp.sum(mask_f.astype(jnp.int32))
    pos = jnp.cumsum(mask_f.astype(jnp.int32)) - 1
    # idx_buf[k] = flat lane index of the k-th masked lane; sentinel r.
    # Length rounds up to a batch multiple so dynamic_slice of the last
    # (partial) batch stays in bounds — sentinel tail lanes gather lane
    # r-1 (clamped) and scatter out of range (dropped).
    buf_len = -(-r // b) * b
    idx_buf = jnp.full(buf_len, r, jnp.int32)
    # unmasked lanes scatter PAST the padded buffer (dropped) — using r
    # as their target would be IN range after padding and overwrite a
    # sentinel slot with a real lane index
    idx_buf = idx_buf.at[jnp.where(mask_f, pos, buf_len)].set(
        jnp.arange(r, dtype=jnp.int32), mode="drop")

    # radiance carried as three 1D planes (+1 dummy slot for dropped lanes)
    def chan(k):
        return jnp.concatenate([radiance[..., k].reshape(r),
                                jnp.zeros((1,), jnp.float32)])
    rad = (chan(0), chan(1), chan(2))

    def cond(st):
        return st[0] * b < count

    def body(st):
        c, rr, rg, rb = st
        take = jax.lax.dynamic_slice(idx_buf, (c * b,), (b,))
        safe = jnp.minimum(take, r - 1)
        sub = {k: v[safe].reshape(b // TILE, TILE)
               for k, v in lanes.items()}
        val = shade_fn(sub)                     # [b//TILE, TILE, 3]
        rr = rr.at[take].set(val[..., 0].reshape(b), mode="drop")
        rg = rg.at[take].set(val[..., 1].reshape(b), mode="drop")
        rb = rb.at[take].set(val[..., 2].reshape(b), mode="drop")
        return c + 1, rr, rg, rb

    _, rr, rg, rb = jax.lax.while_loop(cond, body, (jnp.int32(0),) + rad)
    return jnp.stack([rr[:r].reshape(shape), rg[:r].reshape(shape),
                      rb[:r].reshape(shape)], axis=-1)
