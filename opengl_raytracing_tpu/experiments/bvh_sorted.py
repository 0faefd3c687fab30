"""Direction-sorted tracing for incoherent batches (GI / AO rays).

MEASURED NEGATIVE on the hot path (PERF.md "ray sorting" entry): the
argsort + two full gathers cost more than the per-tile cull precision
they buy back, for every wavefront the pipeline actually issues (GI and
AO origins are already pixel-coherent; only directions scatter, and the
interval culls tolerate that).  Kept here for `scripts/probe_incoherent.py`
so future hardware sweeps can re-check the tradeoff; production code in
`ops/` must not import this module.

(reference: shaders/rt_bvh.glsl traverses per-thread and relies on warp
coherence implicitly; this was the TPU-side analog of a sorted-wavefront
scheduler.)
"""

import jax
import jax.numpy as jnp

from ..ops.bvh_mxu import (EPS, Hit, trace_bvh_mxu_paged,
                           trace_bvh_shadow_mxu_paged)

_SORT_BINS = 64  # 8 octants x 8 sub-bins on the dominant-axis pair


def _direction_keys_soa(dx, dy, dz):
    """Coherence sort key per ray: direction octant + quantized angle.

    Stable-sorting by this key groups rays with similar directions while
    preserving pixel order inside each bin (origins stay spatially
    coherent), which restores the per-tile cull precision that random
    hemisphere directions destroy."""
    octant = ((dx < 0).astype(jnp.int32) * 4
              + (dy < 0).astype(jnp.int32) * 2
              + (dz < 0).astype(jnp.int32))
    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    amax = jnp.maximum(ax, jnp.maximum(ay, az))
    dom = jnp.where(ax >= amax, 0, jnp.where(ay >= amax, 1, 2))
    rest = (ax + ay + az - amax) / jnp.maximum(amax, 1e-9)
    sub = jnp.clip((rest * 4).astype(jnp.int32), 0, 3)
    return octant * 8 + dom * 4 + sub


def sorted_trace(trace_fn, mxu, ro, rd, *extra, eps: float = EPS,
                 active=None):
    """Run an MXU trace with rays stable-sorted by direction coherence.

    trace_fn(mxu, ro, rd, *extra) must accept flat [R,...] rays; results
    are inverse-permuted back to caller order.  Sorting costs one argsort
    + two gathers and typically pays for itself on hemisphere-sampled
    batches (GI/AO).

    `active=None` or a bool mask of the ray batch shape: inactive rays
    (results discarded by the caller) sort to the END as a dedicated run
    of degenerate far-away rays, so their tiles cull to empty ranges and
    the kernel skips them block-wise — without widening the origin
    intervals of the tiles that hold real rays."""
    shape = jnp.broadcast_shapes(jnp.shape(ro)[:-1], jnp.shape(rd)[:-1])
    ro_b = jnp.broadcast_to(ro, shape + (3,))
    rd_b = jnp.broadcast_to(rd, shape + (3,))
    dxf = rd_b[..., 0].reshape(-1)
    dyf = rd_b[..., 1].reshape(-1)
    dzf = rd_b[..., 2].reshape(-1)
    keys = _direction_keys_soa(dxf, dyf, dzf)
    comps = [ro_b[..., k].reshape(-1) for k in range(3)] + [dxf, dyf, dzf]
    if active is not None:
        act = jnp.broadcast_to(active, shape).reshape(-1)
        keys = jnp.where(act, keys, 1 << 10)
        # same degenerate geometry as the tracer's pad rays
        gate_vals = (1e8, 1e8, 1e8, 1.0, 0.0, 0.0)
        comps = [jnp.where(act, c, g) for c, g in zip(comps, gate_vals)]
    perm = jnp.argsort(keys, stable=True)
    # inverse permutation via scatter (a second full sort costs ~an
    # argsort; the scatter is one pass)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    extra_s = [jnp.broadcast_to(e, shape).reshape(-1)[perm] for e in extra]
    # permute per 1D component (packed layouts), re-assemble [R,3] views
    ro_p = jnp.stack([comps[k][perm] for k in range(3)], axis=-1)
    rd_p = jnp.stack([comps[3 + k][perm] for k in range(3)], axis=-1)
    out = trace_fn(mxu, ro_p, rd_p, *extra_s, eps=eps)
    if isinstance(out, Hit):
        return Hit(out.t[inv].reshape(shape),
                   out.p[inv].reshape(shape + (3,)),
                   out.n[inv].reshape(shape + (3,)),
                   out.mat[inv].reshape(shape))
    return out[inv].reshape(shape)


def trace_bvh_mxu_sorted(mxu, ro, rd, eps: float = EPS, active=None) -> Hit:
    return sorted_trace(trace_bvh_mxu_paged, mxu, ro, rd, eps=eps,
                        active=active)


def trace_bvh_shadow_mxu_sorted(mxu, ro, rd, t_max, eps: float = EPS,
                                active=None):
    return sorted_trace(trace_bvh_shadow_mxu_paged, mxu, ro, rd, t_max,
                        eps=eps, active=active)
