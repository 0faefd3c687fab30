"""Pixel-grid data parallelism over a `jax.sharding.Mesh`.

The reference's only parallelism is the implicit one-fragment-per-pixel
SIMT dispatch (reference: shaders/rt/rt_fullscreen.vert:29-48).  The
TPU-native equivalent: shard the image rows across chips, replicate the
scene (BVH + env map fit in HBM many times over), and let XLA insert ICI
collectives where the SVGF stencil needs row halos.

We use `jax.jit` with NamedSharding constraints rather than shard_map:
every op in the frame function is elementwise, a gather into replicated
scene arrays, or a static-shift stencil — exactly the cases where XLA's
SPMD partitioner produces the right collectives (halo exchange via
collective-permute) automatically.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pipeline import (render_frame, RenderState, FrameInputs,
                               accum_planes)


def make_mesh(devices=None, axis: str = "rows") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _accum_spec(axis: str) -> P:
    """Row-sharding spec for the accum layout in effect (planes mode
    carries rows on the SECOND axis of [4,H,W])."""
    return P(None, axis, None) if accum_planes() else P(axis, None, None)


def shard_image_rows(mesh: Mesh, state: RenderState) -> RenderState:
    """Place the accumulation buffer row-sharded across the mesh."""
    sh = NamedSharding(mesh, _accum_spec(mesh.axis_names[0]))
    return RenderState(jax.device_put(state.accum, sh),
                       jax.device_put(state.frame_index,
                                      NamedSharding(mesh, P())))


def render_frame_sharded(mesh: Mesh, params, fin: FrameInputs,
                         state: RenderState, env_map=None, bvh=None, *,
                         height: int, width: int, use_bvh: bool = False,
                         show_motion: bool = False):
    """render_frame with row-sharded image state and replicated scene."""
    axis = mesh.axis_names[0]
    rows = NamedSharding(mesh, _accum_spec(axis))

    def fn(params, fin, state, env_map, bvh):
        # allow_svgf_pallas=False: GSPMD cannot partition the Mosaic
        # SVGF custom call over the row-sharded image; the jnp stencil
        # partitions into collective-permute halo exchanges
        st, out = render_frame(params, fin, state, env_map, bvh,
                               height=height, width=width, use_bvh=use_bvh,
                               show_motion=show_motion,
                               allow_svgf_pallas=False)
        st = RenderState(jax.lax.with_sharding_constraint(st.accum, rows),
                         st.frame_index)
        return st, out

    return fn(params, fin, state, env_map, bvh)


def make_sharded_render_fn(mesh: Mesh, height: int, width: int,
                           use_bvh: bool = False, show_motion: bool = False,
                           donate: bool = True):
    """jit-compiled multi-chip frame function.

    Image rows live sharded on the mesh; scene arrays are replicated; the
    final image comes back row-sharded (callers gather only for host IO).
    """
    def fn(params, fin, state, env_map, bvh):
        return render_frame_sharded(mesh, params, fin, state, env_map, bvh,
                                    height=height, width=width,
                                    use_bvh=use_bvh, show_motion=show_motion)
    return jax.jit(fn, donate_argnums=(2,) if donate else ())
