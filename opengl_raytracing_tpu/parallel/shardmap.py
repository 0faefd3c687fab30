"""Explicit-collective multi-chip renderer (shard_map + ICI primitives).

parallel/sharding.py lets XLA's SPMD partitioner insert the collectives;
this module spells them out with `shard_map`, which is how a production
deployment pins the communication schedule:

  * the image is row-banded over the mesh axis: each chip traces and
    shades ONLY its band (scene arrays replicated in HBM);
  * TAA reprojection may read history anywhere on screen, so the previous
    accumulation is `all_gather`ed over ICI (tiled, one hop per chip) —
    the renderer's analog of sequence-parallel attention gathering keys;
  * the SVGF 7x7 stencil needs 3 rows of each neighbor: two `ppermute`
    ring shifts exchange halos (up and down);
  * frame statistics (mean luminance) reduce with `psum`.

Bitwise-comparable to the single-device renderer (see
tests/test_shardmap.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..constants import YCOEFF
from ..params import RenderParams
from ..models.pipeline import (FrameInputs, RenderState, FrameOutputs,
                               pixel_centers, primary_dirs, trace_and_shade,
                               accum_planes, accum_to_hwc, accum_from_hwc)
from ..ops.scene import SceneCtx
from ..ops.taa import resolve_taa
from ..ops.svgf import svgf_filter, present, blend_tonemap
from ..ops.vecmath import luminance

HALO = 3  # SVGF stencil radius


def _ring_halos(planes, axis: str, n: int):
    """Exchange HALO rows with both neighbors.

    planes [C,BH,W] CHANNEL-MAJOR: the collectives' operands must
    materialize, and a [rows,W,C<128] layout would lane-pad its minor
    dim ~10x (CLAUDE.md SoA rule) — channel-major keeps the dense W on
    lanes.  Returns [C, BH+2*HALO, W] where the first HALO rows came
    from the previous shard (lower global rows) and the last HALO rows
    from the next shard.  Edge shards receive zeros; the filter's
    global-bounds validity masks zero their weights anyway.
    """
    down = [(i, i + 1) for i in range(n - 1)]   # i sends to i+1
    up = [(i + 1, i) for i in range(n - 1)]     # i+1 sends to i
    from_prev = jax.lax.ppermute(planes[:, -HALO:, :], axis, down)
    from_next = jax.lax.ppermute(planes[:, :HALO, :], axis, up)
    # ppermute leaves non-receiving shards with zeros
    return jnp.concatenate([from_prev, planes, from_next], axis=1)


def render_frame_shardmap(mesh: Mesh, params: RenderParams,
                          fin: FrameInputs, state: RenderState,
                          env_map=None, bvh=None, *, height: int, width: int,
                          use_bvh: bool = False, show_motion: bool = False,
                          check_vma: bool = True):
    """One frame with hand-written collectives.  Returns
    (new_state, FrameOutputs, stats) with image/accum row-sharded."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    assert height % n == 0, f"height {height} must divide over {n} shards"
    bh = height // n

    def band_step(accum_local, frame_index):
        accum_local = accum_to_hwc(accum_local)  # [bh,W,4] for the math
        idx = jax.lax.axis_index(axis)
        row0 = idx * bh

        scene = SceneCtx.create(params, fin.cam_pos, env_map=env_map,
                                use_bvh=use_bvh, bvh=bvh)
        px, py = pixel_centers(bh, width, row_offset=row0)
        rd = primary_dirs(px, py, height, width, fin, params)
        curr, motion, gpos, gnrm = trace_and_shade(
            scene, params, fin, px, py, rd, frame_index,
            use_bvh=use_bvh, show_motion=show_motion,
            raygen=(height, width, row0))

        moved = fin.camera_moved > 0
        taa_motion = jnp.where(moved, motion, jnp.zeros_like(motion))

        # Moving camera: TAA reprojection reads ANYWHERE in the history,
        # so gather the full image over ICI.  Still camera (the common
        # interactive state): the still blend only reads the local band,
        # so the gather is skipped entirely — `moved` is replicated
        # across the mesh, making the conditional collective uniform.
        def _taa_moving(_):
            prev_full = jax.lax.all_gather(accum_local, axis, axis=0,
                                           tiled=True)
            return resolve_taa(curr, taa_motion, prev_full, frame_index,
                               params, row_offset=row0, moved=None)

        def _taa_still(_):
            return resolve_taa(curr, jnp.zeros_like(motion), accum_local,
                               frame_index, params, row_offset=0,
                               moved=False)

        # degenerate taa_still_thresh<=0 forces the reprojecting branch
        # even when still (it needs the full-image history for its uv
        # math); mirrors the guard inside resolve_taa
        need_full = jnp.logical_or(
            moved, jnp.asarray(params.taa_still_thresh, jnp.float32) <= 0.0)
        accum_new = jax.lax.cond(need_full, _taa_moving, _taa_still, None)

        if show_motion:
            image = present(accum_new, motion, gpos, gnrm, params,
                            show_motion=True)
        elif params.enable_svgf:
            # halo exchange for the stencil inputs (channel-major, see
            # _ring_halos)
            stack = jnp.concatenate(
                [jnp.moveaxis(a, -1, 0)
                 for a in (accum_new, motion, gpos, gnrm)], axis=0)
            ext = _ring_halos(stack, axis, n)              # [12,bh+6,W]

            def ch(a, b):
                return jnp.moveaxis(ext[a:b], 0, -1)
            filtered = svgf_filter(
                ch(0, 4), ch(4, 6), ch(6, 9), ch(9, 12),
                params, halo=HALO, row_offset=row0, full_height=height)
            image = blend_tonemap(accum_new[..., :3], filtered, params)
        else:
            image = present(accum_new, motion, gpos, gnrm, params)

        # Frame statistic over ICI: mean luminance of the band -> global.
        lum_sum = jax.lax.psum(jnp.sum(luminance(image, YCOEFF)), axis)
        mean_lum = lum_sum / (height * width)

        return accum_from_hwc(accum_new), image, motion, gpos, gnrm, mean_lum

    banded = P(axis, None, None)
    # planes-layout accum ([4,H,W]) row-shards on its SECOND axis
    accum_spec = P(None, axis, None) if accum_planes() else banded
    # check_vma=False is needed ONLY for the forced-MXU interpret-mode
    # configuration (tests/dryrun): Pallas interpret mode's internal
    # dynamic_slice mixes 'rows'-varying operands with unvarying block
    # indices, which the vma checker rejects (JAX suggests exactly this
    # workaround in its error).  On real TPU the kernels compile through
    # Mosaic and full variance checking stays on.
    f = shard_map(
        band_step, mesh=mesh,
        in_specs=(accum_spec, P()),
        out_specs=(accum_spec, banded, banded, banded, banded, P()),
        check_vma=check_vma,
    )
    accum_new, image, motion, gpos, gnrm, mean_lum = f(
        state.accum, state.frame_index)
    new_state = RenderState(accum_new, state.frame_index + 1)
    return new_state, FrameOutputs(image, motion, gpos, gnrm), mean_lum


def make_shardmap_render_fn(mesh: Mesh, height: int,
                            width: int, use_bvh: bool = False,
                            show_motion: bool = False, donate: bool = True,
                            check_vma: bool = True):
    def fn(params, fin, state, env_map, bvh):
        return render_frame_shardmap(mesh, params, fin, state, env_map, bvh,
                                     height=height, width=width,
                                     use_bvh=use_bvh,
                                     show_motion=show_motion,
                                     check_vma=check_vma)
    return jax.jit(fn, donate_argnums=(2,) if donate else ())
