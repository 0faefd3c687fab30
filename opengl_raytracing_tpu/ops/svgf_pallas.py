"""SVGF-lite as a fused Pallas stencil.

The jnp version (ops/svgf.py) expresses the 7x7 variance-guided filter as
49 shifted slices and leans on XLA fusion; this kernel fuses the whole
stencil explicitly: per BH-row output band it DMAs one (12-plane) halo
slab HBM->VMEM and evaluates all 49 taps from VMEM, reading each input
pixel once per band instead of once per tap.

r3 restructure (this file): the original BH=8 bands re-read a 24-row
slab for every 8 output rows (3x input overread, 318 MB/frame at 1080p)
and issued each slab DMA synchronously before compute.  BH=32 with a
two-buffer slab prefetch pipeline cuts the overread to 1.5x —
`ORT_SVGF_BH` / `ORT_SVGF_DB` expose the schedule for on-device A/B —
BUT the r3i hardware session showed the 32/double-buffer combination
FAILS TPU compilation (scoped-vmem kernel stack OOM class; the 12 MB
slab-only budget model below misses the 49-tap unroll's live compute
temporaries), so the default stays the silicon-proven 8/single-buffer
schedule (full preset 43.5 ms r3i; 13.8 vs 17.3 ms jnp, r2) until the
r3j compile bisection clears a bigger band.

Same math as reference: shaders/rt/rt_present.frag:126-225 (see
ops/svgf.py for the annotated weight formulas); boundary taps get zero
weight exactly like the GLSL `continue`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import YCOEFF
from ..params import RenderParams
from .vecmath import smoothstep

PAD = 3          # stencil radius
ROWPAD = 8       # row halo in the plane stack (8-aligned for DMA slicing)
K_NRM = 2.0      # rt_present.frag:160
K_POS = 0.02     # rt_present.frag:161
NPLANES = 12     # r g b m2 motx moty px py pz nx ny nz
VMEM_BUDGET = 12 * 2 ** 20   # slab-buffer budget (leave room for outputs)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _band_config(wp: int):
    """(band height, slab buffer count) honoring knobs + VMEM budget.

    ORT_SVGF_BH: output rows per grid step (default 8 — the schedule
    proven on TPU silicon; 32 enables the prefetch-era banding that
    currently fails Mosaic compile at 1080p, see module docstring).
    ORT_SVGF_DB=1 enables the slab prefetch double buffer.  BH halves
    (min 8) until nbuf slabs fit the budget."""
    bh = int(os.environ.get("ORT_SVGF_BH", "8") or "8")
    bh = max(8, (bh // 8) * 8)
    nbuf = 2 if os.environ.get("ORT_SVGF_DB", "0") == "1" else 1
    while bh > 8 and nbuf * NPLANES * (bh + 2 * ROWPAD) * wp * 4 > VMEM_BUDGET:
        bh //= 2
    return bh, nbuf


def _kernel(par_ref, planes_ref, out_ref, slab, sem, *, h: int, w: int,
            bh: int, nbuf: int):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    var_max, k_var0, k_color0, k_var_m, k_color_m = (
        par_ref[0, 0], par_ref[0, 1], par_ref[0, 2], par_ref[0, 3],
        par_ref[0, 4])

    # slab rows [i*bh, i*bh + bh + 2*ROWPAD) of the padded plane stack —
    # 8-aligned offset and height as Mosaic requires for HBM slices.
    def slab_copy(i, slot):
        return pltpu.make_async_copy(
            planes_ref.at[:, pl.ds(i * bh, bh + 2 * ROWPAD), :],
            slab.at[slot], sem.at[slot])

    cur = jax.lax.rem(b, nbuf)
    if nbuf > 1:
        # prefetch pipeline: band 0 warms up its own slab, then every
        # band starts band b+1's copy into the other buffer before
        # waiting on its own (scratch persists across grid steps).
        @pl.when(b == 0)
        def _():
            slab_copy(0, 0).start()

        @pl.when(b + 1 < nb)
        def _():
            slab_copy(b + 1, jax.lax.rem(b + 1, nbuf)).start()
    else:
        slab_copy(b, cur).start()
    slab_copy(b, cur).wait()
    sl = slab.at[cur]

    def center(k):
        return sl[k, ROWPAD:ROWPAD + bh, PAD:PAD + w]

    def tap(k, dy, dx):
        return sl[k, ROWPAD + dy:ROWPAD + dy + bh, PAD + dx:PAD + dx + w]

    cr, cg, cb = center(0), center(1), center(2)
    m2 = center(3)
    l_center = cr * YCOEFF[0] + cg * YCOEFF[1] + cb * YCOEFF[2]
    var_center = jnp.clip(m2 - l_center * l_center, 0.0, var_max)

    mot_mag = jnp.sqrt(center(4) ** 2 + center(5) ** 2)
    t = smoothstep(0.005, 0.05, mot_mag)
    k_var = k_var0 + (k_var_m - k_var0) * t
    k_color = k_color0 + (k_color_m - k_color0) * t
    var_boost = 1.0 + var_center * (1.0 + k_var * 0.5)

    # normal planes arrive pre-normalized (svgf_filter_pallas) — no
    # per-tap (or center) rsqrt in the kernel
    pxc, pyc, pzc = center(6), center(7), center(8)
    nxc, nyc, nzc = center(9), center(10), center(11)

    # validity coordinates
    row = (jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0)
           + b * bh)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)

    acc_r = jnp.zeros((bh, w), jnp.float32)
    acc_g = jnp.zeros((bh, w), jnp.float32)
    acc_b = jnp.zeros((bh, w), jnp.float32)
    acc_w = jnp.zeros((bh, w), jnp.float32)

    # tap-invariant factors hoisted; the three per-tap gaussians fuse
    # into ONE exp (exp(a)exp(b)exp(c) == exp(a+b+c)): 49 exps/pixel
    # instead of 147 and zero per-tap rsqrts (normals pre-normalized)
    k_col_scale = k_color * 0.3 + 0.05
    w_off_center = var_boost * (1.0 + var_center * 4.0)

    for dy in range(-PAD, PAD + 1):
        for dx in range(-PAD, PAD + 1):
            r = tap(0, dy, dx)
            g = tap(1, dy, dx)
            bl = tap(2, dy, dx)
            dc2 = (r - cr) ** 2 + (g - cg) ** 2 + (bl - cb) ** 2

            dpx = tap(6, dy, dx) - pxc
            dpy = tap(7, dy, dx) - pyc
            dpz = tap(8, dy, dx) - pzc
            dist2 = dpx * dpx + dpy * dpy + dpz * dpz

            nx, ny, nz = tap(9, dy, dx), tap(10, dy, dx), tap(11, dy, dx)
            ndot = jnp.clip(nx * nxc + ny * nyc + nz * nzc, -1.0, 1.0)

            expo = (dc2 * k_col_scale + dist2 * K_POS
                    + jnp.maximum(0.0, 1.0 - ndot) * K_NRM)
            base = var_boost if (dy == 0 and dx == 0) else w_off_center

            valid = ((row + dy >= 0) & (row + dy < h)
                     & (col + dx >= 0) & (col + dx < w))
            wgt = jnp.where(valid, base * jnp.exp(-expo), 0.0)
            acc_r = acc_r + r * wgt
            acc_g = acc_g + g * wgt
            acc_b = acc_b + bl * wgt
            acc_w = acc_w + wgt

    inv_w = 1.0 / jnp.maximum(acc_w, 1e-20)
    zero_w = acc_w <= 0.0
    out_ref[0, :, :] = jnp.where(zero_w, cr, acc_r * inv_w)
    out_ref[1, :, :] = jnp.where(zero_w, cg, acc_g * inv_w)
    out_ref[2, :, :] = jnp.where(zero_w, cb, acc_b * inv_w)


def svgf_filter_pallas(accum, motion, gpos, gnrm, params: RenderParams):
    """Drop-in replacement for ops.svgf.svgf_filter (same outputs)."""
    h, w = accum.shape[0], accum.shape[1]
    wp = -(-(w + 2 * PAD) // 128) * 128        # lanes padded to 128
    bh, nbuf = _band_config(wp)
    hb = -(-h // bh) * bh                      # rows padded to band multiple

    # normals normalized once here so the kernel's 49 taps skip rsqrt
    n_inv = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(gnrm * gnrm, axis=-1, keepdims=True), 1e-24))
    gn = gnrm * n_inv

    srcs = [accum[..., 0], accum[..., 1], accum[..., 2], accum[..., 3],
            motion[..., 0], motion[..., 1],
            gpos[..., 0], gpos[..., 1], gpos[..., 2],
            gn[..., 0], gn[..., 1], gn[..., 2]]
    # one stack+pad fusion (a per-plane update-slice chain costs a pass
    # over the whole stack per plane in the worst lowering)
    planes = jnp.pad(jnp.stack(srcs),
                     ((0, 0), (ROWPAD, (hb - h) + ROWPAD),
                      (PAD, wp - w - PAD)))

    par = jnp.stack([
        jnp.asarray(params.svgf_var_max, jnp.float32),
        jnp.asarray(params.svgf_k_var, jnp.float32),
        jnp.asarray(params.svgf_k_color, jnp.float32),
        jnp.asarray(params.svgf_k_var_motion, jnp.float32),
        jnp.asarray(params.svgf_k_color_motion, jnp.float32),
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32)]).reshape(1, 8)

    kern = functools.partial(_kernel, h=h, w=w, bh=bh, nbuf=nbuf)
    out = pl.pallas_call(
        kern,
        grid=(hb // bh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # params (1,8)
            pl.BlockSpec(memory_space=pl.ANY),       # planes stay in HBM
        ],
        out_specs=pl.BlockSpec((3, bh, w), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, hb, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, NPLANES, bh + 2 * ROWPAD, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=_use_interpret(),
    )(par, planes)

    return jnp.moveaxis(out[:, :h, :], 0, -1)
