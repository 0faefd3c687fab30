"""Direct & indirect lighting, vectorized over pixel batches.

TPU-native counterpart of reference: shaders/rt/rt_lighting.glsl.  Every
per-fragment branch becomes a masked select over the batch; every scene
trace inside a light loop becomes a full-batch trace.  RNG call sites
reproduce the reference's exact (pixel, frame, offset) hashing so noise —
and therefore TAA/SVGF behavior — matches.

Naming of the RNG arguments follows the GLSL call chain:
  * `rng_frame`  — the `frame` parameter of the GLSL function (sometimes
    the per-sample seed, sometimes uFrameIndex, depending on caller);
  * `frame_index` — the global uFrameIndex uniform (used by cpOffset).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..constants import (EPS, PI, SOFT_SHADOW_SAMPLES, LIGHT_CENTER,
                         LIGHT_NORMAL_RAW, LIGHT_RADIUS, LIGHT_COLOR,
                         BVH_ALBEDO, BVH_SPEC_STRENGTH, BVH_GLOSS, GI_MAX_LUM,
                         GI_MIN_COS_THETA, GLASS_DISTORTION_STRENGTH,
                         GLASS_LOCAL_REFL_WEIGHT, YCOEFF)
from ..sampling import (rand, eps_for_dist, concentric_sample,
                        sample_hemisphere_cosine, cp_offset)
from .materials import (get_material, MaterialProps, MTYPE_DIFFUSE,
                        MTYPE_MIRROR, MTYPE_GLASS)
from .scene import SceneCtx
from .scene_analytic import Hit
from .vecmath import dot, normalize, reflect, refract, mix, const3, length

# Batch the analytic secondary direct-light evaluations (glass tree
# 3-batch, primary+GI 2-batch) into single calls — fewer megakernel
# launches under ORT_AN_PALLAS.  Measured NEGATIVE on hardware (r4b
# triple-pair: an_baseline 7.28 / 7.22 ms batched vs 6.02 sequential
# — the 3x-taller kernel's extra VMEM pressure outweighs the saved
# launches), so the default is the sequential per-call form;
# ORT_AN_LIGHT_BATCH=1 re-enables (bit-parity class: identical
# per-lane math, shape-dependent transcendental ulps only).
AN_LIGHT_BATCH = os.environ.get("ORT_AN_LIGHT_BATCH", "0") == "1"

# Disk light frame, precomputed on host
# (reference: shaders/rt/rt_lighting.glsl:29-32, 355-357).
_KN = np.asarray(LIGHT_NORMAL_RAW, np.float64)
_KN = _KN / np.linalg.norm(_KN)
_LT = np.cross(_KN, [0.0, 1.0, 0.0]) if abs(_KN[1]) < 0.99 \
    else np.cross(_KN, [1.0, 0.0, 0.0])
_LT = _LT / np.linalg.norm(_LT)
_LB = np.cross(_KN, _LT)
LIGHT_N = _KN.astype(np.float32)
LIGHT_T = _LT.astype(np.float32)
LIGHT_B = _LB.astype(np.float32)


def _segment_shadow_query(p, q):
    """(origin, dir, window) for a p->q occlusion segment
    (reference: rt_lighting.glsl:49-55)."""
    delta = q - p
    max_t = length(delta)
    rd = delta / jnp.maximum(max_t, 1e-12)[..., None]
    eps = eps_for_dist(max_t)
    return p + rd * eps[..., None], rd, max_t - eps


def occluded_toward(scene: SceneCtx, p, q):
    """Segment occlusion test (reference: rt_lighting.glsl:49-60)."""
    origin, rd, win = _segment_shadow_query(p, q)
    if scene.use_bvh:
        return scene.trace_shadow_any(origin, rd, win)
    h = scene.trace(origin, rd)
    return h.valid & (h.t < win)


def shade_lambert_phong(n, v, l, li, albedo, spec_strength, gloss):
    """Lambert + Phong BRDF for one light sample
    (reference: rt_lighting.glsl:78-98)."""
    ndl = jnp.maximum(dot(n, l), 0.0)
    diffuse = albedo * (ndl / PI)[..., None]
    h = normalize(l + v)
    ndh = jnp.maximum(dot(n, h), 0.0)
    phong = jnp.power(ndh, gloss)
    spec = jnp.where(spec_strength > 0.0, spec_strength * phong, 0.0)
    out = (diffuse + spec[..., None]) * li
    return jnp.where((ndl > 0.0)[..., None], out, 0.0)


def _sun_shadow_query(scene: SceneCtx, h, n):
    """(origin, dir, window) of the sun shadow ray
    (reference: rt_lighting.glsl:125-136).  epsForDist(1000) == 1.0."""
    max_t = 1000.0
    eps = max(1e-4, 1e-3 * max_t)
    origin = h.p + n * eps
    l = jnp.broadcast_to(-scene.sun_dir, origin.shape)
    return origin, l, jnp.full(jnp.shape(h.t), max_t - eps, jnp.float32)


def sun_direct(scene: SceneCtx, h, mat, vdir, blocked=None):
    """Hard-shadowed directional sun (reference: rt_lighting.glsl:114-144).

    `blocked` may be precomputed by a batched shadow trace."""
    if not scene.params.sun_enabled:
        return jnp.zeros(jnp.shape(h.t) + (3,), jnp.float32)
    n = normalize(h.n)
    v = normalize(vdir)
    l = -scene.sun_dir
    ndl = jnp.maximum(dot(n, l), 0.0)
    if blocked is None:
        origin, ldir, win = _sun_shadow_query(scene, h, n)
        if scene.use_bvh:
            blocked = scene.trace_shadow_any(origin, ldir, win)
        else:
            blocked = scene.trace(origin, ldir).valid  # any hit blocks
    li = const3(scene.params.sun_color) * scene.params.sun_intensity
    spec = jnp.where(mat.mtype == MTYPE_DIFFUSE, mat.spec_strength, 0.0)
    out = shade_lambert_phong(n, v, l, li, mat.albedo, spec, mat.gloss)
    return jnp.where(((ndl > 0.0) & ~blocked)[..., None], out, 0.0)


def sky_direct(scene: SceneCtx, h, mat):
    """Cosine sky dome, diffuse only, unshadowed
    (reference: rt_lighting.glsl:156-169)."""
    if not scene.params.sky_enabled:
        return jnp.zeros(jnp.shape(h.t) + (3,), jnp.float32)
    n = normalize(h.n)
    ndl = jnp.maximum(dot(n, scene.sky_up), 0.0)
    li = const3(scene.params.sky_color) * scene.params.sky_intensity
    return mat.albedo * (ndl / PI)[..., None] * li


def _point_shadow_query(scene: SceneCtx, h):
    """(origin, dir, window) of the point-light shadow ray
    (reference: rt_lighting.glsl:186-201)."""
    to_l = scene.point_light_pos - h.p
    dist = jnp.sqrt(jnp.maximum(dot(to_l, to_l), 1e-20))
    l = to_l / dist[..., None]
    eps = eps_for_dist(dist)
    return h.p + l * eps[..., None], l, dist - eps


def point_direct(scene: SceneCtx, h, mat, vdir, blocked=None):
    """Point light with inverse-square falloff and shadows
    (reference: rt_lighting.glsl:181-214)."""
    if not scene.params.point_light_enabled:
        return jnp.zeros(jnp.shape(h.t) + (3,), jnp.float32)
    n = normalize(h.n)
    v = normalize(vdir)
    to_l = scene.point_light_pos - h.p
    dist2 = dot(to_l, to_l)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    l = to_l / dist[..., None]
    ndl = jnp.maximum(dot(n, l), 0.0)
    if blocked is None:
        origin, ldir, win = _point_shadow_query(scene, h)
        if scene.use_bvh:
            blocked = scene.trace_shadow_any(origin, ldir, win)
        else:
            # marker sphere must not shadow its own light
            tmp = scene.trace_ignore_point_light(origin, ldir)
            blocked = tmp.valid & (tmp.t < win)
    li = (const3(scene.params.point_light_color)
          * (scene.params.point_light_intensity
             / jnp.maximum(dist2, 1e-4))[..., None])
    spec = jnp.where(mat.mtype == MTYPE_DIFFUSE, mat.spec_strength, 0.0)
    out = shade_lambert_phong(n, v, l, li, mat.albedo, spec, mat.gloss)
    ok = (dist2 > 1e-6) & (ndl > 0.0) & ~blocked
    return jnp.where(ok[..., None], out, 0.0)


def _disk_offsets(rng_frame, frame_index, px, py):
    """The per-pixel unit-disk offsets (dx, dy) behind _disk_samples —
    shared with the analytic Pallas megakernel, which reconstructs the
    world-space points in-kernel with the identical FMA order."""
    rot_x, rot_y = cp_offset(px, py, frame_index)
    offs = []
    for i in range(SOFT_SHADOW_SAMPLES):
        ux = rand(px + float(i), py + float(i), rng_frame)
        off = float(31 * i + 7)
        uy = rand(py + off, px + off, rng_frame)
        ux = jnp.mod(ux + rot_x, 1.0)
        uy = jnp.mod(uy + rot_y, 1.0)
        offs.append(concentric_sample(ux, uy))
    return offs


def _disk_samples(rng_frame, frame_index, px, py):
    """The SOFT_SHADOW_SAMPLES world-space disk points per pixel
    (reference: rt_lighting.glsl:359-371)."""
    center = const3(LIGHT_CENTER)
    t_axis = jnp.asarray(LIGHT_T)
    b_axis = jnp.asarray(LIGHT_B)
    xls = []
    for dx, dy in _disk_offsets(rng_frame, frame_index, px, py):
        xls.append(center + t_axis * (dx * LIGHT_RADIUS)[..., None]
                   + b_axis * (dy * LIGHT_RADIUS)[..., None])
    return xls


def _disk_light_sum(scene: SceneCtx, h, n, v, albedo, spec_strength, gloss,
                    rng_frame, frame_index, px, py, xls=None, occ_all=None):
    """Soft disk area light: SOFT_SHADOW_SAMPLES concentric samples with
    per-pixel CP rotation (reference: rt_lighting.glsl:355-387,414-445).

    Shadow rays are traced as ONE batched call (leading sample axis) —
    or consumed from `occ_all` when the caller already batched them with
    other lights' shadow queries."""
    if xls is None:
        xls = _disk_samples(rng_frame, frame_index, px, py)
    if occ_all is None:
        xl_all = jnp.stack(xls, axis=0)                      # [S,...,3]
        occ_all = occluded_toward(scene, h.p[None], xl_all)  # [S,...]

    acc = jnp.zeros(jnp.shape(h.t) + (3,), jnp.float32)
    for i in range(SOFT_SHADOW_SAMPLES):
        xl = xls[i]
        delta = xl - h.p
        l = normalize(delta)
        ndl = jnp.maximum(dot(n, l), 0.0)
        cos_theta_l = jnp.maximum(dot(-jnp.asarray(LIGHT_N), l), 0.0)
        r2 = jnp.maximum(dot(delta, delta), 1e-4)
        geom = ndl * cos_theta_l / r2
        vis = jnp.where(occ_all[i], 0.0, 1.0)
        li = const3(LIGHT_COLOR) * (geom * vis)[..., None]
        acc = acc + shade_lambert_phong(n, v, l, li, albedo, spec_strength,
                                        gloss)
    return acc / float(SOFT_SHADOW_SAMPLES)


def direct_light(scene: SceneCtx, h, rng_frame, frame_index, vdir, px, py):
    """Direct lighting, analytic scene (reference: rt_lighting.glsl:313-395).

    Secondary-hit mirror/glass are approximated by environment reflections
    (no recursion), matching the reference exactly.

    ORT_AN_PALLAS=1 routes the whole tree through the fused Pallas
    megakernel (ops/an_pallas.py) — same math, ~190 MB of streams
    instead of ~7 GB of XLA intermediates per full-lane call.
    """
    from .an_pallas import _enabled as _an_pallas_enabled
    if _an_pallas_enabled():
        from .an_pallas import direct_light_pallas
        return direct_light_pallas(scene, h, rng_frame, frame_index,
                                   vdir, px, py)
    params = scene.params
    n = normalize(h.n)
    mat = get_material(h.mat, params)
    v = normalize(vdir)

    # mirror-like secondary: tinted env reflection (rt_lighting.glsl:325-335)
    r = reflect(-v, n)
    mirror_out = scene.sky(r) * mat.albedo

    # glass-like secondary: env reflection + sky diffuse (.:337-350)
    glass_out = scene.sky(r) * mat.albedo + sky_direct(scene, h, mat)

    # diffuse/phong: disk area light + hybrid lights (.:352-394)
    diff = _disk_light_sum(scene, h, n, v, mat.albedo, mat.spec_strength,
                           mat.gloss, rng_frame, frame_index, px, py)
    diff = diff + sun_direct(scene, h, mat, v)
    diff = diff + sky_direct(scene, h, mat)
    diff = diff + point_direct(scene, h, mat, v)

    out = jnp.where((mat.mtype == MTYPE_MIRROR)[..., None], mirror_out,
                    jnp.where((mat.mtype == MTYPE_GLASS)[..., None],
                              glass_out, diff))
    return out


def direct_light_bvh(scene: SceneCtx, h, rng_frame, frame_index, vdir,
                     px, py, active=None, spp_dup: int = 0):
    """Direct lighting for BVH triangles: hard-coded white plastic
    (reference: rt_lighting.glsl:405-460).

    ALL shadow queries (4 disk + sun + point) go through ONE batched
    any-hit kernel call — the TPU wavefront restructuring of the
    reference's six sequential shadow traces.

    `active` (bool, shape of h.t) marks lanes whose radiance is consumed
    by the caller (primary/GI hits).  Inactive lanes — sky pixels, whose
    result is discarded by a downstream select — are excluded from the
    tile cull hulls and get a collapsed shadow window (-1), so all-sky
    tiles skip the any-hit kernel subtile-wise.  Values on inactive
    lanes are unspecified.

    `spp_dup > 1`: the inputs carry a leading SPP batch axis whose h/n
    rows are BROADCAST copies (models/pipeline.py hoists the shared
    primary hit).  Sun and point shadow rays depend only on (h, n), so
    samples 1.. are exact duplicates of sample 0 — their windows
    collapse to -1 (the any-hit kernel gates those subtiles off) and
    sample 0's occlusion broadcasts back.  Bit-identical by
    construction; the disk queries keep per-sample offsets.
    ORT_SPP_SHADOW_DEDUP=0 reverts (A/B pending, r5)."""
    spp_dedup = (spp_dup > 1 and os.environ.get(
        "ORT_SPP_SHADOW_DEDUP", "1") == "1")
    n = normalize(h.n)
    v = normalize(vdir)
    shape = jnp.shape(h.t)
    albedo = jnp.broadcast_to(const3(BVH_ALBEDO), shape + (3,))
    spec = jnp.full(shape, BVH_SPEC_STRENGTH, jnp.float32)
    gloss = jnp.full(shape, BVH_GLOSS, jnp.float32)
    params = scene.params

    offs = _disk_offsets(rng_frame, frame_index, px, py)
    center = const3(LIGHT_CENTER)
    t_axis = jnp.asarray(LIGHT_T)
    b_axis = jnp.asarray(LIGHT_B)
    xls = [center + t_axis * (dx * LIGHT_RADIUS)[..., None]
           + b_axis * (dy * LIGHT_RADIUS)[..., None] for dx, dy in offs]
    occ_disk = blocked_sun = blocked_point = None
    # ndl gate (ORT_NDL_SHADOW_GATE=0 reverts): the reference never
    # consumes a shadow result where the surface faces away from the
    # light — sunDirect/pointDirect RETURN before the trace when
    # ndl <= 0 (rt_lighting.glsl:122-137, 193-207), and the disk loop
    # multiplies vis by geom = ndl*cosThetaL/r2 == 0
    # (rt_lighting.glsl:433-445).  Collapsing those windows to -1 makes
    # the any-hit kernel skip the rays (dead-lane seeding) with
    # BIT-IDENTICAL output; at the close camera roughly half the
    # surface faces away from any given light.
    ndl_gate = os.environ.get("ORT_NDL_SHADOW_GATE", "1") == "1"

    if scene.use_bvh:
        origins, dirs, wins = [], [], []
        for xl in xls:
            o, d, w = _segment_shadow_query(h.p, xl)
            if ndl_gate:
                facing = ((dot(n, d) > 0.0)
                          & (dot(d, -jnp.asarray(LIGHT_N)) > 0.0))
                w = jnp.where(facing, w, -1.0)
            origins.append(o)
            dirs.append(d)
            wins.append(w)
        def _sample0_only(w):
            # collapse the duplicate samples' windows: those rows trace
            # as dead lanes (seeded occluded, subtile-gated off)
            sidx = jnp.arange(spp_dup, dtype=jnp.int32).reshape(
                (spp_dup,) + (1,) * (w.ndim - 1))
            return jnp.where(sidx == 0, w, -1.0)

        if params.sun_enabled:
            o, d, w = _sun_shadow_query(scene, h, n)
            if ndl_gate:
                w = jnp.where(dot(n, d) > 0.0, w, -1.0)
            origins.append(o)
            dirs.append(d)
            wins.append(_sample0_only(w) if spp_dedup else w)
        if params.point_light_enabled:
            o, d, w = _point_shadow_query(scene, h)
            if ndl_gate:
                w = jnp.where(dot(n, d) > 0.0, w, -1.0)
            origins.append(o)
            dirs.append(d)
            wins.append(_sample0_only(w) if spp_dedup else w)
        # tuple-of-batches: one concatenated any-hit stream, no
        # [k,...,3] stack materialized (bvh_mxu._pad_tiles_multi)
        #
        # ORT_ABLATE_SHADOW splits the shadow block for scripts/ablate.py
        # (never set in production): "win0" collapses every window to -1
        # (the any-hit kernel launches but all subtiles gate off -> the
        # delta vs default prices the kernel's inner walk); "occ0" skips
        # the trace call entirely (the further delta prices wavefront
        # construction + hulls/cull + launch).
        _abl = os.environ.get("ORT_ABLATE_SHADOW", "")
        if _abl == "win0":
            wins = [jnp.full_like(w, -1.0) for w in wins]
        if _abl == "occ0":
            occ = tuple(jnp.zeros(shape, jnp.bool_) for _ in origins)
        else:
            occ = scene.trace_shadow_any(tuple(origins), tuple(dirs),
                                         tuple(wins), active=active)
        occ_disk = occ[:SOFT_SHADOW_SAMPLES]

        def _bcast0(o):
            # duplicate-sample dedup: sample 0's occlusion is the value
            # for every sample (identical rays)
            return (jnp.broadcast_to(o[0:1], shape) if spp_dedup else o)

        k = SOFT_SHADOW_SAMPLES
        if params.sun_enabled:
            blocked_sun = _bcast0(occ[k])
            k += 1
        if params.point_light_enabled:
            blocked_point = _bcast0(occ[k])

    if scene.use_bvh:
        # ORT_BVH_BRDF_PALLAS=1: the whole BRDF tail in one fused Pallas
        # pass (the occlusion bits above already came from the any-hit
        # kernel) — see ops/an_pallas.py
        from .an_pallas import _brdf_enabled
        if _brdf_enabled():
            from .an_pallas import shade_bvh_brdf_pallas
            return shade_bvh_brdf_pallas(scene, h, n, v, offs, occ_disk,
                                         blocked_sun, blocked_point)

    acc = _disk_light_sum(scene, h, n, v, albedo, spec, gloss,
                          rng_frame, frame_index, px, py, xls=xls,
                          occ_all=occ_disk)

    # "fake" analytic material for the hybrid lights (rt_lighting.glsl:448-453)
    fake = MaterialProps(albedo, spec, gloss,
                         jnp.zeros(shape, jnp.int32),
                         jnp.ones(shape, jnp.float32))

    acc = acc + sun_direct(scene, h, fake, v, blocked=blocked_sun)
    acc = acc + sky_direct(scene, h, fake)
    acc = acc + point_direct(scene, h, fake, v, blocked=blocked_point)
    return acc


def one_bounce_gi_analytic(scene: SceneCtx, h0, rng_frame, seed, frame_index,
                           px, py):
    """One cosine-weighted bounce + direct light at the secondary hit
    (reference: rt_lighting.glsl:473-507)."""
    mat0 = get_material(h0.mat, scene.params)
    n0 = normalize(h0.n)
    so = jnp.asarray(seed * 13).astype(jnp.float32)
    so2 = jnp.asarray(seed * 37).astype(jnp.float32)
    ux = rand(px + so, py + so, rng_frame)
    uy = rand(py + so2, px + so2, rng_frame)
    wi = sample_hemisphere_cosine(n0, ux, uy)
    cos_theta = jnp.maximum(dot(n0, wi), 0.0)
    origin = h0.p + n0 * EPS
    h1 = scene.trace(origin, wi, coherent=False)
    li_hit = direct_light(scene, h1, rng_frame, frame_index, -wi, px, py)
    li = jnp.where(h1.valid[..., None], li_hit, scene.sky(wi))
    out = mat0.albedo * (cos_theta / PI)[..., None] * li
    return jnp.where((cos_theta > 0.0)[..., None], out, 0.0)


def direct_and_gi_analytic(scene: SceneCtx, h0, seed, frame_index, vdir,
                           px, py):
    """(direct radiance at h0, GI contribution) with the TWO full-lane
    direct_light evaluations — at the primary hit and at the GI bounce
    hit — fused into ONE 2-batch call (the shadow-wavefront batching
    pattern: one megakernel launch under ORT_AN_PALLAS instead of two,
    one fused XLA evaluation otherwise).

    Per-lane math is identical to
    `direct_light(h0) , one_bounce_gi_analytic(h0)` as the pipeline
    called them: the primary evaluation keeps rng_frame = seed, the
    bounce evaluation keeps rng_frame = frame_index — the rng rows ride
    the batch axis and broadcast through the elementwise hash chain."""
    params = scene.params
    mat0 = get_material(h0.mat, params)
    n0 = normalize(h0.n)
    # hemisphere sample (one_bounce_gi_analytic:363-370, rng_frame there
    # is the pipeline's frame_index)
    so = jnp.asarray(seed * 13).astype(jnp.float32)
    so2 = jnp.asarray(seed * 37).astype(jnp.float32)
    ux = rand(px + so, py + so, frame_index)
    uy = rand(py + so2, px + so2, frame_index)
    wi = sample_hemisphere_cosine(n0, ux, uy)
    cos_theta = jnp.maximum(dot(n0, wi), 0.0)
    h1 = scene.trace(h0.p + n0 * EPS, wi, coherent=False)

    shp = jnp.broadcast_shapes(jnp.shape(h0.t), jnp.shape(h1.t))

    def b(x, vec=False):
        return jnp.broadcast_to(x, shp + ((3,) if vec else ()))

    h_pair = Hit(jnp.stack([b(h0.t), b(h1.t)]),
                 jnp.stack([b(h0.p, True), b(h1.p, True)]),
                 jnp.stack([b(h0.n, True), b(h1.n, True)]),
                 jnp.stack([b(h0.mat), b(h1.mat)]))
    v_pair = jnp.stack([b(vdir, True), b(-wi, True)])
    # int32, not float: rand()'s frame path wraps int32 bits (seed*1663
    # exceeds f32 exactness past frame ~10k)
    rng_pair = jnp.stack([
        jnp.broadcast_to(jnp.asarray(seed, jnp.int32), shp),
        jnp.broadcast_to(jnp.asarray(frame_index, jnp.int32), shp)])
    px2 = jnp.broadcast_to(px, (2,) + shp)
    py2 = jnp.broadcast_to(py, (2,) + shp)
    lit = direct_light(scene, h_pair, rng_pair, frame_index, v_pair,
                       px2, py2)

    li = jnp.where(h1.valid[..., None], lit[1], scene.sky(wi))
    gi = mat0.albedo * (cos_theta / PI)[..., None] * li
    gi = jnp.where((cos_theta > 0.0)[..., None], gi, 0.0)
    return lit[0], gi


def one_bounce_gi_bvh(scene: SceneCtx, h0, rng_frame, seed, frame_index,
                      px, py, active=None):
    """BVH GI with grazing-angle cut and firefly luminance clamp
    (reference: rt_lighting.glsl:515-561).

    Inactive lanes (sky pixels) trace degenerate far-away rays that the
    cull drops, and their (discarded) secondary lighting is gated too."""
    so = jnp.asarray(seed * 19).astype(jnp.float32)
    so2 = jnp.asarray(seed * 41).astype(jnp.float32)
    ux = rand(px + so, py + so, rng_frame)
    uy = rand(py + so2, px + so2, rng_frame)
    n0 = normalize(h0.n)
    wi = sample_hemisphere_cosine(n0, ux, uy)
    cos_theta = jnp.maximum(dot(n0, wi), 0.0)
    origin = h0.p + n0 * EPS
    h1 = scene.trace(origin, wi, coherent=False, active=active)
    act1 = h1.valid if active is None else (active & h1.valid)
    li_hit = direct_light_bvh(scene, h1, rng_frame, frame_index, -wi, px, py,
                              active=act1)
    li = jnp.where(h1.valid[..., None], li_hit, scene.sky(wi))
    contrib = const3(BVH_ALBEDO) * (cos_theta / PI)[..., None] * li
    lum = dot(contrib, const3(YCOEFF))
    scale = jnp.where(lum > GI_MAX_LUM,
                      GI_MAX_LUM / jnp.maximum(lum, 1e-6), 1.0)
    contrib = contrib * scale[..., None]
    return jnp.where((cos_theta > GI_MIN_COS_THETA)[..., None], contrib, 0.0)


def shade_glass(scene: SceneCtx, h, wo, mat, seed, frame_index, px, py):
    """Thin-glass shading: Fresnel mix of (env+local reflection) and
    (straight-through + softened bent refraction)
    (reference: rt_lighting.glsl:576-663)."""
    n = normalize(h.n)
    v = normalize(wo)
    i = -v
    ior = jnp.maximum(mat.ior, 1.0001)
    eta = 1.0 / ior

    # The reflected / straight-through / bent secondary rays are
    # independent given the primary hit, so all three trace AND light
    # as ONE 3-batch wavefront (leading batch axis) — one megakernel
    # launch instead of three under ORT_AN_PALLAS, one fused trace in
    # the jnp path (the shadow-wavefront batching pattern).  Per-lane
    # math is unchanged.
    r = reflect(i, n)
    reflect_env = scene.sky(r)
    cos_theta = jnp.clip(dot(-i, n), 0.0, 1.0)
    t_phys, k = refract(i, n, eta)
    t_dir = normalize(mix(i, normalize(t_phys), GLASS_DISTORTION_STRENGTH))

    if AN_LIGHT_BATCH:
        dirs = jnp.stack([r, i, t_dir], axis=0)         # [3,...,3]
        h3 = scene.trace_ignore_glass(h.p[None] + dirs * EPS, dirs)
        v23 = normalize(scene.cam_pos - h3.p)
        # px/py carry the batch axis exactly like the SPP axis does in
        # the pipeline, so the RNG/offset chains broadcast per row
        px3 = jnp.broadcast_to(px, (3,) + jnp.shape(px))
        py3 = jnp.broadcast_to(py, (3,) + jnp.shape(py))
        lit3 = direct_light(scene, h3, seed, frame_index, v23, px3, py3)
        valid = h3.valid
        refl_lit, straight_lit, bent_lit = lit3[0], lit3[1], lit3[2]
        refl_valid, str_valid, bent_valid = valid[0], valid[1], valid[2]
    else:
        h_refl = scene.trace_ignore_glass(h.p + r * EPS, r)
        v2 = normalize(scene.cam_pos - h_refl.p)
        refl_lit = direct_light(scene, h_refl, seed, frame_index, v2,
                                px, py)
        h_straight = scene.trace_ignore_glass(h.p + i * EPS, i)
        v2s = normalize(scene.cam_pos - h_straight.p)
        straight_lit = direct_light(scene, h_straight, seed, frame_index,
                                    v2s, px, py)
        h_refr = scene.trace_ignore_glass(h.p + t_dir * EPS, t_dir)
        v2r = normalize(scene.cam_pos - h_refr.p)
        bent_lit = direct_light(scene, h_refr, seed, frame_index, v2r,
                                px, py)
        refl_valid, str_valid, bent_valid = (h_refl.valid,
                                             h_straight.valid,
                                             h_refr.valid)

    # Reflection: env + local
    reflect_local = jnp.where(refl_valid[..., None], refl_lit, reflect_env)
    reflect_col = mix(reflect_env, reflect_local, GLASS_LOCAL_REFL_WEIGHT)

    # Straight-through
    straight_col = jnp.where(str_valid[..., None], straight_lit,
                             scene.sky(i))

    # Bent refraction, softened toward straight-through
    bent_col = jnp.where(bent_valid[..., None], bent_lit, scene.sky(t_dir))

    refr_col = jnp.where((k > 0.0)[..., None],
                         mix(straight_col, bent_col,
                             GLASS_DISTORTION_STRENGTH),
                         straight_col)
    refr_col = refr_col * mat.albedo

    f0 = ((ior - 1.0) / (ior + 1.0)) ** 2
    fresnel = f0 + (1.0 - f0) * jnp.power(1.0 - cos_theta, 5.0)
    return mix(refr_col, reflect_col, fresnel[..., None])


def shade_mirror(scene: SceneCtx, h, wo, mat, seed, frame_index, px, py):
    """Perfect mirror: one reflected trace + direct light (+ optional GI)
    at the reflected hit (reference: rt_lighting.glsl:675-708)."""
    n = normalize(h.n)
    i = -normalize(wo)
    r = reflect(i, n)
    org = h.p + r * EPS
    h2 = scene.trace(org, r)
    col_hit = direct_light(scene, h2, seed, frame_index, -r, px, py)
    if scene.params.enable_gi:
        gi_seed = seed * 131 + 17
        col_hit = col_hit + (jnp.float32(scene.params.gi_scale_analytic)
                             * one_bounce_gi_analytic(scene, h2, seed,
                                                      gi_seed, frame_index,
                                                      px, py))
    col = jnp.where(h2.valid[..., None], col_hit, scene.sky(r))
    return col * mat.albedo


def compute_ao(scene: SceneCtx, h, frame_index, px, py, active=None):
    """Cosine-hemisphere ambient occlusion, radius-limited, remapped to
    [ao_min, 1] (reference: rt_lighting.glsl:721-757).

    BVH mode uses the ANY-hit kernel with window ao_radius — boolean-
    identical to the reference's closest-hit-then-compare (a hit exists
    within the radius iff the closest hit is within it) but with any-hit
    early-out, t-capped culling, and no normal/winner bookkeeping."""
    params = scene.params
    n = normalize(h.n)
    dirs = []
    for i in range(params.ao_samples):
        o1 = float(37 * i + 3)
        o2 = float(19 * i + 11)
        ux = rand(px + o1, py + o1, frame_index)
        uy = rand(py + o2, px + o2, frame_index)
        dirs.append(sample_hemisphere_cosine(n, ux, uy))
    org = h.p + n * params.ao_bias
    if scene.use_bvh:
        # tuple-of-batches: S hemisphere batches share one origin batch
        # and one window; no [S,...,3] stack is materialized
        win = jnp.full(jnp.shape(h.t), params.ao_radius, jnp.float32)
        occ_hit = scene.trace_shadow_any(
            (org,) * len(dirs), tuple(dirs), (win,) * len(dirs),
            active=active)
        occluded = jnp.sum(jnp.where(occ_hit, 1.0, 0.0), axis=0)
    else:
        d_all = jnp.stack(dirs, axis=0)                # [S,...,3]
        act = None if active is None else jnp.broadcast_to(
            active[None], d_all.shape[:-1])
        tmp = scene.trace(org[None], d_all, coherent=False,
                          active=act)                  # one batched trace
        occluded = jnp.sum(
            jnp.where(tmp.valid & (tmp.t < params.ao_radius), 1.0, 0.0),
            axis=0)
    occ = occluded / float(params.ao_samples)
    ao = 1.0 - occ
    ao = jnp.clip(params.ao_min + (1.0 - params.ao_min) * ao,
                  params.ao_min, 1.0)
    return ao
