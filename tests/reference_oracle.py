"""TEST FIXTURE ONLY: a deliberately LITERAL NumPy transcription of the
reference fragment-shader pipeline, per pixel, used to verify that the
production TPU renderer reproduces the reference's shading — not just a
self-consistent implementation of it.

Transcribed 1:1 (names, control flow, constants) from:
  - shaders/rt/rt_common.glsl       (hash2/rand/ld2/concentric/eps/ndc)
  - shaders/rt/rt_materials.glsl    (getMaterial)
  - shaders/rt/rt_scene_analytic.glsl (plane/sphere/scene/sky)
  - shaders/rt/rt_bvh.glsl:154-170,260-304 (triHit semantics; traversal
    replaced by brute force over all triangles — same closest hit)
  - shaders/rt/rt_lighting.glsl     (all lighting)
  - shaders/rt/rt.frag:50-197       (main loop)
  - shaders/rt/rt_present.frag:65-69,262-264 (ACES + gamma)

This is NOT production code and is intentionally slow (scalar loops).
"""

import math

import numpy as np

M32 = 0xFFFFFFFF


def _v(x, y, z):
    return np.array([x, y, z], np.float64)


# ---- rt_uniforms defaults (reference: include/render/RenderParams.h) ----

class U:
    """The uniform block, loaded from a RenderParams-like mapping."""

    def __init__(self, params, width, height, cam, use_bvh=False, tris=None,
                 frame_index=0):
        p = params
        self.EPS = 1e-4
        self.PI = math.pi
        self.INF = 1e30
        self.uSpp = int(p.spp_per_frame)
        self.uFrameIndex = int(frame_index)
        self.uEnableJitter = int(p.enable_jitter)
        self.uJitter = np.zeros(2)
        self.uResolution = np.array([width, height], np.float64)
        right, up, fwd, thf = cam.basis()
        self.uCamPos = np.asarray(cam.position, np.float64)
        self.uCamRight = np.asarray(right, np.float64)
        self.uCamUp = np.asarray(up, np.float64)
        self.uCamFwd = np.asarray(fwd, np.float64)
        self.uTanHalfFov = float(thf)
        self.uAspect = float(cam.aspect)
        self.uUseBVH = 1 if use_bvh else 0
        self.tris = tris  # [T,9] v0,e1,e2 world space
        self.uUseEnvMap = 0  # oracle tests run without an env map
        self.uEnvIntensity = float(p.env_map_intensity)
        self.uEnableGI = int(p.enable_gi)
        self.uGiScaleAnalytic = float(p.gi_scale_analytic)
        self.uGiScaleBVH = float(p.gi_scale_bvh)
        self.uEnableAO = int(p.enable_ao)
        self.uAO_SAMPLES = int(p.ao_samples)
        self.uAO_RADIUS = float(p.ao_radius)
        self.uAO_BIAS = float(p.ao_bias)
        self.uAO_MIN = float(p.ao_min)
        self.uSunEnabled = int(p.sun_enabled)
        self.uSunColor = np.asarray(p.sun_color, np.float64)
        self.uSunIntensity = float(p.sun_intensity)
        # uploaded unnegated (reference: src/render/render.cpp:149-153);
        # the shader negates it (rt_lighting.glsl:120)
        self.uSunDir = dir_from_yaw_pitch(p.sun_yaw, p.sun_pitch)
        self.uSkyEnabled = int(p.sky_enabled)
        self.uSkyColor = np.asarray(p.sky_color, np.float64)
        self.uSkyIntensity = float(p.sky_intensity)
        self.uSkyUpDir = dir_from_yaw_pitch(p.sky_yaw, p.sky_pitch)
        self.uPointLightEnabled = int(p.point_light_enabled)
        self.uPointLightColor = np.asarray(p.point_light_color, np.float64)
        self.uPointLightIntensity = float(p.point_light_intensity)
        self.uPointLightPos = np.asarray(p.point_light_pos, np.float64)
        self.uMatAlbedo_AlbedoColor = np.asarray(p.mat_albedo_color,
                                                 np.float64)
        self.uMatAlbedo_SpecStrength = float(p.mat_albedo_spec_strength)
        self.uMatAlbedo_Gloss = float(p.mat_albedo_gloss)
        self.uMatGlass_Enabled = int(p.mat_glass_enabled)
        self.uMatGlass_Albedo = np.asarray(p.mat_glass_color, np.float64)
        self.uMatGlass_IOR = float(p.mat_glass_ior)
        self.uMatGlass_Distortion = float(p.mat_glass_distortion)
        self.uMatMirror_Enabled = int(p.mat_mirror_enabled)
        self.uMatMirror_Albedo = np.asarray(p.mat_mirror_color, np.float64)
        self.uMatMirror_Gloss = float(p.mat_mirror_gloss)
        self.uExposure = float(p.exposure)
        # motion/TAA/SVGF uniforms (reference: rt_uniforms.glsl; VPs and
        # uCameraMoved are per-frame, set by render_sequence)
        vp = np.asarray(cam.view_projection(), np.float64)
        self.uCurrViewProj = vp
        self.uPrevViewProj = vp.copy()
        self.uCameraMoved = 0
        self.uEnableTAA = int(p.enable_taa)
        self.uTaaStillThresh = float(p.taa_still_thresh)
        self.uTaaHardMovingThresh = float(p.taa_hard_moving_thresh)
        self.uTaaHistoryMinWeight = float(p.taa_history_min_weight)
        self.uTaaHistoryAvgWeight = float(p.taa_history_avg_weight)
        self.uTaaHistoryMaxWeight = float(p.taa_history_max_weight)
        self.uTaaHistoryBoxSize = float(p.taa_history_box_size)
        self.uEnableSVGF = int(p.enable_svgf)
        self.uSvgfStrength = float(p.svgf_strength)
        self.uVarMax = float(p.svgf_var_max)
        self.uKVar = float(p.svgf_k_var)
        self.uKColor = float(p.svgf_k_color)
        self.uKVarMotion = float(p.svgf_k_var_motion)
        self.uKColorMotion = float(p.svgf_k_color_motion)


def dir_from_yaw_pitch(yaw_deg, pitch_deg):
    """(reference: src/render/render.cpp:35-51)"""
    yaw, pitch = math.radians(yaw_deg), math.radians(pitch_deg)
    d = _v(math.cos(pitch) * math.cos(yaw), math.sin(pitch),
           math.cos(pitch) * math.sin(yaw))
    if d @ d < 1e-6:
        return _v(0.0, -1.0, 0.0)
    return d / np.linalg.norm(d)


# ---- rt_common.glsl ----

def hash2(vx, vy):
    """(reference: rt_common.glsl:57-63)"""
    vx = (vx * 1664525 + 1013904223) & M32
    vy = (vy * 1664525 + 1013904223) & M32
    vx ^= vy >> 16
    vy ^= (vx << 5) & M32
    vx = (vx * 1664525 + 1013904223) & M32
    vy = (vy * 1664525 + 1013904223) & M32
    return vx ^ vy


def rand(px, py, frame):
    """(reference: rt_common.glsl:75-77)"""
    ux = (int(px) ^ (frame & M32)) & M32
    uy = (int(py) ^ ((frame * 1663) & M32)) & M32
    return hash2(ux, uy) / 4294967296.0


def eps_for_dist(d):
    """(reference: rt_common.glsl:88-90)"""
    return max(1e-4, 1e-3 * d)


def halton(i, b):
    """(reference: rt_common.glsl:106-116)"""
    f, r, n = 1.0, 0.0, i
    while n > 0:
        f /= b
        r += f * (n % b)
        n //= b
    return r


def ld2(i):
    """(reference: rt_common.glsl:127-129)"""
    return np.array([halton(i + 1, 2), halton(i + 1, 3)])


def concentric_sample(u, PI):
    """(reference: rt_common.glsl:144-159)"""
    a = 2.0 * u[0] - 1.0
    b = 2.0 * u[1] - 1.0
    if a == 0.0 and b == 0.0:
        r, phi = 0.0, 0.0
    elif abs(a) > abs(b):
        r = a
        phi = (PI / 4.0) * (b / a)
    else:
        r = b
        phi = (PI / 2.0) - (PI / 4.0) * (a / b)
    return r * np.array([math.cos(phi), math.sin(phi)])


def ndc_from_world(p, VP):
    """(reference: rt_common.glsl:175-179)"""
    clip = VP @ np.array([p[0], p[1], p[2], 1.0])
    ndc = clip[:3] / max(clip[3], 1e-6)
    return ndc[:2]


# ---- rt_materials.glsl ----

MAT_FLOOR = 0
MAT_ALBEDO_SPHERE = 1
MAT_GLASS_SPHERE = 2
MAT_MIRROR_SPHERE = 3
MAT_POINTLIGHT_SPHERE = 4


class MaterialProps:
    def __init__(self, albedo, spec, gloss, mtype, ior):
        self.albedo = albedo
        self.specStrength = spec
        self.gloss = gloss
        self.type = mtype
        self.ior = ior


def get_material(u: U, mid):
    """(reference: rt_materials.glsl:57-125)"""
    if mid == MAT_FLOOR:
        return MaterialProps(_v(0.7, 0.7, 0.7), 0.1, 16.0, 0, 1.0)
    if mid == MAT_ALBEDO_SPHERE:
        return MaterialProps(u.uMatAlbedo_AlbedoColor,
                             u.uMatAlbedo_SpecStrength,
                             u.uMatAlbedo_Gloss, 0, 1.0)
    if mid == MAT_GLASS_SPHERE:
        if u.uMatGlass_Enabled == 0:
            return MaterialProps(u.uMatAlbedo_AlbedoColor,
                                 u.uMatAlbedo_SpecStrength,
                                 u.uMatAlbedo_Gloss, 0, 1.0)
        return MaterialProps(u.uMatGlass_Albedo, u.uMatGlass_Distortion,
                             1.0, 2, u.uMatGlass_IOR)
    if mid == MAT_MIRROR_SPHERE:
        if u.uMatMirror_Enabled == 0:
            return MaterialProps(u.uMatAlbedo_AlbedoColor,
                                 u.uMatAlbedo_SpecStrength,
                                 u.uMatAlbedo_Gloss, 0, 1.0)
        return MaterialProps(u.uMatMirror_Albedo, 0.0, u.uMatMirror_Gloss,
                             1, 1.0)
    return MaterialProps(_v(0.8, 0.8, 0.8), 0.2, 16.0, 0, 1.0)


# ---- rt_scene_analytic.glsl ----

kFloorNormal = _v(0.0, 1.0, 0.0)
kFloorD = 0.0
kSphereLeftCenter = _v(-1.2, 1.0, -3.5)
kSphereLeftRadius = 1.0
kGlassCenter = _v(0.7, 1.0, -5.0)
kGlassRadius = 1.0
kMirrorCenter = _v(1.2, 0.7, -2.5)
kMirrorRadius = 0.7
kPointLightRadius = 0.15


class Hit:
    def __init__(self):
        self.t = 0.0
        self.p = _v(0, 0, 0)
        self.n = _v(0, 0, 0)
        self.mat = 0


def intersect_plane(u, ro, rd, n, d, mat_id):
    """(reference: rt_scene_analytic.glsl:71-81)"""
    denom = n @ rd
    if abs(denom) < 1e-6:
        return None
    t = -((n @ ro) + d) / denom
    if t < u.EPS:
        return None
    h = Hit()
    h.t, h.p, h.n, h.mat = t, ro + rd * t, n, mat_id
    return h


def intersect_sphere(u, ro, rd, c, r, mat_id):
    """(reference: rt_scene_analytic.glsl:96-111)"""
    oc = ro - c
    b = oc @ rd
    c2 = oc @ oc - r * r
    disc = b * b - c2
    if disc < 0.0:
        return None
    s = math.sqrt(disc)
    t = -b - s
    if t < u.EPS:
        t = -b + s
    if t < u.EPS:
        return None
    h = Hit()
    h.t = t
    h.p = ro + rd * t
    h.n = (h.p - c) / np.linalg.norm(h.p - c)
    h.mat = mat_id
    return h


def trace_analytic_core(u, ro, rd, include_glass, include_pl):
    """(reference: rt_scene_analytic.glsl:132-167)"""
    best = None

    def consider(h):
        nonlocal best
        if h is not None and (best is None or h.t < best.t):
            best = h

    consider(intersect_plane(u, ro, rd, kFloorNormal, kFloorD, MAT_FLOOR))
    consider(intersect_sphere(u, ro, rd, kSphereLeftCenter,
                              kSphereLeftRadius, MAT_ALBEDO_SPHERE))
    if include_glass:
        consider(intersect_sphere(u, ro, rd, kGlassCenter, kGlassRadius,
                                  MAT_GLASS_SPHERE))
    consider(intersect_sphere(u, ro, rd, kMirrorCenter, kMirrorRadius,
                              MAT_MIRROR_SPHERE))
    if include_pl and u.uPointLightEnabled == 1:
        consider(intersect_sphere(u, ro, rd, u.uPointLightPos,
                                  kPointLightRadius, MAT_POINTLIGHT_SPHERE))
    return best


def trace_analytic(u, ro, rd):
    return trace_analytic_core(u, ro, rd, True, True)


def trace_analytic_ignore_glass(u, ro, rd):
    return trace_analytic_core(u, ro, rd, False, True)


def trace_analytic_ignore_point_light(u, ro, rd):
    return trace_analytic_core(u, ro, rd, True, False)


def sky(u, d):
    """(reference: rt_scene_analytic.glsl:211-223); env map path omitted
    (oracle tests run without an env map)."""
    t = min(max(0.5 * (d[1] + 1.0), 0.0), 1.0)
    a = _v(0.6, 0.7, 0.9) * 0.3
    b = _v(0.1, 0.15, 0.3) * 0.3
    return a + (b - a) * (1.0 - t)  # mix(a, b, 1-t)


# ---- rt_bvh.glsl (brute force replaces traversal; same closest hit) ----

def trace_bvh(u, ro, rd, t_max=None):
    """Closest hit over all triangles, mat forced to 1
    (reference: rt_bvh.glsl:154-243).  Returns Hit or None."""
    tris = u.tris
    if tris is None or len(tris) == 0:
        return None
    cap = u.INF if t_max is None else t_max
    v0, e1, e2 = tris[:, 0:3], tris[:, 3:6], tris[:, 6:9]
    pvec = np.cross(rd[None, :], e2)
    det = np.sum(e1 * pvec, axis=1)
    ok = np.abs(det) >= 1e-8
    inv = 1.0 / np.where(ok, det, 1.0)
    tvec = ro[None, :] - v0
    uu = np.sum(tvec * pvec, axis=1) * inv
    qvec = np.cross(tvec, e1)
    vv = np.sum(rd[None, :] * qvec, axis=1) * inv
    tt = np.sum(e2 * qvec, axis=1) * inv
    acc = (ok & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0) & (uu + vv <= 1.0)
           & (tt >= u.EPS) & (tt <= cap))
    if not acc.any():
        return None
    ti = np.where(acc, tt, np.inf).argmin()
    h = Hit()
    h.t = tt[ti]
    h.p = ro + rd * h.t
    n = np.cross(e1[ti], e2[ti])
    h.n = n / np.linalg.norm(n)
    h.mat = 1
    return h


def trace_bvh_shadow(u, ro, rd, t_max):
    """(reference: rt_bvh.glsl:260-304): any tri hit within [uEPS, tMax]."""
    return trace_bvh(u, ro, rd, t_max) is not None


# ---- rt_lighting.glsl ----

kLightCenter = _v(0.0, 5.0, -3.0)
kLightN = _v(0.0, -1.0, 0.2) / np.linalg.norm(_v(0.0, -1.0, 0.2))
kLightRadius = 1.2
kLightCol = _v(18.0, 18.0, 18.0)


def _normalize(v):
    return v / np.linalg.norm(v)


def occluded_toward(u, p, q):
    """(reference: rt_lighting.glsl:49-60)"""
    rd = _normalize(q - p)
    max_t = np.linalg.norm(q - p)
    eps = eps_for_dist(max_t)
    if u.uUseBVH == 1:
        return trace_bvh_shadow(u, p + rd * eps, rd, max_t - eps)
    h = trace_analytic(u, p + rd * eps, rd)
    return h is not None and h.t < max_t - eps


def shade_lambert_phong(u, N, V, L, Li, albedo, spec_strength, gloss):
    """(reference: rt_lighting.glsl:78-98)"""
    ndl = max(N @ L, 0.0)
    if ndl <= 0.0:
        return _v(0, 0, 0)
    diffuse = albedo * (ndl / u.PI)
    spec = _v(0, 0, 0)
    if spec_strength > 0.0:
        H = _normalize(L + V)
        ndh = max(N @ H, 0.0)
        spec = spec_strength * (ndh ** gloss) * _v(1, 1, 1)
    return (diffuse + spec) * Li


def sun_direct(u, h, mat, vdir):
    """(reference: rt_lighting.glsl:114-144)"""
    if u.uSunEnabled == 0:
        return _v(0, 0, 0)
    N = _normalize(h.n)
    V = _normalize(vdir)
    L = _normalize(-u.uSunDir)
    ndl = max(N @ L, 0.0)
    if ndl <= 0.0:
        return _v(0, 0, 0)
    max_t = 1000.0
    eps = eps_for_dist(max_t)
    origin = h.p + N * eps
    if u.uUseBVH == 1:
        blocked = trace_bvh_shadow(u, origin, L, max_t - eps)
    else:
        blocked = trace_analytic(u, origin, L) is not None
    if blocked:
        return _v(0, 0, 0)
    Li = u.uSunColor * u.uSunIntensity
    spec = mat.specStrength if mat.type == 0 else 0.0
    return shade_lambert_phong(u, N, V, L, Li, mat.albedo, spec, mat.gloss)


def sky_direct(u, h, mat):
    """(reference: rt_lighting.glsl:156-169)"""
    if u.uSkyEnabled == 0:
        return _v(0, 0, 0)
    N = _normalize(h.n)
    Up = _normalize(u.uSkyUpDir)
    ndl = max(N @ Up, 0.0)
    if ndl <= 0.0:
        return _v(0, 0, 0)
    Li = u.uSkyColor * u.uSkyIntensity
    return mat.albedo * (ndl / u.PI) * Li


def point_direct(u, h, mat, vdir):
    """(reference: rt_lighting.glsl:181-214)"""
    if u.uPointLightEnabled == 0:
        return _v(0, 0, 0)
    N = _normalize(h.n)
    V = _normalize(vdir)
    toL = u.uPointLightPos - h.p
    dist2 = toL @ toL
    if dist2 <= 1e-6:
        return _v(0, 0, 0)
    dist = math.sqrt(dist2)
    L = toL / dist
    ndl = max(N @ L, 0.0)
    if ndl <= 0.0:
        return _v(0, 0, 0)
    eps = eps_for_dist(dist)
    origin = h.p + L * eps
    if u.uUseBVH == 1:
        blocked = trace_bvh_shadow(u, origin, L, dist - eps)
    else:
        tmp = trace_analytic_ignore_point_light(u, origin, L)
        blocked = tmp is not None and tmp.t < dist - eps
    if blocked:
        return _v(0, 0, 0)
    Li = u.uPointLightColor * (u.uPointLightIntensity / max(dist2, 1e-4))
    spec = mat.specStrength if mat.type == 0 else 0.0
    return shade_lambert_phong(u, N, V, L, Li, mat.albedo, spec, mat.gloss)


def build_onb(N):
    """(reference: rt_lighting.glsl:227-231)"""
    up = _v(0, 1, 0) if abs(N[1]) < 0.99 else _v(1, 0, 0)
    T = _normalize(np.cross(up, N))
    B = np.cross(N, T)
    return T, B


def sample_hemisphere_cosine(u, N, uv):
    """(reference: rt_lighting.glsl:251-266)"""
    phi = 2.0 * u.PI * uv[0]
    r = math.sqrt(uv[1])
    x = r * math.cos(phi)
    z = r * math.sin(phi)
    y = math.sqrt(max(0.0, 1.0 - uv[1]))
    T, B = build_onb(_normalize(N))
    return _normalize(x * T + z * B + y * _normalize(N))


def cp_offset(u, pix, frame):
    """(reference: rt_lighting.glsl:280-289)"""
    h = np.array([rand(pix[0], pix[1], frame * 911),
                  rand(pix[1], pix[0], frame * 577)])
    ld = ld2(frame)
    return np.mod(h + ld, 1.0)


def _disk_sum(u, h, N, V, albedo, spec_strength, gloss, frame, frag):
    """Disk area light loop shared by directLight / directLightBVH
    (reference: rt_lighting.glsl:355-387, 414-445)."""
    t = _normalize(np.cross(kLightN, _v(0, 1, 0)) if abs(kLightN[1]) < 0.99
                   else np.cross(kLightN, _v(1, 0, 0)))
    b = np.cross(kLightN, t)
    rot = cp_offset(u, frag, u.uFrameIndex)
    ssum = _v(0, 0, 0)
    for i in range(4):  # SOFT_SHADOW_SAMPLES
        uu = np.array([rand(frag[0] + float(i), frag[1] + float(i), frame),
                       rand(frag[1] + float(31 * i + 7),
                            frag[0] + float(31 * i + 7), frame)])
        uu = np.mod(uu + rot, 1.0)
        d = concentric_sample(uu, u.PI) * kLightRadius
        xL = kLightCenter + t * d[0] + b * d[1]
        L = _normalize(xL - h.p)
        ndl = max(N @ L, 0.0)
        cos_theta_l = max((-kLightN) @ L, 0.0)
        r2 = max((xL - h.p) @ (xL - h.p), 1e-4)
        geom = (ndl * cos_theta_l) / r2
        vis = 0.0 if occluded_toward(u, h.p, xL) else 1.0
        Li = kLightCol * geom * vis
        ssum += shade_lambert_phong(u, N, V, L, Li, albedo, spec_strength,
                                    gloss)
    return ssum / 4.0


def direct_light(u, h, frame, vdir, frag):
    """(reference: rt_lighting.glsl:313-395)"""
    N = _normalize(h.n)
    mat = get_material(u, h.mat)
    V = _normalize(vdir)
    if mat.type == 1:
        R = _reflect(-V, N)
        return sky(u, R) * mat.albedo
    if mat.type == 2:
        R = _reflect(-V, N)
        refl = sky(u, R)
        return refl * mat.albedo + sky_direct(u, h, mat)
    ssum = _disk_sum(u, h, N, V, mat.albedo, mat.specStrength, mat.gloss,
                     frame, frag)
    ssum += sun_direct(u, h, mat, V)
    ssum += sky_direct(u, h, mat)
    ssum += point_direct(u, h, mat, V)
    return ssum


def direct_light_bvh(u, h, frame, vdir, frag):
    """(reference: rt_lighting.glsl:405-460)"""
    N = _normalize(h.n)
    albedo = _v(0.85, 0.85, 0.85)
    spec_strength = 0.25
    gloss = 32.0
    V = _normalize(vdir)
    ssum = _disk_sum(u, h, N, V, albedo, spec_strength, gloss, frame, frag)
    fake = MaterialProps(albedo, spec_strength, gloss, 0, 1.0)
    ssum += sun_direct(u, h, fake, V)
    ssum += sky_direct(u, h, fake)
    ssum += point_direct(u, h, fake, V)
    return ssum


def one_bounce_gi_analytic(u, h0, frame, seed, frag):
    """(reference: rt_lighting.glsl:473-507)"""
    mat0 = get_material(u, h0.mat)
    N0 = _normalize(h0.n)
    uu = np.array([rand(frag[0] + float(seed * 13),
                        frag[1] + float(seed * 13), frame),
                   rand(frag[1] + float(seed * 37),
                        frag[0] + float(seed * 37), frame)])
    wi = sample_hemisphere_cosine(u, N0, uu)
    cos_theta = max(N0 @ wi, 0.0)
    if cos_theta <= 0.0:
        return _v(0, 0, 0)
    origin = h0.p + N0 * u.EPS
    h1 = trace_analytic(u, origin, wi)
    if h1 is not None:
        Li = direct_light(u, h1, frame, -wi, frag)
    else:
        Li = sky(u, wi)
    return mat0.albedo * (cos_theta / u.PI) * Li


def one_bounce_gi_bvh(u, h0, frame, seed, frag):
    """(reference: rt_lighting.glsl:515-561)"""
    albedo0 = _v(0.85, 0.85, 0.85)
    uu = np.array([rand(frag[0] + float(seed * 19),
                        frag[1] + float(seed * 19), frame),
                   rand(frag[1] + float(seed * 41),
                        frag[0] + float(seed * 41), frame)])
    N0 = _normalize(h0.n)
    wi = sample_hemisphere_cosine(u, N0, uu)
    cos_theta = max(N0 @ wi, 0.0)
    if cos_theta <= 0.1:  # MIN_COS_THETA
        return _v(0, 0, 0)
    origin = h0.p + N0 * u.EPS
    h1 = trace_bvh(u, origin, wi)
    if h1 is not None:
        Li = direct_light_bvh(u, h1, frame, -wi, frag)
    else:
        Li = sky(u, wi)
    contrib = albedo0 * (cos_theta / u.PI) * Li
    lum = contrib @ _v(0.299, 0.587, 0.114)
    if lum > 8.0:  # MAX_GI_LUM
        contrib *= 8.0 / max(lum, 1e-6)
    return contrib


def _reflect(I, N):
    return I - 2.0 * (I @ N) * N


def _refract(I, N, eta):
    """GLSL refract()."""
    cosi = -(I @ N)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    if k < 0.0:
        return _v(0, 0, 0)
    return eta * I + (eta * cosi - math.sqrt(k)) * N


def shade_glass(u, h, wo, mat, frame, frag):
    """(reference: rt_lighting.glsl:576-663)"""
    N = _normalize(h.n)
    V = _normalize(wo)
    I = -V
    ior = mat.ior
    eta = 1.0 / max(ior, 1.0001)
    distortion = 0.45

    R = _reflect(I, N)
    reflect_env = sky(u, R)
    reflect_local = reflect_env
    h_refl = trace_analytic_ignore_glass(u, h.p + R * u.EPS, R)
    if h_refl is not None:
        V2 = _normalize(u.uCamPos - h_refl.p)
        reflect_local = direct_light(u, h_refl, frame, V2, frag)
    w = 0.4  # localReflWeight
    reflect_col = reflect_env + (reflect_local - reflect_env) * w

    h_straight = trace_analytic_ignore_glass(u, h.p + I * u.EPS, I)
    if h_straight is not None:
        V2 = _normalize(u.uCamPos - h_straight.p)
        straight_col = direct_light(u, h_straight, frame, V2, frag)
    else:
        straight_col = sky(u, I)

    cos_theta = min(max((-I) @ N, 0.0), 1.0)
    k = 1.0 - eta * eta * (1.0 - cos_theta * cos_theta)
    refr_col = straight_col
    if distortion > 0.0 and k > 0.0:
        T_phys = _normalize(_refract(I, N, eta))
        T = _normalize(I + (T_phys - I) * distortion)
        h_refr = trace_analytic_ignore_glass(u, h.p + T * u.EPS, T)
        if h_refr is not None:
            V2 = _normalize(u.uCamPos - h_refr.p)
            bent_col = direct_light(u, h_refr, frame, V2, frag)
        else:
            bent_col = sky(u, T)
        refr_col = straight_col + (bent_col - straight_col) * distortion
    refr_col = refr_col * mat.albedo

    F0 = ((ior - 1.0) / (ior + 1.0)) ** 2
    fresnel = F0 + (1.0 - F0) * (1.0 - cos_theta) ** 5
    return refr_col + (reflect_col - refr_col) * fresnel


def shade_mirror(u, h, wo, mat, frame, frag):
    """(reference: rt_lighting.glsl:675-708)"""
    N = _normalize(h.n)
    I = -_normalize(wo)
    R = _reflect(I, N)
    org = h.p + R * u.EPS
    h2 = trace_analytic(u, org, R)
    if h2 is not None:
        col = direct_light(u, h2, frame, -R, frag)
        if u.uEnableGI == 1:
            gi_seed = frame * 131 + 17
            col = col + u.uGiScaleAnalytic * one_bounce_gi_analytic(
                u, h2, frame, gi_seed, frag)
    else:
        col = sky(u, R)
    return col * mat.albedo


def compute_ao(u, h, frame, frag):
    """(reference: rt_lighting.glsl:721-757)"""
    N = _normalize(h.n)
    occluded = 0
    for i in range(u.uAO_SAMPLES):
        uu = np.array([rand(frag[0] + float(37 * i + 3),
                            frag[1] + float(37 * i + 3), frame),
                       rand(frag[1] + float(19 * i + 11),
                            frag[0] + float(19 * i + 11), frame)])
        d = sample_hemisphere_cosine(u, N, uu)
        org = h.p + N * u.uAO_BIAS
        if u.uUseBVH == 1:
            tmp = trace_bvh(u, org, d)
        else:
            tmp = trace_analytic(u, org, d)
        if tmp is not None and tmp.t < u.uAO_RADIUS:
            occluded += 1
    occ = occluded / u.uAO_SAMPLES
    ao = 1.0 - occ
    ao = min(max(u.uAO_MIN + (1.0 - u.uAO_MIN) * ao, u.uAO_MIN), 1.0)
    return ao


# ---- rt.frag main + present ----

def aces_tonemap(u, x):
    """(reference: rt_present.frag:65-69)"""
    x = x * u.uExposure
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return np.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def render_pixel_mrt(u: U, ix, iy):
    """rt.frag main() for one pixel, stopping BEFORE resolveTAA: the MRT
    outputs (curr linear radiance, motionOut, gpos, gnrm)
    (reference: rt.frag:50-196).  gl_FragCoord = pixel center with GL
    bottom-up rows: (ix+0.5, iy+0.5), iy=0 is the BOTTOM row."""
    SPP = max(u.uSpp, 1)
    frag = np.array([ix + 0.5, iy + 0.5])
    cam_jit = u.uJitter if u.uEnableJitter == 1 else np.zeros(2)
    uv = (frag + cam_jit) / u.uResolution
    ndc = uv * 2.0 - 1.0
    dirv = _normalize(u.uCamFwd
                      + ndc[0] * u.uCamRight * (u.uTanHalfFov * u.uAspect)
                      + ndc[1] * u.uCamUp * u.uTanHalfFov)

    frame_sum = _v(0, 0, 0)
    motion_out = np.zeros(2)
    gpos = _v(0, 0, 0)
    gnrm = _v(0, 0, 0)
    for s in range(SPP):
        seed = u.uFrameIndex * SPP + s
        if u.uUseBVH == 1:
            h = trace_bvh(u, u.uCamPos, dirv)
        else:
            h = trace_analytic(u, u.uCamPos, dirv)
        if h is not None:
            if s == 0:
                # motion + GBuffer from sample 0 (reference: rt.frag:94-101)
                prev_ndc = ndc_from_world(h.p, u.uPrevViewProj)
                curr_ndc = ndc_from_world(h.p, u.uCurrViewProj)
                motion_out = curr_ndc - prev_ndc
                gpos = h.p.copy()
                gnrm = _normalize(h.n)
            V = -dirv
            if u.uUseBVH == 1:
                radiance = direct_light_bvh(u, h, seed, V, frag)
                if u.uEnableGI == 1:
                    radiance = radiance + u.uGiScaleBVH * one_bounce_gi_bvh(
                        u, h, u.uFrameIndex, seed, frag)
                if u.uEnableAO == 1:
                    radiance = radiance * compute_ao(u, h, u.uFrameIndex,
                                                     frag)
            else:
                mat = get_material(u, h.mat)
                if mat.type == 2:
                    radiance = shade_glass(u, h, V, mat, seed, frag)
                elif mat.type == 1:
                    radiance = shade_mirror(u, h, V, mat, seed, frag)
                else:
                    if h.mat == MAT_POINTLIGHT_SPHERE:
                        base_col = (u.uPointLightColor
                                    * u.uPointLightIntensity)
                        d = np.linalg.norm(h.p - u.uCamPos)
                        falloff = 1.0 / max(d * d * 0.25 + 1.0, 1.0)
                        radiance = base_col * falloff
                    else:
                        radiance = direct_light(u, h, seed, V, frag)
                        if u.uEnableGI == 1:
                            radiance = (radiance + u.uGiScaleAnalytic
                                        * one_bounce_gi_analytic(
                                            u, h, u.uFrameIndex, seed, frag))
                        if u.uEnableAO == 1:
                            radiance = radiance * compute_ao(
                                u, h, u.uFrameIndex, frag)
        else:
            radiance = sky(u, dirv)
            # camera-moved miss: sentinel motion kills TAA history
            # (reference: rt.frag:172-175)
            if u.uCameraMoved == 1 and s == 0:
                motion_out = np.array([4.0, 4.0])
        frame_sum = frame_sum + radiance

    return frame_sum / SPP, motion_out, gpos, gnrm


def render_pixel(u: U, ix, iy):
    """One pixel through rt.frag + present with SVGF off (ACES + gamma)
    — the single-frame path the shading parity tests use."""
    curr, _, _, _ = render_pixel_mrt(u, ix, iy)
    mapped = aces_tonemap(u, curr)
    return mapped ** (1.0 / 2.2)


def render_image(u: U, width, height):
    """Full frame [H,W,3], rows bottom-up like the production renderer."""
    img = np.zeros((height, width, 3), np.float64)
    for iy in range(height):
        for ix in range(width):
            img[iy, ix] = render_pixel(u, ix, iy)
    return img


# ---- rt_taa.glsl ----

def _smoothstep(e0, e1, x):
    t = min(max((x - e0) / (e1 - e0), 0.0), 1.0)
    return t * t * (3.0 - 2.0 * t)


def _fetch_nearest(tex, uu, vv):
    """NEAREST + CLAMP_TO_EDGE fetch of tex [H,W,C] at uv in [0,1]
    (accum texture params, reference: src/render/accum.cpp:11-14)."""
    h, w = tex.shape[0], tex.shape[1]
    x = min(max(int(math.floor(uu * w)), 0), w - 1)
    y = min(max(int(math.floor(vv * h)), 0), h - 1)
    return tex[y, x]


def resolve_taa(u: U, curr, uv_curr, motion, prev_accum, frame_index):
    """(reference: rt_taa.glsl:47-180).  Returns rgb+M2 [4]."""
    YC = np.array([0.299, 0.587, 0.114])
    l_curr = curr @ YC
    l_curr2 = l_curr * l_curr
    if u.uEnableTAA == 0 or frame_index == 0:
        return np.append(curr, l_curr2)

    mot_mag = float(np.linalg.norm(motion))

    # CASE 1: effectively still (rt_taa.glsl:86-105)
    if mot_mag < u.uTaaStillThresh:
        prev = _fetch_nearest(prev_accum, uv_curr[0], uv_curr[1])
        if frame_index < 8:
            w_hist = u.uTaaHistoryMinWeight
        elif frame_index < 32:
            w_hist = u.uTaaHistoryAvgWeight
        else:
            w_hist = u.uTaaHistoryMaxWeight
        w_curr = 1.0 - w_hist
        return np.append(prev[:3] * w_hist + curr * w_curr,
                         prev[3] * w_hist + l_curr2 * w_curr)

    # CASE 2: moving — reproject (rt_taa.glsl:116-179)
    uv_prev = np.asarray(uv_curr) - motion * 0.5
    if (uv_prev < 0.0).any() or (uv_prev > 1.0).any():
        return np.append(curr, l_curr2)
    prev = _fetch_nearest(prev_accum, uv_prev[0], uv_prev[1])

    w_hist = 1.0 - _smoothstep(0.02, u.uTaaHardMovingThresh, mot_mag)
    if mot_mag > u.uTaaHardMovingThresh:
        w_hist = 0.0
    l_prev = prev[:3] @ YC
    max_l = max(l_curr, l_prev, 1e-3)
    rel_diff = abs(l_curr - l_prev) / max_l
    w_hist *= 1.0 - _smoothstep(0.03, 0.25, rel_diff)
    if mot_mag > 0.02 and rel_diff > 0.30:
        w_hist = 0.0
    w_hist = min(max(w_hist, 0.0), u.uTaaHistoryMaxWeight)
    w_curr = 1.0 - w_hist
    hist = np.clip(prev[:3], curr - u.uTaaHistoryBoxSize,
                   curr + u.uTaaHistoryBoxSize)
    return np.append(w_hist * hist + w_curr * curr,
                     w_hist * prev[3] + w_curr * l_curr2)


# ---- rt_present.frag: SVGF-lite + present ----

def svgf_filter_px(u: U, accum, motion_tex, gpos, gnrm, ix, iy):
    """(reference: rt_present.frag:126-225).  Direct array indexing: the
    present pass's uv arithmetic lands NEAREST lookups exactly on texel
    boundaries (rt_present.frag:233), whose rounding is unspecified; we
    take the own-pixel interpretation, same as production.  normalize(0)
    for sky pixels is undefined in GLSL; we use the production's
    epsilon-guarded normalize."""
    h_, w_ = accum.shape[0], accum.shape[1]
    c_center = accum[iy, ix, :3]
    m2 = accum[iy, ix, 3]
    YC = np.array([0.299, 0.587, 0.114])
    l_center = c_center @ YC
    var_center = min(max(m2 - l_center * l_center, 0.0), u.uVarMax)

    mot_mag = float(np.linalg.norm(motion_tex[iy, ix]))
    t = min(max(_smoothstep(0.005, 0.05, mot_mag), 0.0), 1.0)
    k_var = u.uKVar + (u.uKVarMotion - u.uKVar) * t
    k_color = u.uKColor + (u.uKColorMotion - u.uKColor) * t
    K_NRM, K_POS = 2.0, 0.02
    var_boost = 1.0 + var_center * (1.0 + k_var * 0.5)

    def nrm(v):
        return v / max(np.linalg.norm(v), 1e-12)

    p_center = gpos[iy, ix]
    n_center = nrm(gnrm[iy, ix])

    acc_col = _v(0, 0, 0)
    acc_w = 0.0
    for j in range(-3, 4):
        for i in range(-3, 4):
            x, y = ix + i, iy + j
            if x < 0 or x >= w_ or y < 0 or y >= h_:
                continue
            c = accum[y, x, :3]
            dc = c - c_center
            w_col = math.exp(-(dc @ dc) * (k_color * 0.3 + 0.05))
            dp = gpos[y, x] - p_center
            w_pos = math.exp(-(dp @ dp) * K_POS)
            ndot = min(max(n_center @ nrm(gnrm[y, x]), -1.0), 1.0)
            w_nrm = math.exp(-max(0.0, 1.0 - ndot) * K_NRM)
            w_spatial = 1.0 if (i == 0 and j == 0) \
                else 1.0 + var_center * 4.0
            w = var_boost * w_col * w_pos * w_nrm * w_spatial
            acc_col = acc_col + c * w
            acc_w += w
    if acc_w <= 0.0:
        return c_center
    return acc_col / acc_w


def present_px(u: U, accum, motion_tex, gpos, gnrm, ix, iy):
    """(reference: rt_present.frag:231-266), motion debug excluded."""
    raw = accum[iy, ix, :3]
    if u.uEnableSVGF == 0:
        linear = raw
    else:
        filtered = svgf_filter_px(u, accum, motion_tex, gpos, gnrm, ix, iy)
        s = min(max(u.uSvgfStrength, 0.0), 1.0)
        linear = raw + (filtered - raw) * s
    mapped = aces_tonemap(u, linear)
    return mapped ** (1.0 / 2.2)


def render_sequence(params, width, height, cams, use_bvh=False, tris=None):
    """The full temporal pipeline over a camera sequence: per frame the
    rt.frag MRT pass + resolveTAA into the ping-pong accum (reference:
    src/render/render.cpp:55-242), then the present pass (SVGF + ACES +
    gamma) of the LAST frame.  camera_moved derives from the VP diff like
    application.cpp:387-395.  Returns the final [H,W,3] sRGB image."""
    accum = np.zeros((height, width, 4), np.float64)
    motion_tex = np.zeros((height, width, 2), np.float64)
    gpos = np.zeros((height, width, 3), np.float64)
    gnrm = np.zeros((height, width, 3), np.float64)
    prev_vp = np.asarray(cams[0].view_projection(), np.float64)
    u = None
    for f, cam in enumerate(cams):
        u = U(params, width, height, cam, use_bvh=use_bvh, tris=tris,
              frame_index=f)
        curr_vp = np.asarray(cam.view_projection(), np.float64)
        u.uCurrViewProj = curr_vp
        u.uPrevViewProj = prev_vp
        u.uCameraMoved = 1 if np.abs(curr_vp - prev_vp).max() > 1e-5 else 0
        new_accum = np.zeros_like(accum)
        for iy in range(height):
            for ix in range(width):
                curr, mot, gp, gn = render_pixel_mrt(u, ix, iy)
                motion_tex[iy, ix] = mot
                gpos[iy, ix] = gp
                gnrm[iy, ix] = gn
                uv_curr = ((ix + 0.5) / width, (iy + 0.5) / height)
                taa_motion = mot if u.uCameraMoved == 1 else np.zeros(2)
                new_accum[iy, ix] = resolve_taa(u, curr, uv_curr,
                                                taa_motion, accum, f)
        accum = new_accum
        prev_vp = curr_vp
    img = np.zeros((height, width, 3), np.float64)
    for iy in range(height):
        for ix in range(width):
            img[iy, ix] = present_px(u, accum, motion_tex, gpos, gnrm,
                                     ix, iy)
    return img
