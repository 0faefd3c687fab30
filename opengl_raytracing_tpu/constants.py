"""Fundamental numeric constants.

Mirrors the reference's compile-time constants
(reference: include/render/RenderParams.h:229-231).
"""

EPS = 1e-4
PI = 3.1415926535
INF = 1e30

# Number of soft-shadow samples for the disk area light
# (reference: shaders/rt/rt_common.glsl:23).
SOFT_SHADOW_SAMPLES = 4

# Disk area light (reference: shaders/rt/rt_lighting.glsl:29-32).
LIGHT_CENTER = (0.0, 5.0, -3.0)
LIGHT_NORMAL_RAW = (0.0, -1.0, 0.2)  # normalized at use sites
LIGHT_RADIUS = 1.2
LIGHT_COLOR = (18.0, 18.0, 18.0)

# Analytic scene geometry (reference: shaders/rt/rt_scene_analytic.glsl:37-54).
FLOOR_NORMAL = (0.0, 1.0, 0.0)
FLOOR_D = 0.0
SPHERE_LEFT_CENTER = (-1.2, 1.0, -3.5)
SPHERE_LEFT_RADIUS = 1.0
GLASS_CENTER = (0.7, 1.0, -5.0)
GLASS_RADIUS = 1.0
MIRROR_CENTER = (1.2, 0.7, -2.5)
MIRROR_RADIUS = 0.7
POINT_LIGHT_MARKER_RADIUS = 0.15

# Material ids (reference: shaders/rt/rt_materials.glsl:20-24).
MAT_FLOOR = 0
MAT_ALBEDO_SPHERE = 1
MAT_GLASS_SPHERE = 2
MAT_MIRROR_SPHERE = 3
MAT_POINTLIGHT_SPHERE = 4

# Luma coefficients used by TAA and SVGF
# (reference: shaders/rt/rt_taa.glsl:50, rt_present.frag:53).
YCOEFF = (0.299, 0.587, 0.114)

# BVH shading: hard-coded white plastic
# (reference: shaders/rt/rt_lighting.glsl:409-412).
BVH_ALBEDO = (0.85, 0.85, 0.85)
BVH_SPEC_STRENGTH = 0.25
BVH_GLOSS = 32.0

# GI clamps for the BVH path (reference: shaders/rt/rt_lighting.glsl:518-519).
GI_MAX_LUM = 8.0
GI_MIN_COS_THETA = 0.1

# Glass shading constants (reference: shaders/rt/rt_lighting.glsl:586,608).
GLASS_DISTORTION_STRENGTH = 0.45
GLASS_LOCAL_REFL_WEIGHT = 0.4

# Default BVH model transform: translate(-2,1.5,0) * scale(0.5)
# (reference: include/app/state.h:26-31).
DEFAULT_BVH_TRANSLATE = (-2.0, 1.5, 0.0)
DEFAULT_BVH_SCALE = 0.5
