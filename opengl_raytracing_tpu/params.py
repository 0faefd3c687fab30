"""User-tunable render parameters.

TPU-native counterpart of the reference's single config struct
(reference: include/render/RenderParams.h:14-239) with the same fields and
defaults.  The struct is registered as a JAX dataclass-pytree:

  * float fields are pytree *data* — traced under jit, so moving a GUI
    slider does NOT recompile;
  * int toggles / sample counts are pytree *metadata* — static under jit,
    because they change the compiled program structure (loop trip counts,
    which shading passes exist at all).

`params_changed` reproduces the reference's exhaustive field diff that
drives accumulation reset (reference: src/app/application.cpp:51-145).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax

Color = Tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class RenderParams:
    # -- Core render settings (reference: RenderParams.h:19-23) --
    spp_per_frame: int = 1            # static: loop trip count
    exposure: float = 1.0

    # -- Materials (reference: RenderParams.h:29-57) --
    mat_albedo_color: Color = (0.85, 0.25, 0.25)
    mat_albedo_spec_strength: float = 0.35
    mat_albedo_gloss: float = 48.0
    mat_glass_enabled: int = 1        # static: switches material branch
    mat_glass_color: Color = (0.95, 0.98, 1.0)
    mat_glass_ior: float = 1.5
    mat_glass_distortion: float = 0.05
    mat_mirror_enabled: int = 1       # static
    mat_mirror_color: Color = (1.0, 1.0, 1.0)
    mat_mirror_gloss: float = 256.0

    # -- Jitter / AA (reference: RenderParams.h:64-70) --
    enable_jitter: int = 1            # static
    jitter_still_scale: float = 0.25
    jitter_moving_scale: float = 0.5

    # -- Global illumination (reference: RenderParams.h:77-83) --
    enable_gi: int = 1                # static
    gi_scale_analytic: float = 0.35
    gi_scale_bvh: float = 0.20

    # -- Environment map (reference: RenderParams.h:89-93) --
    enable_env_map: int = 1           # static
    env_map_intensity: float = 1.0

    # -- Sun / sky / point lights (reference: RenderParams.h:100-154) --
    sun_enabled: int = 1              # static
    sun_color: Color = (1.0, 0.95, 0.85)
    sun_intensity: float = 0.45
    sun_yaw: float = 45.0
    sun_pitch: float = -35.0
    sky_enabled: int = 1              # static
    sky_color: Color = (0.4, 0.5, 1.0)
    sky_intensity: float = 1.0
    sky_yaw: float = 0.0
    sky_pitch: float = 90.0
    point_light_enabled: int = 1      # static
    point_light_color: Color = (1.0, 0.9, 0.7)
    point_light_intensity: float = 20.0
    point_light_pos: Color = (0.0, 2.5, -3.0)
    point_light_orbit_enabled: int = 0  # static (host-side orbit anim)
    # Front-to-back ordered primary chunk walk with tile-wide early
    # termination (ops/bvh_mxu.py).  1.84x on close-up views where the
    # interval cull degenerates; a few % slower on far views.  0 = off,
    # 1 = on, 2 = auto: the app layer resolves per frame from the
    # camera-to-scene-AABB distance (Application._resolve_ordered) — the
    # analog of the reference's always-on near-first + t-pruned stack
    # walk (rt_bvh.glsl:224-239), applied only where it wins on TPU.
    # Excluded from the params_changed accumulation-reset diff (it never
    # changes radiance, only the traversal schedule).
    ordered_primary: int = 2          # static: switches trace kernel
    point_light_orbit_radius: float = 3.5
    point_light_orbit_speed: float = 20.0
    point_light_yaw: float = 0.0
    point_light_pitch: float = 0.0

    # -- Ambient occlusion (reference: RenderParams.h:161-173) --
    enable_ao: int = 1                # static
    ao_samples: int = 4               # static: loop trip count
    ao_radius: float = 0.8
    ao_bias: float = 2e-3
    ao_min: float = 0.5

    # -- TAA (reference: RenderParams.h:180-198) --
    enable_taa: int = 1               # static
    taa_still_thresh: float = 1e-5
    taa_hard_moving_thresh: float = 0.35
    taa_history_min_weight: float = 0.85
    taa_history_avg_weight: float = 0.92
    taa_history_max_weight: float = 0.96
    taa_history_box_size: float = 0.06

    # -- SVGF (reference: RenderParams.h:205-223) --
    enable_svgf: int = 1              # static
    svgf_var_max: float = 0.05
    svgf_k_var: float = 1.0
    svgf_k_color: float = 1.2
    svgf_k_var_motion: float = 0.8
    svgf_k_color_motion: float = 1.5
    svgf_strength: float = 0.7

    # -- Debug (reference: RenderParams.h:238) --
    motion_scale: float = 4.0

    def replace(self, **kw) -> "RenderParams":
        return dataclasses.replace(self, **kw)


_META_FIELDS = tuple(
    f.name for f in dataclasses.fields(RenderParams) if f.type == "int"
)
_DATA_FIELDS = tuple(
    f.name for f in dataclasses.fields(RenderParams) if f.type != "int"
)

jax.tree_util.register_dataclass(
    RenderParams, data_fields=list(_DATA_FIELDS), meta_fields=list(_META_FIELDS)
)


def _as_floats(x):
    if isinstance(x, tuple):
        return tuple(float(v) for v in x)
    return float(x)


def params_changed(a: RenderParams, b: RenderParams, tol: float = 1e-5) -> bool:
    """Field-by-field diff; True triggers accumulation reset.

    Mirrors `app_detail::paramsChanged`
    (reference: src/app/application.cpp:51-145): int fields compare exactly,
    float fields compare with |x - y| > 1e-5.
    """
    for f in dataclasses.fields(RenderParams):
        if f.name == "ordered_primary":
            continue  # traversal schedule only — never changes radiance
        if f.name in ("exposure", "motion_scale"):
            # Tonemap/debug-only params: the reference's paramsChanged
            # deliberately omits them (src/app/application.cpp:51-145
            # checks every field EXCEPT exposure/motionScale), so turning
            # the exposure knob must NOT flush a converged accumulation.
            continue
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if f.name in _META_FIELDS:
            if int(va) != int(vb):
                return True
        else:
            va, vb = _as_floats(va), _as_floats(vb)
            if isinstance(va, tuple):
                if any(abs(x - y) > tol for x, y in zip(va, vb)):
                    return True
            elif abs(va - vb) > tol:
                return True
    return False
