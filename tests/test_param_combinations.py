"""Property test: every toggle combination renders finite, in-range images.

Catches NaN/Inf leaks from masked branches (e.g. all lights off, glass
disabled, env map on with dummy texture) that single-config goldens miss.
"""

import itertools

import numpy as np
import pytest
import jax.numpy as jnp

from opengl_raytracing_tpu import RenderParams
from opengl_raytracing_tpu.models import RenderState, render_frame
from opengl_raytracing_tpu.ops.cubemap import dummy_cubemap
from tests.test_pipeline import make_inputs

H, W = 24, 32

TOGGLE_SETS = [
    # (description, overrides)
    ("all_lights_off", dict(sun_enabled=0, sky_enabled=0,
                            point_light_enabled=0)),
    ("glass_mirror_off", dict(mat_glass_enabled=0, mat_mirror_enabled=0)),
    ("jitter_off_gi_on", dict(enable_jitter=0, enable_gi=1, enable_ao=0)),
    ("ao_only", dict(enable_gi=0, enable_ao=1, ao_samples=2)),
    ("env_on_dummy", dict(enable_env_map=1)),
    ("taa_on_svgf_off", dict(enable_taa=1, enable_svgf=0)),
    ("svgf_on_taa_off", dict(enable_taa=0, enable_svgf=1)),
    ("spp2_everything", dict(spp_per_frame=2, enable_gi=1, enable_ao=1,
                             enable_taa=1, enable_svgf=1)),
    ("orbit_light", dict(point_light_orbit_enabled=1,
                         point_light_yaw=45.0, point_light_pitch=10.0)),
    ("zero_intensities", dict(sun_intensity=0.0, sky_intensity=0.0,
                              point_light_intensity=0.0)),
    ("extreme_exposure", dict(exposure=8.0)),
    ("glass_high_ior", dict(mat_glass_ior=2.4)),
]


@pytest.mark.parametrize("name,overrides",
                         TOGGLE_SETS, ids=[t[0] for t in TOGGLE_SETS])
def test_param_combo_renders_finite(name, overrides):
    params = RenderParams(**overrides)
    env = dummy_cubemap(4) if overrides.get("enable_env_map") else None
    state = RenderState.create(H, W)
    fin = make_inputs(moved=1 if name == "orbit_light" else 0)
    for _ in range(2):
        state, out = render_frame(params, fin, state, env,
                                  height=H, width=W)
    img = np.asarray(out.image)
    assert np.isfinite(img).all(), f"{name}: non-finite pixels"
    assert (img >= 0).all() and (img <= 1).all()
    assert np.isfinite(np.asarray(state.accum)).all()
