"""Golden-image regression gate (SURVEY.md §4: golden tests per config).

Goldens are CPU-rendered at 48x64 by scripts/make_goldens.py.  The
comparison tolerates small float drift (compiler version changes) but
catches semantic regressions.
"""

import os

import numpy as np
import pytest

from opengl_raytracing_tpu.utils.image import read_png

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _configs():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.make_goldens import golden_configs, render_config
    return golden_configs, render_config


@pytest.mark.parametrize("name", [
    "analytic_baseline", "analytic_full", "analytic_no_env_gradient_sky",
    "bvh_baseline", "bvh_full", "raster_parity", "env_cubemap",
    "heavy_4spp_frame3", "bvh_baseline_large", "analytic_full_large",
    "taa_motion_seq", "motion_debug"])
def test_golden(name):
    golden_configs, render_config = _configs()
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip("golden missing; run scripts/make_goldens.py")
    want = read_png(path)[::-1].astype(np.float32) / 255.0
    got = render_config(name, golden_configs()[name])
    diff = np.abs(got - want)
    assert diff.max() < 0.05, f"max diff {diff.max():.4f}"
    assert np.quantile(diff, 0.999) < 0.02
