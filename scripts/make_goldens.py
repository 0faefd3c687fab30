"""(Re)generate golden images for the regression gate (CPU backend).

Run after INTENTIONAL rendering changes:  python scripts/make_goldens.py
The test suite (tests/test_golden.py) renders the same configs and
compares against these PNGs within a small tolerance.
"""

import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from opengl_raytracing_tpu.utils.image import write_png  # noqa: E402

GOLDEN_DIR = os.path.join("tests", "golden")


def golden_configs():
    """Name -> (kwargs for render) for every golden.  Shared with tests."""
    return {
        "analytic_baseline": dict(preset="baseline"),
        "analytic_full": dict(preset="full"),
        "analytic_no_env_gradient_sky": dict(preset="full", enable_env_map=0),
        "bvh_baseline": dict(preset="baseline", scene="bvh"),
        "bvh_full": dict(preset="full", scene="bvh"),
        "raster_parity": dict(preset="baseline", raster=True),
        "env_cubemap": dict(preset="full", env=True),
        "heavy_4spp_frame3": dict(preset="heavy", frames=3),
    }


def render_config(name, cfg, height=48, width=64):
    from opengl_raytracing_tpu.models import (RenderState, render_frame,
                                              preset)
    from opengl_raytracing_tpu.models.raster import render_raster
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    from opengl_raytracing_tpu.ops.cubemap import dummy_cubemap
    from opengl_raytracing_tpu.scene.geometry import (make_bunny,
                                                      gather_triangles,
                                                      model_transform)
    from tests.test_pipeline import make_inputs

    params = preset(cfg.get("preset", "baseline"))
    for k, v in cfg.items():
        if k in ("preset", "scene", "raster", "env", "frames"):
            continue
        params = params.replace(**{k: v})

    bvh = None
    use_bvh = cfg.get("scene") == "bvh"
    if use_bvh:
        tris = gather_triangles(make_bunny(2), model_transform((-2, 1.5, 0),
                                                               0.5))
        bvh = prepare_bvh(tris)
    env = None
    if cfg.get("env"):
        # deterministic procedural environment (checker-ish gradient faces)
        rng = np.random.RandomState(0)
        env = np.asarray(dummy_cubemap(8)) * (
            0.5 + 0.5 * rng.rand(6, 8, 8, 3).astype(np.float32))
        import jax.numpy as jnp
        env = jnp.asarray(env)

    fin = make_inputs()
    if cfg.get("raster"):
        return np.asarray(render_raster(params, fin, bvh, height=height,
                                        width=width))
    state = RenderState.create(height, width)
    img = None
    for _ in range(cfg.get("frames", 1)):
        state, out = render_frame(params, fin, state, env, bvh,
                                  height=height, width=width,
                                  use_bvh=use_bvh)
        img = out.image
    return np.asarray(img)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    # test_pipeline.make_inputs uses module-level H,W=48,64; keep in sync
    for name, cfg in golden_configs().items():
        img = render_config(name, cfg)
        write_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img[::-1])
        print(f"golden {name}: mean={img.mean():.4f} std={img.std():.4f}")


if __name__ == "__main__":
    main()
