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
    """Name -> (kwargs for render) for every golden.  Shared with tests.

    The *_large / motion goldens render at 144x192 — big enough to
    exercise SVGF edge behavior and TAA reprojection at meaningful
    scales (the 48x64 set gates broad semantics cheaply)."""
    return {
        "analytic_baseline": dict(preset="baseline"),
        "analytic_full": dict(preset="full"),
        "analytic_no_env_gradient_sky": dict(preset="full", enable_env_map=0),
        "bvh_baseline": dict(preset="baseline", scene="bvh"),
        "bvh_full": dict(preset="full", scene="bvh"),
        "raster_parity": dict(preset="baseline", raster=True),
        "env_cubemap": dict(preset="full", env=True),
        "heavy_4spp_frame3": dict(preset="heavy", frames=3),
        # large goldens (reference interactions at useful scales; BVH uses
        # the baseline preset — a 144x192 GI+AO render on the CPU oracle
        # walker takes minutes, and GI/AO semantics are gated by bvh_full
        # + analytic_full_large already)
        "bvh_baseline_large": dict(preset="baseline", scene="bvh",
                                   height=144, width=192),
        "analytic_full_large": dict(preset="full", height=144, width=192,
                                    frames=2),
        # camera-in-motion TAA: 3 frames with the camera strafing right,
        # real motion vectors + reprojection weights exercised end-to-end
        # (reference: rt_taa.glsl:116-174)
        "taa_motion_seq": dict(preset="realistic", motion=True, frames=3,
                               height=144, width=192),
        # motion-debug HSV wheel view under camera motion
        # (reference: rt_present.frag:92-104,236-241)
        "motion_debug": dict(preset="baseline", motion=True, frames=2,
                             show_motion=True, height=144, width=192),
    }


_META_KEYS = ("preset", "scene", "raster", "env", "frames", "height",
              "width", "motion", "show_motion")


def _moving_camera_inputs(width, height, n_frames):
    """FrameInputs sequence for a camera strafing right 0.06/frame
    (prev_view_proj trails one frame; camera_moved=1 throughout)."""
    import jax.numpy as jnp
    from opengl_raytracing_tpu import Camera
    from opengl_raytracing_tpu.models import FrameInputs

    cam = Camera()
    cam.aspect = width / height
    prev_vp = cam.view_projection()
    fins = []
    for _ in range(n_frames):
        cam.position = cam.position + np.array([0.06, 0.0, 0.0], np.float32)
        right, up, fwd, thf = cam.basis()
        vp = cam.view_projection()
        fins.append(FrameInputs(
            cam_pos=jnp.asarray(cam.position), cam_right=jnp.asarray(right),
            cam_up=jnp.asarray(up), cam_fwd=jnp.asarray(fwd),
            tan_half_fov=jnp.float32(thf), aspect=jnp.float32(cam.aspect),
            jitter=jnp.zeros(2, jnp.float32), curr_view_proj=jnp.asarray(vp),
            prev_view_proj=jnp.asarray(prev_vp), camera_moved=jnp.int32(1)))
        prev_vp = vp
    return fins


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

    height = cfg.get("height", height)
    width = cfg.get("width", width)
    params = preset(cfg.get("preset", "baseline"))
    for k, v in cfg.items():
        if k in _META_KEYS:
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

    if cfg.get("raster"):
        return np.asarray(render_raster(params, make_inputs(), bvh,
                                        height=height, width=width))
    n_frames = cfg.get("frames", 1)
    if cfg.get("motion"):
        fins = _moving_camera_inputs(width, height, n_frames)
    else:
        fins = [make_inputs()] * n_frames
    state = RenderState.create(height, width)
    img = None
    for fin in fins:
        state, out = render_frame(params, fin, state, env, bvh,
                                  height=height, width=width,
                                  use_bvh=use_bvh,
                                  show_motion=cfg.get("show_motion", False))
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
