"""Shared scene/camera helpers for the TPU measurement scripts.

One definition of the bunny benchmark scene (the production default
transform from `constants`) and the pinhole camera ray grid, so the
cross-script Mrays/ms numbers stay comparable by construction instead of
by copy-pasted literals.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bunny_bvh(subdiv: int = 4):
    """Production-placed procedural bunny, prepared for the device."""
    from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    from opengl_raytracing_tpu.constants import (DEFAULT_BVH_TRANSLATE,
                                                 DEFAULT_BVH_SCALE)
    tris = gather_triangles(make_bunny(subdiv),
                            model_transform(DEFAULT_BVH_TRANSLATE,
                                            DEFAULT_BVH_SCALE))
    return prepare_bvh(tris)


def camera_rays(h: int, w: int, pos=(0.0, 2.0, 8.0), look=None,
                fov_deg: float = 60.0):
    """Pinhole ray grid; returns (ro [h,w,3], d [h,w,3], origin [3]).

    look=None keeps the axis-aligned -Z forward the kernel micro-benches
    use; pass a look-at point for oblique cameras (close/far cases)."""
    import numpy as np
    import jax.numpy as jnp
    if look is None:
        fwd = np.asarray([0.0, 0.0, -1.0], np.float32)
        right = np.asarray([1.0, 0.0, 0.0], np.float32)
        up = np.asarray([0.0, 1.0, 0.0], np.float32)
    else:
        fwd = np.asarray(look, np.float32) - np.asarray(pos, np.float32)
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, [0.0, 1.0, 0.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
    ys = (jnp.arange(h)[:, None] + 0.5) / h * 2 - 1
    xs = (jnp.arange(w)[None, :] + 0.5) / w * 2 - 1
    thf = math.tan(math.radians(fov_deg / 2))
    d = (jnp.asarray(fwd)
         + xs[..., None] * jnp.asarray(right) * (thf * w / h)
         + ys[..., None] * jnp.asarray(up) * thf)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    origin = jnp.asarray(pos, jnp.float32)
    ro = jnp.broadcast_to(origin, d.shape)
    return ro, d, origin
