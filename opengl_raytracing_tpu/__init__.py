"""opengl_raytracing_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
Darky-The-Dragon/OpenGL-RayTracing renderer.

The reference is a single-GPU OpenGL-4.1 fragment-shader ray tracer
(reference: README.md:1-71).  This package re-designs every component
TPU-first:

  * the per-pixel GLSL megakernel (reference: shaders/rt/rt.frag:50-197)
    becomes vectorized JAX array programs over the whole pixel grid, fused
    by XLA;
  * the stack-based BVH traversal (reference: shaders/rt/rt_bvh.glsl:193-243)
    becomes a Pallas packet-traversal kernel with a shared SMEM stack and a
    pure-jnp stackless oracle;
  * ping-pong accumulation FBOs (reference: include/render/accum.h:24-163)
    become donated pytree buffers;
  * the single-GPU dispatch becomes pixel-tile data parallelism over a
    `jax.sharding.Mesh` with ICI collectives (halo exchange for the SVGF
    stencil).

Layout:
  ops/       device kernels (intersection, lighting, TAA, SVGF, tonemap, BVH)
  models/    render pipelines ("model families"): analytic, BVH, presets
  scene/     scene data: BVH build, procedural geometry, OBJ IO
  parallel/  device-mesh sharding of the pixel grid
  utils/     logging, images, checkpointing
  app/       application state, headless CLI, input-action API
  native/    C++ runtime components (BVH builder, OBJ parser, cubemap slicer)
"""

__version__ = "0.1.0"

from .constants import EPS, PI, INF
from .params import RenderParams, params_changed
from .camera import Camera
from .frame_state import FrameState
