"""AOT-compile the production kernels against the REAL (tunnel) Mosaic
compiler without running anything — the r4b lesson: CPU interpret mode
never runs Mosaic, so kernel changes must be compile-verified before
queueing hardware time.

Compiles: closest-hit (1-page + multi-page w/ two-word masks) and the
any-hit shadow (single + tuple wavefront) at tiny shapes.

Usage: python scripts/aot_check.py   (exit 0 iff all compile)
"""

import sys
import os

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from opengl_raytracing_tpu.scene import make_bunny, gather_triangles
    from opengl_raytracing_tpu.scene.geometry import model_transform
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    from opengl_raytracing_tpu.ops.bvh_mxu import (
        trace_bvh_mxu_paged, trace_bvh_shadow_mxu_paged)

    if jax.devices()[0].platform != "tpu":
        print("not a tpu backend; aot check skipped")
        return 1

    ok = True
    for subdiv, tag in ((3, "1page"), (5, "multipage")):
        tris = gather_triangles(make_bunny(subdiv),
                                model_transform((-2, 1.5, 0), 0.5))
        b = prepare_bvh(tris)
        n = 256
        ro = jnp.zeros((n, 3))
        rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
        tm = jnp.full((n,), 5.0)
        cases = {
            f"closest_{tag}": lambda: jax.jit(
                lambda ro, rd: trace_bvh_mxu_paged(
                    b.mxu, ro, rd,
                    shared_origin=jnp.zeros(3)).t).lower(ro, rd).compile(),
            f"shadow_{tag}": lambda: jax.jit(
                lambda ro, rd, tm: trace_bvh_shadow_mxu_paged(
                    b.mxu, ro, rd, tm)).lower(ro, rd, tm).compile(),
            f"shadow_tuple_{tag}": lambda: jax.jit(
                lambda ro, rd, tm: trace_bvh_shadow_mxu_paged(
                    b.mxu, (ro, ro), (rd, rd),
                    (tm, tm * 0.5))).lower(ro, rd, tm).compile(),
        }
        for name, fn in cases.items():
            try:
                fn()
                print(f"AOT OK   {name}")
            except Exception as exc:
                ok = False
                print(f"AOT FAIL {name}: {str(exc)[:300]}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
