"""Coverage for logging, profiling, paths, and param jit behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from opengl_raytracing_tpu import RenderParams
from opengl_raytracing_tpu.utils.log import Logger
from opengl_raytracing_tpu.utils.profiling import (FrameTimer, RayCounter,
                                                   force_complete)
from opengl_raytracing_tpu.models.presets import preset


def test_logger_scrollback_and_filter():
    lg = Logger(echo=False)
    lg.log("BVH", "built %d nodes", 42)
    lg.log("ENV", "loaded %s", "map.png")
    lg.log("BVH", "rebuilt")
    assert len(lg.filtered()) == 3
    assert len(lg.filtered("BVH")) == 2
    assert "built 42 nodes" in lg.filtered("BVH")[0]
    lg.clear()
    assert not lg.lines


def test_frame_timer_sections():
    ft = FrameTimer()
    for _ in range(3):
        with ft.section("trace"):
            _ = float(jnp.sum(jnp.ones((64, 64))))
    stats = ft.stats()
    assert stats["trace"]["n"] == 3
    assert stats["trace"]["mean_ms"] >= 0.0


def test_ray_counter_accounting():
    rc = RayCounter(1080, 1920)
    base = preset("baseline")
    r = rc.rays_per_frame(base)
    assert r["primary"] == 1080 * 1920
    assert r["shadow"] == 1080 * 1920 * 6  # 4 disk + sun + point
    assert "gi" not in r and "ao" not in r
    full = rc.rays_per_frame(preset("full"))
    assert full["gi"] == 1080 * 1920 * 7
    assert full["ao"] == 1080 * 1920 * 4
    assert rc.mrays(base, frame_ms=10.0, kind="primary") > 0


def test_force_complete_returns_scalar():
    x = {"a": jnp.ones((8, 8)), "b": jnp.zeros(3)}
    assert force_complete(x) == 64.0


def test_param_static_fields_trigger_recompile_floats_dont():
    traces = []

    def fn(params):
        traces.append(1)
        return params.exposure * 2.0

    jfn = jax.jit(fn)
    p = RenderParams()
    jfn(p)
    jfn(p.replace(exposure=3.0))        # float change: no retrace
    assert len(traces) == 1
    jfn(p.replace(enable_gi=0))         # static int change: retrace
    assert len(traces) == 2


def test_params_pytree_roundtrip():
    p = preset("heavy")
    leaves, treedef = jax.tree.flatten(p)
    q = jax.tree.unflatten(treedef, leaves)
    assert q.spp_per_frame == 4
    assert q == p
