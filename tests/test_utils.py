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


def test_repo_root_from_foreign_cwd(tmp_path, monkeypatch):
    """repo_root's fallback must return the repo root (three levels above
    utils/paths.py), not the package directory (regression)."""
    import os
    from opengl_raytracing_tpu.utils.paths import repo_root, resolve_path
    monkeypatch.chdir(tmp_path)
    root = repo_root()
    assert os.path.exists(os.path.join(root, "bench.py"))
    assert os.path.isdir(resolve_path("models"))


def test_snapshot_path_without_npz_suffix(tmp_path):
    """save_snapshot('x') / load_snapshot('x') must round-trip even though
    numpy auto-appends .npz on save only (regression)."""
    import numpy as np
    from opengl_raytracing_tpu.camera import Camera
    from opengl_raytracing_tpu.frame_state import FrameState
    from opengl_raytracing_tpu.models.pipeline import RenderState
    from opengl_raytracing_tpu.params import RenderParams
    from opengl_raytracing_tpu.utils.checkpoint import (save_snapshot,
                                                        load_snapshot)
    cam = Camera()
    frame = FrameState.initial(cam.view_projection(), cam.position)
    rs = RenderState.create(8, 8)
    p = str(tmp_path / "snap")  # no .npz
    save_snapshot(p, RenderParams(), cam, frame, rs)
    params, cam2, frame2, rs2 = load_snapshot(p)
    assert int(np.asarray(rs2.frame_index)) == 0
    assert params == RenderParams()


def test_halton_large_indices_match_oracle():
    """Device halton must stay exact for indices up to 2^30 (long
    accumulation runs), matching an unbounded python radical inverse."""
    import numpy as np
    from opengl_raytracing_tpu.sampling import halton

    def oracle(i, b):
        f, r = 1.0, 0.0
        while i > 0:
            f /= b
            r += f * (i % b)
            i //= b
        return r

    for i in (1, 1023, 2 ** 20 + 17, 2 ** 25 + 3, 2 ** 30 - 1):
        for b in (2, 3):
            got = float(np.asarray(halton(i, b)))
            assert abs(got - oracle(i, b)) < 1e-6, (i, b)
