"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(the fake-backend substitute, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opengl_raytracing_tpu.models import RenderState, render_frame, preset
from opengl_raytracing_tpu.parallel import (make_mesh, shard_image_rows,
                                            make_sharded_render_fn)
from tests.test_pipeline import make_inputs

H, W = 32, 64

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.mark.slow
def test_row_sharded_render_matches_single_device():
    params = preset("full")
    fin = make_inputs()

    # single-device reference
    st0 = RenderState.create(H, W)
    st0, out0 = render_frame(params, fin, st0, height=H, width=W)

    mesh = make_mesh(jax.devices()[:8])
    st1 = shard_image_rows(mesh, RenderState.create(H, W))
    fn = make_sharded_render_fn(mesh, H, W, donate=False)
    st1, out1 = fn(params, fin, st1, None, None)

    # partitioned compilation reassociates float ops; expect tiny drift
    diff = np.abs(np.asarray(out0.image) - np.asarray(out1.image))
    assert np.quantile(diff, 0.99) < 1e-3 and diff.max() < 2e-2
    # accumulation actually lives sharded across devices
    assert len(st1.accum.sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_temporal_sequence():
    """Two frames with history reuse under sharding == unsharded result.
    Exercises the SVGF halo exchange across shard boundaries."""
    params = preset("full")
    fin = make_inputs()
    mesh = make_mesh(jax.devices()[:8])

    st_a = RenderState.create(H, W)
    st_b = shard_image_rows(mesh, RenderState.create(H, W))
    fn = make_sharded_render_fn(mesh, H, W, donate=False)
    for _ in range(3):
        st_a, out_a = render_frame(params, fin, st_a, height=H, width=W)
        st_b, out_b = fn(params, fin, st_b, None, None)
    diff = np.abs(np.asarray(out_a.image) - np.asarray(out_b.image))
    assert np.quantile(diff, 0.99) < 2e-3 and diff.max() < 5e-2


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_2d_mesh_sharding_compiles_and_matches():
    params = preset("full").replace(enable_svgf=1)
    fin = make_inputs()
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dy", "dx"))
    tiles = NamedSharding(mesh, P("dy", "dx", None))

    st0 = RenderState.create(H, W)
    st0, out0 = render_frame(params, fin, st0, height=H, width=W)

    state = RenderState(jax.device_put(RenderState.create(H, W).accum, tiles),
                        jax.device_put(jnp.zeros((), jnp.int32),
                                       NamedSharding(mesh, P())))

    @jax.jit
    def step(params, fin, state):
        st, out = render_frame(params, fin, state, height=H, width=W)
        return RenderState(jax.lax.with_sharding_constraint(st.accum, tiles),
                           st.frame_index), out

    st1, out1 = step(params, fin, state)
    diff = np.abs(np.asarray(out0.image) - np.asarray(out1.image))
    assert np.quantile(diff, 0.99) < 1e-3 and diff.max() < 2e-2


def test_row_sharded_bvh_scene_matches():
    """SPMD row sharding with the BVH walker (the explicit-collective
    analog lives in test_shardmap): compiler-partitioned while_loop +
    replicated scene arrays must match single-device."""
    from opengl_raytracing_tpu.scene import make_icosphere
    from opengl_raytracing_tpu.scene.geometry import (gather_triangles,
                                                      model_transform)
    from opengl_raytracing_tpu.ops.scene import prepare_bvh
    params = preset("baseline").replace(enable_gi=0, enable_ao=0)
    tris = gather_triangles(make_icosphere(1.0, 1),
                            model_transform((0.0, 1.0, -3.0), 1.0))
    bvh = prepare_bvh(tris)
    fin = make_inputs()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    rows = NamedSharding(mesh, P("rows", None, None))
    st = RenderState(
        jax.device_put(RenderState.create(H, W).accum, rows),
        jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P())))

    @jax.jit
    def step(params, fin, state, bvh):
        _, out = render_frame(params, fin, state, None, bvh,
                              height=H, width=W, use_bvh=True)
        return jax.lax.with_sharding_constraint(out.image, rows)

    img = np.asarray(step(params, fin, st, bvh))
    st1 = RenderState.create(H, W)
    _, ref = render_frame(params, fin, st1, None, bvh, height=H, width=W,
                          use_bvh=True)
    assert np.abs(img - np.asarray(ref.image)).max() < 1e-5
