"""Application layer: main-loop semantics, input actions, pickers,
checkpoints, raster parity mode."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from opengl_raytracing_tpu.app import Application, AppState
from opengl_raytracing_tpu.app.input import SPP_PRESETS
from opengl_raytracing_tpu.models.presets import preset
from opengl_raytracing_tpu.models.raster import render_raster, CLEAR_COLOR
from opengl_raytracing_tpu.scene.geometry import (make_bunny, save_obj,
                                                  gather_triangles,
                                                  model_transform)
from opengl_raytracing_tpu.utils.checkpoint import (save_snapshot,
                                                    load_snapshot,
                                                    save_preset, load_preset)
from opengl_raytracing_tpu import RenderParams

H, W = 36, 48


def small_app(**kw):
    params = preset("baseline").replace(**kw) if kw else preset("baseline")
    return Application(state=AppState(height=H, width=W, params=params),
                       jit=False)


def test_step_produces_image_and_advances_accum():
    a = small_app()
    img = a.step()
    assert np.asarray(img).shape == (H, W, 3)
    assert int(a.app.render_state.frame_index) == 1
    a.step()
    assert int(a.app.render_state.frame_index) == 2


def test_param_change_resets_accumulation():
    a = small_app()
    a.step()
    a.step()
    assert int(a.app.render_state.frame_index) == 2
    a.app.params = a.app.params.replace(sun_intensity=0.9)
    a.step()  # detected at end of frame -> reset
    assert int(a.app.render_state.frame_index) == 0


def test_exposure_change_does_not_reset_accumulation():
    # the reference's paramsChanged omits exposure/motionScale
    # (src/app/application.cpp:51-145): tonemap-only knobs must not
    # flush a converged accumulation
    a = small_app()
    a.step()
    a.step()
    a.act("exposure_up")
    a.step()
    assert int(a.app.render_state.frame_index) == 3
    a.app.params = a.app.params.replace(motion_scale=8.0)
    a.step()
    assert int(a.app.render_state.frame_index) == 4


def test_host_frame_index_mirrors_device():
    a = small_app()
    a.step()
    a.step()
    assert a.app.host_frame_index == int(a.app.render_state.frame_index) == 2
    a.app.params = a.app.params.replace(sun_intensity=0.9)
    a.step()  # reset at end of frame
    assert a.app.host_frame_index == int(a.app.render_state.frame_index) == 0
    a.step()
    assert a.app.host_frame_index == int(a.app.render_state.frame_index) == 1


def test_camera_move_sets_camera_moved_and_keeps_accumulating():
    a = small_app()
    a.step()
    a.act("move_w")
    a.step()
    # moving does NOT reset accumulation (only TAA handles motion)
    assert int(a.app.render_state.frame_index) == 2


def test_spp_actions_cycle_presets_and_reset():
    a = small_app()
    a.step()
    a.act("spp_up")
    a.step()
    assert a.app.params.spp_per_frame == SPP_PRESETS[1]
    assert int(a.app.render_state.frame_index) <= 1  # reset happened


def test_exposure_clamp():
    a = small_app()
    for _ in range(300):
        a.act("exposure_up")
    a.step()
    assert float(np.asarray(a.app.params.exposure)) <= 8.0
    for _ in range(800):
        a.act("exposure_down")
    a.step()
    assert float(np.asarray(a.app.params.exposure)) >= 0.01


def test_toggle_raster_mode():
    a = small_app()
    a.act("toggle_ray_mode")
    img = a.step()
    arr = np.asarray(img)
    # raster clear color visible above the horizon
    assert np.allclose(arr[-1, 0], CLEAR_COLOR, atol=1e-5)


def test_raster_toggle_clears_last_u8():
    """want_u8 viewers: a raster frame must clear last_u8, or the
    stream would freeze on the final ray frame after an F2 toggle
    (regression)."""
    a = small_app()
    a.want_u8 = True
    a.step()
    assert a.last_u8 is not None
    a.act("toggle_ray_mode")
    a.step()
    assert a.last_u8 is None


def test_motion_debug_toggle():
    a = small_app()
    a.act("toggle_motion_debug")
    img = a.step()
    assert np.isfinite(np.asarray(img)).all()


def test_orbit_updates_yaw_and_resets():
    a = small_app(point_light_orbit_enabled=1)
    y0 = float(np.asarray(a.app.params.point_light_yaw))
    a.step(dt=0.5)
    a.step(dt=0.5)
    assert float(np.asarray(a.app.params.point_light_yaw)) > y0
    assert int(a.app.render_state.frame_index) <= 1  # continuous reset


def test_model_picker_reload(tmp_path=None):
    with tempfile.TemporaryDirectory() as d:
        save_obj(os.path.join(d, "blob.obj"), make_bunny(1))
        a = small_app()
        a.app.model_picker.directory = d
        a.app.model_picker.scan()
        assert a.app.model_picker.entries
        a.app.use_bvh = True
        tris = gather_triangles(make_bunny(1), model_transform())
        a.app.set_bvh_from_tris(tris)
        a.app.model_picker.request(0)
        a.step()
        assert a.app.bvh_tri_count > 0
        assert not a.app.model_picker.reload_requested


def test_bvh_load_failure_keeps_previous():
    a = small_app()
    tris = gather_triangles(make_bunny(1), model_transform())
    a.app.set_bvh_from_tris(tris)
    before = a.app.bvh_tri_count
    ok = a.app.load_bvh_model("/nonexistent/file.obj")
    assert not ok
    assert a.app.bvh_tri_count == before


def test_snapshot_roundtrip():
    a = small_app()
    a.step()
    a.step()
    app = a.app
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "snap.npz")
        save_snapshot(p, app.params, app.camera, app.frame, app.render_state)
        params, cam, frame, rs = load_snapshot(p)
    assert int(rs.frame_index) == int(app.render_state.frame_index)
    np.testing.assert_allclose(np.asarray(rs.accum),
                               np.asarray(app.render_state.accum))
    np.testing.assert_allclose(cam.position, app.camera.position)
    assert params.spp_per_frame == app.params.spp_per_frame


def test_preset_roundtrip():
    p = preset("heavy").replace(exposure=1.5,
                                mat_albedo_color=(0.1, 0.2, 0.3))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p.json")
        save_preset(path, p)
        q = load_preset(path)
    assert q.spp_per_frame == 4
    assert abs(float(np.asarray(q.exposure)) - 1.5) < 1e-6
    assert q.mat_albedo_color == (0.1, 0.2, 0.3)


def test_raster_scene_content():
    # ray-cast raster parity: ground below, clear color above, marker lit
    from tests.test_pipeline import make_inputs
    params = RenderParams()
    fin = make_inputs()
    img = np.asarray(render_raster(params, fin, None, height=48, width=64))
    assert np.allclose(img[-1, 0], CLEAR_COLOR, atol=1e-5)   # sky (top=GL up)
    assert np.allclose(img[0, 32], (0.1, 0.4, 0.1), atol=1e-5)  # ground


def test_resize_recreates_buffers():
    a = small_app()
    a.step()
    a.app.resize(20, 40)
    assert int(a.app.render_state.frame_index) == 0
    img = a.step()
    assert np.asarray(img).shape == (20, 40, 3)


def test_headless_camera_anim_cli(tmp_path):
    from opengl_raytracing_tpu.app.headless import main
    rc = main(["--preset", "baseline", "--frames", "2", "--size", "48x32",
               "--camera-anim", "dolly", "--out", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "frame_last.png").exists()


def test_spp_cycle_wraps():
    a = small_app()
    seen = []
    for _ in range(6):
        a.act("spp_cycle")
        a.step()
        seen.append(a.app.params.spp_per_frame)
    assert seen == [2, 4, 8, 16, 1, 2]  # F3 wrap (reference: input.cpp:74-87)


def test_spp_number_keys():
    a = small_app()
    a.act("spp_preset_3")
    a.step()
    assert a.app.params.spp_per_frame == 8


def test_spp_updown_threshold_semantics():
    """Up/Down/F3 must follow the reference's threshold/exact-match
    chains for NON-preset values too (input.cpp:76-121): spp=6 Up -> 8,
    Down -> 4; F3 from a non-preset wraps to 1."""
    from opengl_raytracing_tpu.app.input import InputState, apply_action
    st = InputState(spp_per_frame=6)
    apply_action(st, "spp_up")
    assert st.spp_per_frame == 8
    st = InputState(spp_per_frame=6)
    apply_action(st, "spp_down")
    assert st.spp_per_frame == 4
    st = InputState(spp_per_frame=6)
    apply_action(st, "spp_cycle")
    assert st.spp_per_frame == 1
    st = InputState(spp_per_frame=16)
    apply_action(st, "spp_up")
    assert st.spp_per_frame == 16 and not st.changed_spp


def test_camera_action_without_app_raises_clear_error():
    from opengl_raytracing_tpu.app.input import InputState, apply_action
    import pytest
    with pytest.raises(ValueError, match="requires an app"):
        apply_action(InputState(), "move_w")


def test_resume_reapplies_cli_overrides(tmp_path):
    """--set overrides must win over a resumed snapshot's params, and
    the hotkey mirrors must track the restored values."""
    import argparse
    from opengl_raytracing_tpu.app.headless import build_parser, make_app
    base = build_parser().parse_args(
        ["--cpu", "--size", "32x24", "--frames", "1"])
    app1 = make_app(base)
    p = str(tmp_path / "snap.npz")
    from opengl_raytracing_tpu.utils.checkpoint import save_snapshot
    a = app1.app
    a.params = a.params.replace(exposure=2.0)
    save_snapshot(p, a.params, a.camera, a.frame, a.render_state)

    resumed = argparse.Namespace(**vars(base))
    resumed.resume = p
    resumed.set = ["sun_intensity=0.9"]
    app2 = make_app(resumed)
    assert float(np.asarray(app2.app.params.exposure)) == 2.0  # snapshot
    assert abs(float(np.asarray(
        app2.app.params.sun_intensity)) - 0.9) < 1e-6  # CLI override wins
    assert app2.input.exposure == 2.0  # mirror synced


def test_turbo_chain_matches_sequential_steps():
    """turbo=k (k still frames chained per dispatch) must reproduce k
    sequential step() calls exactly: same jitter sequence, same accum,
    same presented image."""
    a = small_app()
    b = small_app()
    b.turbo = 3
    for _ in range(3):
        img_a = a.step()
    img_b = b.step()
    assert int(b.app.render_state.frame_index) == 3
    assert b.app.host_frame_index == 3
    np.testing.assert_array_equal(np.asarray(b.app.render_state.accum),
                                  np.asarray(a.app.render_state.accum))
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_a))


def test_turbo_moving_chain_matches_sequential_steps():
    """Moving turbo: one dispatch = the camera-move frame plus k-1
    settling frames — must equal the same k frames stepped
    sequentially (move applied once, then stills)."""
    a = small_app()
    b = small_app()
    b.turbo = 4
    b.act("look 5 0")
    img_b = b.step()
    assert int(b.app.render_state.frame_index) == 4
    a.act("look 5 0")
    img_a = None
    for _ in range(4):
        img_a = a.step()
    np.testing.assert_array_equal(np.asarray(b.app.render_state.accum),
                                  np.asarray(a.app.render_state.accum))
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_a))


def test_turbo_disabled_while_orbiting():
    o = small_app(point_light_orbit_enabled=1)
    o.turbo = 4
    o.step()                   # orbit animates params -> no chaining
    # (the orbit's yaw diff then resets accumulation, matching the
    # reference's paramsChanged — so check the dispatch choice, not the
    # post-reset frame_index)
    assert not any(k[0] == "chain" for k in o._render_cache)
