"""Camera matrices, frame state, and param change detection."""

import numpy as np

from opengl_raytracing_tpu import Camera, FrameState, RenderParams
from opengl_raytracing_tpu.params import params_changed


def test_default_camera_pose():
    cam = Camera()
    np.testing.assert_allclose(cam.position, [0, 2, 8])
    assert cam.yaw == -90.0 and cam.pitch == -10.0 and cam.fov == 60.0


def test_view_matrix_orthonormal_and_basis():
    cam = Camera()
    v = cam.view_matrix()
    r3 = v[:3, :3]
    np.testing.assert_allclose(r3 @ r3.T, np.eye(3), atol=1e-5)
    right, up, fwd, thf = cam.basis()
    np.testing.assert_allclose(right, cam.right, atol=1e-5)
    np.testing.assert_allclose(up, cam.up, atol=1e-5)
    np.testing.assert_allclose(fwd, cam.front, atol=1e-5)
    assert abs(thf - np.tan(np.radians(30.0))) < 1e-6


def test_projection_of_center_point():
    cam = Camera()
    vp = cam.view_projection()
    # point straight ahead of camera projects to ndc center
    p = np.append(cam.position + cam.front * 5.0, 1.0)
    clip = vp @ p
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-5)
    assert -1 <= ndc[2] <= 1


def test_camera_moved_flag():
    cam = Camera()
    fs = FrameState.initial(cam.view_projection(), cam.position)
    fs = fs.begin_frame(cam.view_projection(), cam.position, np.zeros(2))
    assert not fs.camera_moved()
    cam.move(forward=1.0, dt=0.1)
    fs = fs.end_frame().begin_frame(cam.view_projection(), cam.position,
                                    np.zeros(2))
    assert fs.camera_moved()


def test_fov_zoom_clamp():
    cam = Camera()
    cam.zoom(1000.0)
    assert cam.fov == 20.0
    cam.zoom(-1000.0)
    assert cam.fov == 90.0


def test_pitch_clamp():
    cam = Camera()
    cam.look(0.0, 1e6)
    assert cam.pitch == 89.0


def test_params_changed_detects_each_kind():
    a = RenderParams()
    assert not params_changed(a, RenderParams())
    # exposure/motion_scale are tonemap/debug-only: the reference's
    # paramsChanged omits them (src/app/application.cpp:51-145)
    assert not params_changed(a, a.replace(exposure=1.1))
    assert not params_changed(a, a.replace(motion_scale=8.0))
    assert params_changed(a, a.replace(spp_per_frame=4))
    assert params_changed(a, a.replace(mat_albedo_color=(0.1, 0.2, 0.3)))
    assert params_changed(a, a.replace(sun_intensity=0.9))
    assert not params_changed(a, a.replace(sun_intensity=0.45 + 1e-7))
