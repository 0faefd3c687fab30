"""Checkpoint/resume determinism: snapshot mid-accumulation, restore, and
the continuation must be bit-identical to an uninterrupted run."""

import os
import tempfile

import numpy as np

from opengl_raytracing_tpu.app import Application, AppState
from opengl_raytracing_tpu.models.presets import preset
from opengl_raytracing_tpu.utils.checkpoint import save_snapshot, load_snapshot

H, W = 24, 32


def _app():
    return Application(state=AppState(height=H, width=W,
                                      params=preset("realistic")), jit=False)


def test_resume_is_bit_identical():
    # straight run: 4 frames
    a = _app()
    img_straight = None
    for _ in range(4):
        img_straight = a.step()
    img_straight = np.asarray(img_straight)

    # interrupted run: 2 frames, snapshot, restore into a NEW app, 2 more
    b = _app()
    for _ in range(2):
        b.step()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "snap.npz")
        save_snapshot(p, b.app.params, b.app.camera, b.app.frame,
                      b.app.render_state)

        c = _app()
        params, cam, frame, rs = load_snapshot(p)
        c.app.params = c.app.prev_params = params
        c.app.camera = cam
        c.app.frame = frame
        c.app.restore_render_state(rs)
        img_resumed = None
        for _ in range(2):
            img_resumed = c.step()
    np.testing.assert_array_equal(img_straight, np.asarray(img_resumed))
