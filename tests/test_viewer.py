"""Host viewer smoke: serve, fetch a frame, drive an action over HTTP."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

from opengl_raytracing_tpu.app import Application, AppState
from opengl_raytracing_tpu.app.viewer import ViewerState, make_handler
from opengl_raytracing_tpu.models.presets import preset
from opengl_raytracing_tpu.utils.image import read_png


def test_viewer_serves_frames_and_actions(tmp_path):
    app = Application(state=AppState(height=24, width=32,
                                     params=preset("baseline")), jit=False)
    vs = ViewerState(app)
    t = threading.Thread(target=vs.loop, args=(60.0,), daemon=True)
    t.start()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(vs))
    port = server.server_address[1]
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        deadline = time.time() + 60
        while not vs.png and time.time() < deadline:
            time.sleep(0.1)
        assert vs.png, "no frame rendered"

        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png", timeout=10).read()
        p = tmp_path / "f.png"
        p.write_bytes(png)
        img = read_png(str(p))
        assert img.shape == (24, 32, 3)

        state = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/state", timeout=10).read())
        assert state["ray_mode"] is True

        r = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/act?name=toggle_ray_mode",
            timeout=10).read())
        assert r["ok"]
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/set?exposure=2.0", timeout=10).read()
        time.sleep(1.0)
        state = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/state", timeout=10).read())
        assert state["ray_mode"] is False
        assert abs(state["exposure"] - 2.0) < 1e-6
    finally:
        vs.running = False
        server.shutdown()
