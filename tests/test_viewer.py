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


def test_viewer_panel_endpoints(tmp_path):
    """Control-panel surface: schema, pickers, console, mouse look/zoom
    forwarding, server-side /set clamping (reference: src/ui/gui.cpp
    sections + src/io/input.cpp:147-206)."""
    from opengl_raytracing_tpu.utils.log import log

    app = Application(state=AppState(height=24, width=32,
                                     params=preset("baseline")), jit=False)
    vs = ViewerState(app)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(vs))
    port = server.server_address[1]
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()

    def get(path):
        return urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10).read()

    try:
        # page carries the panel + console + pointer-lock wiring
        page = get("/").decode()
        for marker in ("pick_model", "pick_env", "conlog",
                       "requestPointerLock", "wheel", "keymap"):
            assert marker in page, marker

        # schema covers every section the reference panel has
        schema = json.loads(get("/schema"))
        sections = [s[0] for s in schema]
        for want in ("Core", "Materials", "Environment", "Jitter",
                     "Global illumination", "Ambient occlusion", "TAA",
                     "SVGF"):
            assert want in sections
        # every schema field exists on RenderParams
        for _, fields in schema:
            for name, *_ in fields:
                assert hasattr(app.app.params, name), name

        # state exposes the full params dict + picker listings
        state = json.loads(get("/state"))
        assert "params" in state and "spp_per_frame" in state["params"]
        assert isinstance(state["model_entries"], list)

        # mouse look + scroll zoom forward through /act (URL-encoded)
        yaw0 = app.app.camera.yaw
        fov0 = app.app.camera.fov
        assert json.loads(get("/act?name=look%2012%200"))["ok"]
        assert json.loads(get("/act?name=zoom%201"))["ok"]
        assert app.app.camera.yaw != yaw0
        assert app.app.camera.fov != fov0

        # /set clamps to the reference's ranges (input.cpp:147-153)
        get("/set?exposure=99")
        assert float(np.asarray(app.app.params.exposure)) == 8.0
        get("/set?exposure=0.001")
        assert float(np.asarray(app.app.params.exposure)) == 0.05
        # color tuple set
        get("/set?sun_color=1,0.5,0.25")
        assert app.app.params.sun_color == (1.0, 0.5, 0.25)
        # tuple components clamp like ImGui's bounded color pickers
        get("/set?sun_color=2,-1,0.5")
        assert app.app.params.sun_color == (1.0, 0.0, 0.5)
        # panel writes keep the hotkey mirrors in sync: a ] press after a
        # slider drag must continue from the panel value, not snap back
        get("/set?exposure=4.0")
        assert app.input.exposure == 4.0
        app.act("exposure_up")
        assert abs(app.input.exposure - 4.0 * 1.03) < 1e-6
        get("/set?spp_per_frame=8")
        assert app.input.spp_per_frame == 8
        # unknown field is a clean error, not a 500
        assert not json.loads(get("/set?notafield=1"))["ok"]

        # resize recreates the buffers (reference resize callback,
        # application.cpp:216-231) and the next frame follows the shape
        r = json.loads(get("/resize?size=40x20"))
        assert r["ok"] and app.app.height == 20 and app.app.width == 40
        img = np.asarray(app.step())
        assert img.shape == (20, 40, 3)
        assert not json.loads(get("/resize?size=0x0"))["ok"]
        assert not json.loads(get("/resize?size=junk"))["ok"]

        # picker request flags a reload for the app loop
        if app.app.model_picker.entries:
            r = json.loads(get("/pick?kind=model&index=0"))
            assert r["ok"] and app.app.model_picker.reload_requested

        # console scrollback with filter (gui.cpp:16-104)
        log("GUI", "viewer-test marker %d", 42)
        out = json.loads(get("/log?n=50&filter=viewer-test"))
        assert any("viewer-test marker 42" in ln for ln in out["lines"])
    finally:
        vs.running = False
        server.shutdown()


def test_page_keymap_covers_hotkey_surface():
    """Every reference hotkey action (input.py ACTIONS) that makes sense
    in a browser must be reachable from the page's JS keymap."""
    import re
    from opengl_raytracing_tpu.app.viewer import _PAGE
    from opengl_raytracing_tpu.app.input import ACTIONS
    m = re.search(r"const keymap=\{(.*?)\};", _PAGE, re.S)
    assert m, "keymap block missing from page"
    mapped = set(re.findall(r":'([a-z_0-9]+)'", m.group(1)))
    # ESC is the browser's pointer-lock release; quit has no browser analog
    expected = {a for k, a in ACTIONS.items() if a != "quit"}
    missing = expected - mapped
    assert not missing, f"page keymap missing actions: {missing}"


def test_quit_action_stops_render_loop():
    """ESC parity: /act?name=quit ends the render loop like the
    reference's quitRequested -> main-loop exit."""
    app = Application(state=AppState(height=16, width=24,
                                     params=preset("baseline")), jit=False)
    vs = ViewerState(app)
    t = threading.Thread(target=vs.loop, args=(60.0,), daemon=True)
    t.start()
    deadline = time.time() + 60
    while not vs.png and time.time() < deadline:
        time.sleep(0.1)
    assert vs.png
    app.act("quit")
    t.join(timeout=30)
    assert not t.is_alive() and not vs.running


def test_viewer_jpeg_stream_format(tmp_path):
    """--stream-format jpeg: /frame.png serves a decodable baseline
    JPEG with the right content type; the u8 image comes out of the
    frame jit itself (Application.want_u8)."""
    from opengl_raytracing_tpu.utils.image import read_jpeg
    app = Application(state=AppState(height=24, width=32,
                                     params=preset("baseline")), jit=False)
    vs = ViewerState(app, stream_format="jpeg", jpeg_quality=90)
    assert app.want_u8 is True
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
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png", timeout=10)
        assert req.headers["Content-Type"] == "image/jpeg"
        blob = req.read()
        p = tmp_path / "f.jpg"
        p.write_bytes(blob)
        img = read_jpeg(str(p))
        assert img.shape == (24, 32, 3)
        # the jit-side u8 matches a host-side quantization of the f32
        # image (same clip/round formula); lock so both snapshots come
        # from the same frame
        with vs.lock:
            out = app.last_output
            u8 = np.asarray(app.last_u8)
        want = np.clip(np.asarray(out.image) * 255.0 + 0.5,
                       0, 255).astype(np.uint8)
        np.testing.assert_array_equal(u8, want)
    finally:
        vs.running = False
        server.shutdown()
