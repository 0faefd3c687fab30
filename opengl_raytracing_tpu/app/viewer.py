"""Host viewer: interactive rendering over HTTP (no GUI deps).

The reference's GLFW window + ImGui panel have no TPU analog
(SURVEY.md §7 hard part 6); the TPU-native equivalent keeps the frame
loop on-device and streams the single tonemapped readback per frame to a
browser:

  * `GET /`            — viewer page (img stream + keyboard forwarding)
  * `GET /stream`      — multipart/x-mixed-replace PNG stream
  * `GET /frame.png`   — one frame
  * `GET /act?name=X`  — input action (same names as app/input.py)
  * `GET /set?field=v` — RenderParams override (the ImGui panel surface)
  * `GET /state`       — JSON status (fps, frame index, modes, params)

Run:  python -m opengl_raytracing_tpu.app.viewer --size 640x360 --scene bvh
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

import numpy as np

from ..utils.image import write_png
from ..utils.checkpoint import params_to_dict
from ..utils.log import log
from .headless import build_parser, make_app

_PAGE = b"""<!doctype html><html><head><title>opengl_raytracing_tpu</title>
<style>body{background:#111;color:#ddd;font-family:monospace}
img{image-rendering:pixelated;width:80%%}</style></head>
<body><h3>opengl_raytracing_tpu viewer</h3>
<img id="v" src="/stream">
<p>keys: WASDQE move &middot; F2 raster &middot; F5 BVH &middot; F6 motion
&middot; R reset &middot; [ ] exposure &middot; arrows SPP</p>
<div id="s"></div>
<script>
const map={'w':'move_w','a':'move_a','s':'move_s','d':'move_d','q':'move_q',
'e':'move_e','r':'reset','F2':'toggle_ray_mode','F5':'toggle_bvh',
'F6':'toggle_motion_debug','[':'exposure_down',']':'exposure_up',
'ArrowUp':'spp_up','ArrowDown':'spp_down'};
document.addEventListener('keydown',ev=>{const a=map[ev.key];
if(a){fetch('/act?name='+a);ev.preventDefault();}});
setInterval(()=>fetch('/state').then(r=>r.json()).then(j=>{
document.getElementById('s').textContent=JSON.stringify(j);}),1000);
</script></body></html>"""


class ViewerState:
    def __init__(self, application):
        self.application = application
        self.lock = threading.Lock()
        self.png: bytes = b""
        self.running = True

    def loop(self, target_fps: float = 30.0):
        while self.running:
            t0 = time.time()
            with self.lock:
                img = self.application.step()
                arr = np.asarray(img)
            buf = io.BytesIO()
            # reuse the PNG writer via a temp-less path
            import tempfile, os
            with tempfile.NamedTemporaryFile(suffix=".png",
                                             delete=False) as fh:
                path = fh.name
            write_png(path, arr[::-1])
            with open(path, "rb") as fh:
                self.png = fh.read()
            os.unlink(path)
            dt = time.time() - t0
            time.sleep(max(0.0, 1.0 / target_fps - dt))


def make_handler(vs: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _ok(self, ctype, body):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            app = vs.application
            if url.path == "/":
                self._ok("text/html", _PAGE)
            elif url.path == "/frame.png":
                self._ok("image/png", vs.png or b"")
            elif url.path == "/stream":
                self.send_response(200)
                self.send_header("Content-Type",
                                 "multipart/x-mixed-replace; boundary=f")
                self.end_headers()
                try:
                    while vs.running:
                        png = vs.png
                        if png:
                            self.wfile.write(b"--f\r\nContent-Type: "
                                             b"image/png\r\n\r\n")
                            self.wfile.write(png + b"\r\n")
                        time.sleep(1.0 / 30.0)
                except (BrokenPipeError, ConnectionResetError):
                    pass
            elif url.path == "/act":
                name = q.get("name", [""])[0]
                try:
                    with vs.lock:
                        app.act(name)
                    self._ok("application/json", b'{"ok":true}')
                except ValueError as exc:
                    self._ok("application/json",
                             json.dumps({"ok": False,
                                         "err": str(exc)}).encode())
            elif url.path == "/set":
                with vs.lock:
                    for field, vals in q.items():
                        cur = getattr(app.app.params, field)
                        val = (tuple(float(x) for x in vals[0].split(","))
                               if isinstance(cur, tuple) else
                               type(cur)(float(vals[0])) if isinstance(
                                   cur, int) else float(vals[0]))
                        app.app.params = app.app.params.replace(
                            **{field: val})
                self._ok("application/json", b'{"ok":true}')
            elif url.path == "/state":
                a = app.app
                body = json.dumps({
                    "fps": round(a.fps, 1),
                    "frame_index": int(np.asarray(
                        a.render_state.frame_index)),
                    "ray_mode": a.ray_mode, "use_bvh": a.use_bvh,
                    "show_motion": a.show_motion,
                    "spp": a.params.spp_per_frame,
                    "exposure": float(np.asarray(a.params.exposure)),
                }).encode()
                self._ok("application/json", body)
            else:
                self.send_error(404)
    return Handler


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--fps", type=float, default=30.0)
    args = parser.parse_args(argv)
    application = make_app(args)
    vs = ViewerState(application)
    t = threading.Thread(target=vs.loop, args=(args.fps,), daemon=True)
    t.start()
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(vs))
    log("GUI", "viewer at http://localhost:%d (%s)", args.port, args.size)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        vs.running = False
    return 0


if __name__ == "__main__":
    main()
