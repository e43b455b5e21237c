"""HTTP live preview — the headless replacement for the reference's
GLFW/OpenGL interactive window (reference: src/preview.cpp; SURVEY §7 step 8
prescribes "periodic PNG/HTTP preview" instead of GL interop).

Serves:
  GET /            — auto-refreshing HTML page with the current render
  GET /frame.png   — current tonemapped frame (live iteration count header)
  GET /state       — JSON {iteration, width, height}
  POST /orbit?dphi=&dtheta=&dzoom=  — camera orbit (resets accumulation,
                     matching the reference contract src/main.cpp:102-120)

The server reads the renderer's accumulator snapshot under a lock; the
render loop keeps running in the caller's thread.
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

import numpy as np

from ..utils import image as img_io
from .orbit import OrbitState

_PAGE = b"""<!doctype html><html><head><title>tpu path tracer</title>
<style>body{background:#111;color:#ddd;font-family:monospace;text-align:center}
img{image-rendering:pixelated;max-width:90vmin}</style></head><body>
<h3 id=s>rendering...</h3><img id=f src=/frame.png>
<script>
setInterval(async()=>{
  const st=await (await fetch('/state')).json();
  document.getElementById('s').textContent=
    `iteration ${st.iteration} - ${st.width}x${st.height}`;
  document.getElementById('f').src='/frame.png?'+Date.now();
},1000);
</script></body></html>"""


class PreviewServer:
    def __init__(self, renderer, host: str = "127.0.0.1", port: int = 8650):
        self.renderer = renderer
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = urlparse(self.path).path
                if path == "/":
                    self._send(200, "text/html", _PAGE)
                elif path == "/frame.png":
                    with outer.lock:
                        img = outer.renderer.image()
                    buf = io.BytesIO()
                    tmp = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                    import tempfile, os
                    with tempfile.NamedTemporaryFile(
                            suffix=".png", delete=False) as f:
                        name = f.name
                    img_io.write_png(name, tmp)
                    data = open(name, "rb").read()
                    os.unlink(name)
                    self._send(200, "image/png", data)
                elif path == "/state":
                    with outer.lock:
                        it = outer.renderer.iteration
                        w, h = outer.renderer.scene.camera.resolution
                    self._send(200, "application/json", json.dumps(
                        dict(iteration=it, width=w, height=h)).encode())
                else:
                    self._send(404, "text/plain", b"not found")

            def do_POST(self):
                u = urlparse(self.path)
                if u.path == "/orbit":
                    q = parse_qs(u.query)
                    g = lambda k: float(q.get(k, ["0"])[0])
                    with outer.lock:
                        cam = outer.renderer.scene.camera
                        st = OrbitState.from_camera(cam)
                        st = st.rotate(g("dphi"), g("dtheta"))
                        st = st.dolly(g("dzoom"))
                        st.apply(cam)
                        # any camera change resets accumulation
                        # (reference: src/main.cpp:102-120)
                        outer.renderer.reset()
                    self._send(200, "application/json", b'{"ok": true}')
                else:
                    self._send(404, "text/plain", b"not found")

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)

    def start(self):
        self.thread.start()
        return self

    def stop(self):
        self.server.shutdown()
