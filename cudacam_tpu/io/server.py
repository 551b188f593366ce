"""MJPEG preview server — the live-display analog for headless TPU hosts.

The reference renders its live stream in a desktop GL window
(imguiApp.cpp:393-450). A TPU host has no display; the operational
equivalent is an HTTP endpoint: the processing loop keeps pushing outputs
into the device ring, and this server — on its own thread — reads the
newest frame back on demand, JPEG-encodes it, and streams it as
multipart/x-mixed-replace (playable by any browser). Endpoints:

* ``/``            minimal HTML viewer (stream + live status)
* ``/stream.mjpg`` the MJPEG stream
* ``/frame.jpg``   single snapshot
* ``/status``      the app's live status JSON (stage, thresholds, fps, ...)

Host readback happens only here, at the preview rate — the compute loop
itself never crosses the device->host boundary.
"""
from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from cudacam_tpu.utils.logging import get_logger

log = get_logger("server")

_PAGE = b"""<!doctype html>
<html><head><title>cudacam_tpu</title>
<style>body{background:#111;color:#ddd;font-family:monospace;text-align:center}
img{max-width:96vw;border:1px solid #444}pre{color:#8c8}
a{color:#6af;margin:0 6px}</style></head>
<body><h3>cudacam_tpu live</h3>
<div>
<a href="#" onclick="m('edges')">edges</a><a href="#" onclick="m('raw')">raw</a>
<a href="#" onclick="m('split')">split</a><a href="#" onclick="m('overlay')">overlay</a>
</div>
<img id="v" src="/stream.mjpg">
<pre id="s"></pre>
<script>
function m(x){document.getElementById('v').src='/stream.mjpg?mode='+x}
setInterval(async()=>{const r=await fetch('/status');
document.getElementById('s').textContent=JSON.stringify(await r.json(),null,1)},1000)
</script></body></html>
"""


def _encode_jpeg(frame: np.ndarray, quality: int = 85) -> bytes:
    import cv2

    ok, buf = cv2.imencode(".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, quality])
    if not ok:
        raise RuntimeError("JPEG encode failed")
    return buf.tobytes()


class PreviewServer:
    """Serves the newest ring-buffer frame; runs on a daemon thread."""

    def __init__(self, app, host: str = "127.0.0.1", port: int = 8080,
                 fps: float = 15.0, quality: int = 85) -> None:
        # Default bind is localhost-only: the stream has no authentication,
        # and a webcam feed must not silently become network-visible.
        self._app = app
        self._fps = fps
        self._quality = quality
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route into our logger
                log.debug("http: " + fmt, *args)

            def do_GET(self):
                try:
                    route, _, query = self.path.partition("?")
                    mode = None
                    for kv in query.split("&"):
                        if kv.startswith("mode="):
                            mode = kv[5:]
                    if route in ("/", "/index.html"):
                        self._send(200, "text/html", _PAGE)
                    elif route == "/status":
                        body = json.dumps(outer._app.status()).encode()
                        self._send(200, "application/json", body)
                    elif route == "/frame.jpg":
                        jpg = outer._snapshot(mode)
                        if jpg is None:
                            self._send(503, "text/plain", b"no frame yet")
                        else:
                            self._send(200, "image/jpeg", jpg)
                    elif route == "/stream.mjpg":
                        self._stream(mode)
                    else:
                        self._send(404, "text/plain", b"not found")
                except (BrokenPipeError, ConnectionResetError):
                    pass
                except Exception as e:  # surface as HTTP 500, keep serving
                    log.warning("request %s failed: %s", self.path, e)
                    try:
                        self._send(500, "text/plain",
                                   f"error: {e}".encode())
                    except Exception:
                        pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _stream(self, mode=None):
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame",
                )
                self.end_headers()
                period = 1.0 / max(0.1, outer._fps)
                while not outer._stopped.is_set():
                    jpg = outer._snapshot(mode)
                    if jpg is not None:
                        self.wfile.write(b"--frame\r\n")
                        self.wfile.write(b"Content-Type: image/jpeg\r\n")
                        self.wfile.write(
                            f"Content-Length: {len(jpg)}\r\n\r\n".encode()
                        )
                        self.wfile.write(jpg)
                        self.wfile.write(b"\r\n")
                    time.sleep(period)

        self._stopped = threading.Event()
        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server.daemon_threads = True
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True, name="preview-http"
        )

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def _snapshot(self, mode: Optional[str] = None) -> Optional[bytes]:
        # Never touch the device from this thread: read the run loop's
        # host-published copy (see CannyApp.enable_publishing).
        frame = self._app.published_np(mode)
        if frame is None:
            return None
        return _encode_jpeg(frame, self._quality)

    def start(self) -> "PreviewServer":
        self._app.enable_publishing()
        self._thread.start()
        log.info("preview server on http://%s:%d/",
                 self._server.server_address[0], self.port)
        return self

    def stop(self) -> None:
        self._stopped.set()
        self._server.shutdown()
        self._server.server_close()
