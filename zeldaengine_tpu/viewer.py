"""Live HTTP viewer — the interactive window/present/input surface.

The reference is an interactive windowed app: GLFW window + swapchain
present (InitWindow ZeldaEngine.cpp:1587-1742, vkQueuePresentKHR :2030)
with live mouse orbit/drag/scroll and keyboard callbacks (:1766-1937).
A TPU renderer has no window system; the native equivalent of "present"
is streaming the pipelined u8 frames to a browser:

  GET  /            viewer page (canvas + input capture JS)
  GET  /stream      multipart/x-mixed-replace MJPEG of the frame loop
  GET  /frame.jpg   latest frame (single shot)
  GET  /stats       FrameStats JSON
  POST /input       {"type": "key"|"orbit"|"zoom"|"resize", ...} mapped
                    onto the same Engine methods the GLFW callbacks call
                    (KeyboardCallback :1771: F focus, R reset anim,
                    G game mode, M stage roll, L light roll, 0-9 debug
                    views; RMB orbit drag :1845; scroll zoom :1910)

Run: ``python -m zeldaengine_tpu.viewer [--port 8090]``.
"""

from __future__ import annotations

import io
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

LOG = logging.getLogger("zelda.viewer")

_PAGE = """<!doctype html>
<html><head><title>zeldaengine_tpu</title><style>
 body { margin:0; background:#111; color:#9a9; font:12px monospace; }
 #hud { position:fixed; top:4px; left:6px; }
 img { display:block; margin:0 auto; }
</style></head><body>
<div id="hud">zeldaengine_tpu &mdash; drag: orbit &middot; wheel: zoom
 &middot; keys: F R G M L 0-9</div>
<img id="v" src="/stream" draggable="false">
<script>
const post = (o) => fetch('/input', {method:'POST', body:JSON.stringify(o)});
let drag = false, lx = 0, ly = 0;
const img = document.getElementById('v');
img.addEventListener('mousedown', e => { drag = true; lx = e.clientX; ly = e.clientY; e.preventDefault(); });
window.addEventListener('mouseup', () => drag = false);
window.addEventListener('mousemove', e => {
  if (!drag) return;
  post({type:'orbit', dx: e.clientX - lx, dy: e.clientY - ly});
  lx = e.clientX; ly = e.clientY;
});
window.addEventListener('wheel', e => post({type:'zoom', d: e.deltaY > 0 ? -1 : 1}));
window.addEventListener('keydown', e => post({type:'key', key: e.key}));
</script></body></html>"""


class EngineViewer:
    """Owns the render loop: ticks the Engine, encodes each presented
    frame to JPEG, and serves it to any number of stream clients."""

    def __init__(self, engine, port: int = 8090, max_fps: float = 60.0,
                 quality: int = 85):
        self.engine = engine
        self.port = port
        self.max_fps = max_fps
        self.quality = quality
        self._frame: bytes | None = None
        self._frame_seq = 0
        self._cond = threading.Condition()
        self._running = False
        self._render_thread: threading.Thread | None = None
        self._httpd: ThreadingHTTPServer | None = None

    # ------------------------------------------------------------- lifecycle

    def start(self) -> None:
        self._running = True
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path.startswith("/frame"):
                    frame = viewer.wait_frame()
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("Content-Length", str(len(frame)))
                    self.end_headers()
                    self.wfile.write(frame)
                elif self.path == "/stats":
                    import dataclasses

                    body = json.dumps(
                        dataclasses.asdict(viewer.engine.stats)
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=zeldaframe",
                    )
                    self.end_headers()
                    seq = -1
                    try:
                        while viewer._running:
                            frame, seq = viewer.wait_frame_seq(seq)
                            if frame is None:
                                continue
                            self.wfile.write(b"--zeldaframe\r\n")
                            self.wfile.write(b"Content-Type: image/jpeg\r\n")
                            self.wfile.write(
                                f"Content-Length: {len(frame)}\r\n\r\n"
                                .encode()
                            )
                            self.wfile.write(frame)
                            self.wfile.write(b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                else:
                    self.send_error(404)

            def do_POST(self):
                if self.path != "/input":
                    self.send_error(404)
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    msg = json.loads(self.rfile.read(n) or b"{}")
                    viewer.handle_input(msg)
                    body = b'{"ok": true}'
                    self.send_response(200)
                except Exception as e:  # noqa: BLE001 — never kill the loop
                    body = json.dumps({"ok": False,
                                       "error": str(e)}).encode()
                    self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        self.port = self._httpd.server_address[1]  # resolve port 0
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()
        self._render_thread = threading.Thread(target=self._render_loop,
                                               daemon=True)
        self._render_thread.start()
        LOG.info("[VIEWER] serving on http://localhost:%d/", self.port)

    def stop(self) -> None:
        self._running = False
        with self._cond:
            self._cond.notify_all()
        if self._httpd is not None:
            self._httpd.shutdown()
        if self._render_thread is not None:
            self._render_thread.join(timeout=5.0)

    # ----------------------------------------------------------------- frames

    def _render_loop(self) -> None:
        from PIL import Image

        while self._running:
            t0 = time.time()
            try:
                img = self.engine.tick()
            except Exception:  # noqa: BLE001
                LOG.exception("[VIEWER] tick failed")
                time.sleep(0.5)
                continue
            buf = io.BytesIO()
            Image.fromarray(np.asarray(img)).save(
                buf, format="JPEG", quality=self.quality
            )
            with self._cond:
                self._frame = buf.getvalue()
                self._frame_seq += 1
                self._cond.notify_all()
            budget = 1.0 / self.max_fps - (time.time() - t0)
            if budget > 0:
                time.sleep(budget)

    def wait_frame(self, timeout: float = 30.0) -> bytes:
        with self._cond:
            if self._frame is None:
                self._cond.wait(timeout)
            return self._frame or b""

    def wait_frame_seq(self, last_seq: int, timeout: float = 30.0):
        with self._cond:
            if self._frame_seq == last_seq:
                self._cond.wait(timeout)
            return self._frame, self._frame_seq

    # ------------------------------------------------------------------ input

    def handle_input(self, msg: dict) -> None:
        """Map browser events onto the Engine's input surface (the GLFW
        KeyboardCallback/mouse handlers, ZeldaEngine.cpp:1766-1937)."""
        e = self.engine
        kind = msg.get("type")
        if kind == "key":
            k = str(msg.get("key", ""))
            if k in "0123456789":
                e.set_debug_view(int(k))
            elif k.upper() == "F":
                e.focus()
            elif k.upper() == "R":
                e.reset_animation()
            elif k.upper() == "G":
                e.toggle_game_mode()
            elif k.upper() == "M":
                e.toggle_stage_roll()
            elif k.upper() == "L":
                e.toggle_light_roll()
        elif kind == "orbit":
            # Reference sensitivity: CameraArm yaw/pitch per pixel (:1858)
            e.orbit(float(msg.get("dx", 0)) * 0.25,
                    float(msg.get("dy", 0)) * 0.25)
        elif kind == "zoom":
            e.zoom(float(msg.get("d", 0)))
        elif kind == "resize":
            e.resize(int(msg["width"]), int(msg["height"]))
        else:
            raise ValueError(f"unknown input type: {kind!r}")


def main() -> None:
    import argparse

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.engine import Engine

    ap = argparse.ArgumentParser(description="zeldaengine_tpu live viewer")
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--world", type=str, default=None)
    ap.add_argument("--livelink-port", type=int, default=8080)
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    config = EngineConfig(width=args.width, height=args.height)
    world = None
    if args.world:
        from zeldaengine_tpu.scene.world import World

        world = World()
        world.load(path=args.world)
    engine = Engine(config=config, world=world,
                    livelink_port=args.livelink_port)
    engine.start()
    viewer = EngineViewer(engine, port=args.port)
    viewer.start()
    print(f"viewer: http://localhost:{viewer.port}/")
    try:
        while True:
            time.sleep(1.0)
    except KeyboardInterrupt:
        pass
    finally:
        viewer.stop()
        engine.stop()


if __name__ == "__main__":
    main()
