"""Interactive progressive viewer — browser-based UI.

Parity with the reference's interactive shell (Main/window.cpp): orbit
camera (drag / keys), zoom, DoF aperture/focal controls, live
material editing with accumulation reset, FPS/iteration/telemetry panel,
screenshot export — served over HTTP to a browser instead of GLFW/ImGui.

The render loop runs in a background thread, accumulating passes
continuously; camera/scene edits reset accumulation exactly like the
reference's clear() semantics (Core/path_tracer.cpp:101-107).

Usage: python apps/viewer.py --scene example:flagship --port 8080
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, ".")

PAGE = """<!DOCTYPE html>
<html><head><title>pathtracerwithcuda_tpu viewer</title><style>
body{background:#111;color:#ddd;font-family:monospace;margin:0;display:flex}
#left{padding:10px}
canvas{border:1px solid #444;image-rendering:pixelated}
#panel{padding:10px;width:360px}
textarea{width:100%;height:200px;background:#222;color:#ddd;border:1px solid #444}
button{margin:2px;background:#333;color:#ddd;border:1px solid #555;padding:4px 10px}
#stats{white-space:pre;color:#8c8}
</style></head><body>
<div id=left>
<canvas id=c width=640 height=360></canvas>
<div>drag: orbit &nbsp; wheel: zoom &nbsp; shift+drag: pan &nbsp; [ ]: aperture &nbsp; - =: focal</div>
<div id=stats></div>
</div>
<div id=panel>
<h3>materials</h3>
<textarea id=mats></textarea>
<button onclick=applyMats()>apply materials</button>
<button onclick=fetch('/screenshot',{method:'POST'})>screenshot</button>
<div id=msg></div>
</div>
<script>
const c=document.getElementById('c'),ctx=c.getContext('2d');
let dragging=false,lastX=0,lastY=0,shift=false;
c.onmousedown=e=>{dragging=true;lastX=e.offsetX;lastY=e.offsetY};
window.onmouseup=()=>dragging=false;
c.onmousemove=e=>{if(!dragging)return;
  const dx=e.offsetX-lastX,dy=e.offsetY-lastY;lastX=e.offsetX;lastY=e.offsetY;
  fetch(e.shiftKey?'/pan':'/orbit',{method:'POST',body:JSON.stringify({dx,dy})});};
c.onwheel=e=>{e.preventDefault();fetch('/zoom',{method:'POST',body:JSON.stringify({d:Math.sign(e.deltaY)})})};
window.onkeydown=e=>{
  const m={'[':['/aperture',-0.05],']':['/aperture',0.05],'-':['/focal',-0.5],'=':['/focal',0.5]};
  if(m[e.key])fetch(m[e.key][0],{method:'POST',body:JSON.stringify({d:m[e.key][1]})});};
async function refresh(){
  const img=new Image();
  img.onload=()=>{ctx.drawImage(img,0,0,c.width,c.height);setTimeout(refresh,250)};
  img.onerror=()=>setTimeout(refresh,1000);
  img.src='/frame.png?'+Date.now();
  const s=await (await fetch('/stats')).json();
  document.getElementById('stats').textContent=
    `fps ${s.fps}  frame ${s.frame_ms}ms  iteration ${s.iteration}\\n${s.device}`;
}
async function loadMats(){
  document.getElementById('mats').value=JSON.stringify(await (await fetch('/materials')).json(),null,1);}
async function applyMats(){
  const r=await fetch('/materials',{method:'POST',body:document.getElementById('mats').value});
  document.getElementById('msg').textContent=await r.text();}
refresh();loadMats();
</script></body></html>"""


class ViewerState:
    def __init__(self, session):
        self.session = session
        self.lock = threading.Lock()
        self.running = True
        self.dirty = False

    def render_loop(self):
        while self.running:
            with self.lock:
                if self.dirty:
                    self.session.clear()
                    self.dirty = False
            self.session.render()

    def frame_png(self) -> bytes:
        from PIL import Image

        img = self.session.image_u8()
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "PNG")
        return buf.getvalue()


def make_handler(state: ViewerState):
    session = state.session

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                self._send(200, PAGE.encode(), "text/html")
            elif path == "/frame.png":
                self._send(200, state.frame_png(), "image/png")
            elif path == "/stats":
                from pathtracerwithcuda_tpu.utils.device_status import (
                    format_panel,
                    snapshot,
                )

                body = json.dumps(
                    {
                        "fps": round(session.fps, 2),
                        "frame_ms": round(session.last_frame_ms, 1),
                        "iteration": session.pass_counter,
                        "device": format_panel(snapshot()),
                    }
                ).encode()
                self._send(200, body)
            elif path == "/materials":
                self._send(200, json.dumps(session.host_scene.materials).encode())
            else:
                self._send(404, b"{}")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length) if length else b"{}"
            try:
                data = json.loads(raw) if raw.strip() else {}
            except json.JSONDecodeError:
                self._send(400, b"bad json", "text/plain")
                return
            cam = session.camera
            path = self.path.split("?")[0]
            with state.lock:
                if path == "/orbit":
                    cam.modify_yaw(-data.get("dx", 0) * 0.01)
                    cam.modify_pitch(data.get("dy", 0) * 0.01)
                elif path == "/pan":
                    cam.modify_pan(-data.get("dx", 0) * 0.02, data.get("dy", 0) * 0.02)
                elif path == "/zoom":
                    cam.modify_radius(data.get("d", 0) * 0.1)
                elif path == "/aperture":
                    cam.set_aperture_radius(cam.aperture_radius + data.get("d", 0))
                elif path == "/focal":
                    cam.set_focal_distance(cam.focal_distance + data.get("d", 0))
                elif path == "/materials":
                    try:
                        mats = json.loads(raw)
                        assert isinstance(mats, list)
                        session.host_scene.materials = mats
                        session._rebuild()
                        self._send(200, b"materials applied", "text/plain")
                        return
                    except Exception as e:
                        self._send(400, f"error: {e}".encode(), "text/plain")
                        return
                elif path == "/screenshot":
                    p = session.screenshot(".")
                    self._send(200, p.encode(), "text/plain")
                    return
                else:
                    self._send(404, b"", "text/plain")
                    return
                state.dirty = True  # any edit resets accumulation
            self._send(200, b"ok", "text/plain")

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="example:flagship")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from apps.render_cli import build_host_scene
    from pathtracerwithcuda_tpu.config import RenderConfig
    from pathtracerwithcuda_tpu.render.session import RenderSession

    config = RenderConfig(width=args.width, height=args.height,
                          max_tracer_depth=args.depth)
    session = RenderSession(build_host_scene(args.scene), config)
    state = ViewerState(session)
    thread = threading.Thread(target=state.render_loop, daemon=True)
    thread.start()

    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(state))
    print(f"[Info] viewer at http://127.0.0.1:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        state.running = False


if __name__ == "__main__":
    main()
