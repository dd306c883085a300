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
<h3>scene</h3>
<select id=scenes></select>
<button onclick=loadScene()>load scene</button>
<h3>materials</h3>
<textarea id=mats></textarea>
<button onclick=applyMats()>apply materials</button>
<h3>transforms</h3>
<textarea id=xforms style="height:120px"></textarea>
<button onclick=applyXforms()>apply transforms</button>
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
async function loadXforms(){
  document.getElementById('xforms').value=JSON.stringify(await (await fetch('/transforms')).json(),null,1);}
async function applyXforms(){
  const r=await fetch('/transforms',{method:'POST',body:document.getElementById('xforms').value});
  document.getElementById('msg').textContent=await r.text();loadXforms();}
async function loadScenes(){
  const names=await (await fetch('/scenes')).json();
  document.getElementById('scenes').innerHTML=
    names.map(n=>`<option>${n}</option>`).join('');}
async function loadScene(){
  const r=await fetch('/scene',{method:'POST',
    body:JSON.stringify({name:document.getElementById('scenes').value})});
  document.getElementById('msg').textContent=await r.text();
  loadMats();loadXforms();}
refresh();loadMats();loadXforms();loadScenes();
</script></body></html>"""


def list_scenes():
    """Scene chooser inventory (reference render_choose_scene,
    Main/window.cpp:414): procedural examples + every scene JSON in the
    repo's assets/ and, when mounted, the reference res/scene directory."""
    import glob
    import os

    names = ["example:flagship", "example:cornell", "example:sss_dof"]
    for base in ("assets/scene",
                 "/root/reference/gpu_path_tracer/res/scene"):
        if os.path.isdir(base):
            names += sorted(glob.glob(os.path.join(base, "*.json")))
    return names


def apply_transforms(session, data) -> str:
    """Apply a /transforms POST body: same shape the GET returns; only
    changed fields trigger work (position/scale = refit, rotate = rebuild)."""
    import numpy as np

    applied = []
    for m in data.get("meshes", []):
        i = int(m["index"])
        cur = session.host_scene.meshes[i]
        if "rotate" in m and not np.allclose(
                np.asarray(m["rotate"], np.float32), cur.rotate):
            session.set_mesh_rotate(i, np.asarray(m["rotate"], np.float32))
            applied.append(f"mesh{i}:rotate")
        pos = m.get("position")
        scale = m.get("scale")
        pos_new = pos is not None and not np.allclose(
            np.asarray(pos, np.float32), cur.position)
        scale_new = scale is not None and not np.allclose(
            np.asarray(scale, np.float32), cur.scale)
        if pos_new or scale_new:
            session.set_mesh_transform(
                i, position=pos if pos_new else None,
                scale=scale if scale_new else None)
            applied.append(f"mesh{i}:transform")
    for s in data.get("spheres", []):
        i = int(s["index"])
        c_new = "center" in s and not np.allclose(
            np.asarray(s["center"], np.float32),
            session.host_scene.sphere_centers[i])
        r_new = "radius" in s and not np.isclose(
            float(s["radius"]), float(session.host_scene.sphere_radii[i]))
        if c_new or r_new:
            session.set_sphere(i, center=s.get("center") if c_new else None,
                               radius=s.get("radius") if r_new else None)
            applied.append(f"sphere{i}")
    return "applied: " + (", ".join(applied) if applied else "(no changes)")


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
                )

                body = json.dumps(
                    {
                        "fps": round(session.fps, 2),
                        "frame_ms": round(session.last_frame_ms, 1),
                        "iteration": session.pass_counter,
                        "device": format_panel(session.device_status.tick()),
                    }
                ).encode()
                self._send(200, body)
            elif path == "/materials":
                self._send(200, json.dumps(session.host_scene.materials).encode())
            elif path == "/transforms":
                body = {
                    "meshes": [
                        {"index": i, "position": m.position.tolist(),
                         "scale": m.scale.tolist(), "rotate": m.rotate.tolist()}
                        for i, m in enumerate(session.host_scene.meshes)
                    ],
                    "spheres": [
                        {"index": i, "center": c.tolist(), "radius": float(r)}
                        for i, (c, r) in enumerate(zip(
                            session.host_scene.sphere_centers,
                            session.host_scene.sphere_radii))
                    ],
                }
                self._send(200, json.dumps(body).encode())
            elif path == "/scenes":
                self._send(200, json.dumps(list_scenes()).encode())
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
                elif path == "/transforms":
                    # mesh position/scale -> O(n) refit; rotate -> rebuild;
                    # sphere center/radius -> direct update (the reference UI
                    # edit surface, Core/path_tracer.cpp:109-369)
                    try:
                        msg = apply_transforms(session, json.loads(raw))
                        self._send(200, msg.encode(), "text/plain")
                        return
                    except Exception as e:
                        self._send(400, f"error: {e}".encode(), "text/plain")
                        return
                elif path == "/scene":
                    try:
                        from apps.render_cli import build_host_scene

                        session.set_scene(build_host_scene(data["name"]))
                        self._send(200, f"scene {data['name']} loaded".encode(),
                                   "text/plain")
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
