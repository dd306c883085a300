"""Viewer HTTP API tests — the reference UI edit surface over HTTP
(Core/path_tracer.cpp:109-369 material/transform/rotate editors +
Main/window.cpp:414 scene chooser), without a browser."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from apps.viewer import ViewerState, make_handler
from tests.test_session import _torus_session


@pytest.fixture()
def server():
    session = _torus_session()
    state = ViewerState(session)  # no render thread: tests call render()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield session, state, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _post(url, body):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, r.read().decode()


def test_scene_chooser_lists_and_loads(server):
    session, state, base = server
    names = _get(base + "/scenes")
    assert "example:cornell" in names
    assert any(n.endswith("tex_cube.json") for n in names)  # local assets

    before_spheres = len(session.host_scene.sphere_centers)
    status, msg = _post(base + "/scene", {"name": "example:cornell"})
    assert status == 200 and "loaded" in msg
    assert len(session.host_scene.sphere_centers) != before_spheres
    assert session.pass_counter == 0  # accumulation reset


def test_transforms_roundtrip_uses_refit(server, monkeypatch):
    session, state, base = server
    session.render()
    assert session.pass_counter == 1

    t = _get(base + "/transforms")
    assert len(t["meshes"]) == 1 and len(t["spheres"]) == 2
    assert t["meshes"][0]["position"] == pytest.approx([0.0, 0.5, 0.0])

    # position/scale edit MUST take the O(n) refit path (no rebuild)
    import pathtracerwithcuda_tpu.render.session as session_mod

    def boom(*a, **kw):
        raise AssertionError("transform edit triggered a full rebuild")

    monkeypatch.setattr(session_mod, "build_scene_data", boom)
    edit = {"meshes": [{"index": 0, "position": [0.4, 0.6, 0.1],
                        "scale": [0.5, 0.5, 0.5],
                        "rotate": t["meshes"][0]["rotate"]}]}
    status, msg = _post(base + "/transforms", edit)
    assert status == 200 and "mesh0:transform" in msg
    monkeypatch.undo()
    assert session.pass_counter == 0  # edit reset accumulation
    assert np.allclose(session.host_scene.meshes[0].position, [0.4, 0.6, 0.1])

    # rotate edit goes through the rebuild path
    edit = {"meshes": [{"index": 0, "rotate": [0.0, 45.0, 0.0]}]}
    status, msg = _post(base + "/transforms", edit)
    assert status == 200 and "mesh0:rotate" in msg

    # sphere center edit
    edit = {"spheres": [{"index": 1, "center": [0.2, 4.0, 0.0],
                         "radius": 1.5}]}
    status, msg = _post(base + "/transforms", edit)
    assert status == 200 and "sphere1" in msg
    assert np.allclose(session.host_scene.sphere_centers[1], [0.2, 4.0, 0.0])

    # no-op POST applies nothing
    status, msg = _post(base + "/transforms", _get(base + "/transforms"))
    assert status == 200 and "(no changes)" in msg
