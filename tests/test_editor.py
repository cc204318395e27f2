"""Headless editor protocol: connect -> query outliner -> edit a light ->
next frame reflects it (the ImGui editor surface, ZeldaEngine.cpp:4324-4581,
as JSON over the livelink socket)."""

import numpy as np
import pytest

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.engine import Engine
from zeldaengine_tpu.livelink import editor_request, send_data_to_engine
from zeldaengine_tpu.scene.world import (
    CameraDesc, LightDesc, ObjectDesc, RenderFlags, World,
)

PORT = 18291


def _small_world():
    w = World()
    w.main_camera = CameraDesc(
        position=np.array([0.0, -4.0, 4.0], np.float32),
        lookat=np.array([0.0, 0.0, 0.0], np.float32),
    )
    sun = np.array([5.0, -5.0, 10.0], np.float32)
    w.directional_lights = [
        LightDesc(position=sun, type=0, intensity=5.0,
                  direction=sun / np.linalg.norm(sun))
    ]
    w.object_descs = [
        ObjectDesc(profab_name="terrain",
                   render_flags=int(RenderFlags.NONE), instance_count=1),
        ObjectDesc(profab_name="rock_02",
                   render_flags=int(RenderFlags.DEFERRED_SCENE),
                   instance_count=4, min_radius=0.5, max_radius=2.0,
                   min_pscale=0.3, max_pscale=0.6),
    ]
    return w


@pytest.fixture(scope="module")
def engine():
    # fifo present: this module asserts WHICH frame a tick returns
    # (pipelined-previous under frames_in_flight=2); mailbox mode's
    # unbounded staleness would make that racy.
    config = TEST_CONFIG.replace(enable_shadow=False, enable_skydome=False,
                                 present_mode="fifo")
    e = Engine(config=config, world=_small_world(), livelink_port=PORT)
    e.start()
    e.tick()
    yield e
    e.stop()


def test_outliner_lists_objects_and_lights(engine):
    out = editor_request({"Command": "GetOutliner"}, port=PORT)
    assert out["Status"] == "ok"
    assert out["Lights"]["Directional"] == 1
    names = [o["ProfabName"] for o in out["Objects"]]
    assert names == ["terrain", "rock_02"]
    assert out["SceneTriangles"] > 0


def test_details_roundtrip_camera(engine):
    out = editor_request({"Command": "GetDetails", "Target": "Camera"},
                         port=PORT)
    assert out["Values"]["fov"] == 45.0
    editor_request({"Command": "SetDetails", "Target": "Camera",
                    "Values": {"fov": 60.0}}, port=PORT)
    out = editor_request({"Command": "GetDetails", "Target": "Camera"},
                         port=PORT)
    assert out["Values"]["fov"] == 60.0
    editor_request({"Command": "SetDetails", "Target": "Camera",
                    "Values": {"fov": 45.0}}, port=PORT)


def test_edit_light_changes_next_frame(engine):
    engine.tick()
    before = engine.tick()
    reply = editor_request(
        {"Command": "SetDetails", "Target": "DirectionalLight/0",
         "Values": {"intensity": 0.0}}, port=PORT)
    assert reply["Status"] == "ok" and "intensity" in reply["Applied"]
    engine.tick()  # renders the edit; tick RETURNS the pipelined previous
    # frame (frames_in_flight=2, the reference's MAX_FRAMES_IN_FLIGHT —
    # edits present one frame later, like any real swapchain)
    after = engine.tick()
    assert float(np.mean(after)) < float(np.mean(before)) - 1.0  # u8 scale
    editor_request({"Command": "SetDetails", "Target": "DirectionalLight/0",
                    "Values": {"intensity": 5.0}}, port=PORT)


def test_object_edit_triggers_rebuild(engine):
    tris_before = engine.meta.num_triangles
    editor_request({"Command": "SetDetails", "Target": "Object/1",
                    "Values": {"instance_count": 8}}, port=PORT)
    engine.tick()
    assert engine.meta.num_triangles > tris_before
    editor_request({"Command": "SetDetails", "Target": "Object/1",
                    "Values": {"instance_count": 4}}, port=PORT)
    engine.tick()


def test_stats_and_engine_details(engine):
    out = editor_request({"Command": "GetStats"}, port=PORT)
    assert out["Stats"]["frame_index"] > 0
    editor_request({"Command": "SetDetails", "Target": "Engine",
                    "Values": {"DebugView": 3}}, port=PORT)
    assert engine.debug_view == 3
    editor_request({"Command": "SetDetails", "Target": "Engine",
                    "Values": {"DebugView": 0}}, port=PORT)


def test_save_and_reload_world(engine, tmp_path):
    path = str(tmp_path / "World.json")
    out = editor_request({"Command": "SaveWorld", "Path": path}, port=PORT)
    assert out["Status"] == "ok"
    out = editor_request({"Command": "ReloadWorld", "Path": path}, port=PORT)
    assert out["Status"] == "ok"
    engine.tick()
    assert len(engine.world.object_descs) == 2


def test_run_script_executes(engine):
    out = editor_request(
        {"Command": "RunScript",
         "Source": "print(len(world.object_descs))"}, port=PORT)
    assert out["Status"] == "ok"
    assert out["Output"].strip() == "2"


def test_unknown_command_is_error(engine):
    out = editor_request({"Command": "Bogus"}, port=PORT)
    assert out["Status"] == "error"


def test_world_push_still_hot_reloads(engine):
    w2 = _small_world()
    w2.object_descs[1].instance_count = 6
    send_data_to_engine(w2.to_json(), port=PORT)
    import time
    time.sleep(0.3)
    engine.tick()
    assert engine.world.object_descs[1].instance_count == 6
