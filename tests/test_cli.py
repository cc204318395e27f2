"""CLI entrypoints (`python -m zeldaengine_tpu.engine` / `.viewer`).

VERDICT r4 weak #4: `viewer.py --world` crashed with a TypeError
(World.load only accepts raw_data; the file path rides the constructor)
and neither main() had coverage. Both argument paths run 1-2 tiny frames
here with argv injection; pool capacities are shrunk by patching the
EngineConfig constructor the mains call (the flags only expose
width/height, matching the reference's compile-time VIEWPORT).
"""

import sys
import time as time_mod

import numpy as np
import pytest

from zeldaengine_tpu.config import TEST_CONFIG


def _write_world(tmp_path):
    """A minimal world file with a distinctive light so the test can
    prove the file was actually loaded (not a default world)."""
    from zeldaengine_tpu.scene.world import CameraDesc, LightDesc, World

    w = World(file_path=str(tmp_path / "World.json"))
    w.main_camera = CameraDesc(
        position=np.array([0.0, -4.0, 3.0], np.float32),
        lookat=np.array([0.0, 0.0, 0.0], np.float32),
    )
    sun = np.array([5.0, -5.0, 10.0], np.float32)
    w.directional_lights = [
        LightDesc(position=sun, type=0, intensity=7.25,
                  direction=sun / np.linalg.norm(sun))
    ]
    w.save()
    return w.file_path


def _tiny_config_factory(**extra):
    def factory(width, height):
        return TEST_CONFIG.replace(
            width=width, height=height,
            enable_shadow=False, enable_skydome=False, **extra,
        )

    return factory


def test_engine_main_world_flag(tmp_path, monkeypatch):
    import zeldaengine_tpu.engine as em

    path = _write_world(tmp_path)
    out = str(tmp_path / "frame.png")
    monkeypatch.setattr(em, "EngineConfig", _tiny_config_factory())
    monkeypatch.setattr(sys, "argv", [
        "zelda-engine", "--world", path, "--frames", "2",
        "--width", "64", "--height", "64", "--out", out, "--port", "0",
    ])
    em.main()
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape[:2] == (64, 64)


def test_viewer_main_world_flag(tmp_path, monkeypatch):
    """`python -m zeldaengine_tpu.viewer --world <path>` must load the
    world from the file (the round-4 TypeError path) and run the loop."""
    import zeldaengine_tpu.config as cfgmod
    import zeldaengine_tpu.engine as em
    import zeldaengine_tpu.viewer as vm

    path = _write_world(tmp_path)
    captured = {}
    real_engine = em.Engine

    class CapturingEngine(real_engine):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            captured["engine"] = self

    monkeypatch.setattr(em, "Engine", CapturingEngine)
    monkeypatch.setattr(
        cfgmod, "EngineConfig",
        _tiny_config_factory(frames_in_flight=1),
    )
    # main()'s idle loop is `while True: time.sleep(1.0)` — let it spin
    # twice (a frame renders meanwhile), then interrupt like ctrl-C.
    real_sleep = time_mod.sleep
    state = {"idles": 0}

    def fake_sleep(s):
        if s == 1.0:
            state["idles"] += 1
            if state["idles"] >= 2:
                raise KeyboardInterrupt
        real_sleep(min(s, 0.05))

    monkeypatch.setattr(time_mod, "sleep", fake_sleep)
    monkeypatch.setattr(sys, "argv", [
        "zelda-viewer", "--world", path, "--port", "0",
        "--width", "64", "--height", "64", "--livelink-port", "0",
    ])
    vm.main()
    eng = captured["engine"]
    # The distinctive light proves the --world file was parsed.
    assert len(eng.world.directional_lights) == 1
    assert eng.world.directional_lights[0].intensity == pytest.approx(7.25)
    assert eng.stats.frame_index >= 1
