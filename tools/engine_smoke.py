"""End-to-end engine drive (requires a live backend; run from repo root):
livelink world load, editor protocol, tick loop, debug views, material
overrides. Usage: python tools/engine_smoke.py"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.engine import Engine
from zeldaengine_tpu.livelink import send_data_to_engine
from zeldaengine_tpu.livelink.client import editor_request
from zeldaengine_tpu.scene.world import make_demo_world

config = EngineConfig(width=512, height=512, shadowmap_dim=512,
                      texture_size=128, cubemap_size=64,
                      background_size=128, max_point_lights=16)
w = make_demo_world()
w.object_descs[3].instance_count = 100
w.object_descs[4].instance_count = 100
port = 18093
engine = Engine(config=config, world=w, livelink_port=port)
engine.start()
img = engine.tick()
a = np.asarray(img)
assert np.isfinite(a).all() and a.std() > 0.01, a.std()
print("tick OK std=", round(float(a.std()), 4), flush=True)

# livelink reload
w2 = make_demo_world()
w2.main_camera.position = np.array([6.0, 4.0, 5.0], np.float32)
send_data_to_engine(w2.to_json(), port=port)
time.sleep(0.3)
engine.tick()
print("livelink reload OK, reloads=", engine.stats.reloads, flush=True)

# editor protocol: outliner + edit a light + stats
out = editor_request({"Command": "GetOutliner"}, port=port)
assert out.get("Status") == "ok" and "Objects" in out, out
st = editor_request({"Command": "GetStats"}, port=port)
assert st.get("Status") == "ok", st
res = editor_request({"Command": "SetDetails", "Target": "PointLight/0",
                      "Values": {"Intensity": 5.0}}, port=port)
print("editor OK:", res.get("Status"), flush=True)
engine.tick()

# debug view + override surfaces
engine.set_debug_view(4)
engine.tick()
engine.set_debug_view(0)
engine.set_material_override(basecolor=0.5)
engine.tick()
engine.orbit(0.1, 0.05); engine.zoom(-0.5); engine.focus()
img2 = engine.tick()
assert np.isfinite(np.asarray(img2)).all()
print("input/debug/override OK; fps=", round(engine.stats.fps, 2))
engine.stop()
print("ENGINE SMOKE PASS")
