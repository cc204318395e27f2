"""Asset-change detection: a livelink push of an IDENTICAL world must
still rebuild the scene when an asset file on disk changed (VERDICT r2
missing #5 — the mtime keys in assets.py were never consulted by
Engine._scene_content_key)."""

import os

import numpy as np
import pytest

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.engine import Engine
from zeldaengine_tpu.scene.world import (
    CameraDesc, ObjectDesc, RenderFlags, World,
)
from zeldaengine_tpu.utils.image import write_png


def _world():
    w = World()
    w.main_camera = CameraDesc(
        position=np.array([0.0, -3.0, 2.0], np.float32),
        lookat=np.array([0.0, 0.0, 0.0], np.float32),
    )
    w.object_descs = [
        ObjectDesc(profab_name="thing",
                   render_flags=int(RenderFlags.DEFERRED_SCENE),
                   instance_count=1),
    ]
    return w


@pytest.fixture
def profab_root(tmp_path):
    size = TEST_CONFIG.texture_size
    pdir = tmp_path / "Profabs" / "thing"
    (pdir / "models").mkdir(parents=True)
    (pdir / "textures").mkdir()
    with open(pdir / "models" / "thing.obj", "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                "vn 0 0 1\nvt 0 0\nvt 1 0\nvt 0 1\n"
                "f 1/1/1 2/2/1 3/3/1\n")
    img = np.full((size, size, 3), 0.5, np.float32)
    write_png(str(pdir / "textures" / "thing_bc.png"), img)
    return tmp_path


def test_touched_texture_triggers_rebuild(profab_root):
    e = Engine(config=TEST_CONFIG.replace(enable_shadow=False,
                                          enable_skydome=False),
               world=_world(), asset_roots=[str(profab_root)],
               livelink_port=None)
    key1 = e._scene_content_key()

    # Unchanged world + unchanged assets: same key, rebuild skipped.
    assert e._scene_content_key() == key1
    scene_before = e.scene
    e._rebuild_scene()
    assert e.scene is scene_before

    # Touch the texture (newer mtime, same world): key changes, a reload
    # of the identical world JSON rebuilds the scene.
    tex = (profab_root / "Profabs" / "thing" / "textures" / "thing_bc.png")
    st = os.stat(tex)
    os.utime(tex, (st.st_atime + 5, st.st_mtime + 5))
    assert e._scene_content_key() != key1
    e._rebuild_scene()
    assert e.scene is not scene_before
