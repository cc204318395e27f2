"""Demo scene assembly — the CreateEngineWorld procedural world
(ZeldaEngine.cpp:4043-4137) at configurable instance scale."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.scene.assets import build_scene_from_world
from zeldaengine_tpu.scene.world import World, make_demo_world

REFERENCE_CONTENT_ROOT = "/root/reference/Engine/ZeldaEngine"


def demo_world(grass: int = 10000, rocks: int = 64) -> World:
    """The reference demo world, instance counts scaled."""
    w = make_demo_world()
    w.object_descs[2].instance_count = rocks
    w.object_descs[3].instance_count = grass
    w.object_descs[4].instance_count = grass
    return w


def build_demo_scene(
    config: EngineConfig,
    grass: int = 1000,
    rocks: int = 64,
    roots: Optional[List[str]] = None,
):
    """Returns (GpuScene, SceneMeta, World). Uses reference Content assets
    when present (read-only mount), procedural stand-ins otherwise."""
    import os

    if roots is None:
        roots = []
        if os.path.isdir(REFERENCE_CONTENT_ROOT):
            roots.append(REFERENCE_CONTENT_ROOT)
    world = demo_world(grass=grass, rocks=rocks)
    scene, meta = build_scene_from_world(world, config, roots=roots)
    return scene, meta, world
