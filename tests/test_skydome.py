"""Skydome: analytic ray/sphere path vs the rasterized dome mesh, with the
real Content/Models/skydome.obj when mounted (radius 20.48, u phase 0.75)."""

import os

import numpy as np
import pytest

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.passes.frame import render_rows
from zeldaengine_tpu.passes.view import build_view_state
from zeldaengine_tpu.scene.demo import REFERENCE_CONTENT_ROOT, build_demo_scene
from zeldaengine_tpu.scene.mesh import load_obj
from zeldaengine_tpu.scene.scenebuild import SceneBuilder


def test_analytic_matches_mesh_dome():
    cfg_a = TEST_CONFIG.replace(skydome_mode="analytic")
    cfg_m = TEST_CONFIG.replace(skydome_mode="mesh")
    scene, meta, world = build_demo_scene(cfg_a, grass=8, rocks=4)
    view = build_view_state(world, cfg_a, light_capacities=(2, 8, 2))
    ca, _ = render_rows(scene, view, meta, cfg_a)
    cm, _ = render_rows(scene, view, meta, cfg_m)
    d = np.abs(np.asarray(ca) - np.asarray(cm))
    # mesh path linearly interpolates UV over facets; analytic is its
    # infinite-tessellation limit
    assert d.mean() < 5e-3, d.mean()
    assert (d > 0.1).mean() < 0.01


@pytest.mark.skipif(not os.path.isdir(REFERENCE_CONTENT_ROOT),
                    reason="reference content not mounted")
def test_real_skydome_params_derived():
    b = SceneBuilder(TEST_CONFIG)
    dome = load_obj(os.path.join(REFERENCE_CONTENT_ROOT,
                                 "Content/Models/skydome.obj"))
    b.set_skydome_mesh(dome)
    radius, phase = b._sky_params
    assert abs(radius - 20.48) < 0.01
    assert abs(phase - 0.75) < 0.01


def test_world_load_accepts_partial_json():
    """Schema-subset worlds keep defaults per key instead of raising
    (the reference's rapidjson path degrades per-member)."""
    from zeldaengine_tpu.scene.world import World

    w = World()
    w.load(raw_data='{"MainCamera": {"FOV": 60.0}, '
                    '"Objects": [{"ProfabName": "rock_01"}]}')
    assert w.main_camera.fov == 60.0
    assert w.main_camera.z_near == 0.1  # default kept
    assert w.object_descs[0].profab_name == "rock_01"
    assert w.object_descs[0].instance_count == 0
    w.load(raw_data="{}")  # fully empty is a reset world
    assert w.object_descs == []
