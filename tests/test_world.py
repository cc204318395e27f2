"""World JSON serde round-trip + livelink schema compatibility."""

import json

import numpy as np

from zeldaengine_tpu.scene.world import (
    World,
    LightDesc,
    ObjectDesc,
    RenderFlags,
    make_demo_world,
)


def test_world_roundtrip(tmp_path):
    w = make_demo_world()
    path = tmp_path / "World.json"
    w.save(str(path))

    w2 = World(file_path=str(path)).load()
    assert len(w2.object_descs) == 5
    assert w2.object_descs[0].profab_name == "terrain"
    assert w2.object_descs[3].instance_count == 10000
    assert len(w2.directional_lights) == 1
    assert len(w2.point_lights) == 16
    np.testing.assert_allclose(w2.main_camera.position, [5.0, 5.0, 5.0])
    assert w2.main_camera.fov == 45.0


def test_world_load_from_raw_string_matches_livelink_schema():
    # Schema exactly as ZeldaUntitled.py builds it.
    doc = {
        "MainCamera": {
            "Position": [5.0, 5.0, 5.0],
            "Lookat": [0.0, 0.0, 0.5],
            "Speed": 2.5,
            "FOV": 45.0,
            "zNear": 0.1,
            "zFar": 45.0,
        },
        "Skydome": {
            "EnableSkydome": True,
            "OverrideSkydome": True,
            "SkydomeFileName": "grassland_night.png",
            "OverrideCubemap": True,
            "CubemapFileNames": [f"grassland_night_{s}.png"
                                 for s in ("X0", "X1", "Y2", "Y3", "Z4", "Z5")],
        },
        "Background": {
            "EnableBackground": True,
            "OverrideBackground": True,
            "BackgroundFileName": "background.png",
        },
        "DirectionalLights": [
            {
                "Position": [20.0, 0.0, 20.0],
                "Type": 0,
                "Color": [0.0, 0.1, 0.6],
                "Intensity": 15.0,
                "Direction": [20.0, 0.0, 20.0],
                "Radius": 0.0,
                "ExtraData": [0.0, 0.0, 0.0, 0.0],
            }
        ],
        "PointLights": [],
        "SpotLights": [],
        "Objects": [
            {
                "RenderFlags": 0,
                "ProfabName": "terrain",
                "InstanceCount": 1,
                "MinRadius": 0.0,
                "MaxRadius": 0.0,
                "MinRotYaw": 0.0,
                "MaxRotYaw": 0.0,
                "MinRotRoll": 0.0,
                "MaxRotRoll": 0.0,
                "MinRotPitch": 0.0,
                "MaxRotPitch": 0.0,
                "MinPScale": 0.0,
                "MaxPScale": 0.0,
            }
        ],
    }
    w = World().load(raw_data=json.dumps(doc))
    assert w.skydome_file_name == "grassland_night.png"
    assert w.object_descs[0].profab_name == "terrain"
    assert w.directional_lights[0].intensity == 15.0


def test_light_packing_layout():
    l = LightDesc(
        position=np.array([1.0, 2.0, 3.0], np.float32),
        type=1,
        color=np.array([0.5, 0.6, 0.7], np.float32),
        intensity=10.0,
        direction=np.array([0.0, 0.0, 1.0], np.float32),
        radius=1.5,
        extra_data=np.array([0.1, 0.2, 0.3, 0.4], np.float32),
    )
    p = l.packed()
    assert p.shape == (4, 4)
    np.testing.assert_allclose(p[0], [1, 2, 3, 1])  # position.w = type
    np.testing.assert_allclose(p[1], [0.5, 0.6, 0.7, 10.0])  # color.w = intensity
    np.testing.assert_allclose(p[2], [0, 0, 1, 1.5])  # direction.w = radius
    np.testing.assert_allclose(p[3], [0.1, 0.2, 0.3, 0.4])


def test_instance_generation_ring_scatter():
    desc = ObjectDesc(
        profab_name="grass",
        instance_count=1000,
        min_radius=2.0,
        max_radius=8.0,
        min_pscale=0.1,
        max_pscale=0.5,
    )
    inst = desc.generate_instances(seed=3)
    assert inst.shape == (1000, 8)
    r = np.linalg.norm(inst[:, :2], axis=1)
    assert (r >= 2.0 - 1e-5).all() and (r <= 8.0 + 1e-5).all()
    assert (inst[:, 2] == 0).all()  # Z = 0
    assert (inst[:, 6] >= 0.1).all() and (inst[:, 6] <= 0.5).all()
    assert (inst[:, 7] >= 0).all() and (inst[:, 7] <= 255).all()


def test_camera_orbit():
    w = make_demo_world()
    cam = w.main_camera
    arm0 = cam.arm_length
    cam.add_movement(10.0, 0.0)
    np.testing.assert_allclose(cam.arm_length, arm0, rtol=1e-4)
    cam.zoom(1.0)
    np.testing.assert_allclose(cam.arm_length, arm0 - 1.0, rtol=1e-4)


def test_render_flags_values():
    assert int(RenderFlags.NONE) == 1
    assert int(RenderFlags.INSTANCED) == 4
    assert int(RenderFlags.DEFERRED_SCENE) == 1 << 10
