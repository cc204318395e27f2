"""Shared benchmark scenes for the A/B and stage-timing tools."""

from __future__ import annotations

import time

import numpy as np


def build_c4_scene(config):
    """The BASELINE config-4 scene: 16 dense spheres baked to meshlets,
    ~1.03M triangles / ~14k meshlets (same construction as bench.py
    config 4)."""
    from zeldaengine_tpu.meshlet import build_meshlets
    from zeldaengine_tpu.scene.mesh import make_sphere
    from zeldaengine_tpu.scene.scenebuild import SceneBuilder
    from zeldaengine_tpu.scene.world import World, CameraDesc, LightDesc

    b = SceneBuilder(config)
    mat = b.add_material({})
    t0 = time.time()
    for i in range(16):
        mesh = make_sphere(0.8, rings=140, sectors=230)
        offs = np.array(
            [(i % 4 - 1.5) * 2.2, (i // 4 - 1.5) * 2.2, 0.8], np.float32
        )
        ms = build_meshlets(mesh.positions + offs, mesh.indices,
                            normals=mesh.normals, uvs=mesh.uvs)
        b.add_meshlet_object(ms, mat)
    scene, meta = b.build()
    print(f"# c4 bake+build {time.time()-t0:.1f}s tris={meta.num_triangles}"
          f" meshlets={meta.num_meshlets}", flush=True)

    w = World()
    w.main_camera = CameraDesc(
        position=np.array([6.0, -6.0, 3.0], np.float32),
        lookat=np.array([0.0, 0.0, 0.8], np.float32), z_far=80.0,
    )
    moon = np.array([20.0, 0.0, 20.0], np.float32)
    w.directional_lights = [LightDesc(
        position=moon, type=0,
        color=np.array([1.0, 0.95, 0.85], np.float32), intensity=3.0,
        direction=moon / np.linalg.norm(moon),
    )]
    return scene, meta, w


def c4_config(base_cls, **over):
    # Mirrors bench.py config 4 exactly (caps + shadow capacities) so
    # stage probes time the same program the bench runs.
    kw = dict(width=1024, height=1024, shadowmap_dim=512,
              texture_size=128, cubemap_size=64, background_size=128,
              max_point_lights=8, pair_expand=4, pair_expand_shadow=2,
              compact_tris=384 * 1024, compact_tris_shadow=96 * 1024,
              shadow_cone_cull=True, subpixel_cull=True,
              max_pairs=384 * 1024,
              max_pairs_shadow=64 * 1024)
    kw.update(over)
    return base_cls(**kw)
