"""Per-frame view state — the TPU analogue of the XkView "scene UBO"
(ZeldaEngine.cpp:922-965) plus the per-frame matrix computation of
UpdateUniformBuffer (:4585-4664).

Everything here is a traced array: changing the camera, lights, time, or
debug view never recompiles.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.math.transforms import (
    look_at,
    perspective_vk,
    rotate_z,
    matmul_f32,
)
from zeldaengine_tpu.scene.world import World, LightDesc


class ViewState(NamedTuple):
    view_proj: jnp.ndarray  # (4, 4) cameraProj @ cameraView (Y-flipped)
    shadow_space: jnp.ndarray  # (4, 4) shadowProj @ shadowView (Y-flipped)
    model: jnp.ndarray  # (4, 4) localToWorld (stage roll, :4614)
    camera_pos: jnp.ndarray  # (3,)
    camera_fov: jnp.ndarray  # () degrees (cameraInfo.w)
    viewport: jnp.ndarray  # (4,) w, h, right_bar, bottom_bar
    dir_lights: jnp.ndarray  # (Ld, 4, 4)
    point_lights: jnp.ndarray  # (Lp, 4, 4)
    spot_lights: jnp.ndarray  # (Ls, 4, 4)
    lights_count: jnp.ndarray  # (4,) int32: dir, point, spot, cubemap mips
    time: jnp.ndarray  # ()
    z_near: jnp.ndarray  # ()
    z_far: jnp.ndarray  # ()
    debug_view: jnp.ndarray  # () int32 — SPEC_CONSTANTS (push constant)
    # XkGlobalConstants push-constant overrides (ZeldaEngine.cpp:903-919):
    # basecolor, metallic, specular, roughness multipliers (1.0 = off).
    overrides: jnp.ndarray  # (4,)


def pack_lights(lights: Sequence[LightDesc], capacity: int) -> np.ndarray:
    arr = np.zeros((capacity, 4, 4), np.float32)
    for i, l in enumerate(lights[:capacity]):
        arr[i] = l.packed()
    return arr


def build_view_state(
    world: World,
    config: EngineConfig,
    time: float = 0.0,
    roll_stage: float = 0.0,
    roll_light: float = 0.0,
    debug_view: int = 0,
    animate_point_lights: bool = True,
    light_capacities: Optional[tuple] = None,
    right_bar: float = 0.0,
    bottom_bar: float = 0.0,
    overrides=None,
) -> ViewState:
    """Replicates UpdateUniformBuffer (ZeldaEngine.cpp:4585-4664):

    - camera view/proj from the orbit camera (Y-flipped proj)
    - shadow view from directional light 0 toward the origin, shadow proj
      using the *camera's* FOV at aspect 1 (:4614-4616)
    - the point-light ring animation (:4637-4646)
    """
    cam = world.main_camera
    aspect = config.width / config.height
    fov_r = math.radians(cam.fov)

    cam_view = look_at(cam.position, cam.lookat, np.array([0.0, 0.0, 1.0]))
    cam_proj = perspective_vk(fov_r, aspect, cam.z_near, cam.z_far)
    view_proj = matmul_f32(cam_proj, cam_view)

    if world.directional_lights:
        light_pos = np.asarray(world.directional_lights[0].position, np.float32)
    else:
        light_pos = np.array([20.0, 0.0, 20.0], np.float32)
    shadow_view = look_at(light_pos, np.zeros(3), np.array([0.0, 0.0, 1.0]))
    shadow_proj = perspective_vk(fov_r, 1.0, cam.z_near, cam.z_far)
    shadow_space = matmul_f32(shadow_proj, shadow_view)

    model = rotate_z(jnp.float32(roll_stage))

    if light_capacities is not None:
        caps = light_capacities
    elif config.adaptive_light_capacity:
        # Pad each table to the next power of two >= its count (min 1):
        # the unrolled lighting loop evaluates full BxDF per CAPACITY
        # slot, so a 16-capacity table with 1 live light wastes 15
        # full-screen light evaluations. pow2 quantization keeps
        # recompiles to count-crossings (the reference's fixed 16/512/16
        # capacities, ZeldaEngine.cpp:84-86, remain the upper bounds).
        def cap(n, mx):
            c = 1
            while c < n:
                c *= 2
            return min(c, mx)

        caps = (
            cap(len(world.directional_lights), config.max_directional_lights),
            cap(len(world.point_lights), config.max_point_lights),
            cap(len(world.spot_lights), config.max_spot_lights),
        )
    else:
        caps = (
            config.max_directional_lights,
            config.max_point_lights,
            config.max_spot_lights,
        )
    dir_arr = pack_lights(world.directional_lights, caps[0])
    point_arr = pack_lights(world.point_lights, caps[1])
    spot_arr = pack_lights(world.spot_lights, caps[2])

    n_point = min(len(world.point_lights), caps[1])
    if animate_point_lights and n_point > 0:
        # Spinning ring (:4637-4646)
        i = np.arange(n_point, dtype=np.float32)
        radians = np.radians((i / n_point) * 360.0 - roll_light * 100.0)
        distance = (i / n_point) * 5.0 + 2.5
        point_arr[:n_point, 0, 0] = np.sin(radians) * distance
        point_arr[:n_point, 0, 1] = np.cos(radians) * distance
        point_arr[:n_point, 0, 2] = 1.5

    counts = np.array(
        [
            min(len(world.directional_lights), caps[0]),
            n_point,
            min(len(world.spot_lights), caps[2]),
            config.cubemap_mips,
        ],
        np.int32,
    )

    return ViewState(
        view_proj=view_proj,
        shadow_space=shadow_space,
        model=model,
        camera_pos=jnp.asarray(cam.position, jnp.float32),
        camera_fov=jnp.float32(cam.fov),
        viewport=jnp.asarray(
            [config.width, config.height, right_bar, bottom_bar], jnp.float32
        ),
        dir_lights=jnp.asarray(dir_arr),
        point_lights=jnp.asarray(point_arr),
        spot_lights=jnp.asarray(spot_arr),
        lights_count=jnp.asarray(counts),
        time=jnp.float32(time),
        z_near=jnp.float32(cam.z_near),
        z_far=jnp.float32(cam.z_far),
        debug_view=jnp.int32(debug_view),
        overrides=jnp.asarray(
            np.ones(4, np.float32) if overrides is None
            else np.asarray(overrides, np.float32)
        ),
    )
