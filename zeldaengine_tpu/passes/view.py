"""Per-frame view state — the TPU analogue of the XkView "scene UBO"
(ZeldaEngine.cpp:922-965) plus the per-frame matrix computation of
UpdateUniformBuffer (:4585-4664).

Everything here is a traced array: changing the camera, lights, time, or
debug view never recompiles.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
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


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _view_matrices(eye, center, light_pos, fov_r, aspect, z_near, z_far,
                   roll_stage):
    """One compiled dispatch for the frame's three matrices.

    Host profile (round 5): the eager version of this math was ~60 tiny
    dispatches costing 64 ms/frame on the host — the entire config-5
    tick gap. fov/aspect/near/far are STATIC so the Python-float scalar
    arithmetic inside ``perspective`` (and its rounding) is preserved
    bit-for-bit; only the camera/light vectors and the stage roll are
    traced. Recompiles only on resize/fov change."""
    up = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    cam_view = look_at(eye, center, up)
    cam_proj = perspective_vk(fov_r, aspect, z_near, z_far)
    view_proj = matmul_f32(cam_proj, cam_view)
    shadow_view = look_at(light_pos, jnp.zeros(3, jnp.float32), up)
    shadow_proj = perspective_vk(fov_r, 1.0, z_near, z_far)
    shadow_space = matmul_f32(shadow_proj, shadow_view)
    model = rotate_z(jnp.asarray(roll_stage, jnp.float32))
    return view_proj, shadow_space, model


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

    if world.directional_lights:
        light_pos = np.asarray(world.directional_lights[0].position, np.float32)
    else:
        light_pos = np.array([20.0, 0.0, 20.0], np.float32)
    view_proj, shadow_space, model = _view_matrices(
        np.asarray(cam.position, np.float32),
        np.asarray(cam.lookat, np.float32),
        light_pos, fov_r, aspect, cam.z_near, cam.z_far,
        np.float32(roll_stage),
    )

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

    # Small leaves stay HOST NumPy: jit converts them at call time, so
    # eager per-field device puts (one tunneled dispatch each on the
    # axon backend) disappear from the tick (round-5 config-5 profile).
    return ViewState(
        view_proj=view_proj,
        shadow_space=shadow_space,
        model=model,
        camera_pos=np.asarray(cam.position, np.float32),
        camera_fov=np.float32(cam.fov),
        viewport=np.asarray(
            [config.width, config.height, right_bar, bottom_bar], np.float32
        ),
        dir_lights=dir_arr,
        point_lights=point_arr,
        spot_lights=spot_arr,
        lights_count=counts,
        time=np.float32(time),
        z_near=np.float32(cam.z_near),
        z_far=np.float32(cam.z_far),
        debug_view=np.int32(debug_view),
        overrides=(
            np.ones(4, np.float32) if overrides is None
            else np.asarray(overrides, np.float32)
        ),
    )
