"""ZeldaEngine-TPU: a TPU-native real-time 3D renderer built on JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of the ZeldaEngine Vulkan renderer
(reference: iceprincefounder/ZeldaEngine, single-file Vulkan 1.3 engine at
Engine/ZeldaEngine/ZeldaEngine.cpp) as a TPU-first software renderer:

- The Vulkan command buffer / render-pass graph becomes a single jitted
  ``render_frame(scene, view) -> image`` function; pass ordering is function
  composition and XLA dataflow replaces semaphores/fences.
- GLSL shaders (Base.frag / BaseScene.frag / BaseLighting.frag / Common.glsl)
  become vectorized jnp + Pallas kernels.
- The fixed-function rasterizer becomes a tiled, visibility-buffer Pallas
  kernel (homogeneous edge functions, no geometric clipping).
- Scene data is structure-of-arrays with padded static capacities (the
  TPU-native "bindless" design): vertex/index pools, instance tables,
  material tables, texture arrays, light tables.
- The TCP JSON livelink (port 8080, schema of XkWorld::Load) is preserved.
"""

__version__ = "0.2.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (the analogue of the reference's
    VkPipelineCache, ZeldaEngine.cpp:5260): cold-process compiles of the
    frame graph hit disk instead of re-running XLA. Opt out with
    ZELDA_NO_JAX_CACHE=1."""
    if _os.environ.get("ZELDA_NO_JAX_CACHE"):
        return
    import jax

    cache_dir = _os.environ.get(
        "ZELDA_JAX_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass


_enable_compilation_cache()

from zeldaengine_tpu.config import EngineConfig  # noqa: E402

__all__ = ["EngineConfig", "__version__"]
