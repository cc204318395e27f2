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

__version__ = "0.1.0"

from zeldaengine_tpu.config import EngineConfig

__all__ = ["EngineConfig", "__version__"]
