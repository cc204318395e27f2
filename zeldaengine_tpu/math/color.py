"""Color helpers shared by shaders (Common.glsl ports)."""

from __future__ import annotations

import jax.numpy as jnp


def hue2rgb(hue):
    """Common.glsl:50-58 Hue2RGB; vectorized over any leading shape.

    Returns (..., 3) rgb in [0,1].
    """
    hue = jnp.asarray(hue, jnp.float32)
    h = hue - jnp.floor(hue)  # fract
    r = jnp.abs(h * 6.0 - 3.0) - 1.0
    g = 2.0 - jnp.abs(h * 6.0 - 2.0)
    b = 2.0 - jnp.abs(h * 6.0 - 4.0)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0.0, 1.0)


def gamma_correct(color):
    """``pow(c, 0.4545)`` as used at the end of every fragment shader
    (Base.frag:117, BaseLighting.frag:232, Skydome.frag:16)."""
    return jnp.power(jnp.maximum(color, 0.0), 0.4545)


def srgb_to_linear(color):
    """Approximate sRGB decode used for basecolor textures; the reference
    relies on VK_FORMAT_R8G8B8A8_SRGB hardware decode for basecolor only
    (ZeldaEngine.cpp:4868). Uses the exact piecewise sRGB EOTF."""
    c = jnp.asarray(color, jnp.float32)
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))
