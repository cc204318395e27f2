"""Window-gather helpers: TPU gathers are latency-bound per index, so
fetching one small contiguous window per pixel beats N scattered taps."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def gather_windows(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                   wh: int, ww: int) -> jnp.ndarray:
    """Gather (wh, ww) windows from a 2D or 3D image.

    img: (H, W) or (H, W, C); iy/ix: integer arrays of any shape (...,),
    pre-clamped to [0, H-wh] / [0, W-ww].
    Returns (..., wh, ww) or (..., wh, ww, C).
    """
    shape = iy.shape
    iy = iy.reshape(-1)
    ix = ix.reshape(-1)
    if img.ndim == 2:
        fn = lambda y, x: lax.dynamic_slice(img, (y, x), (wh, ww))
        out = jax.vmap(fn)(iy, ix)
        return out.reshape(*shape, wh, ww)
    c = img.shape[-1]
    fn = lambda y, x: lax.dynamic_slice(img, (y, x, 0), (wh, ww, c))
    out = jax.vmap(fn)(iy, ix)
    return out.reshape(*shape, wh, ww, c)


def gather_rows(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                ww: int) -> jnp.ndarray:
    """Gather (ww,) row segments: one index per pixel instead of ww."""
    return gather_windows(img, iy, ix, 1, ww)[..., 0, :]


def gather_layer_windows(atlas: jnp.ndarray, layer: jnp.ndarray,
                         iy: jnp.ndarray, ix: jnp.ndarray,
                         wh: int, ww: int) -> jnp.ndarray:
    """Gather (wh, ww, C) windows from a layered atlas (N, H, W, C)."""
    shape = layer.shape
    l = layer.reshape(-1)
    iy = iy.reshape(-1)
    ix = ix.reshape(-1)
    c = atlas.shape[-1]
    fn = lambda li, y, x: lax.dynamic_slice(
        atlas, (li, y, x, 0), (1, wh, ww, c)
    )[0]
    out = jax.vmap(fn)(l, iy, ix)
    return out.reshape(*shape, wh, ww, c)
