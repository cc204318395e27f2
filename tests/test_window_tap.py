"""sample_base_window must match sample_base on the quad atlas."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def _setup(rng, S=256):
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.texture import build_quad_packed_atlas
    from zeldaengine_tpu.ops.window_tap import planes_from_image_bf16

    img = rng.rand(S, S, 4).astype(np.float32)
    quad = jnp.asarray(build_quad_packed_atlas(
        np.asarray(img[None], np.float32))).astype(jnp.bfloat16)
    planes = planes_from_image_bf16(img)
    return quad, planes


def test_window_matches_sample_base_smooth(rng):
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.texture import sample_base
    from zeldaengine_tpu.ops.window_tap import sample_base_window

    S = 256
    quad, planes = _setup(rng, S)
    h, w = 32, 256
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    uv = jnp.stack([jnp.asarray((xx / w * 0.4 + 0.1).astype(np.float32)),
                    jnp.asarray((yy / h * 0.1 + 0.3).astype(np.float32))],
                   -1)
    ref = sample_base(quad, jnp.zeros((h, w), jnp.int32), uv, S, quad=True)
    out, ovf = sample_base_window(planes, uv, None, S, interpret=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-7, rtol=0)


def test_window_wrap_seam_fallback(rng):
    """uv crossing the repeat seam (u near 0/1 wrapping) blows the block
    window; the in-graph jnp fallback keeps the result exact."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.texture import sample_base
    from zeldaengine_tpu.ops.window_tap import sample_base_window

    S = 256
    quad, planes = _setup(rng, S)
    h, w = 8, 128
    u = np.linspace(0.9, 1.1, w, dtype=np.float32)[None, :].repeat(h, 0)
    v = np.full((h, w), 0.4, np.float32)
    uv = jnp.stack([jnp.asarray(u), jnp.asarray(v)], -1)
    ref = sample_base(quad, jnp.zeros((h, w), jnp.int32), uv, S, quad=True)
    out, ovf = sample_base_window(planes, uv, None, S, interpret=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-7, rtol=0)


def test_window_active_mask_skips_blocks(rng):
    """Fully-inactive blocks are skipped (zeros); active pixels exact."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.texture import sample_base
    from zeldaengine_tpu.ops.window_tap import sample_base_window

    S = 256
    quad, planes = _setup(rng, S)
    h, w = 16, 256
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    uv = jnp.stack([jnp.asarray((xx / w * 0.3 + 0.2).astype(np.float32)),
                    jnp.asarray((yy / h * 0.2 + 0.1).astype(np.float32))],
                   -1)
    act = np.zeros((h, w), bool)
    act[:8, :128] = True
    ref = sample_base(quad, jnp.zeros((h, w), jnp.int32), uv, S, quad=True)
    out, ovf = sample_base_window(planes, uv, jnp.asarray(act), S,
                                  interpret=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(out)[act], np.asarray(ref)[act],
                               atol=2e-7, rtol=0)
    assert np.all(np.asarray(out)[8:, 128:] == 0.0)
