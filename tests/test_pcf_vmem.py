"""compute_pcf_vmem must match compute_pcf tap-for-tap.

Covers the three kernel regimes: window-fit blocks (the fast path),
unfit blocks recomputed by the reference fixup (grazing/wrap coords),
and fallback-cap overflow reporting.

On TPU the kernel is bitwise-identical to compute_pcf (validated by
tools/tpu_golden_check.py on hardware). In interpret mode on CPU,
XLA:CPU reassociates the 25-term tap sum, so these tests assert the
per-pixel OCCLUSION COUNT exactly (every tap classified identically)
plus a 1-ULP tolerance on the averaged factor.
"""

import numpy as np
import pytest


def _assert_taps_equal(out, ref, count=25.0):
    out, ref = np.asarray(out), np.asarray(ref)
    # total = count - 0.9 * k  =>  k recovers the exact tap classification
    k_out = np.round((count - out * count) / 0.9)
    k_ref = np.round((count - ref * count) / 0.9)
    np.testing.assert_array_equal(k_out, k_ref)
    np.testing.assert_allclose(out, ref, atol=2e-7, rtol=0)


@pytest.fixture
def rng():
    return np.random.RandomState(20260817)


def _coords(rng, h, w, du=0.00035, dv=0.0003, skew=0.00008):
    import jax.numpy as jnp

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    u = (0.15 + du * xx + skew * yy).astype(np.float32)
    v = (0.21 + dv * yy - 0.6 * skew * xx).astype(np.float32)
    z = (0.4 + 0.0001 * yy + 0.2 * rng.rand(h, w)).astype(np.float32)
    return jnp.stack([jnp.asarray(u), jnp.asarray(v), jnp.asarray(z),
                      jnp.ones((h, w), jnp.float32)], -1)


@pytest.mark.parametrize("win_rows", [16, 24, 48])
def test_vmem_matches_exact_smooth(rng, win_rows):
    """Demo-like smooth coords: every block fits the kernel window."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.pcf_vmem import compute_pcf_vmem
    from zeldaengine_tpu.ops.shadow import compute_pcf

    sm = jnp.asarray(rng.rand(256, 256).astype(np.float32))
    sc = _coords(rng, 64, 256)
    out, ovf = compute_pcf_vmem(sm, sc, win_rows=win_rows, interpret=True)
    ref = compute_pcf(sm, sc)
    assert int(ovf) == 0
    _assert_taps_equal(out, ref)


def test_vmem_active_mask_excludes_uncovered(rng):
    """A block mixing wild uncovered coords with smooth covered ones
    still takes the fast path when ``active`` masks the uncovered px,
    and covered pixels stay exact."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.pcf_vmem import compute_pcf_vmem
    from zeldaengine_tpu.ops.shadow import compute_pcf

    sm = jnp.asarray(rng.rand(256, 256).astype(np.float32))
    sc = _coords(rng, 16, 128)
    # Odd columns "uncovered": garbage coords hundreds of texels away.
    cov = (np.arange(128)[None, :] % 2 == 0) & np.ones((16, 1), bool)
    wild = _coords(rng, 16, 128, du=0.02, dv=0.03)
    sc = jnp.where(jnp.asarray(cov)[..., None], sc, wild)
    out, ovf = compute_pcf_vmem(sm, sc, active=jnp.asarray(cov),
                                interpret=True)
    ref = compute_pcf(sm, sc)
    assert int(ovf) == 0
    _assert_taps_equal(np.asarray(out)[cov], np.asarray(ref)[cov])


def test_vmem_matches_exact_grazing(rng):
    """Adversarial coords (wrap regions, huge footprints): every block
    falls back to the in-graph reference recompute and stays exact."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.pcf_vmem import compute_pcf_vmem
    from zeldaengine_tpu.ops.shadow import compute_pcf

    sm = jnp.asarray(rng.rand(128, 128).astype(np.float32))
    h, w = 16, 256
    u = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    v = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    z = rng.rand(h, w).astype(np.float32)
    sc = jnp.stack([jnp.asarray(u), jnp.asarray(v), jnp.asarray(z),
                    jnp.ones((h, w), jnp.float32)], -1)
    out, ovf = compute_pcf_vmem(sm, sc, interpret=True)
    ref = compute_pcf(sm, sc)
    assert int(ovf) == 0  # 4 blocks, cap 64
    _assert_taps_equal(out, ref)


def test_vmem_overflow_reported(rng):
    """More unfit blocks than fallback_cap: the overflow is counted."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.pcf_vmem import compute_pcf_vmem

    sm = jnp.asarray(rng.rand(128, 128).astype(np.float32))
    h, w = 32, 512  # 16 blocks, all grazing-unfit
    u = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    v = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    z = rng.rand(h, w).astype(np.float32)
    sc = jnp.stack([jnp.asarray(u), jnp.asarray(v), jnp.asarray(z),
                    jnp.ones((h, w), jnp.float32)], -1)
    _, ovf = compute_pcf_vmem(sm, sc, fallback_cap=4, interpret=True)
    assert int(ovf) == 16 - 4


def test_vmem_padding_and_out_of_range(rng):
    """Non-multiple screen sizes pad; out-of-range pixels return 1.0."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.pcf_vmem import compute_pcf_vmem
    from zeldaengine_tpu.ops.shadow import compute_pcf

    sm = jnp.asarray(rng.rand(256, 256).astype(np.float32))
    sc = _coords(rng, 30, 200)
    # push a band out of depth range (z > 1 -> in_range False)
    sc = sc.at[:5, :, 2].set(1.5)
    out, ovf = compute_pcf_vmem(sm, sc, interpret=True)
    ref = compute_pcf(sm, sc)
    assert int(ovf) == 0
    _assert_taps_equal(out, ref)
    assert np.all(np.asarray(out)[:5] == 1.0)
