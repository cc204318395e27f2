"""PCF windowed implementation vs a direct per-tap reference."""

import numpy as np
import jax.numpy as jnp

from zeldaengine_tpu.ops.shadow import (
    compute_pcf,
    compute_shadow_coord,
    SHADOW_IN_FACTOR,
)


def _naive_pcf(shadowmap, sc4, radius, scale, bias):
    """Literal port of Common.glsl ComputePCF with nearest-texel taps."""
    h, w = shadowmap.shape
    sc = sc4 / sc4[3] if abs(sc4[3]) > 1e-20 else sc4
    total, count = 0.0, 0
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            u = sc[0] + scale * i / w
            v = sc[1] + scale * j / h
            ix = int(np.floor(u * w)) % w
            iy = int(np.floor(v * h)) % h
            dist = shadowmap[iy, ix]
            factor = 1.0
            if -1.0 < sc[2] < 1.0 and sc[3] > 0.0 and dist < sc[2] - bias:
                factor = SHADOW_IN_FACTOR
            total += factor
            count += 1
    return total / count


def test_pcf_matches_naive_taps(rng):
    dim = 32
    shadowmap = rng.uniform(0.3, 1.0, (dim, dim)).astype(np.float32)
    n = 64
    coords = np.zeros((n, 4), np.float32)
    coords[:, 0] = rng.uniform(-0.2, 1.2, n)  # incl. out-of-range (wrap)
    coords[:, 1] = rng.uniform(-0.2, 1.2, n)
    coords[:, 2] = rng.uniform(0.2, 1.1, n)  # incl. z outside (-1,1) guard
    coords[:, 3] = 1.0

    got = np.asarray(
        compute_pcf(jnp.asarray(shadowmap), jnp.asarray(coords), radius=2,
                    scale=1.5, bias=1e-3)
    )
    want = np.array(
        [_naive_pcf(shadowmap, c, 2, 1.5, 1e-3) for c in coords], np.float32
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pcf_homogeneous_divide(rng):
    dim = 16
    shadowmap = np.full((dim, dim), 0.5, np.float32)
    # w != 1: the coord is divided through before tapping
    c = np.array([[0.5 * 2, 0.5 * 2, 0.9 * 2, 2.0]], np.float32)
    got = float(np.asarray(compute_pcf(jnp.asarray(shadowmap),
                                       jnp.asarray(c))))
    # z/w = 0.9 > map 0.5 everywhere -> fully occluded
    np.testing.assert_allclose(got, SHADOW_IN_FACTOR, atol=1e-6)


def test_shadow_coord_bias_matrix():
    space = np.eye(4, dtype=np.float32)
    p = jnp.asarray(np.array([[0.0, 0.0, 0.5]], np.float32))
    sc = np.asarray(compute_shadow_coord(jnp.asarray(space), p))[0]
    # ndc (0,0) -> uv (0.5, 0.5); z passes through
    np.testing.assert_allclose(sc, [0.5, 0.5, 0.5, 1.0], atol=1e-6)


def test_pcf_packed_matches_exact(rng):
    """compute_pcf_packed must be tap-for-tap identical to compute_pcf,
    including at adversarial grazing angles (huge per-tile footprints)
    where the windowed Pallas kernel clamps."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import compute_pcf, compute_pcf_packed

    dim = 128
    sm = jnp.asarray(rng.rand(dim, dim).astype(np.float32))
    # Shadow coords sweeping far beyond one window per 8 pixels: a grazing
    # view where adjacent screen pixels land hundreds of texels apart.
    h, w = 32, 128
    u = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5  # incl. wrap regions
    v = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    z = rng.rand(h, w).astype(np.float32)
    sc = jnp.stack(
        [jnp.asarray(u), jnp.asarray(v), jnp.asarray(z), jnp.ones((h, w))],
        -1,
    )
    exact = compute_pcf(sm, sc)
    packed = compute_pcf_packed(sm, sc)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(exact))


def test_pcf_packed_nonsquare_scale(rng):
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import compute_pcf, compute_pcf_packed

    sm = jnp.asarray(rng.rand(64, 64).astype(np.float32))
    sc = jnp.stack(
        [
            jnp.asarray(rng.rand(16, 16).astype(np.float32)),
            jnp.asarray(rng.rand(16, 16).astype(np.float32)),
            jnp.asarray(rng.rand(16, 16).astype(np.float32)),
            jnp.ones((16, 16)),
        ],
        -1,
    )
    for radius, scale in ((1, 1.0), (2, 1.5), (3, 2.0)):
        exact = compute_pcf(sm, sc, radius=radius, scale=scale)
        packed = compute_pcf_packed(sm, sc, radius=radius, scale=scale)
        np.testing.assert_array_equal(np.asarray(packed), np.asarray(exact))


def test_pcf_window1_matches_exact(rng):
    """compute_pcf_window1 (one-gather 2-D window table) must be
    tap-for-tap identical to compute_pcf, including grazing footprints and
    wrap regions (the window table wrap-pads both axes)."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import compute_pcf, compute_pcf_window1

    dim = 128
    sm = jnp.asarray(rng.rand(dim, dim).astype(np.float32))
    h, w = 32, 128
    u = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    v = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    z = rng.rand(h, w).astype(np.float32)
    sc = jnp.stack(
        [jnp.asarray(u), jnp.asarray(v), jnp.asarray(z), jnp.ones((h, w))],
        -1,
    )
    exact = compute_pcf(sm, sc)
    win1 = compute_pcf_window1(sm, sc)
    np.testing.assert_array_equal(np.asarray(win1), np.asarray(exact))


def test_pcf_window1_nonsquare_scale(rng):
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import compute_pcf, compute_pcf_window1

    sm = jnp.asarray(rng.rand(64, 64).astype(np.float32))
    sc = jnp.stack(
        [
            jnp.asarray(rng.rand(16, 16).astype(np.float32)),
            jnp.asarray(rng.rand(16, 16).astype(np.float32)),
            jnp.asarray(rng.rand(16, 16).astype(np.float32)),
            jnp.ones((16, 16)),
        ],
        -1,
    )
    for radius, scale in ((1, 1.0), (2, 1.5), (3, 2.0)):
        exact = compute_pcf(sm, sc, radius=radius, scale=scale)
        win1 = compute_pcf_window1(sm, sc, radius=radius, scale=scale)
        np.testing.assert_array_equal(np.asarray(win1), np.asarray(exact))


def test_pcf_packed4_matches_exact(rng):
    """compute_pcf_packed4 (quad-fused row table) is tap-for-tap
    identical to compute_pcf across grazing footprints, wrap regions,
    and all (radius, scale) combinations."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import compute_pcf, compute_pcf_packed4

    dim = 128
    sm = jnp.asarray(rng.rand(dim, dim).astype(np.float32))
    h, w = 32, 128
    u = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    v = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    z = rng.rand(h, w).astype(np.float32)
    sc = jnp.stack(
        [jnp.asarray(u), jnp.asarray(v), jnp.asarray(z), jnp.ones((h, w))],
        -1,
    )
    np.testing.assert_array_equal(
        np.asarray(compute_pcf_packed4(sm, sc)),
        np.asarray(compute_pcf(sm, sc)),
    )
    sm2 = jnp.asarray(rng.rand(64, 64).astype(np.float32))
    sc2 = sc[:16, :16] * 0.5
    for radius, scale in ((1, 1.0), (2, 1.5), (3, 2.0)):
        np.testing.assert_array_equal(
            np.asarray(compute_pcf_packed4(sm2, sc2, radius=radius,
                                           scale=scale)),
            np.asarray(compute_pcf(sm2, sc2, radius=radius, scale=scale)),
        )


def test_pcf_packed_roll_matches_exact(rng):
    """The roll-built window table (Pallas, interpret mode here) feeds
    the same tap logic and must match compute_pcf exactly."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import (
        compute_pcf, compute_pcf_packed_roll,
    )

    dim = 128
    sm = jnp.asarray(rng.rand(dim, dim).astype(np.float32))
    h, w = 32, 128
    u = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    v = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    z = rng.rand(h, w).astype(np.float32)
    sc = jnp.stack(
        [jnp.asarray(u), jnp.asarray(v), jnp.asarray(z), jnp.ones((h, w))],
        -1,
    )
    np.testing.assert_array_equal(
        np.asarray(compute_pcf_packed_roll(sm, sc, interpret=True)),
        np.asarray(compute_pcf(sm, sc)),
    )
    for radius, scale in ((1, 1.0), (3, 2.0)):
        np.testing.assert_array_equal(
            np.asarray(compute_pcf_packed_roll(sm, sc, radius=radius,
                                               scale=scale,
                                               interpret=True)),
            np.asarray(compute_pcf(sm, sc, radius=radius, scale=scale)),
        )


def test_pcf_window_roll_matches_exact(rng):
    """One-gather PCF from the kernel-built 2-D window table (interpret
    mode) is tap-for-tap identical to compute_pcf."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import (
        compute_pcf, compute_pcf_window_roll,
    )

    dim = 128
    sm = jnp.asarray(rng.rand(dim, dim).astype(np.float32))
    h, w = 32, 128
    u = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    v = rng.rand(h, w).astype(np.float32) * 4.0 - 1.5
    z = rng.rand(h, w).astype(np.float32)
    sc = jnp.stack(
        [jnp.asarray(u), jnp.asarray(v), jnp.asarray(z), jnp.ones((h, w))],
        -1,
    )
    np.testing.assert_array_equal(
        np.asarray(compute_pcf_window_roll(sm, sc, interpret=True)),
        np.asarray(compute_pcf(sm, sc)),
    )
    np.testing.assert_array_equal(
        np.asarray(compute_pcf_window_roll(sm, sc, radius=1, scale=1.0,
                                           interpret=True)),
        np.asarray(compute_pcf(sm, sc, radius=1, scale=1.0)),
    )


def test_pcf_packed_groups_match_exact(rng):
    """Group-fused row tables (4/8/16 bases per row) are all exact."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import compute_pcf, compute_pcf_packed4

    dim = 128
    sm = jnp.asarray(rng.rand(dim, dim).astype(np.float32))
    h, w = 16, 64
    sc = jnp.stack(
        [jnp.asarray(rng.rand(h, w).astype(np.float32) * 3 - 1),
         jnp.asarray(rng.rand(h, w).astype(np.float32) * 3 - 1),
         jnp.asarray(rng.rand(h, w).astype(np.float32)),
         jnp.ones((h, w))], -1,
    )
    want = np.asarray(compute_pcf(sm, sc))
    for group in (2, 4, 8, 16):
        got = np.asarray(compute_pcf_packed4(sm, sc, group=group))
        np.testing.assert_array_equal(got, want, err_msg=f"group={group}")


def test_pcf_half_close_on_smooth_field(rng):
    """Half-res PCF (VERDICT r2 #10): on a projectively-smooth shadow
    coordinate field (the real case: coords come from one shadow-space
    matrix applied to a smooth surface), the upsampled factor matches
    the full-res exact factor within a couple of tap quanta at penumbra
    edges and is nearly-everywhere identical elsewhere."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import compute_pcf, compute_pcf_half

    dim = 128
    # Piecewise-smooth shadowmap (a real depth render, not per-texel
    # noise): a ground gradient with a blocky occluder.
    ty, tx = np.mgrid[0:dim, 0:dim].astype(np.float32) / dim
    sm_np = (0.6 + 0.3 * ty).astype(np.float32)
    sm_np[30:80, 40:90] = 0.35
    sm = jnp.asarray(sm_np)
    h, w = 32, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u = 0.2 + xx / w * 0.6 + 0.03 * np.sin(yy / 7.0)
    v = 0.2 + yy / h * 0.6
    z = 0.4 + 0.2 * (xx / w)
    sc = jnp.asarray(np.stack([u, v, z, np.ones_like(u)], -1))
    exact = np.asarray(compute_pcf(sm, sc))
    for ups in ("linear", "nearest"):
        half = np.asarray(compute_pcf_half(sm, sc, upsample=ups))
        assert half.shape == exact.shape
        # tap quantum = (1 - 0.1) / 25 = 0.036
        frac_off = np.mean(np.abs(half - exact) > 2 * 0.037)
        assert frac_off < 0.25, (ups, frac_off)
        assert np.mean(np.abs(half - exact)) < 0.03, ups


def test_pcf_half_odd_shape_falls_back(rng):
    """Odd dimensions route to the exact packed path unchanged."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.shadow import (
        compute_pcf_half,
        compute_pcf_packed,
    )

    dim = 64
    sm = jnp.asarray(rng.rand(dim, dim).astype(np.float32))
    sc = jnp.asarray(rng.rand(9, 15, 4).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(compute_pcf_half(sm, sc)),
        np.asarray(compute_pcf_packed(sm, sc)),
    )
