"""Closed-form checks for the delta material families (VERDICT r1 §9).

Mirror and dielectric transport is invisible to eval_brdf (delta lobes),
so the self-consistent goldens were their only coverage. These tests pin
them to analytic optics: Snell's law, the total-internal-reflection
critical angle, Schlick reflectance at normal/grazing incidence, the
Fresnel reflect/refract energy split of the sampled estimator, exact
mirror reflection, and near-unity-IOR transparency end-to-end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt import materials
from tpurt.core.prng import PixelSampler
from tpurt.core.vecmath import dot, normalize, reflect, refract, \
    schlick_fresnel
from tpurt.scene.types import DIELECTRIC, MIRROR


def test_schlick_closed_form():
    # normal incidence: R0 = ((n1-n2)/(n1+n2))^2 — 4% for glass
    r = float(schlick_fresnel(jnp.asarray(1.0), 1.0, 1.5))
    assert r == pytest.approx(((1.0 - 1.5) / 2.5) ** 2, rel=1e-6)
    # grazing incidence: everything reflects
    assert float(schlick_fresnel(jnp.asarray(0.0), 1.0, 1.5)) == \
        pytest.approx(1.0, rel=1e-6)


def test_refract_snells_law(rng):
    """sin(theta_t) = eta · sin(theta_i) for every non-TIR refraction."""
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 256, jnp.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.05  # into the surface
    d = np.asarray(normalize(jnp.asarray(d)))
    for eta in (1.0 / 1.5, 1.33, 1.5):
        t, tir = refract(jnp.asarray(d), n, jnp.full(256, eta, jnp.float32))
        sin_i = np.sqrt(np.maximum(0.0, 1.0 - d[:, 2] ** 2))
        sin_t = np.sqrt(
            np.maximum(0.0, 1.0 - np.asarray(t)[:, 2] ** 2)
        )
        ok = ~np.asarray(tir)
        np.testing.assert_allclose(
            sin_t[ok], np.clip(eta * sin_i[ok], 0, 1), atol=2e-6
        )
        # TIR exactly where Snell has no solution
        np.testing.assert_array_equal(np.asarray(tir), eta * sin_i > 1.0)


def test_tir_critical_angle():
    """Glass→air: TIR beyond asin(1/ior) = 41.81° for ior 1.5."""
    eta = 1.5  # inside glass going out
    crit = np.arcsin(1.0 / eta)
    for ang, expect_tir in [(crit - 0.01, False), (crit + 0.01, True)]:
        d = jnp.asarray(
            [[np.sin(ang), 0.0, -np.cos(ang)]], jnp.float32
        )
        n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        _, tir = refract(d, n, jnp.asarray([eta], jnp.float32))
        assert bool(tir[0]) == expect_tir


def _attrs(kind, n_lanes, param0, albedo=(0.8, 0.7, 0.6), front=True):
    one = jnp.ones(n_lanes, jnp.float32)
    nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                   (n_lanes, 1))
    return materials.HitAttrs(
        pos=jnp.zeros((n_lanes, 3), jnp.float32),
        n_geom=nrm,
        n_shade=nrm,
        front_face=jnp.full(n_lanes, front, bool),
        mat_id=jnp.zeros(n_lanes, jnp.int32),
        kind=jnp.full(n_lanes, kind, jnp.int32),
        albedo=jnp.tile(jnp.asarray([albedo], jnp.float32), (n_lanes, 1)),
        emission=jnp.zeros((n_lanes, 3), jnp.float32),
        param0=one * param0,
        param1=one * 0.0,
    )


def _sampler(n_lanes, seed=7):
    return PixelSampler.make(
        jnp.uint32(seed),
        jnp.zeros(n_lanes, jnp.uint32),
        jnp.arange(n_lanes, dtype=jnp.uint32),
    )


def test_mirror_bounce_exact():
    """fuzz=0 mirror: wi is the exact specular reflection, weight is the
    tint, and the bounce is flagged specular (NEE must skip it)."""
    n_lanes = 64
    ang = 0.3
    d_in = jnp.tile(
        jnp.asarray([[np.sin(ang), 0.0, -np.cos(ang)]], jnp.float32),
        (n_lanes, 1),
    )
    attrs = _attrs(MIRROR, n_lanes, param0=0.0)
    bs = materials.sample_bounce(attrs, -d_in, _sampler(n_lanes), 0)
    expected = np.asarray(reflect(d_in, attrs.n_geom))
    np.testing.assert_allclose(np.asarray(bs.wi), expected, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bs.weight), np.asarray(attrs.albedo), atol=1e-7
    )
    assert np.all(np.asarray(bs.is_specular))


@pytest.mark.parametrize("ang_deg", [0.0, 30.0, 60.0])
def test_dielectric_fresnel_energy_split(ang_deg):
    """The reflect/refract choice frequency of the sampled estimator must
    match the Schlick reflectance at that incidence angle (this is what
    makes choice-by-Fresnel an unbiased estimator with weight = tint)."""
    n_lanes = 1 << 14
    ior = 1.5
    ang = np.deg2rad(ang_deg)
    d_in = jnp.tile(
        jnp.asarray([[np.sin(ang), 0.0, -np.cos(ang)]], jnp.float32),
        (n_lanes, 1),
    )
    attrs = _attrs(DIELECTRIC, n_lanes, param0=ior)
    bs = materials.sample_bounce(attrs, -d_in, _sampler(n_lanes), 0)
    frac_reflect = float(jnp.mean((bs.offset_sign > 0).astype(jnp.float32)))
    expect = float(schlick_fresnel(jnp.cos(ang), 1.0, ior))
    # 4σ binomial band
    sigma = np.sqrt(max(expect * (1 - expect), 1e-9) / n_lanes)
    assert abs(frac_reflect - expect) < 4 * sigma + 1e-4
    # refracted lanes bend by Snell; reflected lanes mirror
    wi = np.asarray(bs.wi)
    refl = np.asarray(bs.offset_sign) > 0
    if ang_deg > 0 and (~refl).any():
        sin_t = np.sqrt(1.0 - wi[~refl, 2] ** 2)
        np.testing.assert_allclose(
            sin_t, np.sin(ang) / ior, atol=1e-5
        )
    if refl.any():
        np.testing.assert_allclose(
            wi[refl], np.asarray(reflect(d_in, attrs.n_geom))[refl],
            atol=1e-6,
        )


def test_dielectric_unity_ior_is_transparent():
    """End-to-end: a glass pane with ior → 1 in front of the camera must
    leave the image unchanged (R0 → 0, refraction → straight through)."""
    from tpurt.core.camera import Camera
    from tpurt.render import framebuffer as fb
    from tpurt.render import render_scene
    from tpurt.scene.procedural import cornell_box, quad
    from tpurt.scene.types import Instance, Material, Mesh
    from tpurt.utils.config import get_config

    cfg = get_config(
        "cornell_pt", width=48, height=48, spp=16, spp_per_batch=8,
        max_bounces=3, intersector="brute",
    )
    base = cornell_box(path_tracer=True)
    state_a, _ = render_scene(cfg, scene=base)

    glassy = cornell_box(path_tracer=True)
    glass = glassy.add_material(
        Material(DIELECTRIC, (1.0, 1.0, 1.0), param0=1.0001, name="pane")
    )
    gv, gi = quad(
        [50, 50, 100], [505, 50, 100], [505, 505, 100], [50, 505, 100]
    )
    pane = glassy.add_mesh(Mesh(gv, gi, glass, name="pane"))
    glassy.add_instance(Instance(pane, name="pane"))
    state_b, _ = render_scene(cfg, scene=glassy)

    a = np.asarray(fb.resolve(state_a))
    b = np.asarray(fb.resolve(state_b))
    # not bit-identical (the pane consumes a bounce event, reshuffling the
    # per-pixel RNG draws), so per-pixel RMSE only measures Monte-Carlo
    # variance; the transport identity check is on 8×8-block means where
    # the noise averages out
    assert abs(a.mean() - b.mean()) < 0.01
    blocks = lambda x: x.reshape(6, 8, 6, 8, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(blocks(a), blocks(b), atol=0.05)
