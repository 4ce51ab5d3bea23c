"""Staged wave driver vs megakernel (SURVEY.md §4.1 differential testing).

The staged pipeline restructures execution into one XLA program per stage
(the TPU-worker-safe layout); it must compute the exact same estimator as
the fused megakernel — same RNG stream, same events, same counts."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.render.integrator import render_batch
from tpurt.render.intersectors import scene_meta
from tpurt.render.staged import make_staged_renderer
from tpurt.scene.device import to_device
from tpurt.scene.procedural import cornell_box, hello_triangle
from tpurt.utils.config import get_config


def _compare(scene, config, accel=None):
    meta = scene_meta(scene)
    ds = to_device(scene)
    if config.intersector == "bvh":
        from tpurt.bvh.two_level import build_scene_accel

        accel = build_scene_accel(ds, meta, leaf_size=config.bvh_leaf_size)
    img_m, rays_m = render_batch(
        ds, scene.camera, jnp.uint32(5), jnp.uint32(8), accel,
        meta=meta, config=config,
    )
    staged = make_staged_renderer(ds, accel, meta=meta, config=config)
    img_s, rays_s = staged(scene.camera, jnp.uint32(5), jnp.uint32(8))
    # different fusions reassociate floats → a decision at the last ulp
    # (shadow `contrib > 0`, Fresnel reflect-vs-refract) may flip and
    # reroute a whole path at a few pixels; systematic divergence would
    # move every pixel
    # the staged counter vector carries extra slots (live-wave counts);
    # the first three (closest/shadow/pair-overflow) must agree
    np.testing.assert_allclose(
        np.asarray(rays_s)[:3], np.asarray(rays_m)[:3], rtol=1e-3
    )
    diff = np.abs(np.asarray(img_s) - np.asarray(img_m))
    assert float((diff > 1e-3).mean()) < 0.02, (diff > 1e-3).mean()
    assert float(np.sqrt((diff ** 2).mean())) < 1e-2


def test_staged_matches_mega_cornell_pt():
    config = get_config(
        "cornell_pt", width=40, height=32, spp_per_batch=2, max_bounces=3,
    )
    _compare(cornell_box(path_tracer=True), config)


def test_staged_matches_mega_no_nee():
    config = get_config(
        "cornell_pt", width=32, height=24, spp_per_batch=1, max_bounces=2,
        use_nee=False,
    )
    _compare(cornell_box(path_tracer=True), config)


def test_staged_matches_mega_bvh():
    config = get_config(
        "cornell_pt", width=32, height=24, spp_per_batch=2, max_bounces=2,
        intersector="bvh",
    )
    _compare(cornell_box(path_tracer=True), config)


def test_staged_flat_shading():
    config = get_config("hello_triangle", width=64, height=48)
    _compare(hello_triangle(), config)


@pytest.mark.parametrize("variant", ["stages", "bounces"])
def test_fusion_variants_bit_exact(monkeypatch, variant):
    """TPURT_FUSE_STAGES keeps every per-bounce program boundary intact
    inside each fused pair, so it must be BIT-exact vs the unfused
    staged pipeline. TPURT_FUSE_BOUNCES puts the whole batch in one
    program — XLA reassociates across bounce boundaries there, so a few
    ulp-sensitive path decisions (shadow contrib > 0, Fresnel branch)
    may reroute: tolerance-compare like the mega-vs-staged tests."""
    scene = cornell_box(path_tracer=True)
    config = get_config(
        "cornell_pt", width=40, height=32, spp_per_batch=2, max_bounces=3,
    )
    meta = scene_meta(scene)
    ds = to_device(scene)

    monkeypatch.setenv("TPURT_FUSE_STAGES", "0")
    monkeypatch.setenv("TPURT_FUSE_BOUNCES", "0")
    base = make_staged_renderer(ds, None, meta=meta, config=config)
    img_b, rays_b = base(scene.camera, jnp.uint32(5), jnp.uint32(8))

    if variant == "stages":
        monkeypatch.setenv("TPURT_FUSE_STAGES", "1")
    else:
        monkeypatch.setenv("TPURT_FUSE_BOUNCES", "1")
    fused = make_staged_renderer(ds, None, meta=meta, config=config)
    img_f, rays_f = fused(scene.camera, jnp.uint32(5), jnp.uint32(8))

    if variant == "stages":
        np.testing.assert_array_equal(
            np.asarray(img_f), np.asarray(img_b))
        np.testing.assert_array_equal(
            np.asarray(rays_f), np.asarray(rays_b))
    else:
        # whole-batch XLA fusion changes shade-math rounding enough to
        # flip a borderline NEE `want` ray (~±1-2 counts) — seen on the
        # aggregate shadow slot before round 4; the per-bounce want
        # slots (smaller magnitudes) need the absolute term too
        np.testing.assert_allclose(
            np.asarray(rays_f), np.asarray(rays_b), rtol=1e-3, atol=2)
        diff = np.abs(np.asarray(img_f) - np.asarray(img_b))
        assert float((diff > 1e-3).mean()) < 0.02, (diff > 1e-3).mean()
        assert float(np.sqrt((diff ** 2).mean())) < 1e-2
