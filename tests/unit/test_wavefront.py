"""Wavefront pipeline (G8 compaction + G9 material sort) vs megakernel.

Both pipelines draw the same RNG stream per (seed, sample, pixel), so they
compute the same estimator — images must match up to float summation order
(SURVEY.md §4.1 differential testing).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh.two_level import build_scene_accel
from tpurt.render.integrator import render_batch
from tpurt.render.intersectors import scene_meta
from tpurt.render.wavefront import render_batch_wavefront
from tpurt.scene.device import to_device
from tpurt.scene.procedural import cornell_box
from tpurt.utils.config import get_config


def _render_both(config, scene, accel=None):
    meta = scene_meta(scene)
    ds = to_device(scene)
    if config.intersector == "bvh":
        accel = build_scene_accel(ds, meta, leaf_size=config.bvh_leaf_size)
    img_m, rays_m = render_batch(
        ds, scene.camera, jnp.uint32(7), jnp.uint32(0), accel,
        meta=meta, config=config,
    )
    img_w, rays_w = render_batch_wavefront(
        ds, scene.camera, jnp.uint32(7), jnp.uint32(0), accel,
        meta=meta, config=config,
    )
    return np.asarray(img_m), np.asarray(rays_m), np.asarray(img_w), np.asarray(rays_w)


def _assert_equivalent(img_m, rays_m, img_w, rays_w):
    """Same estimator up to float reassociation: the two pipelines fuse
    differently under XLA, so a borderline lane (a `contrib > 0` or
    russian-roulette threshold at the last ulp) may flip — tolerate a
    handful of boundary flips, not systematic divergence."""
    np.testing.assert_allclose(rays_w, rays_m, rtol=5e-3)
    diff = np.abs(img_w - img_m)
    frac_off = float((diff > 1e-4).mean())
    assert frac_off < 5e-3, f"{frac_off:.4%} of values differ"
    # one flipped shadow ray at low spp moves its pixel by ~0.1 radiance;
    # systematic divergence would move the whole image
    assert float(np.sqrt((diff ** 2).mean())) < 1e-2


@pytest.mark.parametrize("material_sort", [True, False])
def test_wavefront_matches_megakernel_cornell(material_sort):
    config = get_config(
        "cornell_pt", width=48, height=32, spp_per_batch=2, max_bounces=3,
        wavefront_capacity=512, material_sort=material_sort,
    )
    scene = cornell_box(path_tracer=True)
    _assert_equivalent(*_render_both(config, scene))


def test_wavefront_through_bvh_traversal():
    config = get_config(
        "cornell_pt", width=32, height=24, spp_per_batch=1, max_bounces=2,
        intersector="bvh", wavefront_capacity=256,
    )
    scene = cornell_box(path_tracer=True)
    _assert_equivalent(*_render_both(config, scene))


def test_wavefront_capacity_invariance():
    """The ring-buffer size is an execution detail — it must not change the
    image at all (bit-exact per lane, only fb scatter order differs)."""
    scene = cornell_box(path_tracer=True)
    meta = scene_meta(scene)
    ds = to_device(scene)
    imgs = []
    for cap in (128, 4096):
        config = get_config(
            "cornell_pt", width=24, height=16, spp_per_batch=2,
            max_bounces=2, wavefront_capacity=cap,
        )
        img, _ = render_batch_wavefront(
            ds, scene.camera, jnp.uint32(3), jnp.uint32(0), None,
            meta=meta, config=config,
        )
        imgs.append(np.asarray(img))
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=1e-5, atol=1e-5)
