"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4.5).

The key property (SURVEY.md §4.4): sharding must not change radiometry —
an N-chip render is BIT-IDENTICAL to the single-chip render of the same
global sample window: randomness is a pure function of (seed, sample
index, pixel id), per-ray traversal/shading is elementwise, and the
sample merge is a fixed-order unrolled sum matching the progressive
loop's order (not a layout-reassociating psum) — SURVEY.md §4.4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.parallel.mesh import (
    distributed_spec,
    make_render_mesh,
    render_batch_distributed,
)
from tpurt.render.integrator import render_batch_jit
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device
from tpurt.scene.procedural import cornell_box
from tpurt.utils.config import get_config

SEED = 7


@pytest.fixture(scope="module")
def cornell_setup():
    scene = cornell_box(False)
    cfg = get_config(
        "cornell", width=32, height=24, spp=4, spp_per_batch=1,
        max_bounces=1,
    )
    meta = scene_meta(scene)
    ds = to_device(scene)
    return scene, cfg, meta, ds


def test_mesh_creation():
    mesh = make_render_mesh(2, 4)
    assert mesh.shape == {"sample": 2, "tile": 4}
    with pytest.raises(ValueError):
        make_render_mesh(4, 4)  # only 8 virtual devices


def _single_chip_reference(scene, cfg, meta, ds, accel, n_sample):
    ref = jnp.zeros((cfg.height, cfg.width, 3))
    for sid in range(n_sample):
        img, _ = render_batch_jit(
            ds, scene.camera, SEED, sid * cfg.spp_per_batch, accel,
            meta=meta, config=cfg,
        )
        ref = ref + img
    return np.asarray(ref)


@pytest.mark.parametrize("n_sample,n_tile", [(1, 8), (8, 1), (2, 4)])
def test_distributed_equals_single_chip(cornell_setup, n_sample, n_tile):
    """Tile shards assemble the full frame; sample shards cover disjoint
    sample windows; the result is bit-identical to the 1-chip render of
    the same window (fixed-order sample merge)."""
    scene, cfg, meta, ds = cornell_setup
    mesh = make_render_mesh(n_sample, n_tile)

    rows_per_shard, samples_added = distributed_spec(cfg, mesh)
    out, counts = render_batch_distributed(
        ds, scene.camera, SEED, 0, None, meta=meta, config=cfg, mesh=mesh,
        rows_per_shard=rows_per_shard,
    )
    out = out[: cfg.height]
    assert float(counts[0]) > 0
    assert out.shape == (cfg.height, cfg.width, 3)
    assert samples_added == n_sample * cfg.spp_per_batch

    ref = _single_chip_reference(scene, cfg, meta, ds, None, n_sample)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_distributed_deterministic(cornell_setup):
    scene, cfg, meta, ds = cornell_setup
    mesh = make_render_mesh(2, 2)
    rows_per_shard, _ = distributed_spec(cfg, mesh)
    run = lambda: render_batch_distributed(
        ds, scene.camera, 3, 0, None, meta=meta, config=cfg, mesh=mesh,
        rows_per_shard=rows_per_shard,
    )[0]
    np.testing.assert_array_equal(np.asarray(run()), np.asarray(run()))


@pytest.mark.parametrize("n_sample,n_tile", [(2, 4), (1, 8), (8, 1)])
def test_staged_tile_distributed_equals_single(n_sample, n_tile):
    """The PRODUCTION path (staged pipeline + tile-wavefront Pallas
    traversal) shard_mapped over sample×tile must equal its single-chip
    render of the same sample window (VERDICT r1 §5)."""
    from tpurt.bvh.paircluster import build_pair_accel
    from tpurt.render.staged import make_staged_renderer
    from tpurt.scene.procedural import cornell_box

    scene = cornell_box(path_tracer=True)
    cfg = get_config(
        "cornell_pt", width=40, height=24, spp=2, spp_per_batch=1,
        max_bounces=2, intersector="bvh_tile", pipeline="staged",
    )
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)

    mesh = make_render_mesh(n_sample, n_tile)
    dist = make_staged_renderer(ds, accel, meta=meta, config=cfg,
                                mesh=mesh)
    img_d, counts_d = dist(scene.camera, jnp.uint32(SEED), jnp.uint32(0))
    assert img_d.shape == (cfg.height, cfg.width, 3)

    single = make_staged_renderer(ds, accel, meta=meta, config=cfg)
    ref = jnp.zeros((cfg.height, cfg.width, 3))
    counts_s = None
    for sid in range(n_sample):
        img, c = single(
            scene.camera, jnp.uint32(SEED),
            jnp.uint32(sid * cfg.spp_per_batch),
        )
        ref = ref + img
        counts_s = c if counts_s is None else counts_s + c
    np.testing.assert_array_equal(np.asarray(img_d), np.asarray(ref))
    np.testing.assert_allclose(
        np.asarray(counts_d)[:2], np.asarray(counts_s)[:2]
    )


def test_staged_tile_distributed_via_render_scene():
    """render_scene composes the staged+tile renderer with a mesh when the
    config asks for shards — end-to-end through the public API."""
    from tpurt.render import framebuffer as fb
    from tpurt.render import render_scene

    cfg = get_config(
        "cornell_pt", width=40, height=24, spp=2, spp_per_batch=1,
        max_bounces=1, intersector="bvh_tile", pipeline="staged",
    )
    import dataclasses

    sharded = dataclasses.replace(cfg, n_sample_shards=2, n_tile_shards=2)
    s_dist, stats = render_scene(sharded)
    s_single, _ = render_scene(cfg)
    assert stats["spp"] == 2
    np.testing.assert_array_equal(
        np.asarray(fb.resolve(s_dist)), np.asarray(fb.resolve(s_single))
    )


def test_staged_twolevel_distributed_equals_single():
    """Distributed staged pipeline × two-level instanced accel (the full
    production stack: shard_map + tilewave + TLAS/BLAS) equals the
    single-chip render."""
    from tpurt.bvh.paircluster import build_pair_accel_two_level
    from tpurt.render.staged import make_staged_renderer
    from tpurt.scene.procedural import sponza_standin

    scene = sponza_standin(column_segments=8, column_rings=3)
    cfg = get_config(
        "sponza", width=48, height=24, spp=1, spp_per_batch=1,
        max_bounces=1, intersector="bvh_tile", pipeline="staged",
    )
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel_two_level(ds, meta, scene=scene)
    mesh = make_render_mesh(2, 2)
    dist = make_staged_renderer(ds, accel, meta=meta, config=cfg,
                                mesh=mesh)
    img_d, _ = dist(scene.camera, jnp.uint32(SEED), jnp.uint32(0))
    single = make_staged_renderer(ds, accel, meta=meta, config=cfg)
    ref = jnp.zeros((cfg.height, cfg.width, 3))
    for sid in range(2):
        img, _ = single(scene.camera, jnp.uint32(SEED), jnp.uint32(sid))
        ref = ref + img
    np.testing.assert_array_equal(np.asarray(img_d), np.asarray(ref))


def test_distributed_with_bvh(cornell_setup):
    """Sharded rendering composes with the two-level BVH intersector."""
    from tpurt.bvh.two_level import build_scene_accel

    scene, cfg, meta, ds = cornell_setup
    accel = build_scene_accel(ds, meta, leaf_size=4)
    mesh = make_render_mesh(2, 2)
    rows_per_shard, _ = distributed_spec(cfg, mesh)
    out, _ = render_batch_distributed(
        ds, scene.camera, SEED, 0, accel, meta=meta, config=cfg, mesh=mesh,
        rows_per_shard=rows_per_shard,
    )
    out = out[: cfg.height]
    ref = _single_chip_reference(scene, cfg, meta, ds, accel, 2)
    np.testing.assert_array_equal(np.asarray(out), ref)
