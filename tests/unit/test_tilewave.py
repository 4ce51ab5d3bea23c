"""Tile-wavefront intersector (G2/G4 production path) vs the brute oracle.

Interpret mode on CPU (SURVEY.md §4.1). Covers closest-hit agreement,
any-hit, dead lanes, non-TILE-multiple ray counts, instanced slots, and
the pair-budget overflow flag.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh.paircluster import build_pair_accel
from tpurt.kernels.tilewave import make_tile_intersector
from tpurt.render.intersectors import make_brute_force, scene_meta
from tpurt.scene.device import to_device
from tpurt.scene.procedural import bunny_standin, cornell_box


def _rand_rays(rng, n, center, radius):
    org = center + rng.normal(size=(n, 3)) * radius * 1.5
    target = center + rng.normal(size=(n, 3)) * radius * 0.4
    d = target - org
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def cornell_setup():
    scene = cornell_box(path_tracer=True)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    tile = make_tile_intersector(ds, accel, interpret=True)
    brute = make_brute_force(ds, meta)
    return ds, tile, brute


def test_closest_matches_oracle(cornell_setup, rng):
    ds, (t_closest, _), (b_closest, _) = cornell_setup
    org, dirn = _rand_rays(rng, 1500, np.array([278, 278, 278.0]), 400.0)
    th = t_closest(org, dirn, 0.0, jnp.inf)
    bh = b_closest(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(th.valid), np.asarray(bh.valid))
    hit = np.asarray(bh.valid)
    np.testing.assert_allclose(
        np.asarray(th.t)[hit], np.asarray(bh.t)[hit], rtol=1e-4, atol=1e-3
    )
    t_pos = np.asarray(org + th.t[:, None] * dirn)[hit]
    b_pos = np.asarray(org + bh.t[:, None] * dirn)[hit]
    np.testing.assert_allclose(t_pos, b_pos, rtol=1e-3, atol=1e-2)


def test_any_hit_matches_oracle(cornell_setup, rng):
    ds, (_, t_any), (_, b_any) = cornell_setup
    org, dirn = _rand_rays(rng, 1024, np.array([278, 278, 278.0]), 400.0)
    t_max = jnp.asarray(rng.uniform(10.0, 900.0, 1024), jnp.float32)
    ta = np.asarray(t_any(org, dirn, 0.0, t_max))
    ba = np.asarray(b_any(org, dirn, 0.0, t_max))
    np.testing.assert_array_equal(ta, ba)


def test_dead_lanes(cornell_setup, rng):
    ds, (t_closest, t_any), _ = cornell_setup
    org, dirn = _rand_rays(rng, 1024, np.array([278, 278, 278.0]), 400.0)
    t_max = jnp.where(jnp.arange(1024) % 2 == 0, jnp.inf, -1.0)
    h = t_closest(org, dirn, 0.0, t_max)
    assert not np.any(np.asarray(h.valid)[1::2])
    occ = np.asarray(t_any(org, dirn, 0.0, t_max))
    assert not np.any(occ[1::2])


def test_instanced_mesh_slots(rng):
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    t_closest, _ = make_tile_intersector(ds, accel, interpret=True)
    b_closest, _ = make_brute_force(ds, meta)
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    org, dirn = _rand_rays(rng, 2048, center, 3.0)
    th = t_closest(org, dirn, 0.0, jnp.inf)
    bh = b_closest(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(th.valid), np.asarray(bh.valid))
    hit = np.asarray(bh.valid)
    np.testing.assert_allclose(
        np.asarray(th.t)[hit], np.asarray(bh.t)[hit], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(th.inst)[hit], np.asarray(bh.inst)[hit]
    )
    np.testing.assert_array_equal(
        np.asarray(th.tri)[hit], np.asarray(bh.tri)[hit]
    )


def test_overflow_flag(rng):
    """pairs_per_tile=1 leaves room for only the sentinel pairs — real
    pairs must overflow and be flagged."""
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    assert accel.n_clusters > 2
    t_closest, _ = make_tile_intersector(
        ds, accel, interpret=True, pairs_per_tile=1
    )
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    org, dirn = _rand_rays(rng, 1024, center, 3.0)
    hit, stats = t_closest.with_stats(org, dirn, 0.0, jnp.inf)
    stats = np.asarray(stats)
    assert stats[1] == 1.0  # overflow reported


def test_overflow_no_garbage(rng):
    """Under total budget overflow every real pair is dropped, but every
    tile's output block must still be initialized by its guaranteed
    sentinel — hits degrade to misses, never to garbage slots."""
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    t_closest, t_any = make_tile_intersector(
        ds, accel, interpret=True, pairs_per_tile=1, pairs_avg=1
    )
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    org, dirn = _rand_rays(rng, 4096, center, 3.0)
    hit, stats = t_closest.with_stats(org, dirn, 0.0, jnp.inf)
    assert np.asarray(stats)[1] == 1.0
    assert not np.any(np.asarray(hit.valid))
    assert np.all(np.asarray(hit.slot) == -1)
    occ, stats = t_any.with_stats(org, dirn, 0.0, jnp.inf)
    assert np.asarray(stats)[1] == 1.0
    assert not np.any(np.asarray(occ))


def test_render_scene_budget_auto_retry():
    """render_scene must detect a pair-budget overflow, retry with doubled
    budgets, and produce the same image as an adequate budget (VERDICT
    round-1 item 6). Uses the bunny stand-in: the Cornell box has ≤ 8
    clusters and takes the static all-pairs path, which cannot overflow."""
    from tpurt.render import render_scene
    from tpurt.scene.procedural import bunny_standin
    from tpurt.utils.config import get_config

    scene = bunny_standin(subdivisions=3)
    base = get_config(
        "bunny", width=48, height=36, spp=1, spp_per_batch=1,
        max_bounces=1, intersector="bvh_tile",
    )
    import dataclasses

    tiny = dataclasses.replace(
        base, pairs_avg=2, pairs_avg_bounce=2, pairs_avg_shadow=2
    )
    st_tiny, stats_tiny = render_scene(tiny, scene=scene)
    # entry rows default to "auto" = ON for narrow cluster tables like
    # this standin (tilewave._entry_rows_enabled)
    if os.environ.get("TPURT_ENTRY_ROWS", "auto") != "0":
        # dense entry rows have no global pair capacity: tiny pcap
        # budgets CANNOT overflow, so no retry ever happens and the
        # image is right the first time
        assert stats_tiny["budget_retries"] == 0
    else:
        assert stats_tiny["budget_retries"] > 0
    assert not stats_tiny["pair_overflow"]
    st_ok, stats_ok = render_scene(base, scene=scene)
    assert stats_ok["budget_retries"] == 0
    np.testing.assert_allclose(
        np.asarray(st_tiny.accum), np.asarray(st_ok.accum),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize("scene_kind", ["bunny", "cornell"])
def test_smem_path_matches_oracle(rng, monkeypatch, scene_kind):
    """The SMEM triangle-broadcast kernel (the PRODUCTION hardware path,
    with per-row sub-box skip + best-t culling) vs the brute oracle, in
    interpret mode. Covers both the masked-expansion path (bunny, > 8
    clusters) and the static all-pairs path (cornell, 1 cluster)."""
    monkeypatch.setenv("TPURT_SMEM_TRI", "1")
    if scene_kind == "bunny":
        scene = bunny_standin(subdivisions=3)
    else:
        scene = cornell_box(path_tracer=True)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    t_closest, t_any = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant"
    )
    b_closest, b_any = make_brute_force(ds, meta)
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    radius = float(
        np.max(np.asarray(ds.tri_v0).max(0) - np.asarray(ds.tri_v0).min(0))
    )
    org, dirn = _rand_rays(rng, 2048, center, radius * 0.5)
    th = t_closest(org, dirn, 0.0, jnp.inf)
    bh = b_closest(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(th.valid), np.asarray(bh.valid))
    hit = np.asarray(bh.valid)
    np.testing.assert_allclose(
        np.asarray(th.t)[hit], np.asarray(bh.t)[hit], rtol=1e-4, atol=1e-3
    )
    t_max = jnp.asarray(rng.uniform(0.1, radius, 2048), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(t_any(org, dirn, 0.0, t_max)),
        np.asarray(b_any(org, dirn, 0.0, t_max)),
    )


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_exact_mask_matches_oracle(rng, monkeypatch, impl):
    """TPURT_EXACT_MASK=1 replaces the conservative interval-frustum
    tile mask with an exact per-ray ANY reduction — a pure pair-list
    shrink that must not change a single result (closest AND any-hit).
    Both implementations (the production Pallas kernel and the lax.map
    reference) must agree with the brute oracle."""
    monkeypatch.setenv("TPURT_EXACT_MASK", "1")
    monkeypatch.setenv("TPURT_EXACT_IMPL", impl)
    monkeypatch.setenv("TPURT_SMEM_TRI", "1")
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    t_closest, t_any = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant"
    )
    b_closest, b_any = make_brute_force(ds, meta)
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    radius = float(
        np.max(np.asarray(ds.tri_v0).max(0) - np.asarray(ds.tri_v0).min(0))
    )
    org, dirn = _rand_rays(rng, 2048, center, radius * 0.5)
    th = t_closest(org, dirn, 0.0, jnp.inf)
    bh = b_closest(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(th.valid), np.asarray(bh.valid))
    hit = np.asarray(bh.valid)
    np.testing.assert_allclose(
        np.asarray(th.t)[hit], np.asarray(bh.t)[hit], rtol=1e-4, atol=1e-3
    )
    t_max = jnp.asarray(rng.uniform(0.1, radius, 2048), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(t_any(org, dirn, 0.0, t_max)),
        np.asarray(b_any(org, dirn, 0.0, t_max)),
    )


def test_approx_recip_matches_oracle(rng, monkeypatch):
    """TPURT_APPROX_RECIP=1 (approx reciprocal + one Newton step for the
    Möller–Trumbore 1/det) must agree with the brute oracle to the same
    tolerances as the exact-divide kernel."""
    monkeypatch.setenv("TPURT_APPROX_RECIP", "1")
    monkeypatch.setenv("TPURT_SMEM_TRI", "1")
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    t_closest, _ = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant"
    )
    b_closest, _ = make_brute_force(ds, meta)
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    radius = float(
        np.max(np.asarray(ds.tri_v0).max(0) - np.asarray(ds.tri_v0).min(0))
    )
    org, dirn = _rand_rays(rng, 2048, center, radius * 0.5)
    th = t_closest(org, dirn, 0.0, jnp.inf)
    bh = b_closest(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(th.valid), np.asarray(bh.valid))
    hit = np.asarray(bh.valid)
    np.testing.assert_allclose(
        np.asarray(th.t)[hit], np.asarray(bh.t)[hit], rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("smem", ["0", "1"])
@pytest.mark.parametrize("scene_kind", ["bunny", "cornell"])
def test_lean_occlusion_matches_oracle(rng, monkeypatch, scene_kind, smem):
    """TPURT_LEAN_OCCL=1 compiles any-hit traces into the dedicated lean
    kernel variant (division-free OR-fold, bt=-1 lane retirement) — its
    occlusion booleans must equal the brute oracle on both the
    masked-expansion path (bunny) and the static all-pairs path
    (cornell), with and without the SMEM triangle broadcast."""
    monkeypatch.setenv("TPURT_LEAN_OCCL", "1")
    monkeypatch.setenv("TPURT_SMEM_TRI", smem)
    if scene_kind == "bunny":
        scene = bunny_standin(subdivisions=3)
    else:
        scene = cornell_box(path_tracer=True)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    _, t_any = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant"
    )
    _, b_any = make_brute_force(ds, meta)
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    radius = float(
        np.max(np.asarray(ds.tri_v0).max(0) - np.asarray(ds.tri_v0).min(0))
    )
    org, dirn = _rand_rays(rng, 2048, center, radius * 0.5)
    t_max = jnp.asarray(rng.uniform(0.1, radius, 2048), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(t_any(org, dirn, 0.0, t_max)),
        np.asarray(b_any(org, dirn, 0.0, t_max)),
    )
    # dead lanes (t_max < 0) must never be reported occluded
    t_dead = t_max.at[::3].set(-1.0)
    occ = np.asarray(t_any(org, dirn, 0.0, t_dead))
    assert not occ[::3].any()


def test_launch_chunking_matches_single(rng, monkeypatch):
    """Waves whose pair budget exceeds the SMEM prefetch cap split into
    sequential equal-shape launches — results must be identical."""
    import tpurt.kernels.tilewave as tw

    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    org, dirn = _rand_rays(rng, 4096, center, 3.0)  # 4 tiles
    c_one, a_one = make_tile_intersector(ds, accel, interpret=True)
    h1 = c_one(org, dirn, 0.0, jnp.inf)
    # force 1-tile chunks (4 launches): pair-loop mode chunks by tile
    # count (grid mode, TPURT_PAIR_LOOP=0, chunks by pair capacity)
    if tw._os.environ.get("TPURT_PAIR_LOOP", "1") == "1":
        monkeypatch.setattr(tw, "TILES_PER_LAUNCH", 1)
    else:
        monkeypatch.setattr(tw, "MAX_PAIRS_PER_LAUNCH", 1)
    c_chunk, a_chunk = make_tile_intersector(ds, accel, interpret=True)
    h4 = c_chunk(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(h1.valid), np.asarray(h4.valid))
    np.testing.assert_allclose(np.asarray(h1.t)[np.asarray(h1.valid)],
                               np.asarray(h4.t)[np.asarray(h4.valid)],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(h1.slot), np.asarray(h4.slot))
    t_max = jnp.asarray(rng.uniform(0.5, 4.0, 4096), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(a_one(org, dirn, 0.0, t_max)),
        np.asarray(a_chunk(org, dirn, 0.0, t_max)),
    )


@pytest.mark.parametrize("sort", ["morton", "octant"])
def test_ray_sort_matches_unsorted(rng, sort):
    """ray sorts must be pure reorders: identical results. Uses the
    bunny stand-in (> 8 clusters) so the masked-expansion path runs —
    small scenes take the static all-pairs path where sorts are skipped."""
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    c_plain, _ = make_tile_intersector(ds, accel, interpret=True)
    c_sort, _ = make_tile_intersector(
        ds, accel, interpret=True, ray_sort=sort
    )
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    org, dirn = _rand_rays(rng, 1500, center, 3.0)
    t_max = jnp.where(jnp.arange(1500) % 7 == 0, -1.0, jnp.inf)
    hp = c_plain(org, dirn, 0.0, t_max)
    hs = c_sort(org, dirn, 0.0, t_max)
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hs.valid))
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hs.tri))
    np.testing.assert_allclose(np.asarray(hp.t), np.asarray(hs.t),
                               rtol=1e-6, atol=1e-6)


def test_tile_mask_is_superset_of_exact(rng):
    """The conservative interval mask must never reject a (tile, cluster)
    pair that some ray actually pierces — including mixed-octant tiles."""
    from tpurt.kernels.tilewave import TILE, _tile_mask

    n_tiles, n_c = 4, 64
    n = n_tiles * TILE
    org = jnp.asarray(rng.normal(size=(n, 3)) * 5.0, jnp.float32)
    dirn = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
    tm = jnp.where(jnp.arange(n) % 5 == 0, -1.0, 1e30).astype(jnp.float32)
    clo = jnp.asarray(rng.uniform(-6, 5, size=(n_c, 3)), jnp.float32)
    chi = clo + jnp.asarray(rng.uniform(0.1, 2.0, size=(n_c, 3)),
                            jnp.float32)

    mask = np.asarray(_tile_mask(org, dirn, tm, clo, chi, n_tiles))

    inv = 1.0 / np.where(np.abs(np.asarray(dirn)) < 1e-12, 1e-12,
                         np.asarray(dirn))
    o = np.asarray(org)
    t0 = (np.asarray(clo)[None] - o[:, None]) * inv[:, None]
    t1 = (np.asarray(chi)[None] - o[:, None]) * inv[:, None]
    tn = np.max(np.minimum(t0, t1), axis=-1)
    tf = np.min(np.maximum(t0, t1), axis=-1)
    alive = np.asarray(tm)[:, None] >= 0
    exact = (tn <= tf) & (tf >= 0) & alive
    exact_tc = exact.reshape(n_tiles, TILE, n_c).any(axis=1)
    missed = exact_tc & ~mask
    assert not missed.any(), f"conservative mask lost {missed.sum()} pairs"


def test_exact_mask_tn_min_is_sound_far_break_key(rng):
    """The exact-mask min-entry key must lower-bound EVERY hitting ray's
    true slab-entry distance for its (tile, cluster) pair (the far-break
    soundness condition), must be at least the interval-frustum bound
    (it is the tighter key), and must agree with a numpy reduction."""
    from tpurt.kernels.tilewave import (
        TILE, _exact_any_mask, _tile_mask,
    )

    n_tiles, n_c = 4, 64
    n = n_tiles * TILE
    org = jnp.asarray(rng.normal(size=(n, 3)) * 5.0, jnp.float32)
    dirn = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
    tm = jnp.where(jnp.arange(n) % 5 == 0, -1.0, 30.0).astype(jnp.float32)
    clo = jnp.asarray(rng.uniform(-6, 5, size=(n_c, 3)), jnp.float32)
    chi = clo + jnp.asarray(rng.uniform(0.1, 2.0, size=(n_c, 3)),
                            jnp.float32)

    emask, etn = _exact_any_mask(org, dirn, tm, clo, chi, n_tiles,
                                 return_tn=True)
    emask, etn = np.asarray(emask), np.asarray(etn)
    imask, itn = _tile_mask(org, dirn, tm, clo, chi, n_tiles,
                            return_tn=True)
    imask, itn = np.asarray(imask), np.asarray(itn)

    # numpy twin of the per-ray slab reduction
    inv = 1.0 / np.where(np.abs(np.asarray(dirn)) < 1e-12, 1e-12,
                         np.asarray(dirn))
    o = np.asarray(org)
    t0 = (np.asarray(clo)[None] - o[:, None]) * inv[:, None]
    t1 = (np.asarray(chi)[None] - o[:, None]) * inv[:, None]
    tn = np.maximum(np.max(np.minimum(t0, t1), axis=-1), 0.0)
    tf = np.minimum(np.min(np.maximum(t0, t1), axis=-1),
                    np.maximum(np.asarray(tm)[:, None], 0.0))
    alive = np.asarray(tm)[:, None] >= 0
    hit = (tn <= tf) & alive  # (N, C)
    hit_t = hit.reshape(n_tiles, TILE, n_c)
    tn_t = tn.reshape(n_tiles, TILE, n_c)

    assert (emask == hit_t.any(axis=1)).all()
    # soundness: etn ≤ every hitting ray's true entry distance
    viol = hit_t & (tn_t < etn[:, None, :] - 1e-5)
    assert not viol.any(), f"{viol.sum()} rays enter before the key"
    # exactness vs the numpy min + tightness vs the interval bound
    want = np.where(hit_t.any(axis=1),
                    np.where(hit_t, tn_t, np.inf).min(axis=1), np.inf)
    got = np.where(emask, etn, np.inf)
    assert np.allclose(np.where(np.isfinite(want), want, 0.0),
                       np.where(np.isfinite(got), got, 0.0),
                       rtol=1e-5, atol=1e-5)
    both = emask & imask
    assert (etn[both] >= itn[both] - 1e-4).all(), \
        "exact key must dominate the interval key"


def test_exact_mask_pallas_matches_xla(rng):
    """The Pallas dense exact-mask kernel (production) must reproduce
    the lax.map reference exactly: same mask, same min-entry key —
    including dead rays, a non-multiple-of-128 cluster count (lane
    padding must stay empty-box), and clusters behind every ray."""
    from tpurt.kernels.tilewave import (
        TILE, _exact_any_mask, _exact_any_mask_pallas,
    )

    n_tiles, n_c = 3, 200  # 200 pads to 256 lanes
    n = n_tiles * TILE
    org = jnp.asarray(rng.normal(size=(n, 3)) * 5.0, jnp.float32)
    dirn = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
    tm = jnp.where(jnp.arange(n) % 7 == 0, -1.0,
                   jnp.where(jnp.arange(n) % 3 == 0, 4.0, 30.0)
                   ).astype(jnp.float32)
    clo = jnp.asarray(rng.uniform(-8, 6, size=(n_c, 3)), jnp.float32)
    chi = clo + jnp.asarray(rng.uniform(0.1, 2.0, size=(n_c, 3)),
                            jnp.float32)

    xmask, xtn = _exact_any_mask(org, dirn, tm, clo, chi, n_tiles,
                                 return_tn=True)
    pmask, ptn = _exact_any_mask_pallas(org, dirn, tm, clo, chi,
                                        n_tiles, interpret=True)
    np.testing.assert_array_equal(np.asarray(pmask), np.asarray(xmask))
    m = np.asarray(xmask)
    np.testing.assert_allclose(
        np.asarray(ptn)[m], np.asarray(xtn)[m], rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("unroll", [1, 4, 8])
def test_pair_unroll_matches_oracle(rng, monkeypatch, unroll):
    """The manually-unrolled early-exit pair loop must be exact for any
    TPURT_PAIR_UNROLL: segments of arbitrary length end mid-block, so
    the per-slot guards and the DMA drain must stay balanced. PAIR_UNROLL
    is bound at import, so the module is reloaded around the check."""
    import importlib

    from tpurt.kernels import tilewave as tw

    monkeypatch.setenv("TPURT_PAIR_UNROLL", str(unroll))
    importlib.reload(tw)
    try:
        assert tw.PAIR_UNROLL == unroll
        scene = bunny_standin(subdivisions=3)  # 14 clusters > all-pairs max
        meta = scene_meta(scene)
        ds = to_device(scene)
        accel = build_pair_accel(ds, meta, scene=scene)
        t_closest, t_any = tw.make_tile_intersector(
            ds, accel, interpret=True, ray_sort="octant"
        )
        b_closest, b_any = make_brute_force(ds, meta)
        center = np.asarray(ds.tri_v0).mean(axis=0)
        org, dirn = _rand_rays(rng, 1500, center, 3.0)
        got = t_closest(org, dirn, 0.0, jnp.inf)
        want = b_closest(org, dirn, 0.0, jnp.inf)
        assert bool(jnp.all(got.valid == want.valid))
        ok = np.asarray(want.valid)
        assert np.allclose(np.asarray(got.t)[ok], np.asarray(want.t)[ok],
                           rtol=1e-4, atol=1e-5)
        occ_g = t_any(org, dirn, 0.0, 2.5)
        occ_w = b_any(org, dirn, 0.0, 2.5)
        assert bool(jnp.all(occ_g == occ_w))
    finally:
        monkeypatch.delenv("TPURT_PAIR_UNROLL")
        importlib.reload(tw)


def test_fused_entries_match_xla_build(rng):
    """The fused mask→entry kernel (_exact_entries_pallas) must emit
    BIT-IDENTICAL packed entry words to the mask kernel + XLA expansion
    it replaces (same tn quantization formula, INT32_MAX on no-hit and
    on every lane/row pad) — the entry-row sort order, and therefore
    the whole render, is then unchanged by TPURT_FUSED_ENTRIES."""
    import jax
    from tpurt.kernels.tilewave import (
        BIG, ENTRY_GROUP, TILE, _exact_any_mask_pallas,
        _exact_entries_pallas,
    )

    for n_c, n_tiles in ((37, 5), (200, 3)):  # lane pad + 2-slab cases
        n = n_tiles * TILE
        org = jnp.asarray(rng.normal(size=(n, 3)) * 5.0, jnp.float32)
        dirn = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
        tm = jnp.where(jnp.arange(n) % 7 == 0, -1.0, BIG
                       ).astype(jnp.float32)
        clo = jnp.asarray(rng.uniform(-8, 6, size=(n_c, 3)), jnp.float32)
        chi = clo + jnp.asarray(rng.uniform(0.1, 2.0, size=(n_c, 3)),
                                jnp.float32)
        diag = jnp.linalg.norm(jnp.max(chi, 0) - jnp.min(clo, 0))
        tn_scale = jnp.maximum(diag, 1e-12) / 32766.0
        mask, tn = _exact_any_mask_pallas(org, dirn, tm, clo, chi,
                                          n_tiles, interpret=True)
        tn_q = jnp.clip((jnp.maximum(tn, 0.0) / tn_scale
                         ).astype(jnp.int32), 0, 32766)
        cl = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, n_c), 1)
        entry = jnp.where(mask, (tn_q << 16) | cl, jnp.int32(2**31 - 1))
        cp = ((n_c + 127) // 128) * 128
        tpad = (-n_tiles) % ENTRY_GROUP
        entry = jnp.pad(entry, ((0, tpad), (0, cp - n_c)),
                        constant_values=2**31 - 1)
        fused = _exact_entries_pallas(org, dirn, tm, clo, chi, n_tiles,
                                      tn_scale, interpret=True)
        np.testing.assert_array_equal(np.asarray(fused),
                                      np.asarray(entry))


def test_fused_entries_render_equality(rng, monkeypatch):
    """TPURT_FUSED_ENTRIES=1 (default) vs =0 must render bit-identically
    through the entry-row path (closest and any-hit)."""
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    center = (np.asarray(accel.cluster_lo).min(0)
              + np.asarray(accel.cluster_hi).max(0)) / 2
    radius = float(np.linalg.norm(
        np.asarray(accel.cluster_hi).max(0) - center))
    org, dirn = _rand_rays(rng, 1500, center, radius)
    t_min = jnp.zeros(1500, jnp.float32)
    t_max = jnp.full(1500, 1e30, jnp.float32)
    monkeypatch.setenv("TPURT_ENTRY_ROWS", "1")
    monkeypatch.setenv("TPURT_EXACT_MASK", "all")
    outs = {}
    for fused in ("1", "0"):
        monkeypatch.setenv("TPURT_FUSED_ENTRIES", fused)
        closest, any_hit = make_tile_intersector(ds, accel,
                                                 interpret=True)
        hit = closest(org, dirn, t_min, t_max)
        occ = any_hit(org, dirn, t_min, t_max)
        outs[fused] = (hit, occ)
    h1, o1 = outs["1"]
    h0, o0 = outs["0"]
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(h0.t))
    np.testing.assert_array_equal(np.asarray(h1.tri), np.asarray(h0.tri))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))
