"""Pair-wavefront intersector (G2/G4 dense pipeline) vs the brute oracle.

Runs in Pallas interpret mode on CPU (SURVEY.md §4.1). Exercises
closest-hit agreement, any-hit occlusion, dead lanes, instanced slots,
and the overflow flag of the static pair budget.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh.paircluster import build_pair_accel
from tpurt.kernels.pairwave import make_pair_intersector
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
    pair = make_pair_intersector(ds, accel, interpret=True)
    brute = make_brute_force(ds, meta)
    return ds, pair, brute


def test_closest_matches_oracle(cornell_setup, rng):
    ds, (p_closest, _), (b_closest, _) = cornell_setup
    org, dirn = _rand_rays(rng, 512, np.array([278, 278, 278.0]), 400.0)
    ph = p_closest(org, dirn, 0.0, jnp.inf)
    bh = b_closest(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(ph.valid), np.asarray(bh.valid))
    hit = np.asarray(bh.valid)
    np.testing.assert_allclose(
        np.asarray(ph.t)[hit], np.asarray(bh.t)[hit], rtol=1e-4, atol=1e-3
    )
    p_pos = np.asarray(org + ph.t[:, None] * dirn)[hit]
    b_pos = np.asarray(org + bh.t[:, None] * dirn)[hit]
    np.testing.assert_allclose(p_pos, b_pos, rtol=1e-3, atol=1e-2)


def test_any_hit_matches_oracle(cornell_setup, rng):
    ds, (_, p_any), (_, b_any) = cornell_setup
    org, dirn = _rand_rays(rng, 512, np.array([278, 278, 278.0]), 400.0)
    t_max = jnp.asarray(rng.uniform(10.0, 900.0, 512), jnp.float32)
    pa = np.asarray(p_any(org, dirn, 0.0, t_max))
    ba = np.asarray(b_any(org, dirn, 0.0, t_max))
    np.testing.assert_array_equal(pa, ba)


def test_dead_lanes(cornell_setup, rng):
    ds, (p_closest, p_any), _ = cornell_setup
    org, dirn = _rand_rays(rng, 256, np.array([278, 278, 278.0]), 400.0)
    t_max = jnp.where(jnp.arange(256) % 2 == 0, jnp.inf, -1.0)
    h = p_closest(org, dirn, 0.0, t_max)
    assert not np.any(np.asarray(h.valid)[1::2])
    occ = np.asarray(p_any(org, dirn, 0.0, t_max))
    assert not np.any(occ[1::2])


def test_instanced_mesh_slots(rng):
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    p_closest, _ = make_pair_intersector(ds, accel, interpret=True)
    b_closest, _ = make_brute_force(ds, meta)
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    org, dirn = _rand_rays(rng, 256, center, 3.0)
    ph = p_closest(org, dirn, 0.0, jnp.inf)
    bh = b_closest(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(ph.valid), np.asarray(bh.valid))
    hit = np.asarray(bh.valid)
    np.testing.assert_allclose(
        np.asarray(ph.t)[hit], np.asarray(bh.t)[hit], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(ph.inst)[hit], np.asarray(bh.inst)[hit]
    )
    np.testing.assert_array_equal(
        np.asarray(ph.tri)[hit], np.asarray(bh.tri)[hit]
    )


def test_overflow_flag(rng):
    """A 1-pair/ray budget on a multi-cluster scene must trip the
    overflow flag (and still return well-formed hits)."""
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    assert accel.n_clusters > 2
    p_closest, _ = make_pair_intersector(
        ds, accel, interpret=True, pairs_per_ray=1
    )
    center = np.asarray(
        (np.asarray(ds.tri_v0).min(0) + np.asarray(ds.tri_v0).max(0)) / 2
    )
    # 2048 rays: the 1-pair/ray budget BLOCK-aligns up to 2048 slots, and
    # these rays average ~1.9 real pairs each (measured with the kd-SAH
    # clustering default — tighter boxes than the old Morton chop, which
    # is why 512 rays no longer overflow their aligned budget)
    org, dirn = _rand_rays(rng, 2048, center, 3.0)
    hit, stats = p_closest.with_stats(org, dirn, 0.0, jnp.inf)
    stats = np.asarray(stats)
    assert stats[0] > 2048  # more real pairs than the aligned budget
    assert stats[1] == 1.0  # overflow reported
