"""Packet-BVH kernel (G2/G4 Pallas) vs the dense brute-force oracle.

Runs in Pallas interpret mode on the CPU test mesh (SURVEY.md §4.1 — the
"mock GPU"). Exercises closest-hit t/u/v/tri/inst agreement, any-hit
occlusion, dead-lane handling, and instanced (flattened) geometry.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh.cluster import build_packet_accel
from tpurt.kernels.packet import make_packet_intersector
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
    accel = build_packet_accel(ds, meta)
    packet = make_packet_intersector(ds, accel, interpret=True)
    brute = make_brute_force(ds, meta)
    return ds, packet, brute


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
    # same triangle (modulo exact shared-edge ties, which differ by t only
    # at 1e-6 — compare hit points instead of ids for robustness)
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
    """Mid-size instanced mesh: flattened slots must map back to the right
    (triangle, instance) pairs — verified via hit positions and t."""
    scene = bunny_standin(subdivisions=3)  # ~1.3k tris, 2 instances? (1)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_packet_accel(ds, meta)
    p_closest, _ = make_packet_intersector(ds, accel, interpret=True)
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
