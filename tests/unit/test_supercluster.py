"""Supercluster entry mode (round 5) vs the per-cluster path and oracle.

The hierarchical supercluster level (paircluster.SC_SIZE consecutive
clusters under one parent AABB) moves the exact tile mask + entry
build/sort to S ≈ C/8 superboxes and expands children in-kernel with the
exact per-child box pre-test (tpurt/kernels/tilewave.py sc_mode). These
tests pin:

  * closest/any-hit equality with the per-cluster entry path (flat and
    two-level accels) — the expansion is exact, so results match the
    TPURT_SUPERCLUSTER=0 path bit-for-bit on CPU;
  * oracle agreement (brute force) for closest hits;
  * build invariants: children consecutive, parents contain children,
    TL superclusters never span instances, DMA overrun padding present.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh.paircluster import (
    ROWS_PER_CLUSTER,
    SC_PAD_ROWS,
    SC_SIZE,
    build_pair_accel,
    build_pair_accel_two_level,
)
from tpurt.kernels.tilewave import make_tile_intersector
from tpurt.render.intersectors import make_brute_force, scene_meta
from tpurt.scene.device import to_device
from tpurt.scene.procedural import bunny_standin


def _rand_rays(rng, n, center, radius):
    org = center + rng.normal(size=(n, 3)) * radius * 1.5
    target = center + rng.normal(size=(n, 3)) * radius * 0.4
    d = target - org
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def bunny_setup():
    scene = bunny_standin(subdivisions=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    brute = make_brute_force(ds, meta)
    return scene, ds, meta, accel, brute


def test_build_invariants(bunny_setup):
    _, _, _, accel, _ = bunny_setup
    C = accel.cluster_lo.shape[0]
    S = accel.sc_meta.shape[0]
    assert S == -(-C // SC_SIZE)
    # padding rows appended for the fixed 64-row supercluster DMA
    assert accel.tri_rows.shape[0] == C * ROWS_PER_CLUSTER + SC_PAD_ROWS
    covered = 0
    for s in range(S):
        base = int(accel.sc_meta[s]) & 0xFFFF
        nch = int(accel.sc_meta[s]) >> 16
        assert base == covered  # consecutive, gapless
        assert 1 <= nch <= SC_SIZE
        covered += nch
        lo_children = accel.cluster_lo[base:base + nch]
        hi_children = accel.cluster_hi[base:base + nch]
        assert np.all(accel.sc_lo[s] <= lo_children.min(0) + 1e-6)
        assert np.all(accel.sc_hi[s] >= hi_children.max(0) - 1e-6)
    assert covered == C


def test_tl_superclusters_never_span_instances():
    from tpurt.scene.procedural import sponza_standin

    scene = sponza_standin(column_segments=8, column_rings=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel_two_level(ds, meta, scene=scene)
    inst_of_cluster = np.asarray(accel.pair_meta) >> 20
    for s in range(accel.sc_meta.shape[0]):
        base = int(accel.sc_meta[s]) & 0xFFFF
        nch = int(accel.sc_meta[s]) >> 16
        insts = inst_of_cluster[base:base + nch]
        assert np.all(insts == insts[0])
        # contiguous BLAS rows: row bases are an arithmetic sequence
        rows = np.asarray(accel.pair_meta)[base:base + nch] & ((1 << 20) - 1)
        assert np.all(np.diff(rows) == ROWS_PER_CLUSTER)


@pytest.mark.parametrize("smem", ["0", "1"])
def test_sc_matches_percluster_flat(bunny_setup, rng, monkeypatch, smem):
    """sc entries (TPURT_SUPERCLUSTER=1, forced) ≡ per-cluster entries
    (TPURT_SUPERCLUSTER=0) on incoherent waves — both SMEM and fori
    kernel flavors."""
    _, ds, _, accel, _ = bunny_setup
    monkeypatch.setenv("TPURT_SMEM_TRI", smem)
    monkeypatch.setenv("TPURT_ENTRY_ROWS", "1")
    org, dirn = _rand_rays(rng, 2048, np.zeros(3), 1.2)

    monkeypatch.setenv("TPURT_SUPERCLUSTER", "1")  # force: "auto" only engages when cluster entries exceed VMEM
    sc_closest, sc_any = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant")
    h_sc = sc_closest(org, dirn, 0.0, jnp.inf)
    a_sc = np.asarray(sc_any(org, dirn, 0.0, 2.5))

    monkeypatch.setenv("TPURT_SUPERCLUSTER", "0")
    pc_closest, pc_any = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant")
    h_pc = pc_closest(org, dirn, 0.0, jnp.inf)
    a_pc = np.asarray(pc_any(org, dirn, 0.0, 2.5))

    np.testing.assert_array_equal(np.asarray(h_sc.valid),
                                  np.asarray(h_pc.valid))
    hit = np.asarray(h_pc.valid)
    np.testing.assert_array_equal(np.asarray(h_sc.t)[hit],
                                  np.asarray(h_pc.t)[hit])
    np.testing.assert_array_equal(np.asarray(h_sc.slot)[hit],
                                  np.asarray(h_pc.slot)[hit])
    np.testing.assert_array_equal(a_sc, a_pc)


def test_sc_matches_oracle_flat(bunny_setup, rng, monkeypatch):
    _, ds, _, accel, brute = bunny_setup
    monkeypatch.setenv("TPURT_SUPERCLUSTER", "1")  # force: "auto" only engages when cluster entries exceed VMEM
    monkeypatch.setenv("TPURT_ENTRY_ROWS", "1")
    closest, _ = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant", lean=False)
    b_closest, _ = brute
    org, dirn = _rand_rays(rng, 1536, np.zeros(3), 1.2)
    th = closest(org, dirn, 0.0, jnp.inf)
    bh = b_closest(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(th.valid),
                                  np.asarray(bh.valid))
    hit = np.asarray(bh.valid)
    np.testing.assert_allclose(
        np.asarray(th.t)[hit], np.asarray(bh.t)[hit],
        rtol=1e-4, atol=1e-4,
    )


def test_sc_matches_percluster_two_level(rng, monkeypatch):
    """TL sc mode: one shared object-space ray transform per
    supercluster, per-child exact pre-test, instance-id output field."""
    from tpurt.scene.procedural import sponza_standin

    scene = sponza_standin(column_segments=8, column_rings=3)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel_two_level(ds, meta, scene=scene)
    monkeypatch.setenv("TPURT_ENTRY_ROWS", "1")
    center = (np.asarray(accel.cluster_lo).min(0)
              + np.asarray(accel.cluster_hi).max(0)) / 2
    radius = float(
        np.linalg.norm(np.asarray(accel.cluster_hi).max(0)
                       - np.asarray(accel.cluster_lo).min(0))) / 3
    org, dirn = _rand_rays(rng, 2048, center, radius)

    monkeypatch.setenv("TPURT_SUPERCLUSTER", "1")  # force: "auto" only engages when cluster entries exceed VMEM
    sc_closest, sc_any = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant")
    h_sc = sc_closest(org, dirn, 0.0, jnp.inf)
    a_sc = np.asarray(sc_any(org, dirn, 0.0, radius))

    monkeypatch.setenv("TPURT_SUPERCLUSTER", "0")
    pc_closest, pc_any = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant")
    h_pc = pc_closest(org, dirn, 0.0, jnp.inf)
    a_pc = np.asarray(pc_any(org, dirn, 0.0, radius))

    np.testing.assert_array_equal(np.asarray(h_sc.valid),
                                  np.asarray(h_pc.valid))
    hit = np.asarray(h_pc.valid)
    np.testing.assert_array_equal(np.asarray(h_sc.t)[hit],
                                  np.asarray(h_pc.t)[hit])
    np.testing.assert_array_equal(np.asarray(h_sc.slot)[hit],
                                  np.asarray(h_pc.slot)[hit])
    np.testing.assert_array_equal(np.asarray(h_sc.inst)[hit],
                                  np.asarray(h_pc.inst)[hit])
    np.testing.assert_array_equal(a_sc, a_pc)
