"""Supercluster grouping quality on the captured bunny bench waves (CPU).

Counts exact-ANY pairs/tile at three granularities on the real bounce-1
wave (octant-sorted, the headline's dominant trace):

  clusters (C, the round-4 baseline) |
  superclusters from CONSECUTIVE-8 grouping (the round-5 build) |
  superclusters from a HIERARCHICAL kd regroup (kd_cluster_order at
  size=768 first, then 96 within — tighter parents, candidate upgrade)

The sc traversal kernel pays one 64-row DMA + 8 child pre-tests per
surviving supercluster, so sc_pairs/tile × 8 vs cluster pairs/tile is
the kernel-side cost ratio; mask/entry machinery scales with S vs C.
CPU-only (numpy slab math), no jax needed.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPDIR = "/tmp/tpurt_waves"
TILE = 1024


def exact_pairs_per_tile(org, dirn, tmv, lo, hi):
    """Total exact (tile, box) pairs + live-tile count via the jitted
    XLA exact-ANY mask (the numpy per-tile loop measured >30 min)."""
    import jax.numpy as jnp

    from tpurt.kernels.tilewave import _exact_any_mask

    n_tiles = org.shape[0] // TILE
    mask = np.asarray(_exact_any_mask(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(lo), jnp.asarray(hi), n_tiles))
    return int(mask.sum()), int(np.any(mask, axis=1).sum())


def main():
    from tpurt.bvh.paircluster import (
        SC_SIZE,
        TRIS_PER_CLUSTER,
        _supercluster_groups,
        build_pair_accel,
        flatten_world_tris,
        kd_cluster_order,
    )
    from tpurt.kernels.tilewave import _octant_sort_keys
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.scene.loader import load_scene
    from tpurt.utils.config import get_config
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    config = get_config("bunny")
    scene = load_scene(config.scene)
    ds = to_device(scene)
    meta = scene_meta(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    lo = np.asarray(accel.cluster_lo)
    hi = np.asarray(accel.cluster_hi)
    C = lo.shape[0]

    w = dict(np.load(os.path.join(CAPDIR, "bounce1_wave.npz")))
    org = np.asarray(w["org"], np.float32)
    dirn = np.asarray(w["dirn"], np.float32)
    tmv = np.where(np.asarray(w["alive"]), np.float32(3.4e38),
                   np.float32(-1.0))
    # octant sort (the production wave order)
    keys = np.asarray(_octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(lo.min(0)), jnp.asarray(hi.max(0))))
    order = np.argsort(keys, kind="stable")
    org, dirn, tmv = org[order], dirn[order], tmv[order]
    pad = (-org.shape[0]) % TILE
    if pad:
        org = np.concatenate([org, np.zeros((pad, 3), np.float32)])
        dirn = np.concatenate([dirn, np.ones((pad, 3), np.float32)])
        tmv = np.concatenate([tmv, np.full(pad, -1.0, np.float32)])

    pc, lt = exact_pairs_per_tile(org, dirn, tmv, lo, hi)
    print(f"clusters C={C}: exact pairs {pc} "
          f"({pc / lt:.1f}/live-tile, {lt} live tiles)")

    sc_lo, sc_hi, _ = _supercluster_groups(lo, hi)
    ps, _ = exact_pairs_per_tile(org, dirn, tmv, sc_lo, sc_hi)
    print(f"sc consecutive-8 S={sc_lo.shape[0]}: pairs {ps} "
          f"({ps / lt:.1f}/live-tile; x8 children = {8 * ps / lt:.1f} "
          f"pre-tests/tile vs {pc / lt:.1f} cluster pairs)")

    # hierarchical regroup: kd at 768 first, then kd 96 within
    v0, v1, v2, tri_id, inst_id = flatten_world_tris(ds, meta, scene)
    o768 = kd_cluster_order(v0, v1, v2, size=SC_SIZE * TRIS_PER_CLUSTER,
                            sah=True)
    v0h, v1h, v2h = v0[o768], v1[o768], v2[o768]
    pmin = np.minimum(np.minimum(v0h, v1h), v2h)
    pmax = np.maximum(np.maximum(v0h, v1h), v2h)
    n = v0h.shape[0]
    # within each 768 block, kd-96 ordering; then cluster/super boxes
    lo_h, hi_h, slo_h, shi_h = [], [], [], []
    for b in range(0, n, SC_SIZE * TRIS_PER_CLUSTER):
        e = min(b + SC_SIZE * TRIS_PER_CLUSTER, n)
        sub = slice(b, e)
        o96 = kd_cluster_order(v0h[sub], v1h[sub], v2h[sub],
                               size=TRIS_PER_CLUSTER, sah=True)
        pmn, pmx = pmin[sub][o96], pmax[sub][o96]
        slo_h.append(pmn.min(0))
        shi_h.append(pmx.max(0))
        for cb in range(0, e - b, TRIS_PER_CLUSTER):
            ce = min(cb + TRIS_PER_CLUSTER, e - b)
            lo_h.append(pmn[cb:ce].min(0))
            hi_h.append(pmx[cb:ce].max(0))
    lo_h = np.asarray(lo_h, np.float32)
    hi_h = np.asarray(hi_h, np.float32)
    slo_h = np.asarray(slo_h, np.float32)
    shi_h = np.asarray(shi_h, np.float32)
    ph, _ = exact_pairs_per_tile(org, dirn, tmv, lo_h, hi_h)
    psh, _ = exact_pairs_per_tile(org, dirn, tmv, slo_h, shi_h)
    print(f"hier kd768: clusters {lo_h.shape[0]} pairs "
          f"{ph / lt:.1f}/live-tile; superclusters {slo_h.shape[0]} "
          f"pairs {psh / lt:.1f}/live-tile "
          f"(x8 = {8 * psh / lt:.1f} pre-tests/tile)")


if __name__ == "__main__":
    main()
