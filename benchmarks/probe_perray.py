"""CPU probe: per-ray-exact traversal designs vs the tile kernel.

Round-2 session-4 design study for PARITY.md roadmap #1 ("per-ray pair
exactness"). Measures, on a REAL bunny bounce wave (the worst production
wave kind), the work bounds of every candidate redesign:

  * per-ray EXACT clusters hit (the ideal lane-dense lower bound);
  * per-tile exact-ANY union at several tile sizes (the floor of ANY
    tile-granular scheme — what a perfect cull would leave);
  * the same under alternative ray orderings (first-hit-cluster oracle
    sort — tests whether a better sort key could tighten tile unions);
  * K-round per-ray traversal (each round every ray tests its k-th
    nearest cluster; per-round tiles test the union of k-th ids);
  * cluster-major "pod" packing (8 subtiles of 128 rays x one shared
    cluster per vector op, exact-culled, early-exit visit sets).

Findings (2026-08-17, 262144-ray bounce wave, 854 clusters):
  per-ray exact mean 5.2 clusters; visited-until-hit mean 4.8.
  tile=1024 octant frustum 302/ray, exact-ANY 139/ray; tile=128: 39.
  first-cluster oracle sort does NOT tighten unions (148 vs 139 — rays
  sharing their first cluster diverge immediately after).
  K-round: 312 pair-units/ray-equiv — WORSE than today's 302 (per-round
  unions do not share row work across rounds).
  pods: ~40k pods/Mray at 15.6% lane occupancy — 8x fewer vector units
  than tile pairs, but each pod needs ~56 dynamic (1,128) ray-row reads
  + ~64 accumulator RMW row ops + a cull kernel + pod-packing sorts;
  at measured Mosaic row-op costs the fixed overhead cancels the win.
  CONCLUSION: stay tile-granular; recover the frustum->exact gap with
  the in-kernel per-pair cluster pre-test (tilewave) instead.

Run: JAX_PLATFORMS=cpu python benchmarks/probe_perray.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from probe_tile_union import bounce_wave  # noqa: E402 (sibling import)
from tpurt.bvh.paircluster import build_pair_accel
from tpurt.bvh.two_level import build_scene_accel, make_two_level_intersector
from tpurt.kernels.tilewave import _octant_sort_keys
from tpurt.render import load_scene
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device


def main():
    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    lo = np.asarray(accel.cluster_lo)
    hi = np.asarray(accel.cluster_hi)
    org, dirn, tmv, _ = bounce_wave(scene, ds, meta)
    n = org.shape[0]
    C = lo.shape[0]
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn >= 0, 1e-12, -1e-12), dirn)

    # dense exact mask + slab-entry distances (chunked)
    mask = np.zeros((n, C), bool)
    TN = np.full((n, C), np.inf, np.float32)
    for s in range(0, n, 16384):
        oc, ic, tc = org[s:s + 16384], inv[s:s + 16384], tmv[s:s + 16384]
        t0 = (lo[None] - oc[:, None]) * ic[:, None]
        t1 = (hi[None] - oc[:, None]) * ic[:, None]
        tn = np.max(np.minimum(t0, t1), axis=-1)
        tf = np.min(np.maximum(t0, t1), axis=-1)
        m = (tn <= tf) & (tf >= 0) & (tc[:, None] >= 0)
        mask[s:s + 16384] = m
        TN[s:s + 16384] = np.where(m, np.maximum(tn, 0), np.inf)
    alive = tmv >= 0
    print(f"wave: {n} rays ({100 * alive.mean():.0f}% alive), {C} clusters")
    print(f"per-ray EXACT clusters: mean {mask[alive].sum(1).mean():.2f}")

    # true closest hits -> early-exit visit sets (clusters whose slab
    # entry precedes the ray's closest hit)
    acc2 = build_scene_accel(ds, meta)
    closest, _ = make_two_level_intersector(ds, acc2)
    hit = closest(jnp.asarray(org), jnp.asarray(dirn), 0.0,
                  jnp.asarray(np.where(alive, np.inf, -1.0)))
    eff = np.where(np.asarray(hit.valid) & alive, np.asarray(hit.t), np.inf)
    visits = mask & (TN <= eff[:, None] + 1e-6)
    print(f"per-ray VISITED (early exit): mean "
          f"{visits[alive].sum(1).mean():.2f}")

    octant = ((dirn[:, 0] >= 0).astype(np.int64)
              | ((dirn[:, 1] >= 0).astype(np.int64) << 1)
              | ((dirn[:, 2] >= 0).astype(np.int64) << 2))
    first = np.where(visits.any(1),
                     np.where(visits, TN, np.inf).argmin(1), C)
    slo, shi = lo.min(0), hi.max(0)
    cur = np.asarray(_octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(slo), jnp.asarray(shi))).astype(np.int64)
    for name, key in [("octant(cur)", cur),
                      ("first-cluster oracle", first * 8 + octant)]:
        order = np.argsort(key, kind="stable")
        m2 = mask[order]
        v2 = visits[order]
        for tile in (1024, 128):
            nt = n // tile
            u = m2.reshape(nt, tile, C).any(1)
            print(f"{name:22s} tile={tile:5d} exact-ANY "
                  f"{u.sum(1).mean():7.1f} clusters/ray")
        # pods: 8 subtiles x shared cluster, exact visit sets, grouped
        # per 256 subtiles (the VMEM-accumulator scope)
        ns = n // 128
        sub = v2.reshape(ns, 128, C).any(1)
        G, pods = 256, 0
        for g in range(ns // G):
            cnt = sub[g * G:(g + 1) * G].sum(0)
            pods += int(np.ceil(cnt / 8.0).sum())
        occ = v2.sum() / max(sub.sum() * 128.0, 1)
        print(f"{name:22s} pods {pods} ({pods / (alive.sum() / 1e6):.0f}"
              f"/Mray) occupancy {100 * occ:.1f}%")

    # K-round: per round k, tiles test the union of their rays' k-th
    # nearest clusters (oracle first-cluster sort, no early exit)
    K, tile = 12, 1024
    order = np.argsort(first * 8 + octant, kind="stable")
    lists = np.argsort(np.where(mask[order], TN[order], np.inf),
                       axis=1)[:, :K]
    cnt = mask[order].sum(1)
    nt = n // tile
    total = 0
    for k in range(K):
        ck = np.where(cnt > k, lists[:, k], -1).reshape(nt, tile)
        for t in range(nt):
            total += (np.unique(ck[t]) >= 0).sum()
    print(f"K-round total pair-units: {total} "
          f"({total * tile / alive.sum():.0f} clusters/ray-equiv)")


if __name__ == "__main__":
    main()
