"""CPU probe: next-gen uniform-96 clusterers vs kd-chop (session-6).

kd-chop-96 (production since session 5) reduced exact-ANY pairs/tile
138.8 -> 99.4 on the bunny bounce wave. Two refinement candidates, both
keeping EXACTLY 96 tris per cluster (same C / memory / machinery):

  * kd-sah-96: at every recursion try all 3 axes x several size-multiple
    split positions, pick the min of the SAH-style cost
    area(L)*nL + area(R)*nR computed from true triangle-box unions;
  * kmeans-96: capacity-balanced Lloyd refinement seeded with kd-chop —
    per iteration assign tris to their nearest cluster centroid under a
    hard 96 capacity (greedy by regret), recenter, keep the best-cost
    iterate (cost = mean exact pair proxy: sum of cluster box areas).

Run: JAX_PLATFORMS=cpu python benchmarks/probe_cluster2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from probe_cluster import (
    cluster_boxes,
    kd_chop_clusters,
    measure,
)
from probe_tile_union import bounce_wave
from tpurt.bvh.paircluster import TRIS_PER_CLUSTER, flatten_world_tris
from tpurt.render import load_scene
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device


def _area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
        + d[..., 2] * d[..., 0]


def kd_sah_clusters(v0, v1, v2, size=TRIS_PER_CLUSTER, n_cand=5):
    """kd partition with SAH-chosen axis AND split position (both
    children's counts stay multiples of ``size``)."""
    centro = ((v0 + v1 + v2) / 3.0).astype(np.float64)
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    out = []
    stack = [np.arange(v0.shape[0])]
    while stack:
        s = stack.pop()
        if s.shape[0] <= size:
            out.append(s)
            continue
        c = centro[s]
        n_cl = s.shape[0] // size  # >= 1 full clusters
        # candidate split counts: multiples of size nearest the middle
        mid = max(1, int(round(n_cl / 2.0)))
        cands = sorted({
            max(1, min(n_cl, mid + d))
            for d in range(-(n_cand // 2), n_cand // 2 + 1)
        })
        best = None
        for ax in range(3):
            o = np.argsort(c[:, ax], kind="stable")
            so = s[o]
            # prefix/suffix box unions along the sorted order
            pre_lo = np.minimum.accumulate(pmin[so], axis=0)
            pre_hi = np.maximum.accumulate(pmax[so], axis=0)
            suf_lo = np.minimum.accumulate(pmin[so][::-1], axis=0)[::-1]
            suf_hi = np.maximum.accumulate(pmax[so][::-1], axis=0)[::-1]
            for m in cands:
                k = m * size
                if k >= s.shape[0]:
                    continue
                nl, nr = k, s.shape[0] - k
                cost = (_area(pre_lo[k - 1], pre_hi[k - 1]) * nl
                        + _area(suf_lo[k], suf_hi[k]) * nr)
                if best is None or cost < best[0]:
                    best = (cost, so[:k], so[k:])
        if best is None:  # degenerate: fall back to tail chop
            k = (s.shape[0] - 1) // size * size
            o = np.argsort(c[:, 0], kind="stable")
            so = s[o]
            best = (0.0, so[:k], so[k:])
        stack.append(best[1])
        stack.append(best[2])
    return out


def kmeans_refine(groups, v0, v1, v2, iters=8, topk=6):
    """Capacity-balanced Lloyd: keep every cluster at its seed size."""
    centro = ((v0 + v1 + v2) / 3.0)
    n = centro.shape[0]
    caps = np.array([len(g) for g in groups])
    C = len(groups)
    assign = np.empty(n, np.int32)
    for ci, g in enumerate(groups):
        assign[g] = ci
    best_assign, best_cost = assign.copy(), None
    for _ in range(iters):
        cen = np.zeros((C, 3))
        np.add.at(cen, assign, centro)
        cen /= caps[:, None]
        # top-k nearest clusters per tri (chunked: n x C doesn't fit)
        near = np.empty((n, topk), np.int32)
        nd = np.empty((n, topk), np.float32)
        cen32 = cen.astype(np.float32)
        c32 = centro.astype(np.float32)
        for s in range(0, n, 8192):
            e = min(s + 8192, n)
            d2 = ((c32[s:e, None, :] - cen32[None, :, :]) ** 2).sum(-1)
            nr = np.argpartition(d2, topk, axis=1)[:, :topk]
            dv = np.take_along_axis(d2, nr, axis=1)
            o = np.argsort(dv, axis=1)
            near[s:e] = np.take_along_axis(nr, o, axis=1)
            nd[s:e] = np.take_along_axis(dv, o, axis=1)
        # greedy by regret (2nd best - best, descending)
        regret = nd[:, 1] - nd[:, 0]
        order = np.argsort(-regret, kind="stable")
        left = caps.copy()
        new = np.full(n, -1, np.int32)
        for t in order:
            for ci in near[t]:
                if left[ci] > 0:
                    new[t] = ci
                    left[ci] -= 1
                    break
        # overflow tris (all topk full): keep old cluster if space,
        # else dump into any cluster with room
        un = np.where(new < 0)[0]
        for t in un:
            ci = assign[t]
            if left[ci] > 0:
                new[t] = ci
                left[ci] -= 1
        un = np.where(new < 0)[0]
        if un.size:
            room = np.repeat(np.arange(C), left)
            new[un] = room[: un.size]
        assign = new
        # cost proxy: sum of cluster box areas
        pmin = np.minimum(np.minimum(v0, v1), v2)
        pmax = np.maximum(np.maximum(v0, v1), v2)
        cost = 0.0
        for ci in range(C):
            m = assign == ci
            if m.any():
                cost += _area(pmin[m].min(0), pmax[m].max(0))
        if best_cost is None or cost < best_cost:
            best_cost, best_assign = cost, assign.copy()
    return [np.where(best_assign == ci)[0] for ci in range(C)]


def main():
    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    v0, v1, v2, _, _ = flatten_world_tris(ds, meta, scene)
    org, dirn, tmv, frac = bounce_wave(scene, ds, meta)
    print(f"wave: {org.shape[0]} rays ({100 * frac:.0f}% alive), "
          f"{v0.shape[0]} tris", flush=True)

    kd = kd_chop_clusters(v0, v1, v2)
    lo, hi = cluster_boxes(kd, v0, v1, v2)
    measure("kd-chop-96", lo, hi, org, dirn, tmv)

    sah = kd_sah_clusters(v0, v1, v2)
    sizes = np.array([len(g) for g in sah])
    print(f"  [kd-sah] sizes mean {sizes.mean():.0f} min {sizes.min()} "
          f"max {sizes.max()} C={len(sah)}", flush=True)
    lo, hi = cluster_boxes(sah, v0, v1, v2)
    measure("kd-sah-96", lo, hi, org, dirn, tmv)

    km = kmeans_refine(sah, v0, v1, v2)
    lo, hi = cluster_boxes(km, v0, v1, v2)
    measure("kmeans-96(sah)", lo, hi, org, dirn, tmv)

    km2 = kmeans_refine(kd, v0, v1, v2)
    lo, hi = cluster_boxes(km2, v0, v1, v2)
    measure("kmeans-96(kd)", lo, hi, org, dirn, tmv)


if __name__ == "__main__":
    main()
