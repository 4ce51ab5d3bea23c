"""CPU probe: cluster-quality variants vs pair counts on a real wave.

The tile kernel's cost is ~ frustum_pairs · c_machinery +
exact_pass_pairs · c_rows (PARITY.md session-4 decomposition). Both
terms scale with how tight the per-cluster AABBs are. The production
builder chops the Morton-sorted triangle order into uniform runs of 96
(tpurt/bvh/paircluster.py) — Morton runs jump diagonally at code
boundaries, so their boxes overlap heavily. This probe measures, on the
same real bunny bounce wave as probe_perray.py, the per-tile frustum and
exact-ANY pair counts for:

  * morton-chop-96 (production);
  * median-split treelets (recursive widest-axis centroid median until
    <= 96 tris, cluster order = Morton of centroid; sizes in (48, 96]
    pad to the fixed 8-row stride);
  * SAH-greedy cuts along the Morton order (cut when the accumulated
    run's surface area stops paying for fewer clusters).

Run: JAX_PLATFORMS=cpu python benchmarks/probe_cluster.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from probe_tile_union import bounce_wave  # noqa: E402 (sibling import)
from tpurt.bvh.cluster import _morton
from tpurt.bvh.paircluster import TRIS_PER_CLUSTER, flatten_world_tris
from tpurt.kernels import tilewave as tw
from tpurt.render import load_scene
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device

TILE = 1024


def chop_clusters(v0, v1, v2, size=TRIS_PER_CLUSTER):
    t = v0.shape[0]
    return [np.arange(s, min(s + size, t)) for s in range(0, t, size)]


def median_split_clusters(v0, v1, v2, max_tris=TRIS_PER_CLUSTER):
    centro = ((v0 + v1 + v2) / 3.0).astype(np.float64)
    out = []
    stack = [np.arange(v0.shape[0])]
    while stack:
        s = stack.pop()
        if s.shape[0] <= max_tris:
            out.append(s)
            continue
        c = centro[s]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        m = s.shape[0] // 2
        part = np.argpartition(c[:, ax], m)
        stack.append(s[part[:m]])
        stack.append(s[part[m:]])
    return out


def kd_chop_clusters(v0, v1, v2, size=TRIS_PER_CLUSTER):
    """Recursive widest-axis partition with split counts that are
    multiples of ``size``: every cluster is exactly ``size`` tris (bar
    the last), so C and memory match morton-chop while the boxes are
    kd-tight."""
    centro = ((v0 + v1 + v2) / 3.0).astype(np.float64)
    out = []
    stack = [np.arange(v0.shape[0])]
    while stack:
        s = stack.pop()
        if s.shape[0] <= size:
            out.append(s)
            continue
        c = centro[s]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        n_cl = s.shape[0] / size
        k = max(1, int(round(n_cl / 2.0))) * size
        if k >= s.shape[0]:
            k = (s.shape[0] - 1) // size * size
        part = np.argpartition(c[:, ax], k)
        stack.append(s[part[:k]])
        stack.append(s[part[k:]])
    return out


def sah_morton_cuts(v0, v1, v2, max_tris=TRIS_PER_CLUSTER):
    """Greedy cuts along the (already Morton-sorted) order: start a new
    cluster when the running box's half-area grew by more than the
    per-cluster fixed cost would amortize."""
    t = v0.shape[0]
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    out = []
    s = 0
    while s < t:
        e = min(s + max_tris, t)
        lo = pmin[s].copy()
        hi = pmax[s].copy()

        def area(l, h):
            d = h - l
            return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

        best_j, best_cost = e, None
        a0 = None
        for j in range(s + 1, e + 1):
            if j < e:
                np.minimum(lo, pmin[j], out=lo)
                np.maximum(hi, pmax[j], out=hi)
            n_in = j - s
            a = area(lo, hi)
            if a0 is None:
                a0 = a
            # cost per tri of ending the cluster at j: box area grows,
            # but fixed per-cluster cost (machinery) amortizes over n_in
            cost = a / n_in + a0 * (max_tris / n_in - 1.0) * 0.02
            if best_cost is None or cost < best_cost:
                best_cost, best_j = cost, j
        # never emit tiny clusters unless at the end
        best_j = max(best_j, min(s + 24, t))
        out.append(np.arange(s, best_j))
        s = best_j
    return out


def cluster_boxes(groups, v0, v1, v2):
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    lo = np.stack([pmin[g].min(0) for g in groups])
    hi = np.stack([pmax[g].max(0) for g in groups])
    # order clusters by Morton of centroid (locality of ids)
    cen = (lo + hi) * 0.5
    order = np.argsort(
        _morton(cen, cen.min(0), cen.max(0)), kind="stable"
    )
    return lo[order].astype(np.float32), hi[order].astype(np.float32)


def measure(name, lo, hi, org, dirn, tmv):
    n = org.shape[0]
    C = lo.shape[0]
    slo, shi = lo.min(0), hi.max(0)
    keys = np.asarray(tw._octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(slo), jnp.asarray(shi)))
    order = np.argsort(keys, kind="stable")
    org, dirn, tmv = org[order], dirn[order], tmv[order]
    n_tiles = n // TILE
    mask = np.asarray(tw._tile_mask(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(lo), jnp.asarray(hi), n_tiles))
    frustum = mask.sum(1)
    # exact-ANY per tile (chunked numpy)
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn >= 0, 1e-12, -1e-12), dirn)
    exact = np.zeros((n_tiles, C), bool)
    for ti in range(n_tiles):
        s = ti * TILE
        oc = org[s:s + TILE, None]
        ic = inv[s:s + TILE, None]
        alive = (tmv[s:s + TILE] >= 0)[:, None]
        t0 = (lo[None] - oc) * ic
        t1 = (hi[None] - oc) * ic
        tn = np.max(np.minimum(t0, t1), axis=-1)
        tf = np.min(np.maximum(t0, t1), axis=-1)
        exact[ti] = ((tn <= tf) & (tf >= 0) & alive).any(0)
    ex = exact.sum(1)
    # per-cluster triangle rows (fixed 8-row stride → kernel row count
    # is the same per passing pair; memory scales with C)
    print(f"{name:18s} C={C:5d} frustum/tile {frustum.mean():7.1f} "
          f"exact-ANY/tile {ex.mean():7.1f} "
          f"area {((hi - lo).prod(1) ** (1 / 3)).mean():.4f}")
    return frustum.mean(), ex.mean()


def main():
    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    v0, v1, v2, _, _ = flatten_world_tris(ds, meta, scene)
    org, dirn, tmv, frac = bounce_wave(scene, ds, meta)
    print(f"wave: {org.shape[0]} rays ({100 * frac:.0f}% alive), "
          f"{v0.shape[0]} tris")
    for name, fn in [
        ("morton-chop-96", chop_clusters),
        ("median-split-96", median_split_clusters),
        ("kd-chop-96", kd_chop_clusters),
        ("sah-morton", sah_morton_cuts),
    ]:
        groups = fn(v0, v1, v2)
        sizes = np.array([len(g) for g in groups])
        lo, hi = cluster_boxes(groups, v0, v1, v2)
        print(f"  [{name}] sizes mean {sizes.mean():.0f} "
              f"min {sizes.min()} max {sizes.max()}")
        measure(name, lo, hi, org, dirn, tmv)


if __name__ == "__main__":
    main()
