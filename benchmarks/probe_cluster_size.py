"""CPU probe: cluster SIZE sweep under the measured kernel cost model.

The production tile kernel uses 96-tri clusters (8 rows of 12). Smaller
clusters mean tighter boxes (fewer rays-per-tile pay for unneeded
triangle rows) but more pairs (more per-pair machinery + pre-tests +
mask/expansion cost, which scale with C); bigger clusters amortize
machinery over more rows but drag more MT row work per surviving pair.

For sizes {48, 96, 192} this replays the kernel's exact pruning ladder
(front-to-back exact pairs, far break, best-t-limited pre-test, per-row
sub-box tests, MT updates) on real bunny bounce/shadow waves and scores
each size with the measured per-op costs:

    pair machinery  ~62 ns   (250 ns/while-iter at unroll 4)
    exact pre-test  ~30 ns   (26-op far-limited slab)
    row-box test    ~35 ns
    MT row          ~180 ns  (12 tris, extract/issue-bound)
    mask            ~16 VPU ops x C per tile (Pallas exact mask)

Run: JAX_PLATFORMS=cpu python benchmarks/probe_cluster_size.py [n_tiles]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from probe_tile_union import bounce_wave
from tpurt.bvh.paircluster import kd_cluster_order, flatten_world_tris
from tpurt.kernels import tilewave as tw
from tpurt.render import load_scene
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device

TILE = 1024
NS = dict(pair=62.0, pre=30.0, rowbox=35.0, mtrow=180.0)
MASK_NS_PER_C = 16.0 / 8.0  # 16 VPU ops per (ray,cluster) / 8 sublanes
                            # -> per tile-row-of-128: ~2 ns per cluster


def slab_any(lo, hi, o, iv, far):
    t0 = (lo[None] - o) * iv
    t1 = (hi[None] - o) * iv
    tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
    tf = np.minimum(np.maximum(t0, t1).min(-1), far)
    return bool(((tn <= tf) & (far >= 0)).any())


def mt_best(v0, v1, v2, o, d, bt):
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d[:, None], e2[None])
    det = (e1[None] * p).sum(-1)
    ok = np.abs(det) > 1e-12
    inv = 1.0 / np.where(ok, det, 1.0)
    tv = o[:, None] - v0[None]
    u = (tv * p).sum(-1) * inv
    q = np.cross(tv, e1[None])
    v = (d[:, None] * q).sum(-1) * inv
    t = (e2[None] * q).sum(-1) * inv
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
    t = np.where(ok, t, np.inf)
    return np.minimum(bt, t.min(1))


def ladder(size, v0, v1, v2, org, dirn, inv, tmv, sample, diag):
    order = kd_cluster_order(v0, v1, v2, size=size, sah=True)
    w0, w1, w2 = v0[order], v1[order], v2[order]
    n = w0.shape[0]
    C = -(-n // size)
    rows_per = size // 12
    # kd-sah within-cluster row order (as production), folded into one
    # global permutation so rows are consecutive 12-runs
    perm = np.arange(n)
    for c in range(C):
        idx = np.arange(c * size, min((c + 1) * size, n))
        sub = kd_cluster_order(w0[idx], w1[idx], w2[idx], size=12,
                               sah=True)
        perm[c * size:c * size + len(idx)] = idx[sub]
    w0, w1, w2 = w0[perm], w1[perm], w2[perm]
    pmin = np.minimum(np.minimum(w0, w1), w2)
    pmax = np.maximum(np.maximum(w0, w1), w2)
    lo = np.stack([pmin[c * size:(c + 1) * size].min(0)
                   for c in range(C)])
    hi = np.stack([pmax[c * size:(c + 1) * size].max(0)
                   for c in range(C)])
    rlo = np.full((C * rows_per, 3), np.inf)
    rhi = np.full((C * rows_per, 3), -np.inf)
    for g in range(C * rows_per):
        ri = np.arange(g * 12, min((g + 1) * 12, n))
        if len(ri):
            rlo[g] = pmin[ri].min(0)
            rhi[g] = pmax[ri].max(0)

    scale = diag / 32766.0
    agg = dict(pairs=0.0, execd=0.0, pre_kill=0.0, survive=0.0,
               rows_pass=0.0, tiles=0)
    for ti in sample:
        s = ti * TILE
        o = org[s:s + TILE]
        d = dirn[s:s + TILE]
        iv = inv[s:s + TILE]
        bt = np.where(tmv[s:s + TILE] >= 0, tmv[s:s + TILE], -1.0)
        t0 = (lo[:, None] - o[None]) * iv[None]
        t1 = (hi[:, None] - o[None]) * iv[None]
        tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
        tf = np.minimum(np.maximum(t0, t1).min(-1), bt[None])
        hit_any = ((tn <= tf) & (bt[None] >= 0)).any(1)
        tn_lo = np.where(hit_any, tn.min(1), np.inf)
        cl = np.where(hit_any)[0]
        eq = np.floor(np.maximum(tn_lo[cl], 0) / scale)
        ordr = np.argsort(eq, kind="stable")
        cl = cl[ordr]
        deqs = eq[ordr] * scale
        agg["tiles"] += 1
        agg["pairs"] += len(cl)
        for c, deq in zip(cl, deqs):
            if np.all(bt < deq):
                break
            agg["execd"] += 1
            if not slab_any(lo[c], hi[c], o, iv, bt):
                agg["pre_kill"] += 1
                continue
            agg["survive"] += 1
            rb = c * rows_per
            for r in range(rows_per):
                if not slab_any(rlo[rb + r], rhi[rb + r], o, iv, bt):
                    continue
                agg["rows_pass"] += 1
                ri = slice((rb + r) * 12,
                           min((rb + r + 1) * 12, w0.shape[0]))
                if ri.start < ri.stop:
                    bt = mt_best(w0[ri], w1[ri], w2[ri], o, d, bt)
    T = agg["tiles"]
    ex, pk, sv, rp = (agg[k] / T for k in
                      ("execd", "pre_kill", "survive", "rows_pass"))
    kern_ns = (ex * NS["pair"] + ex * NS["pre"]
               + sv * rows_per * NS["rowbox"] + rp * NS["mtrow"])
    mask_ns = C * MASK_NS_PER_C * 8  # 8 ray rows per tile
    print(f"  size={size:4d} C={C:5d} pairs/tile={agg['pairs']/T:7.1f} "
          f"exec={ex:6.1f} prekill={pk:6.1f} survive={sv:6.1f} "
          f"rows_pass={rp:6.1f}  kernel~{kern_ns/1000:6.1f}us/tile "
          f"mask~{mask_ns/1000:5.1f}us/tile total~"
          f"{(kern_ns + mask_ns)/1000:6.1f}us/tile")
    return kern_ns + mask_ns


def main(n_sample=16):
    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    v0, v1, v2, _, _ = flatten_world_tris(ds, meta, scene)
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    slo_, shi_ = pmin.min(0), pmax.max(0)
    diag = float(np.linalg.norm(shi_ - slo_))

    org, dirn, tmv, _ = bounce_wave(scene, ds, meta)
    keys = np.asarray(tw._octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(slo_), jnp.asarray(shi_)))
    o_ = np.argsort(keys, kind="stable")
    org, dirn, tmv = org[o_], dirn[o_], tmv[o_]
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn >= 0, 1e-12, -1e-12), dirn)
    texit = np.maximum((slo_[None] - org) * inv,
                       (shi_[None] - org) * inv).min(1)
    tmv = np.where(tmv >= 0,
                   np.minimum(tmv, texit * 1.0001 + 1e-4 * diag), tmv)

    n_tiles = org.shape[0] // TILE
    rng = np.random.default_rng(0)
    alive = [t for t in range(n_tiles)
             if (tmv[t * TILE:(t + 1) * TILE] >= 0).sum() > 256]
    sample = rng.choice(alive, min(n_sample, len(alive)), replace=False)

    print(f"bunny bounce wave, {len(sample)} sampled tiles:")
    for size in (48, 96, 192):
        ladder(size, v0, v1, v2, org, dirn, inv, tmv, sample, diag)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
