"""CPU probe: ray-TILE size sweep under the EXACT any mask.

The old TILE=2048 hardware A/B was a wash, but it predates the exact
Pallas mask: back then wider tiles paid conservative-union growth in
REAL kernel pairs. With exact-ANY pairs the tradeoff changes shape:

  bigger T: fewer (tile, cluster) pairs per ray (any-hit dilution is
            sublinear), better amortization of the ~135 ns of scalar
            extracts per 12-tri MT row (they are per-row, not per-ray)
            and of per-pair machinery/pre-test scalars;
  smaller T: fewer wasted ray-lanes per pair (vector op cost scales
            with T), tighter far-break keys.

This replays the exact pruning ladder on real bunny bounce/shadow waves
for T in {512, 1024, 2048, 4096} with the measured cost model, charging
vector work prop. to T/1024 and scalar work per pair/row:

  machinery+pre-test   92 ns/pair          (scalar)
  row-box              35 ns/row * T/1024  (vector)
  MT row               135 ns (extracts, scalar) + 45 ns * T/1024 (issue)
  exact mask           ~2 ns * C per 128-ray row  (T-invariant per ray)

Run: JAX_PLATFORMS=cpu python benchmarks/probe_tile_size.py [n_rays_sampled]
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

TPC = 96
NS = dict(pair=92.0, rowbox=35.0, mt_scalar=135.0, mt_issue=45.0)


def slab_hits(lo, hi, o, iv, far):
    """(R,) bool per-ray slab hit against one box."""
    t0 = (lo[None] - o) * iv
    t1 = (hi[None] - o) * iv
    tn = np.minimum(t0, t1).max(axis=1)
    tf = np.maximum(t0, t1).min(axis=1)
    return (tn <= np.minimum(tf, far)) & (far >= 0.0)


def main(max_rays=64 * 1024):
    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    v0, v1, v2, _, _ = flatten_world_tris(ds, meta, scene)
    order = kd_cluster_order(v0, v1, v2, sah=True)
    v0, v1, v2 = v0[order], v1[order], v2[order]
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    n = v0.shape[0]
    C = -(-n // TPC)
    lo = np.stack([pmin[c * TPC:(c + 1) * TPC].min(0) for c in range(C)])
    hi = np.stack([pmax[c * TPC:(c + 1) * TPC].max(0) for c in range(C)])
    rlo = np.full((C * 8, 3), np.inf)
    rhi = np.full((C * 8, 3), -np.inf)
    for c in range(C):
        idx = np.arange(c * TPC, min(c * TPC + TPC, n))
        sub = kd_cluster_order(v0[idx], v1[idx], v2[idx], size=12,
                               sah=True)
        idx = idx[sub]
        for r in range(8):
            ri = idx[r * 12:(r + 1) * 12]
            if len(ri):
                rlo[c * 8 + r] = pmin[ri].min(0)
                rhi[c * 8 + r] = pmax[ri].max(0)

    org, dirn, tmv, _ = bounce_wave(scene, ds, meta)
    keys = np.asarray(tw._octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(lo.min(0)), jnp.asarray(hi.max(0))))
    o_ = np.argsort(keys, kind="stable")
    org, dirn, tmv = org[o_], dirn[o_], tmv[o_]
    if org.shape[0] > max_rays:
        org, dirn, tmv = (a[:max_rays] for a in (org, dirn, tmv))
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn >= 0, 1e-12, -1e-12), dirn)
    N = org.shape[0]
    print(f"rays={N} clusters={C} (bunny bounce wave, octant-sorted)")

    # per-ray exact cluster hits once; tiles then aggregate bitwise
    hits = np.zeros((N, C), bool)
    far = np.where(tmv >= 0, tmv, -1.0)
    for c in range(C):
        hits[:, c] = slab_hits(lo[c], hi[c], org, inv, far)

    for T in (512, 1024, 2048, 4096):
        n_tiles = N // T
        pairs = rows_pass = rows_tested = 0
        vec = T / 1024.0
        for t in range(n_tiles):
            s = t * T
            any_c = hits[s:s + T].any(axis=0)
            cs = np.where(any_c)[0]
            pairs += len(cs)
            for c in cs:
                for r in range(8):
                    rows_tested += 1
                    if slab_hits(rlo[c * 8 + r], rhi[c * 8 + r],
                                 org[s:s + T], inv[s:s + T],
                                 far[s:s + T]).any():
                        rows_pass += 1
        cost = (pairs * NS["pair"]
                + rows_tested * NS["rowbox"] * vec
                + rows_pass * (NS["mt_scalar"] + NS["mt_issue"] * vec))
        per_ray = cost / (n_tiles * T)
        print(f"T={T:5d}: pairs/tile={pairs / n_tiles:7.1f} "
              f"pairs/ray={pairs * T / (n_tiles * T):.0f} "
              f"rows pass={rows_pass / max(rows_tested, 1) * 100:4.1f}% "
              f"kernel {cost / n_tiles / 1e3:7.1f} us/tile "
              f"= {per_ray:6.2f} ns/ray")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64 * 1024)
