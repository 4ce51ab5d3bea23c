"""How much does conservative bf16 widening inflate row-box pass rates?

probe_bf16_vpu.py measured bf16 min/max+fma at 1.74-2.2x f32 VPU
throughput — the row-box slab test could halve IF run in bf16 with
conservatively widened bounds (round boxes outward, absorb the ~2^-8
relative error of bf16 o/iv arithmetic as a slab margin). A pre-test
is only sound if widened-pass ⊇ exact-pass, and only PROFITABLE if the
extra passes are rare. This sim replays the bunny bounce-wave row
ladder (probe_kernel_sim.main_rows machinery) with slab margins
m ∈ {0, 0.5%, 1.5%, 3%} and reports the pass-rate inflation.

Run: JAX_PLATFORMS=cpu python benchmarks/probe_bf16_widen.py [n_tiles]
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
TPC = 96  # tris per cluster


def slab_any_margin(lo, hi, o, iv, far, m):
    """ANY-lane slab with relative margin m on entry/exit (the bf16
    error model: |t0,t1 error| <= ~3 ulps of bf16 ~ 1.2% relative)."""
    t0 = (lo[None] - o) * iv
    t1 = (hi[None] - o) * iv
    tn = np.minimum(t0, t1).max(axis=1)
    tf = np.maximum(t0, t1).min(axis=1)
    scale = np.maximum(np.abs(tn), np.abs(tf))
    return bool(np.any(
        (tn - m * scale <= np.minimum(tf + m * scale, far))
        & (far >= 0.0)
    ))


def main(n_sample=16):
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
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn >= 0, 1e-12, -1e-12), dirn)
    rng = np.random.default_rng(0)
    n_tiles = org.shape[0] // TILE
    alive = [t for t in range(n_tiles)
             if (tmv[t * TILE:(t + 1) * TILE] >= 0).sum() > 256]
    sample = rng.choice(alive, min(n_sample, len(alive)), replace=False)

    margins = [0.0, 0.005, 0.015, 0.03]
    tested = 0
    passed = {m: 0 for m in margins}
    for ti in sample:
        s = ti * TILE
        o = org[s:s + TILE]
        iv = inv[s:s + TILE]
        bt = np.where(tmv[s:s + TILE] >= 0, tmv[s:s + TILE], -1.0)
        hitc = [c for c in range(C)
                if slab_any_margin(lo[c], hi[c], o, iv, bt, 0.0)]
        for c in hitc:
            for r in range(8):
                tested += 1
                for m in margins:
                    if slab_any_margin(rlo[c * 8 + r], rhi[c * 8 + r],
                                       o, iv, bt, m):
                        passed[m] += 1
    base = passed[0.0]
    print(f"tiles={len(sample)} row-tests={tested}")
    for m in margins:
        print(f"margin={m * 100:4.1f}%: pass={passed[m]} "
              f"({100 * passed[m] / tested:.2f}%) "
              f"inflation=+{100 * (passed[m] - base) / max(base, 1):.2f}%")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
