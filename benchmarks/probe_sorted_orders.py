"""Pair/tile structure of the captured bunny bench waves under the
SORTED-WAVE pipeline's orderings (round-3 design probe).

The sorted-wave pipeline (render/staged.py) traces each bounce wave in
its own octant order (identical to today's in-intersector sort) but
traces SHADOW waves in the bounce wave's order instead of giving them
their own octant sort+restore (~33 ms/trace of lax.sort machinery). The
question this probe answers from the captured waves
(benchmarks/probe_occl_decomp.py --capture):

  for each wave and ordering, how many EXACT (tile, cluster) pairs and
  live tiles does the traversal actually see? orderings:
    pixel   — raw wave order (today's shadow0; screen-tile coherent)
    octant  — own octant sort (today's production bounce/shadow order)
    bounce  — the owning bounce wave's octant order (sorted-mode shadows)
    bounce+trunc — same, after truncating the bounce wave at its live
                   count rounded to a tile multiple (live-cap truncation)

Run on TPU: python benchmarks/probe_sorted_orders.py
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPDIR = "/tmp/tpurt_waves"


def main():
    import jax
    import jax.numpy as jnp

    from tpurt.kernels import tilewave as tw
    from tpurt.render import build_accel
    from tpurt.scene.loader import load_scene
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.utils.config import get_config

    config = get_config("bunny", spp=8, spp_per_batch=8)
    scene = load_scene(config.scene)
    ds = to_device(scene)
    meta = scene_meta(scene)
    accel = build_accel(config, ds, meta, scene=scene)
    lo = jnp.asarray(accel.cluster_lo)
    hi = jnp.asarray(accel.cluster_hi)
    scene_lo = jnp.min(lo, axis=0)
    scene_hi = jnp.max(hi, axis=0)
    TILE = tw.TILE

    waves = {}
    for f in sorted(glob.glob(CAPDIR + "/*.npz")):
        name = os.path.basename(f)[: -len("_wave.npz")]
        waves[name] = dict(np.load(f))
    if not waves:
        print("no captured waves — run probe_occl_decomp.py --capture")
        return 1

    def tmv_of(w, shadow):
        if shadow:
            return np.where(w["want"], w["tmax"], -1.0).astype(np.float32)
        return np.where(w["alive"], tw.BIG, -1.0).astype(np.float32)

    @jax.jit
    def octant_keys(org, dirn, tmv):
        return tw._octant_sort_keys(org, dirn, tmv, scene_lo, scene_hi)

    def measure(tag, org, dirn, tmv):
        n = org.shape[0]
        pad = (-n) % TILE
        if pad:
            org = np.concatenate([org, np.zeros((pad, 3), np.float32)])
            dirn = np.concatenate([dirn, np.ones((pad, 3), np.float32)])
            tmv = np.concatenate([tmv, np.full(pad, -1.0, np.float32)])
        n_tiles = org.shape[0] // TILE
        CH = tw.TILES_PER_LAUNCH
        nch = -(-n_tiles // CH)
        padt = nch * CH * TILE - org.shape[0]
        if padt:
            org = np.concatenate([org, np.zeros((padt, 3), np.float32)])
            dirn = np.concatenate([dirn, np.ones((padt, 3), np.float32)])
            tmv = np.concatenate([tmv, np.full(padt, -1.0, np.float32)])

        @jax.jit
        def count(org, dirn, tmv):
            pairs = jnp.zeros((), jnp.float32)
            live = jnp.zeros((), jnp.float32)
            for k in range(nch):
                s = k * CH * TILE
                e = s + CH * TILE
                m, _ = tw._exact_any_mask_pallas(
                    org[s:e], dirn[s:e], tmv[s:e], lo, hi, CH
                )
                pairs += jnp.sum(m.astype(jnp.float32))
                live += jnp.sum(jnp.any(m, axis=1).astype(jnp.float32))
            return pairs, live

        p, lt = jax.block_until_ready(
            count(jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv))
        )
        print(f"  {tag:18s} tiles={n_tiles:5d} live_tiles={float(lt):7.0f} "
              f"pairs={float(p):9.0f} ({float(p) / n_tiles:7.1f}/tile)",
              flush=True)

    def order_by(keys, *arrs):
        perm = np.argsort(np.asarray(keys), kind="stable")
        return [a[perm] for a in arrs]

    for b in (1, 2):
        bw = waves.get(f"bounce{b}")
        sw = waves.get(f"shadow{b}")
        if bw is None:
            continue
        borg = bw["org"].astype(np.float32)
        bdir = bw["dirn"].astype(np.float32)
        btm = tmv_of(bw, shadow=False)
        bkeys = np.asarray(octant_keys(borg, bdir, btm))
        print(f"\n== bounce{b} (live {int((btm >= 0).sum())})")
        measure("octant", *order_by(bkeys, borg, bdir, btm))
        live = int((btm >= 0).sum())
        cap = -(-live // TILE) * TILE
        o2, d2, t2 = order_by(bkeys, borg, bdir, btm)
        measure("octant+trunc", o2[:cap], d2[:cap], t2[:cap])
        if sw is not None:
            sorg = sw["org"].astype(np.float32)
            sdir = sw["dirn"].astype(np.float32)
            stm = tmv_of(sw, shadow=True)
            print(f"== shadow{b} (want {int((stm >= 0).sum())})")
            measure("octant", *order_by(
                np.asarray(octant_keys(sorg, sdir, stm)), sorg, sdir, stm))
            measure("bounce-order", *order_by(bkeys, sorg, sdir, stm))
            so2, sd2, st2 = order_by(bkeys, sorg, sdir, stm)
            measure("bounce+trunc", so2[:cap], sd2[:cap], st2[:cap])

    sw0 = waves.get("shadow0")
    if sw0 is not None:
        sorg = sw0["org"].astype(np.float32)
        sdir = sw0["dirn"].astype(np.float32)
        stm = tmv_of(sw0, shadow=True)
        print(f"\n== shadow0 (want {int((stm >= 0).sum())})")
        measure("pixel (sorted-mode)", sorg, sdir, stm)
        measure("octant", *order_by(
            np.asarray(octant_keys(sorg, sdir, stm)), sorg, sdir, stm))
    return 0


if __name__ == "__main__":
    sys.exit(main())
