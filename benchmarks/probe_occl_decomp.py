"""Decompose the trace/occlude stage costs on REAL bunny bench waves.

The round-3 xplane frame profile attributes ~600 ms of the 1.18 s bench
batch to the two bounce traces and ~460 ms to the three shade_occlude
stages — far above the expected cost of the exact-mask pair counts
(shadow waves match ~8 pairs/tile). This probe captures the actual
inter-stage waves from a bench-shape render (TPURT_CAPTURE_WAVES hook in
render/staged.py), then times each pipeline piece in isolation on the
TPU with xplane ground truth:

  keys+sort | pallas exact mask | expansion | kernel | restore

for each wave kind (bounce closest, shadow any-hit), plus the measured
exact pairs/tile so kernel time can be compared against its pair count.

Usage:
  python benchmarks/probe_occl_decomp.py --capture   # run once (slow)
  python benchmarks/probe_occl_decomp.py             # time the pieces
"""

import functools
import glob
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPDIR = "/tmp/tpurt_waves"


def capture():
    env = dict(os.environ)
    env["TPURT_CAPTURE_WAVES"] = CAPDIR
    code = (
        "from tpurt.render import render_scene\n"
        "from tpurt.utils.config import get_config\n"
        "c = get_config('bunny', spp=8, spp_per_batch=8)\n"
        "render_scene(c, readback_stats=False)\n"
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt.kernels import tilewave as tw
    from tpurt.render import build_accel
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.scene.loader import load_scene
    from tpurt.utils.config import get_config

    config = get_config("bunny", spp=8, spp_per_batch=8)
    scene = load_scene(config.scene)
    ds = to_device(scene)
    meta = scene_meta(scene)
    accel = build_accel(config, ds, meta, scene=scene)
    lo = jnp.asarray(accel.cluster_lo)
    hi = jnp.asarray(accel.cluster_hi)
    tri_rows = jnp.asarray(accel.tri_rows)
    C = int(accel.cluster_lo.shape[0])
    TILE = tw.TILE

    waves = {}
    for f in sorted(glob.glob(CAPDIR + "/*.npz")):
        name = os.path.basename(f)[: -len("_wave.npz")]
        waves[name] = dict(np.load(f))
    if not waves:
        print("no captured waves — run with --capture first")
        return 1

    def prep(w, shadow):
        org = jnp.asarray(w["org"])
        dirn = jnp.asarray(w["dirn"])
        n = org.shape[0]
        if shadow:
            tmv = jnp.asarray(w["tmax"])
            tmv = jnp.where(jnp.asarray(w["want"]), tmv, -1.0)
        else:
            tmv = jnp.where(jnp.asarray(w["alive"]), tw.BIG, -1.0)
        pad = (-n) % TILE
        if pad:
            org = jnp.concatenate([org, jnp.zeros((pad, 3), jnp.float32)])
            dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), jnp.float32)])
            tmv = jnp.concatenate([tmv, jnp.full(pad, -1.0, jnp.float32)])
        return org, dirn, tmv

    scene_lo = jnp.min(lo, axis=0)
    scene_hi = jnp.max(hi, axis=0)

    @jax.jit
    def keys_sort(org, dirn, tmv):
        keys = tw._octant_sort_keys(org, dirn, tmv, scene_lo, scene_hi)
        n = org.shape[0]
        out = jax.lax.sort(
            (keys, org[:, 0], org[:, 1], org[:, 2], dirn[:, 0],
             dirn[:, 1], dirn[:, 2], tmv,
             jnp.arange(n, dtype=jnp.int32)),
            num_keys=1,
        )
        return out[1:]

    @jax.jit
    def mask_fn(org, dirn, tmv):
        n_tiles = org.shape[0] // TILE
        return tw._exact_any_mask_pallas(org, dirn, tmv, lo, hi, n_tiles)

    def expansion_chunk(mask, tn_lower, keep, pcap):
        n_tiles, n_cl = mask.shape
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        counts = jnp.minimum(rank[:, -1], keep)
        off = jnp.minimum(
            jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(counts, dtype=jnp.int32)]), pcap)
        scene_diag = jnp.linalg.norm(scene_hi - scene_lo)
        tn_scale = jnp.maximum(scene_diag, 1e-12) / 32766.0
        tn_q = jnp.clip((jnp.maximum(tn_lower, 0.0) / tn_scale)
                        .astype(jnp.int32), 0, 32766)
        m = mask & (rank <= keep)
        tile_of = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
        cl_of = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
        entry = (tn_q << 16) | cl_of
        k_tile = jnp.where(m, tile_of, n_tiles).ravel()
        k_entry = jnp.where(m, entry, jnp.int32(2 ** 31 - 1)).ravel()
        _, pair_cl = jax.lax.sort((k_tile, k_entry), num_keys=2)
        return off, pair_cl[:pcap], counts.sum(dtype=jnp.int32), tn_scale

    CHUNK = tw.TILES_PER_LAUNCH
    cap_avg = max(config.pairs_avg, config.pairs_avg_bounce,
                  config.pairs_avg_shadow)
    pcap = min(CHUNK * min(cap_avg, C), tw.MAX_PAIRS_PER_LAUNCH)

    def pieces(tag, w, shadow):
        org, dirn, tmv = prep(w, shadow)
        n = org.shape[0]
        n_tiles = n // TILE
        print(f"\n== {tag}: n={n} tiles={n_tiles} "
              f"alive={float(jnp.sum(tmv >= 0)):.0f}")

        def t(name, fn, *args, iters=3):
            out = jax.block_until_ready(fn(*args))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jax.block_until_ready(fn(*args))
            print(f"  {name:28s} {(time.perf_counter() - t0) / iters * 1e3:8.1f} ms",
                  flush=True)
            return out

        sorted_ = t("keys+fwd sort", keys_sort, org, dirn, tmv)
        org_s = jnp.stack(sorted_[0:3], axis=1)
        dir_s = jnp.stack(sorted_[3:6], axis=1)
        tmv_s = sorted_[6]
        rk = sorted_[7]

        # chunked mask (production shape: 15 x 256-tile launches)
        nchunks = -(-n_tiles // CHUNK)
        padt = nchunks * CHUNK * TILE - n
        if padt:
            org_s = jnp.concatenate(
                [org_s, jnp.zeros((padt, 3), jnp.float32)])
            dir_s = jnp.concatenate(
                [dir_s, jnp.ones((padt, 3), jnp.float32)])
            tmv_s = jnp.concatenate(
                [tmv_s, jnp.full(padt, -1.0, jnp.float32)])

        @jax.jit
        def mask_all(org, dirn, tmv):
            outs = []
            for k in range(nchunks):
                s = k * CHUNK * TILE
                e = s + CHUNK * TILE
                outs.append(tw._exact_any_mask_pallas(
                    org[s:e], dirn[s:e], tmv[s:e], lo, hi, CHUNK))
            return ([o[0] for o in outs], [o[1] for o in outs])

        masks, tns = t("pallas exact mask (chunked)", mask_all,
                       org_s, dir_s, tmv_s)
        total_pairs = sum(float(jnp.sum(m)) for m in masks)
        live_tiles = sum(float(jnp.sum(jnp.any(m, 1))) for m in masks)
        print(f"  exact pairs total {total_pairs:.0f} "
              f"({total_pairs / n_tiles:.1f}/tile; live tiles "
              f"{live_tiles:.0f})")

        @jax.jit
        def expand_all(masks, tns):
            return [expansion_chunk(m, t_, C, pcap)
                    for m, t_ in zip(masks, tns)]

        exp = t("expansion (chunked)", expand_all, masks, tns)

        any_hit = shadow

        @jax.jit
        def kernel_all(exp, org, dirn, tmv):
            outs = []
            for k in range(nchunks):
                off, pair_cl, npair, tn_scale = exp[k]
                s = k * CHUNK * TILE
                e = s + CHUNK * TILE
                outs.append(tw._launch_tiles_loop(
                    off, pair_cl, org[s:e], dirn[s:e], tmv[s:e],
                    tri_rows, n_tiles=CHUNK, interpret=False,
                    any_hit=any_hit, n_pairs=npair,
                    overflow=jnp.zeros((), bool), pair_meta=None,
                    inv_xform=None, tn_scale=tn_scale))
            return outs

        outs = t("kernel (pair loop, chunked)", kernel_all, exp,
                 org_s, dir_s, tmv_s)

        @jax.jit
        def restore(rk, bs):
            return jax.lax.sort((rk, bs), num_keys=1)[1]

        bs_all = jnp.concatenate([o[3] for o in outs])[:n]
        t("restore sort (2-op)", restore, rk, bs_all)

    order = ["bounce1", "bounce2", "shadow0", "shadow1", "shadow2"]
    prof = "/tmp/tpurt_occlprof"
    with jax.profiler.trace(prof):
        for name in order:
            if name in waves:
                pieces(name, waves[name], name.startswith("shadow"))

    pb = sorted(glob.glob(prof + "/**/*.xplane.pb", recursive=True),
                key=os.path.getmtime)
    if pb:
        print("\n== xplane device times")
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "xplane_summary.py"), pb[-1], "30"])
    return 0


if __name__ == "__main__":
    if "--capture" in sys.argv:
        capture()
        print("captured to", CAPDIR)
    else:
        sys.exit(main())
