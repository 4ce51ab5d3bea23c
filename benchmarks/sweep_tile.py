"""Tile-wavefront kernel throughput on the real TPU (vs sweep_packet/_pair).

Bunny geometry, coherent camera rays + shuffled rays, closest-hit Mrays/s
and (tile,cluster) pair counts.

  python benchmarks/sweep_tile.py [--pairs-per-tile 96] [--reps 5]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs-per-tile", type=int, default=96)
    ap.add_argument("--pairs-avg", type=int, default=0)
    ap.add_argument("--sort", default="none")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scene", default="bunny")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt.bvh.paircluster import build_pair_accel
    from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
    from tpurt.kernels.tilewave import make_tile_intersector
    from tpurt.render import load_scene
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.utils.config import get_config

    cfg = get_config(args.scene, width=args.width, height=args.height)
    scene = load_scene(cfg.scene)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    n_clusters = accel.n_clusters
    accel = jax.device_put(accel)

    w, h = cfg.width, cfg.height
    px, py = full_frame_pixels_tiled(w, h)
    org_np, dir_np = camera_rays(scene.camera, np.asarray(px),
                                 np.asarray(py), w, h)
    org_np = np.asarray(org_np)
    dir_np = np.asarray(dir_np)
    n = org_np.shape[0]
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    dir_inc = dir_np[perm]
    org_inc = org_np[perm[::-1]]
    # bounce-like: origins stay tile-coherent (hit points of their pixel
    # tile), directions random — the realistic e2e incoherent case
    dir_bnc = dir_np[perm]
    org_bnc = org_np

    @jax.jit
    def run(accel_dev, org, dirn):
        c, _ = make_tile_intersector(
            ds, accel_dev, pairs_per_tile=args.pairs_per_tile,
            pairs_avg=args.pairs_avg, ray_sort=args.sort,
        )
        hit, stats = c.with_stats(org, dirn, 0.0, jnp.inf)
        return hit.t, stats

    results = {"n_rays": n, "n_clusters": int(n_clusters),
               "pairs_per_tile": args.pairs_per_tile, "sort": args.sort}
    pend = {}
    for name, (o, d) in (("coherent", (org_np, dir_np)),
                         ("bounce_like", (org_bnc, dir_bnc)),
                         ("incoherent", (org_inc, dir_inc))):
        o = jax.device_put(jnp.asarray(o))
        d = jax.device_put(jnp.asarray(d))
        t, stats = run(accel, o, d)
        jax.block_until_ready((t, stats))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            t, stats = run(accel, o, d)
        jax.block_until_ready((t, stats))
        dt = (time.perf_counter() - t0) / args.reps
        results[name] = {"mrays": n / dt / 1e6, "s": dt}
        pend[name] = stats

    for name, st in pend.items():  # D2H after all timing (axon poison)
        st = np.asarray(jax.device_get(st))
        results[name]["pairs"] = float(st[0])
        results[name]["overflow"] = float(st[1])
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
