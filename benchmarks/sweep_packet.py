"""Raw packet-kernel throughput sweep on the real TPU.

Measures closest-hit trace Mrays/s on the bunny geometry for the current
TPURT_PACKET_SIZE / TPURT_ILEAVE / sort settings, on two ray sets:
  - coherent: primary camera rays (the best case packets are designed for)
  - incoherent: camera rays with shuffled directions (bounce-ray stand-in)
Also reports the traversal counters (node steps, leaf rows) so per-step
latency can be derived.

Run one config per process (module-level PACKET/ILEAVE):
  TPURT_PACKET_SIZE=2048 TPURT_ILEAVE=1 python benchmarks/sweep_packet.py \
      [--sort octant|morton|none] [--n-rays N]
Parent sweep mode:
  python benchmarks/sweep_packet.py --sweep
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt.bvh.cluster import build_packet_accel
    from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
    from tpurt.kernels.packet import make_packet_intersector
    from tpurt.render import load_scene
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.utils.config import get_config

    cfg = get_config("bunny", width=args.width, height=args.height)
    scene = load_scene(cfg.scene)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_packet_accel(ds, meta, scene=scene)
    accel = jax.device_put(accel)

    w, h = cfg.width, cfg.height
    px, py = full_frame_pixels_tiled(w, h)
    org_np, dir_np = camera_rays(scene.camera, np.asarray(px),
                                 np.asarray(py), w, h)
    org_np = np.asarray(org_np)
    dir_np = np.asarray(dir_np)
    n = org_np.shape[0]
    # incoherent set: shuffle direction assignment across pixels
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    dir_inc = dir_np[perm]
    org_inc = org_np[perm[::-1]]

    closest, _ = make_packet_intersector(ds, accel, ray_sort=args.sort)

    @jax.jit
    def run(accel_dev, org, dirn):
        c, _ = make_packet_intersector(ds, accel_dev, ray_sort=args.sort)
        hit, stats = c.with_stats(org, dirn, 0.0, jnp.inf)
        return hit.t, stats

    results = {}
    for name, (o, d) in (("coherent", (org_np, dir_np)),
                         ("incoherent", (org_inc, dir_inc))):
        o = jax.device_put(jnp.asarray(o))
        d = jax.device_put(jnp.asarray(d))
        t, stats = run(accel, o, d)  # compile + warm
        jax.block_until_ready((t, stats))
        reps = args.reps
        t0 = time.perf_counter()
        for _ in range(reps):
            t, stats = run(accel, o, d)
        jax.block_until_ready((t, stats))
        dt = (time.perf_counter() - t0) / reps
        # one stats readback at the very end of this set (poisons, but
        # each set's timing is already recorded; do NOT reuse process)
        results[name] = {"mrays": n / dt / 1e6, "s": dt}
    # read counters last (D2H poisons — after all timing)
    st = np.asarray(jax.device_get(stats))
    results["n_rays"] = n
    results["groups"] = int(st.shape[0])
    results["node_steps"] = float(st[:, 0].sum())
    results["leaf_rows"] = float(st[:, 1].sum())
    out = {
        "packet": int(os.environ.get("TPURT_PACKET_SIZE", 2048)),
        "ileave": int(os.environ.get("TPURT_ILEAVE", 1)),
        "sort": args.sort,
        **results,
    }
    print("RESULT " + json.dumps(out), flush=True)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--sort", default="octant")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--configs", default="")
    args = ap.parse_args()
    if not args.sweep:
        return child(args)

    configs = []
    if args.configs:
        for spec in args.configs.split(";"):
            p, i, s = spec.split(",")
            configs.append((int(p), int(i), s))
    else:
        configs = [
            (2048, 1, "octant"),
            (2048, 2, "octant"),
            (2048, 4, "octant"),
            (1024, 4, "octant"),
            (1024, 8, "octant"),
            (4096, 1, "octant"),
            (4096, 2, "octant"),
            (2048, 1, "morton"),
            (1024, 4, "morton"),
            (2048, 1, "none"),
        ]
    for p, i, s in configs:
        env = dict(os.environ, TPURT_PACKET_SIZE=str(p),
                   TPURT_ILEAVE=str(i))
        cmd = [sys.executable, os.path.abspath(__file__), "--sort", s,
               "--width", str(args.width), "--height", str(args.height),
               "--reps", str(args.reps)]
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=900)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[7:], flush=True)
                break
        else:
            err = (r.stdout + r.stderr).strip().splitlines()
            print(json.dumps({"packet": p, "ileave": i, "sort": s,
                              "error": err[-1] if err else "?"}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
