"""Round-2 profiling: where does the time actually go?

Measures, on the live backend:
  1. bare dispatch latency (tiny jitted fn, warm)
  2. packet-kernel-only Mrays/s on bunny camera rays (+ node/leaf counters)
  3. cornell per-stage wall times (staged pipeline, debug brackets)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5):
    fn(*args)  # warm
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}")

    # 1. dispatch overhead
    @jax.jit
    def tiny(x):
        return x * 2.0 + 1.0

    x = jnp.ones((8, 128))
    dt = timeit(tiny, x, n=20)
    print(f"dispatch latency (warm tiny jit): {dt*1e3:.3f} ms")

    # 2. packet kernel alone on bunny camera rays
    from tpurt.bvh.cluster import build_packet_accel
    from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
    from tpurt.kernels import packet as pk
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.scene.loader import load_scene

    for scene_name, w, h in [("cornell", 512, 512), ("bunny", 800, 600)]:
        scene = load_scene(scene_name)
        meta = scene_meta(scene)
        ds = to_device(scene)
        accel = build_packet_accel(ds, meta)
        print(f"\n[{scene_name}] tris={accel.prim_tri.shape[0]} "
              f"nodes={accel.n_nodes} rows={accel.n_rows}")
        px, py = full_frame_pixels_tiled(w, h)
        org, dirn = camera_rays(scene.camera, px, py, w, h)
        n = org.shape[0]
        closest, any_hit = pk.make_packet_intersector(ds, accel)

        for sort in ["none", "octant", "morton"]:
            c2, _ = pk.make_packet_intersector(ds, accel, ray_sort=sort)

            def run(o, d):
                hit = c2(o, d, 0.0, jnp.inf)
                return hit.t

            dt = timeit(jax.jit(run), org, dirn, n=3)
            print(f"  closest-hit kernel sort={sort:7s}: {dt*1e3:8.2f} ms "
                  f"= {n/dt/1e6:8.2f} Mrays/s  (n={n})")

        # counters
        hit, stats = jax.jit(
            lambda o, d: closest.with_stats(o, d, 0.0, jnp.inf)
        )(org, dirn)
        stats = np.asarray(stats)
        print(f"  per-group node steps: mean={stats[:,0].mean():.0f} "
              f"max={stats[:,0].max():.0f}; leaf rows: "
              f"mean={stats[:,1].mean():.0f} max={stats[:,1].max():.0f} "
              f"groups={stats.shape[0]}")

    # 3. cornell staged per-stage times
    import os
    os.environ["TPURT_DEBUG_STAGES"] = "1"
    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    cfg = get_config("cornell", width=256, height=256, spp=16,
                     pipeline="staged")
    print("\n[cornell staged 256x256 spp16] cold:")
    t0 = time.perf_counter()
    state, stats = render_scene(cfg)
    print(f"  total {time.perf_counter()-t0:.2f}s, "
          f"{stats['mrays_per_s']:.3f} Mrays/s")
    print("[cornell staged] warm second frame:")
    t0 = time.perf_counter()
    state, stats = render_scene(cfg)
    print(f"  total {time.perf_counter()-t0:.2f}s, "
          f"{stats['mrays_per_s']:.3f} Mrays/s")


if __name__ == "__main__":
    main()
