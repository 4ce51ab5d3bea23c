"""Xplane profile of the bench.py headline batch (bunny 800x600@8spp).

Runs the exact bench child shape with a warmup render, then profiles the
measured render under jax.profiler.trace and prints the top TPU ops via
xplane_summary (no tensorboard needed). Respects the TPURT_* env flags,
so run it with the A/B winner set, e.g.:

  TPURT_LEAN_OCCL=1 python benchmarks/profile_bench_xplane.py
"""

import glob
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    scene = "bunny"
    if "--scene" in sys.argv:
        scene = sys.argv[sys.argv.index("--scene") + 1]
    if scene == "bunny":
        overrides = dict(width=800, height=600, spp=8, spp_per_batch=2,
                         max_bounces=2)
    else:
        overrides = {}  # the ladder preset's own shape
    if "--spp-per-batch" in sys.argv:
        overrides["spp_per_batch"] = int(
            sys.argv[sys.argv.index("--spp-per-batch") + 1])
    config = get_config(scene, **overrides)
    warm = get_config(scene, **{**overrides,
                                "spp": config.spp_per_batch})
    t0 = time.perf_counter()
    render_scene(warm, readback_stats=False)
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    outdir = "/tmp/tpurt_prof"
    os.makedirs(outdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        state, stats = render_scene(config, readback_stats=False)
    print(f"measured {time.perf_counter() - t0:.2f}s "
          f"(est {stats['mrays_per_s']:.2f} Mrays/s)", flush=True)

    planes = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True),
                    key=os.path.getmtime)
    if not planes:
        print("no xplane written", file=sys.stderr)
        return 1
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "xplane_summary.py"),
                    planes[-1], "40"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
