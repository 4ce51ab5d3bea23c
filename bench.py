"""Benchmark entry (driver-run on real TPU hardware each round).

Prints ONE JSON line: the primary metric Mrays/sec/chip (closest-hit +
shadow rays actually traced, counted on device — BASELINE.json:2) on the
bunny ladder config (BASELINE.json:9: ~80k tris, full BVH traversal,
Blinn-Phong + mirror). ``vs_baseline`` is the ratio against the 150
Mrays/sec/chip v5p target (BASELINE.json:5; no published reference numbers
exist — BASELINE.md).

Usage: python bench.py [--scene bunny] [--width W] [--height H] [--spp N]
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bunny")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--spp-per-batch", type=int, default=4)
    ap.add_argument("--max-bounces", type=int, default=2)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    config = get_config(
        args.scene,
        width=args.width,
        height=args.height,
        spp=args.spp,
        spp_per_batch=args.spp_per_batch,
        max_bounces=args.max_bounces,
    )

    # Warmup: compile + first batch (not timed).
    warm = get_config(
        args.scene,
        width=args.width,
        height=args.height,
        spp=config.spp_per_batch,
        spp_per_batch=config.spp_per_batch,
        max_bounces=args.max_bounces,
    )
    t0 = time.perf_counter()
    render_scene(warm)
    warm_s = time.perf_counter() - t0

    state, stats = render_scene(config)
    mrays = stats["mrays_per_s"]
    platform = jax.devices()[0].platform
    device = str(jax.devices()[0])
    result = {
        "metric": f"Mrays/sec/chip ({args.scene})",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 150.0, 4),
        "detail": {
            "scene": args.scene,
            "resolution": f"{args.width}x{args.height}",
            "spp": stats["spp"],
            "rays_traced": stats["rays_traced"],
            "elapsed_s": round(stats["elapsed_s"], 3),
            "warmup_s": round(warm_s, 3),
            "frame_ms": round(
                stats["elapsed_s"] / max(stats["spp"], 1) * 1e3
                * config.spp_per_batch, 1,
            ),
            "device": device,
            "platform": platform,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
