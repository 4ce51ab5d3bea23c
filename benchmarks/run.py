"""Benchmark ladder runner (SURVEY.md §6): renders the five configs and
writes a measured table to BASELINE_MEASURED.md + results JSONL.

Usage: python benchmarks/run.py [--cpu] [--quick] [--configs bunny,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (config, overrides, quick-overrides)
LADDER = [
    ("hello_triangle", {}, {}),
    ("cornell", {}, dict(width=256, height=256, spp=16)),
    ("bunny", {}, dict(width=400, height=300, spp=4)),
    ("cornell_pt", {}, dict(width=256, height=256, spp=32)),
    ("sponza", dict(spp=4), dict(width=480, height=270, spp=2)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "results.jsonl"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    want = set(args.configs.split(",")) if args.configs else None
    device = str(jax.devices()[0])
    rows = []
    for name, over, quick in LADDER:
        if want and name not in want:
            continue
        overrides = dict(over)
        if args.quick:
            overrides.update(quick)
        config = get_config(name, **overrides)
        # warm-up: compile the batch executable (same shape) untimed
        import dataclasses

        warm = dataclasses.replace(config, spp=config.spp_per_batch)
        t_w = time.perf_counter()
        # no stats readback in the warmup (axon first-D2H poison)
        render_scene(warm, readback_stats=False)
        warm_s = time.perf_counter() - t_w
        t0 = time.perf_counter()
        state, stats = render_scene(config)
        wall = time.perf_counter() - t0
        rec = {
            "config": name,
            "resolution": f"{config.width}x{config.height}",
            "spp": stats["spp"],
            "mrays_per_s": round(stats["mrays_per_s"], 3),
            "frame_s": round(stats["elapsed_s"], 3),
            "wall_s": round(wall, 2),
            "warmup_s": round(warm_s, 1),
            "pair_overflow": stats.get("pair_overflow", False),
            "budget_retries": stats.get("budget_retries", 0),
            "rays": int(stats["rays_traced"]),
            "device": device,
            "ts": time.strftime("%Y-%m-%d %H:%M"),
        }
        rows.append(rec)
        print(json.dumps(rec))
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    md = os.path.join(os.path.dirname(__file__), "..",
                      "BASELINE_MEASURED.md")
    with open(md, "w") as f:
        f.write("# Measured benchmark ladder (latest run)\n\n")
        f.write(f"Device: {device}\n\n")
        f.write("| config | resolution | spp | Mrays/s | frame s | "
                "warmup s | overflow |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(
                f"| {r['config']} | {r['resolution']} | {r['spp']} | "
                f"{r['mrays_per_s']} | {r['frame_s']} | {r['warmup_s']} | "
                f"{'RETRY x' + str(r['budget_retries']) if r['budget_retries'] else 'ok'} |\n"
            )
    print(f"table → {md}")


if __name__ == "__main__":
    main()
