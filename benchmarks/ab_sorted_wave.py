"""Hardware A/B of the sorted-wave pipeline + live truncation (round 3).

Sequence (one TPU subprocess at a time — the device lock is exclusive):
  1. seed    — sorted, UNCAPPED bunny bench-shape render with stats
               readback + TPURT_AUTOTUNE_WRITE=1: measures the
               per-bounce live counts that become the truncation caps.
  2. sorted  — bench.py with TPURT_SORTED_WAVE=1 (caps auto-applied
               from the autotune table).
  3. sorted_notrunc — TPURT_SORTED_WAVE=1 TPURT_LIVE_TRUNC=0 (isolates
               the sort-restructure from the truncation win).
  4. base    — bench.py with TPURT_SORTED_WAVE=0 (round-2 production
               path, same session for a fair wall clock).

Each bench row appends to benchmarks/ab_results.jsonl with a variant
tag. Run: python benchmarks/ab_sorted_wave.py [--skip-seed]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_seed():
    env = dict(
        os.environ,
        TPURT_SORTED_WAVE="1",
        TPURT_LIVE_TRUNC="0",
        TPURT_AUTOTUNE_WRITE="1",
    )
    code = (
        "from tpurt.render import render_scene\n"
        "from tpurt.utils.config import get_config\n"
        "c = get_config('bunny', spp=8, spp_per_batch=8)\n"
        "state, stats = render_scene(c)\n"
        "print('SEED', stats['live_counts'], stats['mrays_per_s'])\n"
    )
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=ROOT,
                       timeout=3600, capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("SEED"):
            print(f"{line}  ({time.time() - t0:.0f}s)", flush=True)
            return True
    print("seed failed:", (r.stderr.splitlines() or ["?"])[-1][:300])
    return False


def run_bench(tag, **env_over):
    env = dict(os.environ, **env_over)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, cwd=ROOT, timeout=4800, capture_output=True, text=True,
    )
    rec = {"variant": tag, "wall_s": round(time.time() - t0, 1)}
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            rec.update(json.loads(line))
    print(json.dumps(rec), flush=True)
    with open(os.path.join(ROOT, "benchmarks", "ab_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    if "--skip-seed" not in sys.argv:
        if not run_seed():
            return 1
    run_bench("sorted+trunc", TPURT_SORTED_WAVE="1")
    run_bench("sorted_notrunc", TPURT_SORTED_WAVE="1",
              TPURT_LIVE_TRUNC="0")
    run_bench("base_r2", TPURT_SORTED_WAVE="0")
    return 0


if __name__ == "__main__":
    sys.exit(main())
