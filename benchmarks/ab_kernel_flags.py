"""A/B the bench headline across kernel env-flag sets in ONE TPU session.

Each variant runs bench.py's child in a fresh subprocess (axon D2H-poison
law + worker-crash retry, PARITY.md), sequentially so only one process
holds the tunneled TPU device lock at a time. Results append to
benchmarks/ab_results.jsonl and print as a table.

Usage:
  python benchmarks/ab_kernel_flags.py                 # default variant set
  python benchmarks/ab_kernel_flags.py --variants base,lean_occl
  python benchmarks/ab_kernel_flags.py --probe         # VPU op-cost probe first
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (env overrides, extra bench.py args)
VARIANTS = {
    "base": ({}, []),
    "lean_occl": ({"TPURT_LEAN_OCCL": "1"}, []),
    "approx_recip": ({"TPURT_APPROX_RECIP": "1"}, []),
    "lean+recip": (
        {"TPURT_LEAN_OCCL": "1", "TPURT_APPROX_RECIP": "1"}, []),
    "batch8": ({}, ["--spp-per-batch", "8"]),
    "unroll4": ({"TPURT_PAIR_UNROLL": "4"}, []),
    "unroll8": ({"TPURT_PAIR_UNROLL": "8"}, []),
    "lean+unroll4": (
        {"TPURT_LEAN_OCCL": "1", "TPURT_PAIR_UNROLL": "4"}, []),
    "lean+batch8": (
        {"TPURT_LEAN_OCCL": "1"}, ["--spp-per-batch", "8"]),
    "morton_clusters": ({"TPURT_CLUSTERING": "morton"}, []),
    "kd_clusters": ({"TPURT_CLUSTERING": "kd"}, []),
    "exact_mask": ({"TPURT_EXACT_MASK": "1"}, []),
    "exact_xla": (
        {"TPURT_EXACT_MASK": "1", "TPURT_EXACT_IMPL": "xla"}, []),
    "exact+lean": (
        {"TPURT_EXACT_MASK": "1", "TPURT_LEAN_OCCL": "1"}, []),
    "exact+lean+unroll4": (
        {"TPURT_EXACT_MASK": "1", "TPURT_LEAN_OCCL": "1",
         "TPURT_PAIR_UNROLL": "4"}, []),
    "all_on": (
        {"TPURT_EXACT_MASK": "1", "TPURT_LEAN_OCCL": "1",
         "TPURT_APPROX_RECIP": "1"}, []),
    # round-3 headline-config variants (8 spp/batch = the bench default)
    "entry_rows": (
        {"TPURT_ENTRY_ROWS": "1"}, ["--spp-per-batch", "8"]),
    # round-5 supercluster A/B: "auto" default means the plain bench now
    # runs WITH superclusters — "nosc" is the explicit control
    "sc": ({"TPURT_SUPERCLUSTER": "auto"}, ["--spp-per-batch", "8"]),
    "nosc": ({"TPURT_SUPERCLUSTER": "0"}, ["--spp-per-batch", "8"]),
    # round-5 fused mask→entry kernel A/B ("fe" = the new default)
    "fe": ({"TPURT_FUSED_ENTRIES": "1"}, ["--spp-per-batch", "8"]),
    "nofe": ({"TPURT_FUSED_ENTRIES": "0"}, ["--spp-per-batch", "8"]),
    # exact mask on COHERENT waves too: rejected pre-fusion (the dense
    # mask couldn't pay for itself at ~18 pairs/tile) — re-tested now
    # that the fused kernel cut the dense path's cost
    "fe_exact_all": ({"TPURT_EXACT_MASK": "all"},
                     ["--spp-per-batch", "8"]),
}
# "base8" is the same config as "batch8" (advisor r3); keep the alias so
# old result rows stay interpretable, but share the definition.
VARIANTS["base8"] = VARIANTS["batch8"]


def run_variant(name, retries=2, timeout=3600, scene_args=None):
    env_over, extra = VARIANTS[name]
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"), "--_child"]
    cmd += scene_args or ["--scene", "bunny", "--width", "800",
                          "--height", "600", "--spp", "8",
                          "--spp-per-batch", "2", "--max-bounces", "2"]
    # extra args override the defaults above (argparse keeps the last)
    cmd += extra
    env = dict(os.environ, **env_over)
    for attempt in range(retries):
        t0 = time.time()
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout, env=env)
        except subprocess.TimeoutExpired:
            print(f"# {name} attempt {attempt + 1}: timeout", flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                rec["variant"] = name
                rec["env"] = env_over
                rec["extra"] = extra
                rec["wall_s"] = round(time.time() - t0, 1)
                return rec
        err = (r.stderr.splitlines() or ["?"])[-1][:200]
        print(f"# {name} attempt {attempt + 1} failed: {err}", flush=True)
    return {"variant": name, "error": True}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,lean_occl,approx_recip")
    ap.add_argument("--probe", action="store_true",
                    help="run probe_vpu_ops.py first")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "ab_results.jsonl"))
    ap.add_argument("--scene", default=None,
                    help="bench scene override (e.g. sponza)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--spp", type=int, default=None)
    args = ap.parse_args()
    scene_args = None
    if args.scene:
        scene_args = ["--scene", args.scene]
        if args.width:
            scene_args += ["--width", str(args.width)]
        if args.height:
            scene_args += ["--height", str(args.height)]
        if args.spp:
            scene_args += ["--spp", str(args.spp)]

    if args.probe:
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "probe_vpu_ops.py")],
            capture_output=True, text=True, timeout=1800,
        )
        print(r.stdout)
        if r.returncode != 0:
            print(r.stderr[-500:], file=sys.stderr)

    rows = []
    for name in args.variants.split(","):
        name = name.strip()
        if name not in VARIANTS:
            print(f"# unknown variant {name}; known: {list(VARIANTS)}")
            continue
        rec = run_variant(name, scene_args=scene_args)
        rec["ts"] = time.strftime("%Y-%m-%d %H:%M")
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    print(f"\n{'variant':16s} {'Mrays/s':>9s} {'warmup s':>9s}")
    for r in rows:
        if r.get("error"):
            print(f"{r['variant']:16s} {'ERROR':>9s}")
        else:
            print(f"{r['variant']:16s} {r['value']:9.2f} "
                  f"{r['detail']['warmup_s']:9.1f}")


if __name__ == "__main__":
    main()
