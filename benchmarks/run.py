"""Benchmark ladder runner (SURVEY.md §6): renders the five configs and
writes a measured table to BASELINE_MEASURED.md + results JSONL.

Each config runs in a FRESH SUBPROCESS: the first device→host readback of
a process permanently degrades every later dispatch on the axon backend
(~100×, benchmarks/profile_poison.py), so a single-process multi-config
ladder poisons every config after the first — reproduced in round 2
(PARITY.md session-4). The child also retries on the intermittent
"TPU worker crashed" tunnel fault, like bench.py.

Usage: python benchmarks/run.py [--cpu] [--quick] [--configs bunny,...]
               [--check] [--update-floors]

``--check`` is the perf-regression gate (SURVEY.md §4.4 item 6): every
measured config is compared against the committed floor in
benchmarks/perf_floors.json ("quick" table for --quick, else "full");
any config below its floor — or any config that errors — exits 1
CI-style. ``--update-floors`` rewrites the floors to 80% of this run's
numbers (use only after a verified improvement).
"""

import argparse
import json
import os
import subprocess
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


def child_main(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    overrides = json.loads(args.overrides)
    config = get_config(args.config, **overrides)
    device = str(jax.devices()[0])
    # warm-up: compile the batch executable (same shape) untimed; no
    # stats readback before the measured run (axon first-D2H poison)
    warm = dataclasses.replace(config, spp=config.spp_per_batch)
    t_w = time.perf_counter()
    render_scene(warm, readback_stats=False)
    warm_s = time.perf_counter() - t_w
    # Median of three timed renders: the tunneled backend has BOTH
    # timing failure modes — multi-minute stall windows that inflate a
    # single measurement (a cornell_pt row measured 26 Mrays/s between
    # two 74.7 readings, identical RMSE) and the law-5 lying-clock
    # anomaly that deflates one (bench.py's measure-twice-take-slower
    # guard). The median survives one outlier in either direction.
    t0 = time.perf_counter()
    runs = []
    for _ in range(3):
        state, stats = render_scene(config)
        runs.append(stats)
    wall = time.perf_counter() - t0
    runs.sort(key=lambda s: s["elapsed_s"])
    stats = runs[1]
    # Hardware-accuracy RMSE (VERDICT r4 weak #3): re-render this
    # scene's GOLDEN fixture config on the SAME device and compare to
    # the committed golden. Runs after the timed row (the D2H poison
    # has already happened; accuracy doesn't care about dispatch
    # latency). --quick skips it (the gate run stays fast).
    rmse_val = None
    bias_val = None
    if not args.skip_rmse:
        try:
            import numpy as np

            from tests.golden.configs import GOLDENS
            from tpurt.render import framebuffer as fb

            gpath = os.path.join(
                os.path.dirname(__file__), "..", "tests", "golden",
                "data", f"{args.config}.npz",
            )
            if args.config in GOLDENS and os.path.exists(gpath):
                golden = np.load(gpath)["image"]
                gconfig = get_config(args.config, **GOLDENS[args.config])
                gstate, _ = render_scene(gconfig)
                img = np.asarray(fb.resolve(gstate), np.float32)
                rmse_val = round(
                    float(np.sqrt(np.mean((img - golden) ** 2))), 8
                )
                # Energy bias — the well-conditioned cross-device
                # accuracy statistic for deep-bounce MC configs: one
                # ulp of cross-backend fp difference in a bounce
                # direction decorrelates the path's remaining bounces,
                # so per-pixel RMSE is noise-floor-limited (measured on
                # cornell_pt: 0.0397 @ 8 spp -> 0.0125 @ 64 spp, pure
                # 1/sqrt(spp) — no bias signal). The MEAN difference
                # averages that noise over pixels x samples; real
                # accuracy bugs (wrong BRDF, lost hits) shift it.
                bias_val = round(float(img.mean() - golden.mean()), 8)
        except Exception as e:  # report, never fail the ladder row
            rmse_val = f"error: {e!r}"[:160]
    rec = {
        "config": args.config,
        "resolution": f"{config.width}x{config.height}",
        "spp": stats["spp"],
        "mrays_per_s": round(stats["mrays_per_s"], 3),
        "frame_s": round(stats["elapsed_s"], 3),
        "wall_s": round(wall, 2),
        "warmup_s": round(warm_s, 1),
        "pair_overflow": stats.get("pair_overflow", False),
        "budget_retries": stats.get("budget_retries", 0),
        "rays": int(stats["rays_traced"]),
        "rmse_vs_golden": rmse_val,
        "bias_vs_golden": bias_val,
        "device": device,
        "ts": time.strftime("%Y-%m-%d %H:%M"),
    }
    print("LADDER_RESULT " + json.dumps(rec))
    return 0


FLOORS_PATH = os.path.join(os.path.dirname(__file__), "perf_floors.json")


def check_floors(rows, floors):
    """Gate logic: (failures, skipped) given measured rows + floor table.

    A row fails if it errored or its mrays_per_s is below the committed
    floor; configs without a floor are skipped (reported, not failed).
    Pure function — unit-tested in tests/unit/test_perf_gate.py."""
    failures, skipped = [], []
    for r in rows:
        name = r.get("config", "?")
        floor = floors.get(name)
        if r.get("error"):
            failures.append(f"{name}: run errored (no measurement)")
            continue
        if floor is None:
            skipped.append(name)
            continue
        got = r.get("mrays_per_s", 0.0)
        if got < floor:
            failures.append(
                f"{name}: {got} Mrays/s < floor {floor} "
                f"(regression or mis-configured run)"
            )
    return failures, skipped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="gate against benchmarks/perf_floors.json")
    ap.add_argument("--update-floors", action="store_true",
                    help="rewrite floors to 80%% of this run")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset")
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "results.jsonl"))
    ap.add_argument("--skip-rmse", action="store_true", dest="skip_rmse",
                    help="skip the golden-config RMSE re-render")
    # child mode (one config per process)
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--config", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--overrides", default="{}", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args._child:
        sys.exit(child_main(args))
    if args.quick:
        args.skip_rmse = True

    want = set(args.configs.split(",")) if args.configs else None
    rows = []
    all_rows = []  # includes errored configs (the gate fails on those)
    for name, over, quick in LADDER:
        if want and name not in want:
            continue
        overrides = dict(over)
        if args.quick:
            overrides.update(quick)
        cmd = [sys.executable, __file__, "--_child", "--config", name,
               "--overrides", json.dumps(overrides)]
        if args.cpu:
            cmd.append("--cpu")
        if args.skip_rmse:
            cmd.append("--skip-rmse")
        rec = None
        for attempt in range(args.retries):
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=4200)
            for line in r.stdout.splitlines():
                if line.startswith("LADDER_RESULT "):
                    rec = json.loads(line[len("LADDER_RESULT "):])
                    break
            if rec:
                break
            err = (r.stderr.splitlines() or ["?"])[-1][:200]
            print(f"# {name} attempt {attempt + 1} failed: {err}",
                  file=sys.stderr)
        if not rec:
            rec = {"config": name, "error": True}
            print(json.dumps(rec))
            all_rows.append(rec)
            continue
        rows.append(rec)
        all_rows.append(rec)
        print(json.dumps(rec))
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    if args.update_floors:
        key = "quick" if args.quick else "full"
        with open(FLOORS_PATH) as f:
            floors_doc = json.load(f)
        for r in rows:
            floors_doc.setdefault(key, {})[r["config"]] = round(
                r["mrays_per_s"] * 0.8, 1
            )
        with open(FLOORS_PATH, "w") as f:
            json.dump(floors_doc, f, indent=2)
            f.write("\n")
        print(f"floors[{key}] ← 0.8 × this run → {FLOORS_PATH}")

    gate_rc = 0
    if args.check:
        key = "quick" if args.quick else "full"
        with open(FLOORS_PATH) as f:
            floors = json.load(f).get(key, {})
        failures, skipped = check_floors(all_rows, floors)
        for s in skipped:
            print(f"PERF-GATE skip: {s} (no committed floor)")
        for msg in failures:
            print(f"PERF-GATE FAIL: {msg}")
        if failures:
            gate_rc = 1
        else:
            print(f"PERF-GATE ok: {len(all_rows)} config(s) ≥ floors")

    # only a FULL ladder on the real device refreshes the committed table
    # (a --configs/--cpu/--quick subset run would clobber it with partial
    # or CPU rows)
    if want or args.cpu or args.quick:
        sys.exit(gate_rc)
    md = os.path.join(os.path.dirname(__file__), "..",
                      "BASELINE_MEASURED.md")
    with open(md, "w") as f:
        f.write("# Measured benchmark ladder (latest run)\n\n")
        f.write(f"Device: {rows[0]['device'] if rows else '?'} — one fresh "
                "subprocess per config (axon D2H-poison law)\n\n")
        f.write("| config | resolution | spp | Mrays/s | frame s | "
                "warmup s | RMSE vs golden (this device) | "
                "energy bias | overflow |\n")
        f.write("|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(
                f"| {r['config']} | {r['resolution']} | {r['spp']} | "
                f"{r['mrays_per_s']} | {r['frame_s']} | {r['warmup_s']} | "
                f"{r.get('rmse_vs_golden', '—')} | "
                f"{r.get('bias_vs_golden', '—')} | "
                f"{'RETRY x' + str(r['budget_retries']) if r['budget_retries'] else 'ok'} |\n"
            )
    print(f"table → {md}")
    sys.exit(gate_rc)


if __name__ == "__main__":
    main()
