"""Multi-chip performance evidence within this box's limits (VERDICT r4
missing #4). Three measurements:

  (a) --tpu1x1 : single-chip TPU shard_map overhead — the staged bench
      pipeline compiled over a 1×1 ("sample","tile") mesh vs unsharded,
      fresh subprocess each (axon D2H poison law). This is the ONLY
      multi-chip perf fact measurable on real hardware here (the box has
      one chip); it bounds the per-chip cost of the shard_map plumbing
      (partitioned collectives compile to no-ops on a 1×1 mesh, so any
      delta is pure SPMD-program overhead).
  (b) --cpu-scaling : virtual-8-device CPU mesh wall-clock scaling of
      the staged pipeline at FIXED GLOBAL WORK (bunny golden-scale
      config, interpret-mode Pallas): mesh shapes 1×1 → 2×4. CAVEAT
      (recorded with the numbers): virtual devices share this host's
      physical cores, so the curve measures sharding overhead +
      host-thread concurrency, NOT ICI-connected chip scaling.
  (c) --project : N-chip projection table from the measured single-chip
      bench throughput + the X2 merge cost model. The merge is ONE
      all_gather of the (H, W, 3) f32 radiance sum per batch + a
      fixed-order sum (bit-identical contract, render/staged.py):
      bytes_in = (N−1)/N · H·W·3·4 per chip per batch over ICI
      (v5e: 1600 Gbps = 200 GB/s per chip per direction, public spec).
      Sample shards render DISJOINT sample windows — zero redundant
      compute — so projected rate ≈ N · R₁ / (1 + t_merge / t_batch).

Writes probe_multichip_scaling.json next to this file; PARITY.md §2.3
carries the narrative table.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "probe_multichip_scaling.json")


def _save(key, value):
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    doc[key] = value
    doc["ts"] = time.strftime("%Y-%m-%d %H:%M")
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{key} -> {OUT}")


def tpu_1x1_child(mesh_on: bool):
    """One bench-shape render, unsharded or over a 1×1 mesh."""
    import jax

    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    kw = dict(spp=8, spp_per_batch=8)
    if mesh_on:
        kw.update(n_sample_shards=1, n_tile_shards=1)
    config = get_config("bunny", **kw)
    # force the mesh path even at 1×1 (render_scene only builds a mesh
    # when the product is > 1 — patch the gate by building it here)
    if mesh_on:
        # render_scene only builds a mesh when the shard product is > 1,
        # so drive the staged renderer directly with an explicit 1×1 mesh
        import dataclasses

        from tpurt.parallel.mesh import make_render_mesh
        from tpurt.render import build_accel
        from tpurt.render.intersectors import scene_meta
        from tpurt.render.staged import make_staged_renderer
        from tpurt.scene.device import to_device
        from tpurt.scene.loader import load_scene

        scene = load_scene(config.scene)
        meta = scene_meta(scene)
        ds = to_device(scene)
        jit_config = dataclasses.replace(config, spp=0, seed=0,
                                         exposure=1.0)
        accel = jax.device_put(
            build_accel(jit_config, ds, meta, scene=scene))
        mesh = make_render_mesh(1, 1)
        renderer = make_staged_renderer(ds, accel, meta=meta,
                                        config=jit_config, mesh=mesh)
        # warm (compile) then measure two accumulations, report slower
        out = renderer(scene.camera, 0, 0)
        jax.block_until_ready(out)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = renderer(scene.camera, 0, 0)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        batch_s = max(times)
        rays = 0.0
    else:
        from tpurt.render import render_scene

        render_scene(config, readback_stats=False)  # warm
        _, stats = render_scene(config)
        _, stats2 = render_scene(config)
        if stats2["elapsed_s"] > stats["elapsed_s"]:
            stats = stats2
        batch_s = stats["elapsed_s"]
        rays = stats["rays_traced"]
    print("PROBE_RESULT " + json.dumps(
        {"mesh": mesh_on, "batch_s": round(batch_s, 4), "rays": rays}))


def run_tpu_1x1():
    rows = []
    for mesh_on in (False, True):
        cmd = [sys.executable, __file__, "--_child",
               "--mesh" if mesh_on else "--nomesh"]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=4200)
        rec = None
        for line in r.stdout.splitlines():
            if line.startswith("PROBE_RESULT "):
                rec = json.loads(line[len("PROBE_RESULT "):])
        if rec is None:
            print(r.stdout[-2000:])
            print(r.stderr[-2000:])
            raise SystemExit(f"child failed (mesh={mesh_on})")
        rows.append(rec)
        print(rec)
    base, mesh = rows[0]["batch_s"], rows[1]["batch_s"]
    overhead = mesh / base - 1.0
    _save("tpu_1x1", {
        "unsharded_batch_s": base,
        "mesh1x1_batch_s": mesh,
        "overhead_frac": round(overhead, 4),
    })


def cpu_scaling_child(n_sample: int, n_tile: int):
    import dataclasses

    import jax

    # the box's sitecustomize pins JAX_PLATFORMS=axon and IGNORES the
    # env var — only a pre-init config update selects the virtual-device
    # CPU backend (same gotcha as tests/conftest.py / generate_goldens)
    jax.config.update("jax_platforms", "cpu")

    from tpurt.parallel.mesh import make_render_mesh
    from tpurt.render import build_accel
    from tpurt.render.intersectors import scene_meta
    from tpurt.render.staged import make_staged_renderer
    from tpurt.scene.device import to_device
    from tpurt.scene.loader import load_scene
    from tpurt.utils.config import get_config

    # fixed global work; per-shard work shrinks as the mesh grows.
    # n_sample_shards multiplies spp per outer batch, so FIX global spp
    # by keeping spp_per_batch * n_sample constant.
    sppb = 8 // max(n_sample, 1)
    config = get_config("bunny", width=128, height=96, spp=8,
                        spp_per_batch=sppb,
                        n_sample_shards=n_sample, n_tile_shards=n_tile)
    scene = load_scene(config.scene)
    meta = scene_meta(scene)
    ds = to_device(scene)
    jit_config = dataclasses.replace(config, spp=0, seed=0, exposure=1.0)
    accel = build_accel(jit_config, ds, meta, scene=scene)
    mesh = (make_render_mesh(n_sample, n_tile)
            if n_sample * n_tile > 1 else None)
    renderer = make_staged_renderer(ds, accel, meta=meta,
                                    config=jit_config, mesh=mesh)
    out = renderer(scene.camera, 0, 0)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = renderer(scene.camera, 0, 0)
        jax.block_until_ready(out)
    batch_s = (time.perf_counter() - t0) / iters
    print("PROBE_RESULT " + json.dumps(
        {"mesh": f"{n_sample}x{n_tile}", "batch_s": round(batch_s, 4)}))


def run_cpu_scaling():
    shapes = [(1, 1), (1, 2), (1, 4), (2, 4), (1, 8), (8, 1)]
    rows = []
    for ns, nt in shapes:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
        env.setdefault("TPURT_INTERPRET_PALLAS", "1")
        cmd = [sys.executable, __file__, "--_child-cpu",
               "--ns", str(ns), "--nt", str(nt)]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           env=env, timeout=3600)
        rec = None
        for line in r.stdout.splitlines():
            if line.startswith("PROBE_RESULT "):
                rec = json.loads(line[len("PROBE_RESULT "):])
        if rec is None:
            print(r.stdout[-1500:])
            print(r.stderr[-1500:])
            rec = {"mesh": f"{ns}x{nt}", "error": True}
        rows.append(rec)
        print(rec)
    base = next((r["batch_s"] for r in rows
                 if r.get("mesh") == "1x1" and not r.get("error")), None)
    for r in rows:
        if base and not r.get("error"):
            r["speedup_vs_1x1"] = round(base / r["batch_s"], 3)
    _save("cpu_virtual_mesh", {
        "note": ("virtual devices share host cores: measures sharding "
                 "overhead + host concurrency, NOT ICI chip scaling"),
        "rows": rows,
    })


def run_projection(r1_mrays: float, batch_s: float):
    """N-chip X2 projection from measured single-chip numbers."""
    H, W = 600, 800
    frame_bytes = H * W * 3 * 4
    ici_bw = 200e9  # v5e: 1600 Gbps/chip/direction (public spec)
    rows = []
    for n in (1, 2, 4, 8, 16, 64, 256):
        # ring all_gather: each chip receives (N-1)/N of the gathered
        # buffer; fixed-order sum is local flops (negligible)
        t_merge = (n - 1) / n * frame_bytes / ici_bw
        eff = 1.0 / (1.0 + t_merge / batch_s)
        rows.append({
            "chips": n,
            "merge_ms": round(t_merge * 1e3, 3),
            "efficiency": round(eff, 4),
            "projected_mrays": round(r1_mrays * n * eff, 1),
        })
    _save("projection_x2", {
        "basis_mrays_1chip": r1_mrays,
        "basis_batch_s": batch_s,
        "ici_bw_GBps": ici_bw / 1e9,
        "rows": rows,
    })
    for r in rows:
        print(r)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu1x1", action="store_true")
    ap.add_argument("--cpu-scaling", action="store_true")
    ap.add_argument("--project", action="store_true")
    ap.add_argument("--r1", type=float, default=None,
                    help="measured 1-chip Mrays/s for --project")
    ap.add_argument("--batch-s", type=float, default=None,
                    help="measured 1-chip batch seconds for --project")
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--_child-cpu", action="store_true",
                    dest="child_cpu", help=argparse.SUPPRESS)
    ap.add_argument("--mesh", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--nomesh", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--ns", type=int, default=1, help=argparse.SUPPRESS)
    ap.add_argument("--nt", type=int, default=1, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args._child:
        return tpu_1x1_child(args.mesh)
    if args.child_cpu:
        return cpu_scaling_child(args.ns, args.nt)
    if args.tpu1x1:
        run_tpu_1x1()
    if args.cpu_scaling:
        run_cpu_scaling()
    if args.project:
        assert args.r1 and args.batch_s, "--project needs --r1 --batch-s"
        run_projection(args.r1, args.batch_s)


if __name__ == "__main__":
    main()
