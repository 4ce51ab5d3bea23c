"""CLI — the L5 app/demo layer (SURVEY.md §1 L5, §2.1 C12/C13).

The reference's ``main()`` opens a window, picks a scene, and runs the
render loop; headless on TPU that becomes subcommands:

  python -m tpurt render  --config cornell_pt --out out.png
  python -m tpurt animate --config sponza --frames 24 --out-dir frames/
  python -m tpurt info

``render`` supports progressive checkpoint/resume (--checkpoint/--resume,
SURVEY.md §5) and profiling (--profile writes a Perfetto trace via
jax.profiler — the RenderDoc/timestamp-query analog).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time


def _add_config_overrides(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--config", default="cornell",
                    help="preset name or scene file (.obj/.gltf/.glb)")
    ap.add_argument("--width", type=int)
    ap.add_argument("--height", type=int)
    ap.add_argument("--spp", type=int)
    ap.add_argument("--spp-per-batch", type=int, dest="spp_per_batch")
    ap.add_argument("--max-bounces", type=int, dest="max_bounces")
    ap.add_argument("--seed", type=int)
    ap.add_argument("--exposure", type=float)
    ap.add_argument("--intersector",
                    choices=["auto", "brute", "bvh", "bvh_packet",
                             "bvh_pair", "bvh_tile"])
    ap.add_argument("--pipeline",
                    choices=["auto", "mega", "staged", "wavefront"])
    ap.add_argument("--no-nee", action="store_true",
                    help="disable next-event estimation")
    ap.add_argument("--sample-shards", type=int, dest="n_sample_shards",
                    help="X2 sample-parallel axis size")
    ap.add_argument("--tile-shards", type=int, dest="n_tile_shards",
                    help="X1 tile-parallel axis size")
    ap.add_argument("--texture-filter", dest="texture_filter",
                    choices=["nearest", "bilinear"],
                    help="base-color sampling (bilinear = glTF LINEAR)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize() before rendering "
                         "(TPU pods: run the same command on every host)")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (multihost; "
                         "omit on TPU pods for auto-detection)")
    ap.add_argument("--num-processes", type=int, dest="num_processes",
                    help="total process count (multihost)")
    ap.add_argument("--process-id", type=int, dest="process_id",
                    help="this process's index (multihost)")


def _build_config(args):
    from tpurt.utils.config import get_config

    overrides = {}
    for field in ("width", "height", "spp", "spp_per_batch", "max_bounces",
                  "seed", "exposure", "intersector", "pipeline",
                  "n_sample_shards", "n_tile_shards", "texture_filter"):
        v = getattr(args, field, None)
        if v is not None:
            overrides[field] = v
    if getattr(args, "no_nee", False):
        overrides["use_nee"] = False
    return get_config(args.config, **overrides)


def _maybe_cpu(args) -> None:
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "multihost", False):
        from tpurt.parallel.mesh import init_multihost

        pi, pc = init_multihost(
            coordinator_address=getattr(args, "coordinator", None),
            num_processes=getattr(args, "num_processes", None),
            process_id=getattr(args, "process_id", None),
        )
        print(f"multihost: process {pi}/{pc}")


def cmd_render(args) -> int:
    _maybe_cpu(args)
    from tpurt.render import framebuffer as fb
    from tpurt.render import render_scene
    from tpurt.render.checkpoint import load_checkpoint, save_checkpoint
    from tpurt.render.png import write_png

    config = _build_config(args)
    state = None
    if args.resume:
        state, ck_config, _ = load_checkpoint(args.resume)
        if ck_config is not None:
            # CLI overrides win over checkpointed config
            merged = dataclasses.asdict(ck_config)
            for k, v in dataclasses.asdict(config).items():
                default = getattr(type(config)(), k, None)
                if v != default:
                    merged[k] = v
            config = type(config)(**merged)
        print(f"resumed at {int(state.n_samples)} spp from {args.resume}")

    t0 = time.perf_counter()
    state, stats = render_scene(config, state=state, verbose=args.verbose)
    if args.checkpoint:
        save_checkpoint(args.checkpoint, state, config)
        print(f"checkpoint → {args.checkpoint}")
    img = fb.to_png_array(state, config.exposure)
    write_png(args.out, img)
    print(
        f"{args.out}: {config.width}x{config.height} {stats['spp']} spp, "
        f"{stats['mrays_per_s']:.2f} Mrays/s, "
        f"{time.perf_counter() - t0:.2f}s total"
    )
    return 0


def cmd_animate(args) -> int:
    """Animated flythrough (config 5, BASELINE.json:11): one PNG per frame
    along the scene's camera path; accumulation resets on camera move
    (SURVEY.md §3.5)."""
    _maybe_cpu(args)
    from tpurt.render import framebuffer as fb
    from tpurt.render import render_scene
    from tpurt.render.png import write_png
    from tpurt.scene.loader import load_scene
    from tpurt.scene.procedural import flythrough_cameras

    config = _build_config(args)
    scene = load_scene(config.scene)
    cams = flythrough_cameras(config.scene, args.frames)
    os.makedirs(args.out_dir, exist_ok=True)
    t0 = time.perf_counter()
    total_rays = 0.0
    # Frames stay ON DEVICE between flushes: any device→host readback
    # mid-run permanently degrades dispatch latency on the axon backend
    # (benchmarks/profile_poison.py). But holding EVERY frame until the
    # end grows device memory linearly with --frames (OOM on long
    # flythroughs) and loses all PNGs on a late-frame failure — so the
    # backlog is flushed every --readback-chunk frames (0 = only at the
    # end, the fastest choice on axon for short runs).
    import jax
    import numpy as np

    chunk = args.readback_chunk
    frames = []       # (frame_index, packed u8 image, counts or None)
    written = 0
    overflow_frames = []

    if getattr(args, "autotune", False):
        # Measurement mode (VERDICT r4 weak #5: caps are camera-blind):
        # render the whole flythrough UNCAPPED with per-frame stats
        # readback and record the per-bounce live/want MAXIMA over all
        # cameras into the autotune cache — flythrough-max caps make
        # later capped animate runs overflow-free along this path.
        # Per-frame D2H makes this run slow on axon (poison law); it is
        # a calibration pass, not a timing pass.
        os.environ["TPURT_LIVE_TRUNC"] = "0"
        os.environ["TPURT_AUTOTUNE_WRITE"] = "1"

    def _check_counts(idx, counts):
        """Deferred overflow accounting: counts were kept on device
        (render_scene deferred-accounting note); read them with the
        frame flush and flag any frame whose live cap cut alive rays."""
        if counts is None:
            return
        c = np.asarray(counts)
        if c.shape[0] > 3 and (c[3] > 0.0 or c[2] > 0.0):
            overflow_frames.append(idx)

    def _flush():
        nonlocal written
        jax.block_until_ready([im for _, im, _ in frames])
        for idx, img, counts in frames:
            path = os.path.join(args.out_dir, f"frame_{idx:04d}.png")
            write_png(path, np.asarray(img))
            _check_counts(idx, counts)
        written += len(frames)
        frames.clear()

    for f, cam in enumerate(cams):
        state, stats = render_scene(
            config, scene=scene, camera=cam,
            readback_stats=getattr(args, "autotune", False))
        total_rays += stats["rays_traced"]
        frames.append((f, fb.pack_u8(fb.tonemap(fb.resolve(state),
                                                config.exposure)),
                       stats.get("counts_device")))
        if chunk and len(frames) >= chunk:
            _flush()
        if args.verbose:
            print(f"  frame {f + 1}/{len(cams)}: {stats['mrays_per_s']:.2f} "
                  f"Mrays/s (est)")
    _flush()
    elapsed = time.perf_counter() - t0
    if overflow_frames:
        # LOUD + correct: a live cap cut alive rays on these frames (the
        # caps were measured at a different camera). Re-render them
        # uncapped and overwrite the PNGs.
        import warnings

        warnings.warn(
            f"live caps truncated alive rays on frames {overflow_frames}"
            " — re-rendering those frames uncapped", RuntimeWarning)
        uncapped = dataclasses.replace(config, live_caps=(),
                                       shadow_caps=())
        os.environ["TPURT_LIVE_TRUNC"] = "0"
        for idx in overflow_frames:
            state, _ = render_scene(uncapped, scene=scene,
                                    camera=cams[idx],
                                    readback_stats=False)
            img = fb.pack_u8(fb.tonemap(fb.resolve(state),
                                        config.exposure))
            write_png(os.path.join(args.out_dir, f"frame_{idx:04d}.png"),
                      np.asarray(img))
    print(
        f"{len(cams)} frames → {args.out_dir} in {elapsed:.1f}s "
        f"({elapsed / len(cams) * 1e3:.0f} ms/frame, "
        f"{total_rays / elapsed / 1e6:.2f} Mrays/s, "
        f"{len(overflow_frames)} capped-frame overflow(s))"
    )
    return 0


def cmd_export(args) -> int:
    """Materialize a scene (preset or file) as a standard .obj/.glb/.gltf
    asset — the demo-asset path (BASELINE.json:9,11): presets are
    procedural stand-ins, exported to real files and reloaded through the
    C5/C6 loaders."""
    from tpurt.scene.export import export_scene
    from tpurt.scene.loader import load_scene

    scene = load_scene(args.config)
    export_scene(args.out, scene)
    ntri = scene.num_triangles
    print(f"{args.out}: {len(scene.meshes)} meshes, "
          f"{len(scene.instances)} instances, {ntri} unique tris")
    return 0


def cmd_info(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    print(f"jax {jax.__version__}, {len(devs)} device(s):")
    for d in devs:
        print(f"  [{d.id}] {d} platform={d.platform}")
    from tpurt.utils.config import PRESETS

    print("presets:", ", ".join(sorted(PRESETS)))
    from tpurt.utils import aotcache

    s = aotcache.stats()
    print(
        f"aot cache: {s['entries']} entries, "
        f"{s['bytes'] / (1 << 30):.2f} GiB "
        f"(cap {s['max_bytes'] / (1 << 30):.0f} GiB) at {s['dir']}"
    )
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpurt",
                                 description="TPU-native ray tracer")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="render one config to a PNG")
    _add_config_overrides(r)
    r.add_argument("--out", default="out.png")
    r.add_argument("--checkpoint", help="write FrameState .npz after render")
    r.add_argument("--resume", help="resume from a FrameState .npz")
    r.add_argument("--profile", help="write a jax.profiler trace to this dir")
    r.add_argument("--verbose", "-v", action="store_true")
    r.set_defaults(fn=cmd_render)

    a = sub.add_parser("animate", help="render a camera flythrough")
    _add_config_overrides(a)
    a.add_argument("--frames", type=int, default=8)
    a.add_argument("--out-dir", default="frames")
    a.add_argument("--readback-chunk", type=int, default=64,
                   dest="readback_chunk",
                   help="flush frames to PNG every N frames (bounds device "
                        "memory; 0 = one readback at the end)")
    a.add_argument("--autotune", action="store_true",
                   help="calibration pass: render uncapped with per-frame "
                        "stats readback and record flythrough-max live/want "
                        "counts into the autotune cache (slow; run once per "
                        "scene/resolution)")
    a.add_argument("--verbose", "-v", action="store_true")
    a.set_defaults(fn=cmd_animate)

    e = sub.add_parser("export", help="write a scene to .obj/.glb/.gltf")
    e.add_argument("--config", default="bunny",
                   help="preset name or scene file")
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export)

    i = sub.add_parser("info", help="show devices and presets")
    i.add_argument("--cpu", action="store_true")
    i.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)

    profile_dir = getattr(args, "profile", None)
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            rc = args.fn(args)
        print(f"profiler trace → {profile_dir}")
        return rc
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
