"""Sponza-scale per-trace machinery decomposition (VERDICT r4 weak #2:
"sponza is the weakest row and the least understood — every
decomposition probe is bunny-centric").

Captures the real inter-stage waves of a sponza 1080p@4spp bench-shape
render (TPURT_CAPTURE_WAVES), then times each per-sorted-trace piece in
isolation on the TPU at both granularities:

  keys+fwd sort | exact mask | entry build+lane sort | restore
     at CLUSTER granularity (C ≈ 2400 two-level instance-clusters) and
     at SUPERCLUSTER granularity (S ≈ C/7, round-5 sc mode)

and reports which pair path the production gate engages at this scale
(entry rows vs budgeted, sc vs per-cluster — tilewave._entry_rows_enabled
with the 48 MB VMEM bound).

Usage:
  python benchmarks/probe_sponza_decomp.py --capture   # once (slow)
  python benchmarks/probe_sponza_decomp.py             # time pieces
"""

import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPDIR = "/tmp/tpurt_sponza_waves"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_sponza_decomp.json")


def capture():
    env = dict(os.environ)
    env["TPURT_CAPTURE_WAVES"] = CAPDIR
    code = (
        "from tpurt.render import render_scene\n"
        "from tpurt.utils.config import get_config\n"
        "c = get_config('sponza', spp=4)\n"
        "render_scene(c, readback_stats=False)\n"
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt.kernels import tilewave as tw
    from tpurt.render import build_accel
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.scene.loader import load_scene
    from tpurt.utils.config import get_config

    config = get_config("sponza", spp=4)
    scene = load_scene(config.scene)
    ds = to_device(scene)
    meta = scene_meta(scene)
    accel = build_accel(config, ds, meta, scene=scene)
    lo = jnp.asarray(accel.cluster_lo)
    hi = jnp.asarray(accel.cluster_hi)
    C = int(accel.cluster_lo.shape[0])
    has_sc = getattr(accel, "sc_meta", None) is not None
    S = int(accel.sc_lo.shape[0]) if has_sc else 0
    sc_lo = jnp.asarray(accel.sc_lo) if has_sc else None
    sc_hi = jnp.asarray(accel.sc_hi) if has_sc else None
    TILE = tw.TILE
    report = {"C": C, "S": S, "two_level": hasattr(accel, "pair_meta")}

    waves = {}
    for f in sorted(glob.glob(CAPDIR + "/*.npz")):
        name = os.path.basename(f)[: -len("_wave.npz")]
        waves[name] = dict(np.load(f))
    if not waves:
        print("no captured waves — run with --capture first")
        return 1
    print("waves:", {k: int(v["org"].shape[0]) for k, v in waves.items()})

    scene_lo = jnp.min(lo, axis=0)
    scene_hi = jnp.max(hi, axis=0)

    def prep(w, shadow):
        org = jnp.asarray(w["org"])
        dirn = jnp.asarray(w["dirn"])
        n = org.shape[0]
        if shadow:
            tmv = jnp.asarray(w["tmax"])
            tmv = jnp.where(jnp.asarray(w["want"]), tmv, -1.0)
        else:
            tmv = jnp.where(jnp.asarray(w["alive"]), tw.BIG, -1.0)
        pad = (-n) % TILE
        if pad:
            org = jnp.concatenate([org, jnp.zeros((pad, 3), jnp.float32)])
            dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), jnp.float32)])
            tmv = jnp.concatenate([tmv, jnp.full(pad, -1.0, jnp.float32)])
        return org, dirn, tmv

    @jax.jit
    def keys_sort(org, dirn, tmv):
        keys = tw._octant_sort_keys(org, dirn, tmv, scene_lo, scene_hi)
        n = org.shape[0]
        out = jax.lax.sort(
            (keys, org[:, 0], org[:, 1], org[:, 2], dirn[:, 0],
             dirn[:, 1], dirn[:, 2], tmv,
             jnp.arange(n, dtype=jnp.int32)),
            num_keys=1,
        )
        return out[1:]

    import functools

    def mask_at(boxes_lo, boxes_hi):
        @jax.jit
        def f(org, dirn, tmv):
            n_tiles = org.shape[0] // TILE
            return tw._exact_any_mask_pallas(
                org, dirn, tmv, boxes_lo, boxes_hi, n_tiles)
        return f

    @functools.partial(jax.jit, static_argnums=(2,))
    def entry_build(mask, tn_lower, n_boxes):
        n_tiles = mask.shape[0]
        scene_diag = jnp.linalg.norm(scene_hi - scene_lo)
        tn_scale = jnp.maximum(scene_diag, 1e-12) / 32766.0
        tn_q = jnp.clip(
            (jnp.maximum(tn_lower, 0.0) / tn_scale).astype(jnp.int32),
            0, 32766)
        cl_of = jax.lax.broadcasted_iota(
            jnp.int32, (n_tiles, n_boxes), 1)
        entry = jnp.where(mask, (tn_q << 16) | cl_of,
                          jnp.int32(2**31 - 1))
        cp = ((n_boxes + 127) // 128) * 128
        tpad = (-n_tiles) % tw.ENTRY_GROUP
        if cp != n_boxes or tpad:
            entry = jnp.pad(entry, ((0, tpad), (0, cp - n_boxes)),
                            constant_values=2**31 - 1)
        return jax.lax.sort(entry)

    def fused_at(boxes_lo, boxes_hi):
        @jax.jit
        def f(org, dirn, tmv):
            n_tiles = org.shape[0] // TILE
            scene_diag = jnp.linalg.norm(scene_hi - scene_lo)
            tn_scale = jnp.maximum(scene_diag, 1e-12) / 32766.0
            ent = tw._exact_entries_pallas(
                org, dirn, tmv, boxes_lo, boxes_hi, n_tiles, tn_scale)
            counts = (ent != jnp.int32(2**31 - 1)).sum(
                axis=1, dtype=jnp.int32)[:n_tiles]
            return jax.lax.sort(ent), counts
        return f

    @jax.jit
    def restore2(rk, bs):
        return jax.lax.sort((rk, bs), num_keys=1)[1]

    def t(name, fn, *args, iters=3):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.block_until_ready(fn(*args))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"  {name:34s} {ms:8.1f} ms", flush=True)
        return out, ms

    for tag, shadow in (("bounce1", False), ("shadow0", True),
                        ("bounce2", False)):
        w = waves.get(tag)
        if w is None:
            continue
        org, dirn, tmv = prep(w, shadow)
        n = org.shape[0]
        n_tiles = n // TILE
        alive = float(jnp.sum(tmv >= 0))
        gate_c = tw._entry_rows_enabled(C, n_tiles)
        gate_s = tw._entry_rows_enabled(S, n_tiles) if has_sc else False
        row = {"n": n, "tiles": n_tiles, "alive": alive,
               "entry_gate_clusters": gate_c,
               "entry_gate_superclusters": gate_s}
        print(f"\n== {tag}: n={n} tiles={n_tiles} alive={alive:.0f} "
              f"entry_gate C={gate_c} S={gate_s}")

        s_out, ms = t("keys+fwd sort (9-op)", keys_sort, org, dirn, tmv)
        row["fwd_sort_ms"] = ms
        org_s = jnp.stack(s_out[0:3], axis=1)
        dir_s = jnp.stack(s_out[3:6], axis=1)
        tmv_s = s_out[6]
        rk = s_out[7]

        (m_c, tn_c), ms = t(f"exact mask C={C}",
                            mask_at(lo, hi), org_s, dir_s, tmv_s)
        row["mask_cluster_ms"] = ms
        row["pairs_per_tile_cluster"] = float(jnp.sum(m_c)) / n_tiles
        _, ms = t(f"entry build+sort C={C}", entry_build, m_c, tn_c, C)
        row["entry_cluster_ms"] = ms
        # round-5 fused mask→entry kernel: one pallas call + lane sort
        # replaces (mask kernel + XLA entry build); compare its total
        # against mask_cluster_ms + entry_cluster_ms
        _, ms = t(f"FUSED entries+sort C={C}", fused_at(lo, hi),
                  org_s, dir_s, tmv_s)
        row["fused_cluster_ms"] = ms
        if has_sc:
            (m_s, tn_s), ms = t(f"exact mask S={S}",
                                mask_at(sc_lo, sc_hi),
                                org_s, dir_s, tmv_s)
            row["mask_sc_ms"] = ms
            row["pairs_per_tile_sc"] = float(jnp.sum(m_s)) / n_tiles
            _, ms = t(f"entry build+sort S={S}", entry_build,
                      m_s, tn_s, S)
            row["entry_sc_ms"] = ms
            _, ms = t(f"FUSED entries+sort S={S}",
                      fused_at(sc_lo, sc_hi), org_s, dir_s, tmv_s)
            row["fused_sc_ms"] = ms
        _, ms = t("restore sort (2-op)", restore2, rk, tmv_s)
        row["restore_ms"] = ms
        report[tag] = row

    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    doc[time.strftime("%Y-%m-%d %H:%M")] = report
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"\nreport -> {OUT}")
    return 0


if __name__ == "__main__":
    if "--capture" in sys.argv:
        capture()
    else:
        sys.exit(main())
