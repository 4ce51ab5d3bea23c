"""CPU probe: numpy simulation of the tileloop kernel's pruning ladder.

Replays, for a sample of real bounce-wave tiles, exactly what the kernel
does per front-to-back pair — far-break / early loop exit, exact
best-t-limited cluster pre-test, per-row sub-box tests, Möller–Trumbore
row updates — and reports where the per-pair work actually goes:

  * pairs until the early loop exit (validates the while_loop change);
  * pairs killed by the far break vs the exact pre-test vs surviving;
  * rows tested vs rows passing per surviving pair;
  * would-be HALF-box kills (rows 0–3 / 4–7 unions): the candidate
    PARITY roadmap item — if halves kill ~half the row tests, the two
    extra half tests (~30 ns) buy ~140 ns/pair.

Run: JAX_PLATFORMS=cpu python benchmarks/probe_kernel_sim.py [n_tiles]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from probe_tile_union import bounce_wave
from tpurt.bvh.paircluster import (
    ROWS_PER_CLUSTER,
    TRIS_PER_CLUSTER,
    build_pair_accel,
)
from tpurt.kernels import tilewave as tw
from tpurt.render import load_scene
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device

TILE = 1024
TPR = 12


def mt_best(v0, v1, v2, o, d, bt):
    """Möller–Trumbore best-t update: tris (k,3) vs rays (R,3)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d[:, None], e2[None])  # (R, k, 3)
    det = (e1[None] * p).sum(-1)
    ok = np.abs(det) > 1e-12
    inv = 1.0 / np.where(ok, det, 1.0)
    tv = o[:, None] - v0[None]
    u = (tv * p).sum(-1) * inv
    q = np.cross(tv, e1[None])
    v = (d[:, None] * q).sum(-1) * inv
    t = (e2[None] * q).sum(-1) * inv
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
    t = np.where(ok, t, np.inf)
    return np.minimum(bt, t.min(1))


def slab(lo, hi, o, iv, far):
    t0 = (lo[None] - o) * iv
    t1 = (hi[None] - o) * iv
    tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
    tf = np.minimum(np.maximum(t0, t1).min(-1), far)
    return tn <= tf


def main(n_sample=24):
    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    lo = np.asarray(accel.cluster_lo)
    hi = np.asarray(accel.cluster_hi)
    C = lo.shape[0]
    rows = np.asarray(accel.tri_rows)  # (C*8, 128)
    # decode per-slot triangle v0/e1/e2 from the packed rows
    lanes = np.arange(TPR) * 10
    rv0 = np.stack([rows[:, lanes + k] for k in range(3)], -1)
    re1 = np.stack([rows[:, lanes + 3 + k] for k in range(3)], -1)
    re2 = np.stack([rows[:, lanes + 6 + k] for k in range(3)], -1)
    # per-row sub-boxes (spare lanes 120-125)
    rblo = rows[:, 120:123]
    rbhi = rows[:, 123:126]

    org, dirn, tmv, _ = bounce_wave(scene, ds, meta)
    slo_, shi_ = lo.min(0), hi.max(0)
    keys = np.asarray(tw._octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(slo_), jnp.asarray(shi_)))
    o_ = np.argsort(keys, kind="stable")
    org, dirn, tmv = org[o_], dirn[o_], tmv[o_]
    # scene-exit cap (as _run does)
    diag = np.linalg.norm(shi_ - slo_)
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn >= 0, 1e-12, -1e-12), dirn)
    texit = np.minimum(
        np.maximum((slo_[None] - org) * inv, (shi_[None] - org) * inv)
        .min(1), np.inf)
    cap = texit * 1.0001 + 1e-4 * diag
    tmv = np.where(tmv >= 0, np.minimum(tmv, cap), tmv)

    n_tiles = org.shape[0] // TILE
    # quantized entry bounds (as the expansion packs them)
    scale = diag / 32766.0
    rng = np.random.default_rng(0)
    # sample tiles that have alive rays
    alive_tiles = [t for t in range(n_tiles)
                   if (tmv[t * TILE:(t + 1) * TILE] >= 0).sum() > 256]
    sample = rng.choice(alive_tiles, min(n_sample, len(alive_tiles)),
                        replace=False)

    agg = dict(pairs=0, exec=0, far_skip=0, pre_kill=0, survive=0,
               rows_tested=0, rows_pass=0, half_kill=0, half_tests=0,
               break_at=0.0, tiles=0)
    for ti in sample:
        s = ti * TILE
        o = org[s:s + TILE]
        d = dirn[s:s + TILE]
        iv = inv[s:s + TILE]
        bt = np.where(tmv[s:s + TILE] >= 0, tmv[s:s + TILE], -1.0)
        # exact-ANY pair list front-to-back (what EXACT_MASK + sort give)
        t0 = (lo[:, None] - o[None]) * iv[None]  # (C, R, 3) via swap
        t1 = (hi[:, None] - o[None]) * iv[None]
        tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
        tf = np.minimum(np.maximum(t0, t1).min(-1), bt[None])
        hit_any = ((tn <= tf) & (bt[None] >= 0)).any(1)
        tn_lo = np.where(hit_any, tn.min(1), np.inf)
        cl = np.where(hit_any)[0]
        entry_q = np.floor(np.maximum(tn_lo[cl], 0) / scale)
        order = np.argsort(entry_q, kind="stable")
        cl = cl[order]
        deqs = entry_q[order] * scale
        agg["tiles"] += 1
        agg["pairs"] += len(cl)
        broke = len(cl)
        for i, (c, deq) in enumerate(zip(cl, deqs)):
            if np.all(bt < deq):
                broke = i
                agg["far_skip"] += len(cl) - i
                break
            agg["exec"] += 1
            # exact pre-test with far = bt
            if not slab(lo[c], hi[c], o, iv, bt).any():
                agg["pre_kill"] += 1
                continue
            agg["survive"] += 1
            rb = c * ROWS_PER_CLUSTER
            # half-box would-kill (unions of row boxes 0-3 / 4-7)
            for h in range(2):
                hlo = rblo[rb + 4 * h: rb + 4 * h + 4].min(0)
                hhi = rbhi[rb + 4 * h: rb + 4 * h + 4].max(0)
                agg["half_tests"] += 1
                if not slab(hlo, hhi, o, iv, bt).any():
                    agg["half_kill"] += 1
            for r in range(ROWS_PER_CLUSTER):
                agg["rows_tested"] += 1
                if not slab(rblo[rb + r], rbhi[rb + r], o, iv, bt).any():
                    continue
                agg["rows_pass"] += 1
                bt = mt_best(rv0[rb + r], rv0[rb + r] + re1[rb + r],
                             rv0[rb + r] + re2[rb + r], o, d, bt)
        agg["break_at"] += broke / max(1, len(cl))

    T = agg["tiles"]
    print(f"tiles={T} pairs/tile={agg['pairs'] / T:.1f} "
          f"executed={agg['exec'] / T:.1f} "
          f"far-skipped={agg['far_skip'] / T:.1f} "
          f"(break at {100 * agg['break_at'] / T:.0f}% of list)")
    print(f"pre-test kills/tile={agg['pre_kill'] / T:.1f} "
          f"surviving pairs/tile={agg['survive'] / T:.1f}")
    print(f"rows: tested/surviving-pair="
          f"{agg['rows_tested'] / max(1, agg['survive']):.2f} "
          f"passing={agg['rows_pass'] / max(1, agg['survive']):.2f}")
    print(f"half-boxes: kill rate "
          f"{100 * agg['half_kill'] / max(1, agg['half_tests']):.0f}% "
          f"(each kill skips 4 row tests)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)


def main_rows(n_sample=24):
    """Row-box pass rates: morton-chop rows (production) vs kd-sah-12
    within-cluster rows (candidate: reorder tris inside each cluster by
    a 3-level SAH kd so each 12-tri row is spatially tight)."""
    from tpurt.bvh.paircluster import kd_cluster_order, flatten_world_tris

    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    v0, v1, v2, _, _ = flatten_world_tris(ds, meta, scene)
    order = kd_cluster_order(v0, v1, v2, sah=True)
    v0, v1, v2 = v0[order], v1[order], v2[order]
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    n = v0.shape[0]
    C = -(-n // TRIS_PER_CLUSTER)
    lo = np.stack([pmin[c * 96:(c + 1) * 96].min(0) for c in range(C)])
    hi = np.stack([pmax[c * 96:(c + 1) * 96].max(0) for c in range(C)])

    def row_boxes(within):
        rlo = np.full((C * 8, 3), np.inf)
        rhi = np.full((C * 8, 3), -np.inf)
        for c in range(C):
            s = c * 96
            idx = np.arange(s, min(s + 96, n))
            if within == "kd12":
                sub = kd_cluster_order(v0[idx], v1[idx], v2[idx],
                                       size=12, sah=True)
                idx = idx[sub]
            for r in range(8):
                ri = idx[r * 12:(r + 1) * 12]
                if len(ri):
                    rlo[c * 8 + r] = pmin[ri].min(0)
                    rhi[c * 8 + r] = pmax[ri].max(0)
        return rlo, rhi

    org, dirn, tmv, _ = bounce_wave(scene, ds, meta)
    slo_, shi_ = lo.min(0), hi.max(0)
    keys = np.asarray(tw._octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(slo_), jnp.asarray(shi_)))
    o_ = np.argsort(keys, kind="stable")
    org, dirn, tmv = org[o_], dirn[o_], tmv[o_]
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn >= 0, 1e-12, -1e-12), dirn)
    rng = np.random.default_rng(0)
    n_tiles = org.shape[0] // TILE
    alive_tiles = [t for t in range(n_tiles)
                   if (tmv[t * TILE:(t + 1) * TILE] >= 0).sum() > 256]
    sample = rng.choice(alive_tiles, min(n_sample, len(alive_tiles)),
                        replace=False)
    for within in ("morton", "kd12"):
        rlo, rhi = row_boxes(within)
        tested = passed = 0
        for ti in sample:
            s = ti * TILE
            o = org[s:s + TILE]
            iv = inv[s:s + TILE]
            bt = np.where(tmv[s:s + TILE] >= 0, tmv[s:s + TILE], -1.0)
            hitc = np.zeros(C, bool)
            for c in range(C):
                if slab(lo[c], hi[c], o, iv, bt).any():
                    hitc[c] = True
            for c in np.where(hitc)[0]:
                for r in range(8):
                    tested += 1
                    if slab(rlo[c * 8 + r], rhi[c * 8 + r], o, iv,
                            bt).any():
                        passed += 1
        print(f"rows[{within}]: tested={tested} passed={passed} "
              f"({100 * passed / tested:.1f}%)", flush=True)


def mt_any(v0, v1, v2, o, d, bt):
    """Any-hit: occluded mask for tris (k,3) vs rays (R,3), window bt."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d[:, None], e2[None])
    det = (e1[None] * p).sum(-1)
    ok = np.abs(det) > 1e-12
    inv = 1.0 / np.where(ok, det, 1.0)
    tv = o[:, None] - v0[None]
    u = (tv * p).sum(-1) * inv
    q = np.cross(tv, e1[None])
    v = (d[:, None] * q).sum(-1) * inv
    t = (e2[None] * q).sum(-1) * inv
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0) & (t < bt[:, None])
    return ok.any(1)


def main_shadow(n_sample=24):
    """Shadow-wave (any-hit) ladder: how early does the all-occluded /
    far-break loop exit fire, and how much work remains per tile."""
    from probe_tile_union import bounce_wave as _bw  # noqa: F401
    from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
    from tpurt.bvh.two_level import (
        build_scene_accel, make_two_level_intersector)

    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    lo = np.asarray(accel.cluster_lo)
    hi = np.asarray(accel.cluster_hi)
    rows = np.asarray(accel.tri_rows)
    lanes = np.arange(TPR) * 10
    rv0 = np.stack([rows[:, lanes + k] for k in range(3)], -1)
    re1 = np.stack([rows[:, lanes + 3 + k] for k in range(3)], -1)
    re2 = np.stack([rows[:, lanes + 6 + k] for k in range(3)], -1)
    rblo = rows[:, 120:123]
    rbhi = rows[:, 123:126]

    # shadow wave: primary hit points -> a fixed key light above+behind
    w, h = 800, 600
    px, py = full_frame_pixels_tiled(w, h)
    org, dirn = camera_rays(scene.camera, np.asarray(px), np.asarray(py),
                            w, h)
    org = np.asarray(org)[:262144]
    dirn = np.asarray(dirn)[:262144]
    ac2 = build_scene_accel(ds, meta)
    closest, _ = make_two_level_intersector(ds, ac2)
    hit = closest(jnp.asarray(org), jnp.asarray(dirn), 0.0, jnp.inf)
    valid = np.asarray(hit.valid)
    t = np.asarray(hit.t)
    p = org + t[:, None] * dirn
    slo_, shi_ = lo.min(0), hi.max(0)
    light = shi_ + (shi_ - slo_) * np.array([0.3, 0.8, 0.3])
    wd = light[None] - p
    dist = np.linalg.norm(wd, axis=1)
    wd = (wd / np.maximum(dist[:, None], 1e-9)).astype(np.float32)
    sorg = (p + 1e-3 * wd).astype(np.float32)
    tmv = np.where(valid, (dist * 0.999).astype(np.float32), -1.0)

    keys = np.asarray(tw._octant_sort_keys(
        jnp.asarray(sorg), jnp.asarray(wd), jnp.asarray(tmv),
        jnp.asarray(slo_), jnp.asarray(shi_)))
    o_ = np.argsort(keys, kind="stable")
    sorg, wd, tmv = sorg[o_], wd[o_], tmv[o_]
    inv = 1.0 / np.where(np.abs(wd) < 1e-12,
                         np.where(wd >= 0, 1e-12, -1e-12), wd)
    diag = np.linalg.norm(shi_ - slo_)
    scale = diag / 32766.0
    rng = np.random.default_rng(0)
    n_tiles = sorg.shape[0] // TILE
    alive_tiles = [ti for ti in range(n_tiles)
                   if (tmv[ti * TILE:(ti + 1) * TILE] >= 0).sum() > 256]
    sample = rng.choice(alive_tiles, min(n_sample, len(alive_tiles)),
                        replace=False)
    agg = dict(pairs=0, exec=0, skip=0, pre_kill=0, survive=0,
               rows_tested=0, rows_pass=0, occl=0.0, tiles=0)
    for ti in sample:
        s = ti * TILE
        o = sorg[s:s + TILE]
        d = wd[s:s + TILE]
        iv = inv[s:s + TILE]
        bt = np.where(tmv[s:s + TILE] >= 0, tmv[s:s + TILE], -1.0)
        t0 = (lo[:, None] - o[None]) * iv[None]
        t1 = (hi[:, None] - o[None]) * iv[None]
        tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
        tf = np.minimum(np.maximum(t0, t1).min(-1), bt[None])
        hit_any = ((tn <= tf) & (bt[None] >= 0)).any(1)
        tn_lo = np.where(hit_any, tn.min(1), np.inf)
        cl = np.where(hit_any)[0]
        entry_q = np.floor(np.maximum(tn_lo[cl], 0) / scale)
        order = np.argsort(entry_q, kind="stable")
        cl = cl[order]
        deqs = entry_q[order] * scale
        agg["tiles"] += 1
        agg["pairs"] += len(cl)
        alive0 = (bt >= 0).sum()
        for i, (c, deq) in enumerate(zip(cl, deqs)):
            if np.all(bt < deq):  # occluded lanes carry bt = -1
                agg["skip"] += len(cl) - i
                break
            agg["exec"] += 1
            live = slab(lo[c], hi[c], o, iv, bt)
            if not live.any():
                agg["pre_kill"] += 1
                continue
            agg["survive"] += 1
            rb = c * ROWS_PER_CLUSTER
            for r in range(ROWS_PER_CLUSTER):
                agg["rows_tested"] += 1
                if not slab(rblo[rb + r], rbhi[rb + r], o, iv, bt).any():
                    continue
                agg["rows_pass"] += 1
                occ = mt_any(rv0[rb + r], rv0[rb + r] + re1[rb + r],
                             rv0[rb + r] + re2[rb + r], o, d, bt)
                bt = np.where(occ, -1.0, bt)
        agg["occl"] += ((bt < 0).sum() - (TILE - alive0)) / max(1, alive0)
    T = agg["tiles"]
    print(f"SHADOW tiles={T} pairs/tile={agg['pairs'] / T:.1f} "
          f"executed={agg['exec'] / T:.1f} early-skipped={agg['skip'] / T:.1f}")
    print(f"pre-kills/tile={agg['pre_kill'] / T:.1f} surviving="
          f"{agg['survive'] / T:.1f} rows pass="
          f"{agg['rows_pass'] / max(1, agg['survive']):.2f}/8 "
          f"occluded={100 * agg['occl'] / T:.0f}%")
