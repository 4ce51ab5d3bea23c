"""Pair wavefront traversal — dense (ray, cluster) intersection.

The TPU-native answer to incoherent rays (SURVEY.md §7 "divergent
traversal on a lockstep machine", G2/G4). The lockstep packet kernel
(tpurt.kernels.packet) is throughput-bound on redundant work: a packet
tests the union of all its rays' BVH paths, which for bounce waves is
most of the scene (measured 0.9 Mrays/s on shuffled bunny rays,
benchmarks/sweep_packet.py). This pipeline spends a little dense XLA
work to match every ray to exactly the clusters it pierces, then does
only the matched (ray, cluster) triangle tests, densely:

  1. CULL  (XLA, dense):   mask[N, C] = ray-vs-cluster-AABB slab tests —
     pure VPU, no control flow, chunked over rays to bound memory.
  2. EXPAND (XLA):         mask → cluster-major (ray, cluster) pair list
     via nonzero (cumsum+scatter under the hood — sort-free because the
     cluster-major flattening is already sorted by cluster).
     Segments are 64-aligned so a 1024-pair block overlaps ≤ 16 clusters.
  3. TEST  (Pallas):       grid over 1024-pair blocks; each block loops
     its small cluster range, fetches 8 packed tri rows per cluster from
     VMEM, and Möller–Trumbore-tests them against all 8×128 pairs in
     lockstep (per-pair cluster-match masks keep it correct).
  4. REDUCE (XLA):         scatter-min by ray → closest hit; two more
     masked scatters recover (u, v, slot) deterministically (min-slot
     tie-break, matching the jnp oracle).

No per-lane gathers anywhere; the only data-dependent addressing is the
per-block row fetch — exactly what Mosaic supports. Throughput is
coherence-INDEPENDENT: primary and bounce waves cost the same per pair.

Closure discipline: accel fields ride as jit arguments, never closure
constants (axon D2H poison — benchmarks/profile_poison.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.bvh.paircluster import ROWS_PER_CLUSTER, TPR, PairAccel
from tpurt.kernels.packet import BIG, EPS_DENOM, _use_interpret
from tpurt.render.intersectors import Hit

LANES_PER_TRI = 10
BLOCK = 1024  # pairs per kernel block: one (8, 128) f32 tile per field
SEG_ALIGN = 64  # cluster segments padded to this → block spans ≤ 16
MAX_SPAN = BLOCK // SEG_ALIGN
RAY_CHUNK = 1 << 17  # cull-phase ray rows per mask chunk (bounds memory)


def _tri_row_test(row, ox, oy, oz, dx, dy, dz, match, bt, bu, bv, bs):
    """Test one packed row (12 tris) against a (8,128) pair tile.

    Same Möller–Trumbore math and epsilons as the packet kernel / jnp
    oracle; ``match`` masks pairs whose cluster owns this row. The 12
    tests are independent (pipelined) and folded with a min-tree."""
    cand = []
    for j in range(TPR):
        base = j * LANES_PER_TRI
        v0x = row[0, base + 0]
        v0y = row[0, base + 1]
        v0z = row[0, base + 2]
        e1x = row[0, base + 3]
        e1y = row[0, base + 4]
        e1z = row[0, base + 5]
        e2x = row[0, base + 6]
        e2y = row[0, base + 7]
        e2z = row[0, base + 8]
        sl = row[0, base + 9]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok_det = jnp.abs(det) > EPS_DENOM
        inv = 1.0 / jnp.where(ok_det, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = (
            ok_det
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > 0.0)
        )
        cand.append((jnp.where(ok & match, t, BIG), u, v, sl))

    while len(cand) > 1:
        nxt = []
        for a in range(0, len(cand) - 1, 2):
            (ta, ua, va, sa), (tb, ub, vb, sb) = cand[a], cand[a + 1]
            take_b = tb < ta
            nxt.append((
                jnp.minimum(ta, tb),
                jnp.where(take_b, ub, ua),
                jnp.where(take_b, vb, va),
                jnp.where(take_b, sb, sa),
            ))
        if len(cand) % 2:
            nxt.append(cand[-1])
        cand = nxt
    tm, um, vm, sm = cand[0]
    win = tm < bt
    return (
        jnp.where(win, tm, bt),
        jnp.where(win, um, bu),
        jnp.where(win, vm, bv),
        jnp.where(win, sm, bs),
    )


def _pair_kernel(
    cmin_ref, cmax_ref,  # scalar prefetch: per-block cluster range (SMEM)
    tri_ref,  # (R, 128) f32 VMEM — full packed tri table
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref, pc_ref,  # (8,128)
    bt_ref, bu_ref, bv_ref, bs_ref,  # outs (8, 128)
):
    b = pl.program_id(0)
    c0 = cmin_ref[b]
    c1 = cmax_ref[b]
    tm = tm_ref[:]
    alive = tm >= 0.0
    pc = pc_ref[:]
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    init = (
        jnp.where(alive, tm, -1.0),
        jnp.zeros_like(tm),
        jnp.zeros_like(tm),
        jnp.full_like(tm, -1.0),
    )

    # exact-trip loops over the block's cluster range (scalar bounds from
    # SMEM): dead blocks (c0 = -1) get span 0. Row loop is a fori too —
    # Python-unrolling span×rows×12 tris makes a ~60k-op jaxpr that takes
    # minutes to compile; only the 12-tri lane-extract unroll is static.
    def rbody(r, carry):
        c, bt, bu, bv, bs = carry
        match = pc == c.astype(jnp.float32)
        row = tri_ref[pl.ds(c * ROWS_PER_CLUSTER + r, 1), :]
        bt, bu, bv, bs = _tri_row_test(
            row, ox, oy, oz, dx, dy, dz, match, bt, bu, bv, bs
        )
        return c, bt, bu, bv, bs

    def jbody(j, carry):
        c = c0 + j
        _, bt, bu, bv, bs = jax.lax.fori_loop(
            0, ROWS_PER_CLUSTER, rbody, (c,) + carry
        )
        return bt, bu, bv, bs

    span = jnp.where(c0 >= 0, c1 - c0 + 1, 0)
    bt, bu, bv, bs = jax.lax.fori_loop(0, span, jbody, init)
    bt_ref[:] = bt
    bu_ref[:] = bu
    bv_ref[:] = bv
    bs_ref[:] = bs


def _cull_expand(org, dirn, t_max_vec, lo, hi, *, n_clusters, pair_cap):
    """Phases 1–2: dense AABB cull + cluster-major pair expansion.

    Returns (pair_ray, pair_cluster, block_cmin, block_cmax, n_pairs,
    overflow) with static shapes; pair_ray < 0 marks padding slots."""
    n = org.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                          jnp.where(dirn >= 0.0, 1e-12, -1e-12), dirn)

    n_chunks = max(1, math.ceil(n / RAY_CHUNK))
    chunk = math.ceil(n / n_chunks)
    cap_chunk = -(-pair_cap // n_chunks)
    cap_chunk = -(-cap_chunk // BLOCK) * BLOCK

    pair_ray_parts = []
    pair_cluster_parts = []
    aoff_parts = []  # per-chunk aligned offsets (C+1,), for block ranges
    total_pairs = jnp.int32(0)
    overflow = jnp.asarray(False)
    # aligned capacity per chunk: every cluster may pad up to SEG_ALIGN-1
    acap_chunk = cap_chunk + n_clusters * SEG_ALIGN
    acap_chunk = -(-acap_chunk // BLOCK) * BLOCK

    for ci in range(n_chunks):
        s = ci * chunk
        e = min(n, s + chunk)
        o_c = org[s:e]
        i_c = inv[s:e]
        tm_c = t_max_vec[s:e]
        m = e - s
        # slab test (m, C): entry within [0, tmax] and alive
        t0 = (lo[None] - o_c[:, None]) * i_c[:, None]
        t1 = (hi[None] - o_c[:, None]) * i_c[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        mask = (
            (tn <= tf)
            & (tf >= 0.0)
            & (tn <= tm_c[:, None])
            & (tm_c[:, None] >= 0.0)
        )
        counts = mask.sum(axis=0, dtype=jnp.int32)  # (C,)
        u_off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]
        )
        a_cnt = -(-counts // SEG_ALIGN) * SEG_ALIGN
        a_off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(a_cnt)]
        )
        idx = jnp.nonzero(
            mask.T.ravel(), size=cap_chunk, fill_value=-1
        )[0].astype(jnp.int32)
        valid = idx >= 0
        c_of = jnp.where(valid, idx // m, n_clusters)
        r_of = idx - c_of * m
        rank = (
            jnp.arange(cap_chunk, dtype=jnp.int32)
            - u_off[jnp.minimum(c_of, n_clusters)]
        )
        pos = a_off[jnp.minimum(c_of, n_clusters)] + rank
        # invalid/overflow slots get DISTINCT out-of-range indices (mode
        # "drop" discards them) — unique_indices=True must hold for real
        arange_c = jnp.arange(cap_chunk, dtype=jnp.int32)
        pos = jnp.where(valid & (pos < acap_chunk), pos,
                        acap_chunk + arange_c)
        pr = jnp.full(acap_chunk, -1, jnp.int32).at[pos].set(
            r_of + s, mode="drop", unique_indices=True,
        )
        pcl = jnp.full(acap_chunk, -1, jnp.int32).at[pos].set(
            c_of, mode="drop", unique_indices=True,
        )
        pair_ray_parts.append(pr)
        pair_cluster_parts.append(pcl)
        aoff_parts.append(a_off)
        total_pairs = total_pairs + u_off[-1]
        overflow = overflow | (u_off[-1] > cap_chunk)

    pair_ray = jnp.concatenate(pair_ray_parts)
    pair_cluster = jnp.concatenate(pair_cluster_parts)
    # per-block cluster ranges from the aligned offsets, chunk by chunk
    nb_chunk = acap_chunk // BLOCK
    cmins = []
    cmaxs = []
    for ci in range(n_chunks):
        a_off = aoff_parts[ci]
        starts = jnp.arange(nb_chunk, dtype=jnp.int32) * BLOCK
        ends = starts + (BLOCK - 1)
        cmin = (
            jnp.searchsorted(a_off, starts, side="right").astype(jnp.int32)
            - 1
        )
        cmax = (
            jnp.searchsorted(a_off, ends, side="right").astype(jnp.int32)
            - 1
        )
        used = a_off[-1]
        live = starts < used
        cmin = jnp.where(live, jnp.clip(cmin, 0, n_clusters - 1), -1)
        cmax = jnp.where(live, jnp.clip(cmax, 0, n_clusters - 1), -1)
        cmins.append(cmin)
        cmaxs.append(cmax)
    block_cmin = jnp.concatenate(cmins)
    block_cmax = jnp.concatenate(cmaxs)
    return (pair_ray, pair_cluster, block_cmin, block_cmax, total_pairs,
            overflow)


def _trace_pairs(org, dirn, t_max_vec, lo, hi, tri_rows, *, n_clusters,
                 pair_cap, interpret):
    """Full pipeline: cull → expand → block kernel → per-ray reduce."""
    n = org.shape[0]
    (pair_ray, pair_cluster, block_cmin, block_cmax, n_pairs,
     overflow) = _cull_expand(
        org, dirn, t_max_vec, lo, hi, n_clusters=n_clusters,
        pair_cap=pair_cap,
    )
    p = pair_ray.shape[0]
    n_blocks = p // BLOCK
    safe = jnp.clip(pair_ray, 0, n - 1)
    dead = pair_ray < 0

    def field(a, fill):
        v = jnp.where(dead, fill, a[safe])
        return v.reshape(n_blocks * 8, 128)

    ox = field(org[:, 0], 0.0)
    oy = field(org[:, 1], 0.0)
    oz = field(org[:, 2], 0.0)
    dx = field(dirn[:, 0], 1.0)
    dy = field(dirn[:, 1], 1.0)
    dz = field(dirn[:, 2], 1.0)
    tm = field(t_max_vec, -1.0)
    pc = jnp.where(dead, -1.0, pair_cluster.astype(jnp.float32)).reshape(
        n_blocks * 8, 128
    )

    # index maps receive (grid idx, *scalar_prefetch_refs)
    tile = lambda: pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [tile()] * 8,
        out_specs=[tile()] * 4,
    )
    args = (ox, oy, oz, dx, dy, dz, tm, pc)
    args = jax.lax.optimization_barrier(args)
    bt, bu, bv, bs = pl.pallas_call(
        _pair_kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape] * 4,
        interpret=interpret,
    )(block_cmin, block_cmax, tri_rows, *args)
    bt, bu, bv, bs = jax.lax.optimization_barrier((bt, bu, bv, bs))

    bt = bt.reshape(p)
    bu = bu.reshape(p)
    bv = bv.reshape(p)
    bs = bs.reshape(p)

    # per-ray reduction: closest t, then min-slot tie-break, then payload
    ray_i = jnp.where(dead, n, pair_ray)  # padding → dropped slot n
    hit_pair = bs >= 0.0
    t_eff = jnp.where(hit_pair, bt, BIG)
    best_t = jnp.full(n + 1, BIG, jnp.float32).at[ray_i].min(
        t_eff, mode="drop"
    )[:n]
    win1 = hit_pair & (bt <= best_t[jnp.clip(pair_ray, 0, n - 1)])
    s_eff = jnp.where(win1, bs, BIG)
    best_s = jnp.full(n + 1, BIG, jnp.float32).at[ray_i].min(
        s_eff, mode="drop"
    )[:n]
    win2 = win1 & (bs == best_s[jnp.clip(pair_ray, 0, n - 1)])
    zero = jnp.zeros(n + 1, jnp.float32)
    u_best = zero.at[ray_i].max(jnp.where(win2, bu, -BIG),
                                mode="drop")[:n]
    v_best = zero.at[ray_i].max(jnp.where(win2, bv, -BIG),
                                mode="drop")[:n]
    found = best_t < BIG
    u_best = jnp.where(found, jnp.maximum(u_best, 0.0), 0.0)
    v_best = jnp.where(found, jnp.maximum(v_best, 0.0), 0.0)
    slot = jnp.where(found, best_s, -1.0)
    stats = jnp.stack(
        [n_pairs.astype(jnp.float32),
         overflow.astype(jnp.float32)]
    )
    return best_t, u_best, v_best, slot, stats


def make_pair_intersector(ds, accel: PairAccel, *,
                          interpret: bool | None = None,
                          pairs_per_ray: int = 8):
    """Closest/any-hit pair over uniform Morton clusters (same interface
    as make_brute_force / make_packet_intersector).

    ``pairs_per_ray`` sizes the static pair budget (cap = N × budget);
    overflow is reported in ``closest.with_stats`` stats[1] and drops the
    trailing clusters of the affected ray chunk."""
    if interpret is None:
        interpret = _use_interpret()
    lo = accel.cluster_lo
    hi = accel.cluster_hi
    tri_rows = accel.tri_rows
    prim_tri = accel.prim_tri
    prim_inst = accel.prim_inst
    n_clusters = int(accel.cluster_lo.shape[0])
    n_prims = prim_tri.shape[0]

    def _tmax_vec(org, t_max):
        n = org.shape[0]
        tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        return jnp.where(jnp.isfinite(tm), tm, BIG)

    def _run(org, dirn, t_max):
        n = org.shape[0]
        cap = -(-(n * pairs_per_ray) // BLOCK) * BLOCK
        return _trace_pairs(
            org, dirn, _tmax_vec(org, t_max), jnp.asarray(lo),
            jnp.asarray(hi), jnp.asarray(tri_rows),
            n_clusters=n_clusters, pair_cap=cap, interpret=interpret,
        )

    def _hit_from(bt, bu, bv, bs):
        slot = bs.astype(jnp.int32)
        valid = slot >= 0
        slot_c = jnp.clip(slot, 0, n_prims - 1)
        return Hit(
            t=jnp.where(valid, bt, jnp.inf),
            u=bu,
            v=bv,
            tri=jnp.asarray(prim_tri)[slot_c],
            inst=jnp.asarray(prim_inst)[slot_c],
            valid=valid,
            slot=jnp.where(valid, slot_c, -1),
        )

    def closest(org, dirn, t_min, t_max) -> Hit:
        del t_min
        bt, bu, bv, bs, _ = _run(org, dirn, t_max)
        return _hit_from(bt, bu, bv, bs)

    def any_hit(org, dirn, t_min, t_max):
        del t_min
        _, _, _, bs, _ = _run(org, dirn, t_max)
        return bs >= 0.0

    def closest_with_stats(org, dirn, t_min, t_max):
        del t_min
        bt, bu, bv, bs, stats = _run(org, dirn, t_max)
        return _hit_from(bt, bu, bv, bs), stats

    closest.with_stats = closest_with_stats
    return closest, any_hit
