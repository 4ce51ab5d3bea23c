"""Tile-wavefront traversal — (ray-tile, cluster) pair intersection.

The production TPU traversal path (SURVEY.md G2/G4). Same idea as
tpurt.kernels.pairwave — match rays to the clusters they pierce, then do
only the matched intersection work — but at (1024-ray tile, cluster)
granularity, which eliminates every slow XLA data-movement primitive
(measured on the axon TPU, benchmarks/profile_pair_phases.py: per-ray
pair expansion spent 3.7 s in nonzero + 0.63 s in gathers + 0.17 s in
scatters while the actual intersection kernel took 23 ms):

  1. CULL (XLA, fused):  tile_mask[T, C] — does ANY ray of tile t hit
     cluster c's AABB?  A dense slab test reduced over the tile axis;
     nothing big materializes.
  2. EXPAND (XLA, tiny): nonzero over the (T, C) mask — ~10⁵ elements,
     not 10⁸ — then a small lax.sort merges in one GUARANTEED sentinel
     pair per tile (cluster −1; the kernel initializes a tile's output on
     its first pair, so every output block is always written even under
     budget overflow). Pairs are tile-major after the merge.
  3. TEST (Pallas):      grid over pairs. Scalar-prefetched pair arrays
     drive the BlockSpec index maps, so each grid step reads its ray
     tile DIRECTLY from the SoA buffers (no gather) and accumulates
     best-hit state INTO the tile's output block (consecutive pairs of a
     tile revisit the same block — the standard TPU grid-reduction
     pattern; no scatter).
  4. Output blocks reshape straight back to per-ray arrays (ray order is
     never permuted).

Redundancy: every ray in a tile tests every cluster the TILE's union
reaches — the packet-tracing bargain, but per 96-triangle cluster
instead of per whole-BVH-walk, and with zero machinery overhead. Rays
should arrive tile-coherent (the render pipelines trace in screen-tile
order; bounce waves inherit origin coherence from their pixels).

Closure discipline: accel fields ride as jit arguments (axon D2H poison,
benchmarks/profile_poison.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.bvh.paircluster import (
    INST_SHIFT,
    ROWS_PER_CLUSTER,
    SC_SIZE as _SC_SIZE,
    PairAccel,
)
from tpurt.kernels.packet import BIG, EPS_DENOM, _ray_sort_keys, \
    _use_interpret
from tpurt.render.intersectors import Hit

import os as _os

# rays per tile: TILE/128 sublane rows per SoA field. 1024 = one (8,128)
# native VPU tile; 2048 halves the per-row lane-extract amortization at
# the cost of wider tile unions (env-tunable for benchmarking).
TILE = int(_os.environ.get("TPURT_TILE_SIZE", 1024))
SUB = TILE // 128  # sublane rows per field
# pair-loop unroll factor (see _tileloop_kernel): trades while-loop
# machinery (~250 ns/iter) for code size / guard ops. Hardware A/B
# (benchmarks/ab_results.jsonl): 4 beats 2 by ~5% e2e; 8 regresses.
PAIR_UNROLL = int(_os.environ.get("TPURT_PAIR_UNROLL", 4))
# interpret-mode unroll: an EXPLICIT env value is honored (the unroll
# oracle tests exercise guard/DMA-drain balance at 1/4/8 on CPU); the
# hardware default stays 2 under interpret so the CPU test suite keeps
# compact jaxprs (unrolling only pays on hardware — PARITY.md law 3)
PAIR_UNROLL_INTERP = (PAIR_UNROLL if "TPURT_PAIR_UNROLL" in _os.environ
                      else 2)
_TPR = 12
_LANES_PER_TRI = 10


def _row_candidates(row, ox, oy, oz, dx, dy, dz, out):
    """Append the row's 12 independent Möller–Trumbore candidate tuples
    (t-or-BIG, u, v, slot) to ``out`` — no folding, no best-state reads.

    Keeping every triangle test independent lets the VPU pipeline them
    at issue rate; a per-row fold+select serialized on the best-state
    carry measured ~240 ns/row vs ~45 ns of issue work (the fold across
    all rows happens once per cluster in the caller)."""
    for j in range(_TPR):
        base = j * _LANES_PER_TRI
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
        out.append((jnp.where(ok, t, BIG), u, v, sl))


def _fold_candidates(cand):
    """Tree-fold candidate tuples to the single closest one."""
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
    return cand[0]


def _row_candidates_smem(sm_ref, slot, r, ox, oy, oz, dx, dy, dz, out):
    """_row_candidates twin reading triangle scalars from an SMEM copy of
    the cluster (sm_ref[slot, r, lane]) instead of vector lane extracts —
    SMEM scalar loads go through the scalar pipe and do not block the
    VPU (the lane-extract version measured ~240 ns/row, extract-bound).

    TPURT_APPROX_RECIP=1 replaces the full-precision ``1/det`` with the
    VPU's approximate reciprocal plus one Newton step (~fp32-accurate:
    rel err ≤ ~2⁻²² vs ~2⁻¹⁴ raw) — worth it iff divide is multi-cycle
    on this backend (benchmarks/probe_vpu_ops.py measures that)."""
    approx = _os.environ.get("TPURT_APPROX_RECIP", "0") == "1"
    for j in range(_TPR):
        base = j * _LANES_PER_TRI
        v0x = sm_ref[slot, r, base + 0]
        v0y = sm_ref[slot, r, base + 1]
        v0z = sm_ref[slot, r, base + 2]
        e1x = sm_ref[slot, r, base + 3]
        e1y = sm_ref[slot, r, base + 4]
        e1z = sm_ref[slot, r, base + 5]
        e2x = sm_ref[slot, r, base + 6]
        e2y = sm_ref[slot, r, base + 7]
        e2z = sm_ref[slot, r, base + 8]
        sl = sm_ref[slot, r, base + 9]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok_det = jnp.abs(det) > EPS_DENOM
        den = jnp.where(ok_det, det, 1.0)
        if approx:
            r0 = pl.reciprocal(den, approx=True)
            inv = r0 * (2.0 - den * r0)  # one Newton step
        else:
            inv = 1.0 / den
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
        out.append((jnp.where(ok, t, BIG), u, v, sl))


def _row_occluded_smem(sm_ref, slot, r, ox, oy, oz, dx, dy, dz, bt):
    """Division-free any-hit twin of ``_row_candidates_smem``: OR-folds
    the row's 12 Möller–Trumbore window tests without computing
    ``inv = 1/det`` or carrying (t, u, v, slot) closest-fold state.

    Sign-normalizing by ``sg = sign(det)`` turns the post-division
    conditions ``u ≥ 0, v ≥ 0, u+v ≤ 1, 0 < t < tmax`` into the exact
    divide-free equivalents ``su ≥ 0, sv ≥ 0, su+sv ≤ ad, 0 < st <
    bt·ad`` (ad = |det|). ``bt`` is the lane's live window: tmax for
    live lanes, −1 for dead OR already-occluded lanes — the latter can
    never re-trigger because ``st < bt·ad`` is false for bt < 0."""
    occ = None
    for j in range(_TPR):
        base = j * _LANES_PER_TRI
        v0x = sm_ref[slot, r, base + 0]
        v0y = sm_ref[slot, r, base + 1]
        v0z = sm_ref[slot, r, base + 2]
        e1x = sm_ref[slot, r, base + 3]
        e1y = sm_ref[slot, r, base + 4]
        e1z = sm_ref[slot, r, base + 5]
        e2x = sm_ref[slot, r, base + 6]
        e2y = sm_ref[slot, r, base + 7]
        e2z = sm_ref[slot, r, base + 8]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        sg = jnp.where(det >= 0.0, 1.0, -1.0)
        ad = det * sg
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        su = (tx * px + ty * py + tz * pz) * sg
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        sv = (dx * qx + dy * qy + dz * qz) * sg
        st = (e2x * qx + e2y * qy + e2z * qz) * sg
        hit = (
            (ad > EPS_DENOM)
            & (su >= 0.0)
            & (sv >= 0.0)
            & (su + sv <= ad)
            & (st > 0.0)
            & (st < bt * ad)
        )
        occ = hit if occ is None else (occ | hit)
    return occ


def _row_box_interval(sm0, slot0, r, ox, oy, oz, ivx, ivy, ivz, far):
    """Slab interval of row r's sub-AABB (SMEM spare lanes 120–125)
    against the tile's rays, far-limited by ``far`` (the current best t).
    """
    blox = sm0[slot0, r, 120]
    bloy = sm0[slot0, r, 121]
    bloz = sm0[slot0, r, 122]
    bhix = sm0[slot0, r, 123]
    bhiy = sm0[slot0, r, 124]
    bhiz = sm0[slot0, r, 125]
    t0x = (blox - ox) * ivx
    t1x = (bhix - ox) * ivx
    t0y = (bloy - oy) * ivy
    t1y = (bhiy - oy) * ivy
    t0z = (bloz - oz) * ivz
    t1z = (bhiz - oz) * ivz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), far),
    )
    return tn, tf


def _tile_kernel(
    *refs,  # prefetch ref(s), tri_ref, ray_ref, out_ref, scratch...
    unroll: bool,
    any_hit: bool,
    smem_tri: bool = False,
    two_level: bool = False,
    n_out: int = 4,
    row_skip: bool = True,
):
    # Operand layout (two_level adds the pair_meta/xform prefetch refs):
    #   pk_ref   scalar prefetch (SMEM): pair → tile·2¹⁶ + cluster + 1
    #   pm_ref   (two_level) (IC,) i32: row_base | instance << INST_SHIFT
    #   xf_ref   (two_level) (IC·12,) f32: world→object 3×4 per cluster
    #   tri_ref  (R, 128) f32 VMEM — packed tri table (object space when
    #            two_level, world space otherwise)
    #   ray_ref  (10·SUB, 128) — packed ray tile
    #   out_ref  (n_out·SUB, 128) — best state: bt|bu|bv|bs[|bi]
    # Single packed ray operand and single packed output: per grid step
    # Mosaic evaluates every operand's index map and change-detects its
    # block — 12 separate operands cost ~1 µs/step of pure machinery
    # (profiled); 3 operands cut that ~4×.
    if two_level:
        pk_ref, pm_ref, xf_ref, tri_ref, ray_ref, out_ref = refs[:6]
        scratch = refs[6:]
    else:
        pk_ref, tri_ref, ray_ref, out_ref = refs[:4]
        scratch = refs[4:]
    i = pl.program_id(0)
    v = pk_ref[i]
    c = (v & 0xFFFF) - 1
    prev_t = pk_ref[jnp.maximum(i - 1, 0)] >> 16
    first = (i == 0) | (prev_t != (v >> 16))

    if two_level:
        meta_v = pm_ref[jnp.maximum(c, 0)]
        inst_f = (meta_v >> INST_SHIFT).astype(jnp.float32)

        def row_base(cid):
            return pm_ref[cid] & ((1 << INST_SHIFT) - 1)
    else:
        inst_f = None

        def row_base(cid):
            return cid * ROWS_PER_CLUSTER

    if smem_tri:
        sm_ref, sems = scratch[0], scratch[1]
        slot = jax.lax.rem(i, 2)
        nslot = 1 - slot

        def cluster_dma(s, cid):
            return pltpu.make_async_copy(
                tri_ref.at[pl.ds(row_base(cid), ROWS_PER_CLUSTER), :],
                sm_ref.at[s],
                sems.at[s],
            )

        # bootstrap: the first pair starts its own copy
        @pl.when((i == 0) & (c >= 0))
        def _():
            cluster_dma(slot, c).start()

        # prefetch the NEXT pair's cluster while this one computes; the
        # wait below uses the exact same condition (cn >= 0 at i+1 ⇔
        # c >= 0 at that step), so semaphores stay balanced even when
        # the any-hit early-out skips a pair's compute
        nv = pk_ref[jnp.minimum(i + 1, pl.num_programs(0) - 1)]
        cn = (nv & 0xFFFF) - 1

        @pl.when((i + 1 < pl.num_programs(0)) & (cn >= 0))
        def _():
            cluster_dma(nslot, cn).start()

        @pl.when(c >= 0)
        def _():
            cluster_dma(slot, c).wait()

    @pl.when(first)
    def _():
        tm = ray_ref[6 * SUB:7 * SUB, :]
        out_ref[0:SUB, :] = jnp.where(tm >= 0.0, tm, -1.0)
        out_ref[SUB:3 * SUB, :] = jnp.zeros((2 * SUB, 128), jnp.float32)
        out_ref[3 * SUB:n_out * SUB, :] = jnp.full(
            ((n_out - 3) * SUB, 128), -1.0, jnp.float32
        )

    def _load_rays():
        """Ray tile components (+ inverse dirs), transformed into the
        cluster's object space when two_level (the TLAS→BLAS ray
        transform of SURVEY.md §3.3 — d is NOT renormalized, so the hit
        parameter t stays in world units across instances)."""
        ox = ray_ref[0:SUB, :]
        oy = ray_ref[SUB:2 * SUB, :]
        oz = ray_ref[2 * SUB:3 * SUB, :]
        dx = ray_ref[3 * SUB:4 * SUB, :]
        dy = ray_ref[4 * SUB:5 * SUB, :]
        dz = ray_ref[5 * SUB:6 * SUB, :]
        if not two_level:
            return (ox, oy, oz, dx, dy, dz,
                    ray_ref[7 * SUB:8 * SUB, :],
                    ray_ref[8 * SUB:9 * SUB, :],
                    ray_ref[9 * SUB:10 * SUB, :])
        b = jnp.maximum(c, 0) * 12
        m = [xf_ref[b + k] for k in range(12)]
        nox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        noy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        noz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        ndx = m[0] * dx + m[1] * dy + m[2] * dz
        ndy = m[4] * dx + m[5] * dy + m[6] * dz
        ndz = m[8] * dx + m[9] * dy + m[10] * dz

        def inv(dv):
            return 1.0 / jnp.where(
                jnp.abs(dv) < 1e-12,
                jnp.where(dv >= 0.0, 1e-12, -1e-12), dv,
            )

        return (nox, noy, noz, ndx, ndy, ndz,
                inv(ndx), inv(ndy), inv(ndz))

    do = c >= 0
    if any_hit:
        # occlusion early-out: once every lane of the tile is occluded
        # (bs ≥ 0) or dead (bt < 0), the remaining pairs skip their body
        # — shadow waves in closed scenes occlude fast, and this was the
        # single biggest kernel cost of the staged pipeline (116 ms per
        # 960k-ray occlude, profiled)
        done = jnp.all(
            (out_ref[3 * SUB:4 * SUB, :] >= 0.0)
            | (out_ref[0:SUB, :] < 0.0)
        )
        do = do & (first | ~done)

    if smem_tri and not row_skip:
        # fallback structure (TPURT_ROW_SKIP=0): round-1's independent
        # unrolled rows + one fold per pair, with a per-pair cluster-box
        # pre-test assembled from the row boxes — compile-time insurance
        # should the conditional-per-row kernel regress the Mosaic
        # remote-compile service
        sm0 = scratch[0]
        slot0 = slot

        @pl.when(do)
        def _():
            (ox, oy, oz, dx, dy, dz, ivx, ivy, ivz) = _load_rays()
            bt = out_ref[0:SUB, :]
            hit_any = None
            for r in range(ROWS_PER_CLUSTER):
                tn, tf = _row_box_interval(
                    sm0, slot0, r, ox, oy, oz, ivx, ivy, ivz, bt
                )
                h = tn <= tf
                hit_any = h if hit_any is None else (hit_any | h)
            ok = jnp.any(hit_any)

            @pl.when(ok)
            def _():
                rows_out = []
                for r in range(ROWS_PER_CLUSTER):
                    cand = []
                    _row_candidates_smem(
                        sm0, slot0, r, ox, oy, oz, dx, dy, dz, cand
                    )
                    rows_out.append(_fold_candidates(cand))
                tm_c, um, vm, sm = _fold_candidates(rows_out)
                win = tm_c < bt
                out_ref[0:SUB, :] = jnp.where(win, tm_c, bt)
                out_ref[SUB:2 * SUB, :] = jnp.where(
                    win, um, out_ref[SUB:2 * SUB, :])
                out_ref[2 * SUB:3 * SUB, :] = jnp.where(
                    win, vm, out_ref[2 * SUB:3 * SUB, :])
                out_ref[3 * SUB:4 * SUB, :] = jnp.where(
                    win, sm, out_ref[3 * SUB:4 * SUB, :])
                if two_level:
                    out_ref[4 * SUB:5 * SUB, :] = jnp.where(
                        win, inst_f, out_ref[4 * SUB:5 * SUB, :])

        return

    if smem_tri:
        # Per-ROW exact skip test: every 12-tri row carries its own
        # sub-AABB in its SMEM spare lanes (120–125); slab-test it
        # against the tile's rays with the CURRENT best t as the far
        # limit, and skip the whole row when no ray can beat it.
        # Skipping is exact (a triangle inside the box cannot beat a
        # best t the box itself cannot beat). This subsumes the old
        # per-pair cluster pre-test (a pair whose 8 rows all fail does
        # no triangle work) and — critically for divergent bounce
        # waves, where the conservative tile mask passes most clusters
        # — culls at 12-tri granularity for ~25 vector ops per row vs
        # ~420 of row tests. Best-hit state accumulates in a VMEM
        # scratch (conditionally-written rows need a ref, not values).
        sm0 = scratch[0]
        acc = scratch[2]
        slot0 = slot  # computed at kernel top (program_id inside a cond
        # branch has no lowering rule in interpret mode)

        @pl.when(do)
        def _():
            (ox, oy, oz, dx, dy, dz, ivx, ivy, ivz) = _load_rays()
            bt = out_ref[0:SUB, :]
            acc[0:SUB, :] = jnp.full((SUB, 128), BIG, jnp.float32)
            acc[SUB:3 * SUB, :] = jnp.zeros((2 * SUB, 128), jnp.float32)
            acc[3 * SUB:4 * SUB, :] = jnp.full((SUB, 128), -1.0,
                                               jnp.float32)
            for r in range(ROWS_PER_CLUSTER):
                tn, tf = _row_box_interval(
                    sm0, slot0, r, ox, oy, oz, ivx, ivy, ivz,
                    jnp.minimum(bt, acc[0:SUB, :]),
                )
                row_ok = jnp.any(tn <= tf)

                @pl.when(row_ok)
                def _(r=r):
                    cand = []
                    _row_candidates_smem(
                        sm0, slot0, r, ox, oy, oz, dx, dy, dz, cand
                    )
                    tr, ur, vr, sr = _fold_candidates(cand)
                    at = acc[0:SUB, :]
                    win = tr < at
                    acc[0:SUB, :] = jnp.where(win, tr, at)
                    acc[SUB:2 * SUB, :] = jnp.where(
                        win, ur, acc[SUB:2 * SUB, :])
                    acc[2 * SUB:3 * SUB, :] = jnp.where(
                        win, vr, acc[2 * SUB:3 * SUB, :])
                    acc[3 * SUB:4 * SUB, :] = jnp.where(
                        win, sr, acc[3 * SUB:4 * SUB, :])
            tm_c = acc[0:SUB, :]
            win = tm_c < bt
            out_ref[0:SUB, :] = jnp.where(win, tm_c, bt)
            out_ref[SUB:2 * SUB, :] = jnp.where(
                win, acc[SUB:2 * SUB, :], out_ref[SUB:2 * SUB, :])
            out_ref[2 * SUB:3 * SUB, :] = jnp.where(
                win, acc[2 * SUB:3 * SUB, :],
                out_ref[2 * SUB:3 * SUB, :])
            out_ref[3 * SUB:4 * SUB, :] = jnp.where(
                win, acc[3 * SUB:4 * SUB, :],
                out_ref[3 * SUB:4 * SUB, :])
            if two_level:
                out_ref[4 * SUB:5 * SUB, :] = jnp.where(
                    win, inst_f, out_ref[4 * SUB:5 * SUB, :])

        return

    @pl.when(do)
    def _():
        (ox, oy, oz, dx, dy, dz, _, _, _) = _load_rays()
        base = row_base(jnp.maximum(c, 0))
        if unroll:
            # hardware: rows are independent of each other (the previous
            # per-row merge into the best-state carry serialized at
            # ~240 ns/row); each row folds its own 12 candidates, the 16
            # row winners tree-fold once per cluster. Keeping all 192
            # candidates live instead blew VMEM/registers (3 MB live)
            # and the compile never finished.
            rows_out = []
            for r in range(ROWS_PER_CLUSTER):
                row = tri_ref[pl.ds(base + r, 1), :]
                cand = []
                _row_candidates(row, ox, oy, oz, dx, dy, dz, cand)
                rows_out.append(_fold_candidates(cand))
            tm_c, um, vm, sm = _fold_candidates(rows_out)
        else:
            # interpret mode keeps a compact fori jaxpr (full unrolling
            # made the CPU test suite 8× slower to execute)
            def rbody(r, cr):
                row = tri_ref[pl.ds(base + r, 1), :]
                out = []
                _row_candidates(row, ox, oy, oz, dx, dy, dz, out)
                return _fold_candidates(out + [cr])

            init = (jnp.full((SUB, 128), BIG, jnp.float32),
                    jnp.zeros((SUB, 128), jnp.float32),
                    jnp.zeros((SUB, 128), jnp.float32),
                    jnp.full((SUB, 128), -1.0, jnp.float32))
            tm_c, um, vm, sm = jax.lax.fori_loop(
                0, ROWS_PER_CLUSTER, rbody, init
            )
        bt = out_ref[0:SUB, :]
        win = tm_c < bt
        out_ref[0:SUB, :] = jnp.where(win, tm_c, bt)
        out_ref[SUB:2 * SUB, :] = jnp.where(win, um,
                                            out_ref[SUB:2 * SUB, :])
        out_ref[2 * SUB:3 * SUB, :] = jnp.where(
            win, vm, out_ref[2 * SUB:3 * SUB, :])
        out_ref[3 * SUB:4 * SUB, :] = jnp.where(
            win, sm, out_ref[3 * SUB:4 * SUB, :])
        if two_level:
            out_ref[4 * SUB:5 * SUB, :] = jnp.where(
                win, inst_f, out_ref[4 * SUB:5 * SUB, :])


def _tile_mask(org, dirn, t_max_vec, lo, hi, n_tiles, return_tn=False):
    """(T, C) bool, CONSERVATIVE: may cluster c's box be hit by some ray
    of tile t?  With ``return_tn`` also returns the (T, C) f32 lower
    bound of the slab entry distance (the front-to-back pair-ordering
    key: testing near clusters first tightens every ray's best t early,
    which the kernel's per-row box far-limit then turns into skipped
    rows; for any-hit waves near clusters occlude sooner, feeding the
    all-occluded early-out).

    Interval-arithmetic frustum test: the tile is summarized by its
    alive-ray origin box and inverse-direction interval, and the slab
    test runs on intervals — T·C·~40 ops instead of the exact per-ray
    N·C·12 reduction (which cost 15 ms/trace on the axon TPU). The mask
    is a superset of the exact one (extra pairs only add masked work in
    the kernel, they never lose hits). Tiles with mixed direction signs
    get ±huge inverse intervals and conservatively pass — the Morton
    ray sort keeps real tiles sign-pure."""
    o = org.reshape(n_tiles, TILE, 3)
    d = dirn.reshape(n_tiles, TILE, 3)
    tm = t_max_vec.reshape(n_tiles, TILE)
    alive = (tm >= 0.0)[..., None]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d >= 0.0, 1e-12, -1e-12), d)
    tm_t = jnp.max(tm, axis=1)  # (T,) — max alive tmax (dead are -1)

    # Aggregates are SIGN-SPLIT per axis: a tile mixing +x and −x rays
    # would otherwise get an inverse interval spanning ±∞ and pass every
    # cluster (screen-tile-boundary tiles did exactly that). Each sign
    # group gets its own per-axis origin/inverse interval; the per-AXIS
    # slab interval is the union over present groups (a ray's group can
    # differ per axis, so the union must happen before the cross-axis
    # max/min — per-group tn/tf would be unsound for mixed octants).
    near_lo = None  # (T, C, 3) lower bound of per-axis slab entry
    far_hi = None  # (T, C, 3) upper bound of per-axis slab exit
    for g_mask in ((d >= 0.0) & alive, (d < 0.0) & alive):
        olo = jnp.min(jnp.where(g_mask, o, BIG), axis=1)  # (T, 3)
        ohi = jnp.max(jnp.where(g_mask, o, -BIG), axis=1)
        ivlo = jnp.min(jnp.where(g_mask, inv, BIG), axis=1)
        ivhi = jnp.max(jnp.where(g_mask, inv, -BIG), axis=1)
        present = jnp.any(g_mask, axis=1)[:, None]  # (T, 1, 3)

        def plane(b):  # interval of (b - o) * iv; b: (1, C, 3)
            alo = b - ohi[:, None]
            ahi = b - olo[:, None]
            p1 = alo * ivlo[:, None]
            p2 = alo * ivhi[:, None]
            p3 = ahi * ivlo[:, None]
            p4 = ahi * ivhi[:, None]
            return (
                jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
            )

        t0_lo, t0_hi = plane(lo[None])
        t1_lo, t1_hi = plane(hi[None])
        g_near = jnp.where(present, jnp.minimum(t0_lo, t1_lo), BIG)
        g_far = jnp.where(present, jnp.maximum(t0_hi, t1_hi), -BIG)
        near_lo = g_near if near_lo is None else jnp.minimum(near_lo,
                                                             g_near)
        far_hi = g_far if far_hi is None else jnp.maximum(far_hi, g_far)
    tn_lower = jnp.max(near_lo, axis=-1)  # (T, C)
    tf_upper = jnp.min(far_hi, axis=-1)
    mask = (
        (tn_lower <= tf_upper)
        & (tf_upper >= 0.0)
        & (tn_lower <= tm_t[:, None])
        & (tm_t[:, None] >= 0.0)
    )
    if return_tn:
        return mask, tn_lower
    return mask


def _exact_any_mask(org, dirn, t_max_vec, lo, hi, n_tiles,
                    return_tn=False):
    """(T, C) bool, EXACT: does ANY ray of tile t hit cluster c's box?

    The interval-frustum mask (``_tile_mask``) is loose by construction —
    the origin-box × inverse-direction-interval product covers ray
    combinations that do not exist; on the bunny bounce wave it passes
    296 pairs/tile where only 96 have any true ray·box hit, and even
    128-ray sub-frustums only trim it to 288 (benchmarks/
    probe_sortkey.py::main3 — the looseness is the interval arithmetic,
    not tile width). TPURT_EXACT_MASK=1 replaces ~150 ns of in-kernel
    machinery+pre-test per frustum-only pair (plus its 4 KB cluster DMA)
    with a dense per-ray slab reduction here (~N·C·16 flops of fused
    XLA, chunked over tiles to bound VMEM).

    With ``return_tn`` also returns the (T, C) f32 minimum slab-entry
    distance over the tile's HITTING rays (BIG where none hit) — the
    exact front-to-back/far-break key. It dominates the interval bound
    (every hitting lane's true entry is ≥ this min, and non-hitting
    lanes cannot find a hit in the cluster at all), so the kernel's
    far break fires earlier: the interval bound was loose enough that
    on closest bounce waves it NEVER tripped (probe_kernel_sim.py).
    """
    C = lo.shape[0]
    o = org.reshape(n_tiles, TILE, 3)
    tm = t_max_vec.reshape(n_tiles, TILE)
    inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                          jnp.where(dirn >= 0.0, 1e-12, -1e-12), dirn)
    iv = inv.reshape(n_tiles, TILE, 3)
    # chunk tiles so the (chunk, TILE, C) intermediates stay ~tens of MB
    chunk = max(1, min(n_tiles, 8))
    pad = (-n_tiles) % chunk
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, TILE, 3))])
        iv = jnp.concatenate([iv, jnp.ones((pad, TILE, 3))])
        tm = jnp.concatenate([tm, jnp.full((pad, TILE), -1.0)])

    def body(args):
        oc, ic, tc = args  # (chunk, TILE, 3), ..., (chunk, TILE)
        tn = jnp.zeros((chunk, TILE, C), jnp.float32)
        tf = jnp.broadcast_to(
            jnp.maximum(tc, 0.0)[..., None], (chunk, TILE, C))
        for a in range(3):
            t0 = (lo[None, None, :, a] - oc[..., a:a + 1]) \
                * ic[..., a:a + 1]
            t1 = (hi[None, None, :, a] - oc[..., a:a + 1]) \
                * ic[..., a:a + 1]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tc >= 0.0)[..., None]
        if return_tn:
            tn_min = jnp.min(jnp.where(hit, tn, BIG), axis=1)
            return jnp.any(hit, axis=1), tn_min  # (chunk, C) ×2
        return jnp.any(hit, axis=1)  # (chunk, C)

    m = jax.lax.map(body, (
        o.reshape(-1, chunk, TILE, 3),
        iv.reshape(-1, chunk, TILE, 3),
        tm.reshape(-1, chunk, TILE),
    ))
    if return_tn:
        m, tn_min = m
        return (m.reshape(-1, C)[:n_tiles],
                tn_min.reshape(-1, C)[:n_tiles])
    return m.reshape(-1, C)[:n_tiles]


def _exact_mask_kernel(ray_ref, box_ref, mask_ref, tn_ref, *,
                       n_blocks: int, group: int):
    """Dense exact-ANY tile mask, one grid step per GROUP of ray tiles.

    Layout is the whole trick: rays ride the SUBLANE axis (``ray_ref``
    block (group·TILE, 8) — field slices are (TILE, 1) columns) and
    clusters ride the LANE axis (``box_ref`` rows are (1, Cp) slices),
    so each ray×cluster slab op is one fat (TILE, 128) VPU op. The
    per-tile body is ~16 ops × Cp/128 statically-unrolled blocks — no
    inner fori/while (whose ~250 ns/iteration machinery is exactly what
    this kernel exists to avoid, PARITY.md law 3) and a tiny jaxpr.
    Tiles are processed in groups of ``group`` (= 8) because the Mosaic
    lowering requires output block sublane dims divisible by 8 — a
    (1, Cp) per-tile output block is rejected on hardware (the
    round-2 session-7 A/B launch failure); grouping also amortizes the
    grid machinery 8×.

    ray_ref  (group·TILE, 8) f32: ox oy oz ivx ivy ivz tm pad
             (tm < 0 = dead; trailing-tile padding rides as dead rays)
    box_ref  (8, Cp) f32: lox loy loz hix hiy hiz pad pad (empty boxes
             where padded: lo=+BIG, hi=−BIG — they can never hit)
    mask_ref (group, Cp) f32: 1.0 where ANY live ray of tile g hits
    tn_ref   (group, Cp) f32: min slab-entry over tile g's HITTING rays
             (BIG where none) — the exact far-break key
    """
    # ray rows are processed in RCH-row chunks accumulated into the
    # output refs: full-TILE (1024, 128) intermediates put the kernel
    # ~21 MB over the ~16 MB scoped-VMEM stack limit on v5e (measured
    # launch failure); (RCH, 128) temps keep the stack ~1 MB.
    RCH = 256
    for g in range(group):
        for b in range(n_blocks):
            sl = pl.ds(b * 128, 128)
            mask_ref[g:g + 1, sl] = jnp.zeros((1, 128), jnp.float32)
            tn_ref[g:g + 1, sl] = jnp.full((1, 128), BIG, jnp.float32)
        for rc in range(TILE // RCH):
            rows = pl.ds(g * TILE + rc * RCH, RCH)
            o = [ray_ref[rows, a:a + 1] for a in range(3)]
            iv = [ray_ref[rows, 3 + a:4 + a] for a in range(3)]
            tm = ray_ref[rows, 6:7]
            alive = tm >= 0.0
            tf0 = jnp.maximum(tm, 0.0)
            for b in range(n_blocks):
                sl = pl.ds(b * 128, 128)
                tn = jnp.zeros((RCH, 128), jnp.float32)
                tf = jnp.broadcast_to(tf0, (RCH, 128))
                for a in range(3):
                    lo_a = box_ref[a:a + 1, sl]
                    hi_a = box_ref[3 + a:4 + a, sl]
                    t0 = (lo_a - o[a]) * iv[a]
                    t1 = (hi_a - o[a]) * iv[a]
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                hit = (tn <= tf) & alive
                mask_ref[g:g + 1, sl] = jnp.maximum(
                    mask_ref[g:g + 1, sl],
                    jnp.any(hit, axis=0, keepdims=True
                            ).astype(jnp.float32),
                )
                tn_ref[g:g + 1, sl] = jnp.minimum(
                    tn_ref[g:g + 1, sl],
                    jnp.min(jnp.where(hit, tn, BIG), axis=0,
                            keepdims=True),
                )


def _exact_any_mask_pallas(org, dirn, t_max_vec, lo, hi, n_tiles,
                           interpret=False):
    """Pallas twin of ``_exact_any_mask(..., return_tn=True)``.

    The XLA lax.map version measured ~6× the VPU floor on hardware
    (sequential 8-tile chunks under a while loop); at bench scale its
    cost canceled exactly the in-kernel pair savings it bought
    (session-7 A/B wash). This kernel runs the same N·C·16-flop slab
    reduction at ~4 µs/tile, which flips the exact mask from a wash to
    a win: traversal segments carry only EXACT pairs (bounce ~96 vs 296
    frustum, shadow ~8 vs 135 — probe_cluster.py), so the traversal
    kernel pays DMA + machinery only where a real ray·box hit exists.

    Returns (mask (T, C) bool, tn_min (T, C) f32).
    """
    C = lo.shape[0]
    n = org.shape[0]
    cp = ((C + 127) // 128) * 128
    group = 8  # Mosaic output-block sublane rule (see kernel docstring)
    tp = ((n_tiles + group - 1) // group) * group
    inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                          jnp.where(dirn >= 0.0, 1e-12, -1e-12), dirn)
    ray_pack = jnp.concatenate(
        [org, inv, t_max_vec[:, None],
         jnp.zeros((n, 1), jnp.float32)], axis=1,
    )  # (N, 8)
    if tp != n_tiles:
        # trailing-group padding: dead rays (tm = −1) never hit
        pad = jnp.zeros(((tp - n_tiles) * TILE, 8), jnp.float32)
        pad = pad.at[:, 6].set(-1.0)
        ray_pack = jnp.concatenate([ray_pack, pad])
    boxes = jnp.full((8, cp), BIG, jnp.float32)
    boxes = boxes.at[3:6, :].set(-BIG)
    boxes = boxes.at[0:3, :C].set(jnp.asarray(lo).T)
    boxes = boxes.at[3:6, :C].set(jnp.asarray(hi).T)

    mask_f, tn = pl.pallas_call(
        functools.partial(_exact_mask_kernel, n_blocks=cp // 128,
                          group=group),
        grid=(tp // group,),
        in_specs=[
            pl.BlockSpec((group * TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((group, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, cp), jnp.float32),
            jax.ShapeDtypeStruct((tp, cp), jnp.float32),
        ],
        interpret=interpret,
        # the (group·TILE, 8) ray block lane-pads to (8,128) tiles in
        # VMEM (4 MB, double-buffered) and the unrolled body's live
        # ranges overlap — ~21 MB scoped VMEM at bench scale, over the
        # 16 MB DEFAULT cap. v5e has 128 MB physical VMEM; raise the cap.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(ray_pack, boxes)
    return mask_f[:n_tiles, :C] > 0.5, tn[:n_tiles, :C]


def _exact_entry_kernel(scale_ref, ray_ref, box_ref, ent_ref,
                        hit_acc, tn_acc, *, n_blocks: int, group: int,
                        n_real: int):
    """``_exact_mask_kernel`` twin that emits PACKED ENTRY WORDS.

    Round 5 (VERDICT r4 weak #1 "fuse mask/entry production into the
    traversal launch"): true single-program fusion is impossible — the
    per-tile front-to-back order requires a lane-axis sort between mask
    and traversal, and Mosaic has no in-kernel sort/scatter (the dense
    skip-loop alternative is bounded out by the ~250 ns/fori-iteration
    law — see docs/DESIGN_perray_staging.md round-5 note). What IS
    fusable is the ENTRY BUILD: this kernel accumulates the same
    hit-any/min-tn state as the mask kernel (VMEM scratch instead of
    output refs), then packs ``(tn_q << 16) | cluster_id`` (INT32_MAX
    where no ray hits) straight into the output — the exact word the
    entry-row lane sort consumes. vs the mask kernel + XLA expansion:
    one i32 output instead of two f32 (half the HBM write+read), no
    (tp,cp)→(T,C) output slices, no where/iota/clip/shift/pad XLA pass
    (measured 31 ms/trace at sponza 1080p, probe_sponza_decomp.json),
    and the output shape is already the (tp, cp) slab layout the sort
    wants (tp pads to group=8=ENTRY_GROUP).

    scale_ref SMEM (1,) f32: tn quantization scale (scene_diag/32766 —
    same formula as the XLA path, so packed words are bit-identical).

    The slab-accumulation body is intentionally kept in lockstep with
    ``_exact_mask_kernel`` (still used by the budgeted path and the
    TPURT_FUSED_ENTRIES=0 control): any math change must be applied to
    both, and test_fused_entries_match_xla_build bit-compares the two
    end-to-end, so drift fails the suite loudly.
    """
    RCH = 256
    for g in range(group):
        for b in range(n_blocks):
            sl = pl.ds(b * 128, 128)
            hit_acc[g:g + 1, sl] = jnp.zeros((1, 128), jnp.float32)
            tn_acc[g:g + 1, sl] = jnp.full((1, 128), BIG, jnp.float32)
        for rc in range(TILE // RCH):
            rows = pl.ds(g * TILE + rc * RCH, RCH)
            o = [ray_ref[rows, a:a + 1] for a in range(3)]
            iv = [ray_ref[rows, 3 + a:4 + a] for a in range(3)]
            tm = ray_ref[rows, 6:7]
            alive = tm >= 0.0
            tf0 = jnp.maximum(tm, 0.0)
            for b in range(n_blocks):
                sl = pl.ds(b * 128, 128)
                tn = jnp.zeros((RCH, 128), jnp.float32)
                tf = jnp.broadcast_to(tf0, (RCH, 128))
                for a in range(3):
                    lo_a = box_ref[a:a + 1, sl]
                    hi_a = box_ref[3 + a:4 + a, sl]
                    t0 = (lo_a - o[a]) * iv[a]
                    t1 = (hi_a - o[a]) * iv[a]
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                hit = (tn <= tf) & alive
                hit_acc[g:g + 1, sl] = jnp.maximum(
                    hit_acc[g:g + 1, sl],
                    jnp.any(hit, axis=0, keepdims=True
                            ).astype(jnp.float32),
                )
                tn_acc[g:g + 1, sl] = jnp.minimum(
                    tn_acc[g:g + 1, sl],
                    jnp.min(jnp.where(hit, tn, BIG), axis=0,
                            keepdims=True),
                )
        scale = scale_ref[0]
        for b in range(n_blocks):
            sl = pl.ds(b * 128, 128)
            tn_q = jnp.clip(
                (jnp.maximum(tn_acc[g:g + 1, sl], 0.0) / scale
                 ).astype(jnp.int32),
                0, 32766,
            )
            lanes = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                     + b * 128)
            # pad lanes (≥ n_real) carry degenerate boxes that the slab
            # math treats as hits (tn clamps to 0 ≤ tf0) — the mask
            # kernel sliced them off; here they must pack to INT32_MAX
            ent_ref[g:g + 1, sl] = jnp.where(
                (hit_acc[g:g + 1, sl] > 0.5) & (lanes < n_real),
                (tn_q << 16) | lanes,
                jnp.int32(2 ** 31 - 1),
            )


def _exact_entries_pallas(org, dirn, t_max_vec, lo, hi, n_tiles,
                          tn_scale, interpret=False):
    """Fused exact-mask → packed-entry build (see _exact_entry_kernel).

    Returns the UNSORTED (tp, cp) int32 entry slab, tp = n_tiles padded
    to ENTRY_GROUP, cp = C padded to 128; INT32_MAX where tile t has no
    ray hitting cluster c (and on all padding). ``lax.sort`` of the
    result per row is exactly the entry-row operand of
    ``_launch_tiles_loop``.
    """
    C = lo.shape[0]
    n = org.shape[0]
    cp = ((C + 127) // 128) * 128
    group = 8  # Mosaic output-block sublane rule (see _exact_mask_kernel)
    # the output slab feeds _launch_tiles_loop's entries operand, which
    # DMAs ENTRY_GROUP-row chunks — the row padding must match or the
    # launch kernel reads past the slab on its last chunk
    assert group == ENTRY_GROUP, "fused entry slab rows must pad to ENTRY_GROUP"
    tp = ((n_tiles + group - 1) // group) * group
    inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                          jnp.where(dirn >= 0.0, 1e-12, -1e-12), dirn)
    ray_pack = jnp.concatenate(
        [org, inv, t_max_vec[:, None],
         jnp.zeros((n, 1), jnp.float32)], axis=1,
    )  # (N, 8)
    if tp != n_tiles:
        pad = jnp.zeros(((tp - n_tiles) * TILE, 8), jnp.float32)
        pad = pad.at[:, 6].set(-1.0)
        ray_pack = jnp.concatenate([ray_pack, pad])
    boxes = jnp.full((8, cp), BIG, jnp.float32)
    boxes = boxes.at[3:6, :].set(-BIG)
    boxes = boxes.at[0:3, :C].set(jnp.asarray(lo).T)
    boxes = boxes.at[3:6, :C].set(jnp.asarray(hi).T)
    scale = jnp.reshape(jnp.asarray(tn_scale, jnp.float32), (1,))

    entries = pl.pallas_call(
        functools.partial(_exact_entry_kernel, n_blocks=cp // 128,
                          group=group, n_real=C),
        grid=(tp // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((group * TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((group, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((tp, cp), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((group, cp), jnp.float32),
            pltpu.VMEM((group, cp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(scale, ray_pack, boxes)[0]
    return entries


def _octant_sort_keys(org, dirn, t_max_vec, scene_lo, scene_hi):
    """Direction-octant-major, origin-Morton-minor coherence keys.

    For incoherent (bounce/shadow) waves the right tile invariant is a
    SIGN-PURE direction cone first, spatial locality second: measured on
    the bunny bounce-1 wave, octant-major tiles match 296 clusters/tile
    vs 737 for origin-major Morton (origin bits dominate that key's
    prefix, leaving tiles direction-mixed, which the interval frustum
    cannot cull). Dead rays sort to the back as in _ray_sort_keys."""
    from tpurt.kernels.packet import _expand_bits7

    ext = jnp.maximum(scene_hi - scene_lo, 1e-12)
    q = jnp.clip((org - scene_lo) / ext, 0.0, 1.0)
    g = jnp.minimum((q * 64.0).astype(jnp.uint32), jnp.uint32(63))
    morton_o = (
        (_expand_bits7(g[:, 0]) << 2)
        | (_expand_bits7(g[:, 1]) << 1)
        | _expand_bits7(g[:, 2])
    )  # 18 bits
    octant = (
        (dirn[:, 0] >= 0.0).astype(jnp.uint32)
        | ((dirn[:, 1] >= 0.0).astype(jnp.uint32) << 1)
        | ((dirn[:, 2] >= 0.0).astype(jnp.uint32) << 2)
    )
    key = (octant << 18) | morton_o
    return jnp.where(t_max_vec < 0.0, jnp.uint32(0xFFFFFFFF), key)


def _trace_tiles(org, dirn, t_max_vec, lo, hi, tri_rows, *, n_clusters,
                 pair_cap, per_tile_clamp, interpret, any_hit=False,
                 all_pairs=False, pair_meta=None, inv_xform=None):
    n = org.shape[0]
    n_tiles = n // TILE
    assert n % TILE == 0, "caller pads rays to TILE"
    if all_pairs:
        # tiny-scene fast path: the pair list is the full static
        # (tile, cluster) enumeration — no mask, no nonzero, no merge
        # sort, no overflow possible; every tile's first pair (cluster 0)
        # initializes its output block. This removes ALL per-trace XLA
        # machinery for scenes like the Cornell box (1 cluster).
        import numpy as _np

        assert pair_cap == n_tiles * n_clusters
        tiles_np = _np.repeat(
            _np.arange(n_tiles, dtype=_np.int32), n_clusters
        )
        clusters_np = _np.tile(
            _np.arange(n_clusters, dtype=_np.int32), n_tiles
        )
        packed = jnp.asarray(tiles_np * 65536 + clusters_np + 1)
        n_pairs = jnp.asarray(n_tiles * n_clusters, jnp.int32)
        overflow = jnp.zeros((), bool)
        return _launch_tiles(
            packed, org, dirn, t_max_vec, tri_rows, n_tiles=n_tiles,
            pair_cap=pair_cap, interpret=interpret, any_hit=any_hit,
            n_pairs=n_pairs, overflow=overflow, pair_meta=pair_meta,
            inv_xform=inv_xform,
        )
    mask = _tile_mask(org, dirn, t_max_vec, lo, hi, n_tiles)
    n_pairs = mask.sum(dtype=jnp.int32) + n_tiles
    # Every tile owns ONE guaranteed sentinel pair (cluster −1) so its
    # output block is initialized even when it hits nothing — the
    # sentinels are merged in AFTER global-cap truncation (below), so no
    # overflow mode can ever leave a block uninitialized (garbage bs ≥ 0
    # would decode as fake hits). Real pairs are clamped per tile first
    # (an overfull tile loses its trailing Morton-order clusters —
    # flagged — every other tile stays exact), then globally capped (the
    # kernel grid size; tiles borrow slack from each other, trailing
    # tiles lose real pairs when the cap is hit — also flagged).
    keep = per_tile_clamp - 1  # real (non-sentinel) pairs per tile
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    overflow = jnp.any(rank[:, -1:] > keep)
    mask = mask & (rank <= keep)
    real_cap = pair_cap - n_tiles
    overflow = overflow | (mask.sum(dtype=jnp.int32) > real_cap)
    ridx = jnp.nonzero(mask.ravel(), size=real_cap, fill_value=-1)[0]
    ridx = ridx.astype(jnp.int32)
    rvalid = ridx >= 0
    int_max = jnp.int32(2**31 - 1)
    # merge sentinels with the surviving real pairs in tile-major order:
    # key = tile·(C+1) + cluster+1 (sentinel cluster −1 ⇒ key = tile·(C+1),
    # sorting first within its tile); dropped slots sort to the back
    real_key = jnp.where(
        rvalid,
        (ridx // n_clusters) * (n_clusters + 1) + ridx % n_clusters + 1,
        int_max,
    )
    sent_key = jnp.arange(n_tiles, dtype=jnp.int32) * (n_clusters + 1)
    keys = jax.lax.sort(jnp.concatenate([sent_key, real_key]))
    valid = keys < int_max
    # fills → last tile (adjacent to the final real pair: tile T-1's
    # sentinel always survives, so no spurious re-init)
    pair_tile = jnp.where(valid, keys // (n_clusters + 1), n_tiles - 1)
    pair_cluster = jnp.where(
        valid, keys % (n_clusters + 1) - 1, -1
    )
    # single packed scalar-prefetch array (tile·2¹⁶ + cluster + 1) — the
    # prefetch operand lives in SMEM, so one array halves the footprint
    packed = pair_tile * 65536 + (pair_cluster + 1)
    return _launch_tiles(
        packed, org, dirn, t_max_vec, tri_rows, n_tiles=n_tiles,
        pair_cap=pair_cap, interpret=interpret, any_hit=any_hit,
        n_pairs=n_pairs, overflow=overflow, pair_meta=pair_meta,
        inv_xform=inv_xform,
    )


def _launch_tiles(packed, org, dirn, t_max_vec, tri_rows, *, n_tiles,
                  pair_cap, interpret, any_hit, n_pairs, overflow,
                  pair_meta=None, inv_xform=None):
    """Pack rays, size the grid, and run the tile kernel over the pair
    list (shared by the masked-expansion and static-all-pairs paths).

    ``pair_meta``/``inv_xform`` switch on two-level mode: extra scalar-
    prefetch operands carry the per-instance-cluster row base + world→
    object transform, and a fifth output field carries the winning
    instance id."""
    two_level = pair_meta is not None
    n_out = 5 if two_level else 4
    n = org.shape[0]
    # one packed (T·10·SUB, 128) ray operand per tile:
    # ox|oy|oz|dx|dy|dz|tm|ivx|ivy|ivz (inverse dirs feed the kernel's
    # exact per-row box skip test; two_level recomputes them in object
    # space in-kernel)
    inv_d = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                            jnp.where(dirn >= 0.0, 1e-12, -1e-12), dirn)
    ray_pack = jnp.concatenate(
        [a.reshape(n_tiles, SUB, 128) for a in (
            org[:, 0], org[:, 1], org[:, 2],
            dirn[:, 0], dirn[:, 1], dirn[:, 2], t_max_vec,
            inv_d[:, 0], inv_d[:, 1], inv_d[:, 2])],
        axis=1,
    ).reshape(n_tiles * 10 * SUB, 128)

    n_prefetch = 3 if two_level else 1

    def _tile_of(i, pk, *rest):
        del rest
        return (pk[i] >> 16, 0)

    in_spec = pl.BlockSpec((10 * SUB, 128), _tile_of,
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_out * SUB, 128), _tile_of,
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_tiles * n_out * SUB, 128),
                                     jnp.float32)
    (ray_pack,) = jax.lax.optimization_barrier((ray_pack,))
    # default ON for hardware: SMEM scalar broadcast measured 15.2/9.2
    # Mrays/s vs 12.6/7.2 for vector lane extracts (bunny closest-hit,
    # coherent/shuffled). TPURT_SMEM_TRI=0 reverts; =1 forces it in
    # interpret mode too (CPU tests of the SMEM path).
    smem_tri = _os.environ.get(
        "TPURT_SMEM_TRI", "" if interpret else "1") == "1"
    # TPURT_ROW_SKIP=0 reverts the SMEM kernel to round-1's independent-
    # row structure (one fold per pair, pair-level box pre-test) —
    # compile-time insurance for the Mosaic remote-compile service
    row_skip = _os.environ.get("TPURT_ROW_SKIP", "1") == "1"
    scratch = []
    if smem_tri:
        scratch = [
            pltpu.SMEM((2, ROWS_PER_CLUSTER, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            # per-pair best-hit accumulator (conditionally-written rows
            # need a ref; merged into the tile's out block once per pair)
            pltpu.VMEM((4 * SUB, 128), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(pair_cap,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), in_spec],
        out_specs=[out_spec],
        scratch_shapes=scratch,
    )
    operands = (packed, tri_rows, ray_pack)
    if two_level:
        operands = (packed, pair_meta, inv_xform.reshape(-1),
                    tri_rows, ray_pack)
    out = pl.pallas_call(
        functools.partial(_tile_kernel, unroll=not interpret,
                          any_hit=any_hit, smem_tri=smem_tri,
                          two_level=two_level, n_out=n_out,
                          row_skip=row_skip),
        grid_spec=grid_spec,
        out_shape=[out_shape],
        interpret=interpret,
    )(*operands)[0]
    (out,) = jax.lax.optimization_barrier((out,))
    out = out.reshape(n_tiles, n_out, SUB, 128)
    bt = out[:, 0].reshape(n)
    bu = out[:, 1].reshape(n)
    bv = out[:, 2].reshape(n)
    bs = out[:, 3].reshape(n)
    bi = out[:, 4].reshape(n) if two_level else jnp.zeros_like(bt)
    stats = jnp.stack(
        [n_pairs.astype(jnp.float32), overflow.astype(jnp.float32)]
    )
    return bt, bu, bv, bs, bi, stats


def _tileloop_kernel(
    *refs,  # prefetch refs, tri_ref, ray_ref, out_ref, scratch...
    two_level: bool = False,
    n_out: int = 4,
    smem_tri: bool = True,
    lean_any: bool = False,
    unroll: int = 2,
    entry_rows: bool = False,
    sc_mode: bool = False,
):
    """Grid-over-TILES pair-loop kernel (round-2 production traversal).

    One grid step per ray tile; the step fori-loops over the tile's REAL
    (tile, cluster) pairs via SMEM segment offsets. Versus the
    grid-over-pairs kernel (``_tile_kernel``) this removes the ~1 µs of
    Mosaic grid machinery per pair SLOT (budget slots and sentinel pairs
    included — the round-1 design paid it even for empty slots), writes
    each output block exactly once (no cross-step revisit), and — because
    the launch shape no longer depends on the wave's pair budget — lets
    every wave kind (primary/bounce/shadow, closest and any-hit: the
    any-hit early-out rides a runtime prefetch flag) share ONE Mosaic
    kernel variant, cutting the remote-compile warmup ~3×.

    Operand order: off_ref (TL+1,) i32 segment offsets; pc_ref (PCAP,)
    i32 pair entries (tile-major, FRONT-TO-BACK: quantized slab-entry
    bound << 16 | cluster id); fl_ref (1,) i32 bit0 = any-hit; sc_ref
    (1,) f32 tn dequantization scale; [pm_ref/xf_ref two-level tables];
    tri_ref; packed ray tile; packed out block. Cluster triangle rows
    are double-buffer DMA'd into SMEM across loop iterations (same
    discipline as ``_tile_kernel``).

    FAR BREAK: entries sort front-to-back per tile and carry a floor-
    quantized lower bound of the cluster's slab entry distance, so
    ``deq ≤ true tn``. Once every lane's best t (or tmax, or dead −1)
    is below ``deq``, no later pair of this tile can improve any lane —
    the remaining pairs skip their vector work in a few ops.

    ``lean_any`` (compile-time, TPURT_LEAN_OCCL=1): occlusion-only body.
    Rows run the division-free OR-fold window test
    (``_row_occluded_smem``) instead of the closest-hit candidate fold;
    an occluded lane sets slot ≥ 0 (the wrapper's contract) AND bt = −1,
    which retires it from every later box test, the far break, and the
    early loop exit — the all-occluded early-out falls out of the bt
    check for free. Costs one extra Mosaic variant per config (the
    closest/any-hit runtime-flag sharing is bypassed for any-hit
    traces), bought back by the cheaper occlusion inner loop.
    """
    if entry_rows:
        # dense entry-row mode (round 3): no packed SMEM pair list and
        # no offsets — the tile's FRONT-TO-BACK entry row ((tn_q << 16)
        # | cluster, lane-axis-sorted by XLA) is DMA'd from the VMEM
        # entries operand into SMEM scratch in groups of ENTRY_GROUP
        # tiles; the loop bound is the tile's live count. Removes the
        # global expansion sort, the SMEM pair capacity (and with it
        # budget overflow/retries and MAX_PAIRS_PER_LAUNCH splitting).
        # ``sc_mode`` (round 5): entries are SUPERCLUSTER ids — scm_ref
        # maps each to (first_child_cluster | n_children << 16); the
        # body expands children with the exact per-child box pre-test.
        if two_level and sc_mode:
            (cnt_ref, fl_ref, sc_ref, scm_ref, pm_ref, xf_ref, tri_ref,
             ent_ref, ray_ref, out_ref) = refs[:10]
            scratch = refs[10:]
        elif two_level:
            (cnt_ref, fl_ref, sc_ref, pm_ref, xf_ref, tri_ref,
             ent_ref, ray_ref, out_ref) = refs[:9]
            scratch = refs[9:]
        elif sc_mode:
            (cnt_ref, fl_ref, sc_ref, scm_ref, tri_ref, ent_ref,
             ray_ref, out_ref) = refs[:8]
            scratch = refs[8:]
        else:
            (cnt_ref, fl_ref, sc_ref, tri_ref, ent_ref, ray_ref,
             out_ref) = refs[:7]
            scratch = refs[7:]
        ent_sm, ent_sems = scratch[0], scratch[1]
        scratch = scratch[2:]
        i = pl.program_id(0)
        npr = pl.num_programs(0)
        grp = i // ENTRY_GROUP
        eslot = jax.lax.rem(grp, 2)

        def ent_dma(sl, g):
            return pltpu.make_async_copy(
                ent_ref.at[pl.ds(g * ENTRY_GROUP, ENTRY_GROUP), :],
                ent_sm.at[sl],
                ent_sems.at[sl],
            )

        @pl.when(i == 0)
        def _():
            ent_dma(0, 0).start()

        # each group's first tile: wait own copy, prefetch next group
        @pl.when(jax.lax.rem(i, ENTRY_GROUP) == 0)
        def _():
            ent_dma(eslot, grp).wait()

            @pl.when((grp + 1) * ENTRY_GROUP < npr)
            def _():
                ent_dma(1 - eslot, grp + 1).start()

        erow = jax.lax.rem(i, ENTRY_GROUP)

        def read_entry(p):
            return ent_sm[eslot, erow, p]

        s = jnp.int32(0)
        e = cnt_ref[i]
    elif two_level:
        (off_ref, pc_ref, fl_ref, sc_ref, pm_ref, xf_ref, tri_ref,
         ray_ref, out_ref) = refs[:9]
        scratch = refs[9:]
    else:
        off_ref, pc_ref, fl_ref, sc_ref, tri_ref, ray_ref, out_ref = \
            refs[:7]
        scratch = refs[7:]
    if not entry_rows:
        i = pl.program_id(0)
        s = off_ref[i]
        e = off_ref[i + 1]

        def read_entry(p):
            return pc_ref[p]

    is_any = fl_ref[0] == 1

    if two_level:

        def row_base(cid):
            return pm_ref[cid] & ((1 << INST_SHIFT) - 1)
    else:

        def row_base(cid):
            return cid * ROWS_PER_CLUSTER

    # init best state: bt from tmax (dead rays −1), u=v=0, slot(−1)[,inst]
    tm = ray_ref[6 * SUB:7 * SUB, :]
    out_ref[0:SUB, :] = jnp.where(tm >= 0.0, tm, -1.0)
    out_ref[SUB:3 * SUB, :] = jnp.zeros((2 * SUB, 128), jnp.float32)
    out_ref[3 * SUB:n_out * SUB, :] = jnp.full(
        ((n_out - 3) * SUB, 128), -1.0, jnp.float32
    )

    # world-space ray fields, loaded once per tile
    wox = ray_ref[0:SUB, :]
    woy = ray_ref[SUB:2 * SUB, :]
    woz = ray_ref[2 * SUB:3 * SUB, :]
    wdx = ray_ref[3 * SUB:4 * SUB, :]
    wdy = ray_ref[4 * SUB:5 * SUB, :]
    wdz = ray_ref[5 * SUB:6 * SUB, :]
    wix = ray_ref[7 * SUB:8 * SUB, :]
    wiy = ray_ref[8 * SUB:9 * SUB, :]
    wiz = ray_ref[9 * SUB:10 * SUB, :]

    def _pair_rays(c):
        """Ray fields in the pair's test space (object space when
        two_level — the TLAS→BLAS transform of SURVEY.md §3.3; d is NOT
        renormalized so t stays in world units)."""
        if not two_level:
            return wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz
        b = jnp.maximum(c, 0) * 12
        m = [xf_ref[b + k] for k in range(12)]
        nox = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
        noy = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
        noz = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
        ndx = m[0] * wdx + m[1] * wdy + m[2] * wdz
        ndy = m[4] * wdx + m[5] * wdy + m[6] * wdz
        ndz = m[8] * wdx + m[9] * wdy + m[10] * wdz

        def inv(dv):
            return 1.0 / jnp.where(
                jnp.abs(dv) < 1e-12,
                jnp.where(dv >= 0.0, 1e-12, -1e-12), dv,
            )

        return nox, noy, noz, ndx, ndy, ndz, inv(ndx), inv(ndy), inv(ndz)

    if smem_tri:
        sm_ref, sems = scratch[0], scratch[1]

        if sc_mode:
            # supercluster DMA: ALL SC_SIZE children's rows in one copy
            # (children are consecutive clusters ⇒ contiguous rows; the
            # build pads tri_rows so a short last group can't overrun)
            def cluster_dma(sl, sid):
                first = scm_ref[sid] & 0xFFFF
                return pltpu.make_async_copy(
                    tri_ref.at[
                        pl.ds(row_base(first),
                              _SC_SIZE * ROWS_PER_CLUSTER), :],
                    sm_ref.at[sl],
                    sems.at[sl],
                )
        else:
            def cluster_dma(sl, cid):
                return pltpu.make_async_copy(
                    tri_ref.at[pl.ds(row_base(cid), ROWS_PER_CLUSTER), :],
                    sm_ref.at[sl],
                    sems.at[sl],
                )

        # bootstrap the double buffer: pair s starts its own copy; pair
        # p starts p+1's during its compute; every started copy is waited
        # exactly once (balanced even at tile boundaries — segments never
        # prefetch past their own end)
        @pl.when(e > s)
        def _():
            cluster_dma(jax.lax.rem(s, 2), read_entry(s) & 0xFFFF).start()

    def _smem_cluster_body(slot, row0, rays, inst_f):
        """One cluster's SMEM work at row offset ``row0``: the exact
        per-cluster box pre-test (the cluster's own AABB rides in spare
        lanes 126–127 of its first three rows —
        paircluster._pack_cluster_box_lanes; one ~26-op slab test,
        best-t far-limited, decides whether ANY lane can still reach the
        cluster — on divergent waves over half the conservatively-
        matched pairs die here), then the 8 far-limited row tests.
        Shared by the per-cluster pair body (row0 = 0) and the
        supercluster child expansion (row0 = k·ROWS_PER_CLUSTER)."""
        (ox, oy, oz, dx, dy, dz, ivx, ivy, ivz) = rays
        bt0 = out_ref[0:SUB, :]
        clox = sm_ref[slot, row0 + 0, 126]
        cloy = sm_ref[slot, row0 + 0, 127]
        cloz = sm_ref[slot, row0 + 1, 126]
        chix = sm_ref[slot, row0 + 1, 127]
        chiy = sm_ref[slot, row0 + 2, 126]
        chiz = sm_ref[slot, row0 + 2, 127]
        t0x = (clox - ox) * ivx
        t1x = (chix - ox) * ivx
        t0y = (cloy - oy) * ivy
        t1y = (chiy - oy) * ivy
        t0z = (cloz - oz) * ivz
        t1z = (chiz - oz) * ivz
        ctn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x),
                        jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        ctf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x),
                        jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), bt0),
        )

        @pl.when(jnp.any(ctn <= ctf))
        def _():
            for r in range(ROWS_PER_CLUSTER):
                bt_r = out_ref[0:SUB, :]
                tn, tf = _row_box_interval(
                    sm_ref, slot, row0 + r, ox, oy, oz, ivx, ivy, ivz,
                    bt_r
                )

                if lean_any:

                    @pl.when(jnp.any(tn <= tf))
                    def _(r=r, bt_r=bt_r):
                        occ = _row_occluded_smem(
                            sm_ref, slot, row0 + r, ox, oy, oz,
                            dx, dy, dz, bt_r
                        )
                        out_ref[0:SUB, :] = jnp.where(
                            occ, -1.0, bt_r)
                        out_ref[3 * SUB:4 * SUB, :] = jnp.where(
                            occ, 0.0,
                            out_ref[3 * SUB:4 * SUB, :])

                    continue

                @pl.when(jnp.any(tn <= tf))
                def _(r=r):
                    cand = []
                    _row_candidates_smem(
                        sm_ref, slot, row0 + r, ox, oy, oz, dx, dy, dz,
                        cand
                    )
                    tr, ur, vr, sr = _fold_candidates(cand)
                    bt = out_ref[0:SUB, :]
                    win = tr < bt
                    out_ref[0:SUB, :] = jnp.where(win, tr, bt)
                    out_ref[SUB:2 * SUB, :] = jnp.where(
                        win, ur, out_ref[SUB:2 * SUB, :])
                    out_ref[2 * SUB:3 * SUB, :] = jnp.where(
                        win, vr, out_ref[2 * SUB:3 * SUB, :])
                    out_ref[3 * SUB:4 * SUB, :] = jnp.where(
                        win, sr, out_ref[3 * SUB:4 * SUB, :])
                    if two_level:
                        out_ref[4 * SUB:5 * SUB, :] = jnp.where(
                            win, inst_f,
                            out_ref[4 * SUB:5 * SUB, :])

    def _fori_cluster_body(c, rays, inst_f):
        """interpret/no-SMEM flavor of one cluster: compact fori over
        rows with vector lane extracts (CPU tests keep small jaxprs)."""
        (ox, oy, oz, dx, dy, dz, ivx, ivy, ivz) = rays
        base = row_base(jnp.maximum(c, 0))

        def rbody(r, cr):
            row = tri_ref[pl.ds(base + r, 1), :]
            out = []
            _row_candidates(row, ox, oy, oz, dx, dy, dz, out)
            return _fold_candidates(out + [cr])

        init = (jnp.full((SUB, 128), BIG, jnp.float32),
                jnp.zeros((SUB, 128), jnp.float32),
                jnp.zeros((SUB, 128), jnp.float32),
                jnp.full((SUB, 128), -1.0, jnp.float32))
        tm_c, um, vm, sm = jax.lax.fori_loop(
            0, ROWS_PER_CLUSTER, rbody, init
        )
        bt = out_ref[0:SUB, :]
        if lean_any:
            # occlusion semantics only: any candidate inside the
            # live window occludes the lane (retire via bt = −1)
            occ = tm_c < bt
            out_ref[0:SUB, :] = jnp.where(occ, -1.0, bt)
            out_ref[3 * SUB:4 * SUB, :] = jnp.where(
                occ, 0.0, out_ref[3 * SUB:4 * SUB, :])
            return
        win = tm_c < bt
        out_ref[0:SUB, :] = jnp.where(win, tm_c, bt)
        out_ref[SUB:2 * SUB, :] = jnp.where(
            win, um, out_ref[SUB:2 * SUB, :])
        out_ref[2 * SUB:3 * SUB, :] = jnp.where(
            win, vm, out_ref[2 * SUB:3 * SUB, :])
        out_ref[3 * SUB:4 * SUB, :] = jnp.where(
            win, sm, out_ref[3 * SUB:4 * SUB, :])
        if two_level:
            out_ref[4 * SUB:5 * SUB, :] = jnp.where(
                win, inst_f, out_ref[4 * SUB:5 * SUB, :])

    def pair_body(p):
        v = read_entry(p)
        c = v & 0xFFFF
        if smem_tri:
            slot = jax.lax.rem(p, 2)

            @pl.when(p + 1 < e)
            def _():
                cluster_dma(1 - slot, read_entry(p + 1) & 0xFFFF).start()

            cluster_dma(slot, c).wait()
        # Early-outs (the DMA chain continues unconditionally to keep
        # semaphores balanced — 4 KB per pair is noise next to the
        # skipped row tests): any-hit all-occluded (runtime flag), and
        # the front-to-back far break — every lane already beats this
        # pair's entry-distance lower bound (see kernel docstring).
        # In sc_mode the bound is the SUPERBOX entry distance, a valid
        # lower bound for every child (superbox ⊇ child box).
        deq = (v >> 16).astype(jnp.float32) * sc_ref[0]
        done = jnp.all(out_ref[0:SUB, :] < deq)
        if not lean_any:
            done = done | (is_any & jnp.all(
                (out_ref[3 * SUB:4 * SUB, :] >= 0.0)
                | (out_ref[0:SUB, :] < 0.0)
            ))

        @pl.when(~done)
        def _():
            if sc_mode:
                # supercluster expansion: children share the instance
                # (TL builds never span one), so the object-space ray
                # transform happens once per supercluster
                mv = scm_ref[c]
                base_cl = mv & 0xFFFF
                nch = mv >> 16
                rays = _pair_rays(base_cl)
                inst_f = (
                    (pm_ref[base_cl] >> INST_SHIFT).astype(jnp.float32)
                    if two_level and not lean_any else None
                )
                for k in range(_SC_SIZE):

                    @pl.when(k < nch)
                    def _(k=k):
                        if smem_tri:
                            _smem_cluster_body(
                                slot, k * ROWS_PER_CLUSTER, rays, inst_f
                            )
                        else:
                            _fori_cluster_body(base_cl + k, rays, inst_f)
                return
            rays = _pair_rays(c)
            inst_f = (
                (pm_ref[jnp.maximum(c, 0)]
                 >> INST_SHIFT).astype(jnp.float32)
                if two_level and not lean_any else None
            )
            if smem_tri:
                _smem_cluster_body(slot, 0, rays, inst_f)
            else:
                _fori_cluster_body(c, rays, inst_f)

    # Manually unrolled EARLY-TERMINATING pair loop. The dynamic-bound
    # loop lowers to a Mosaic while loop whose per-iteration
    # condition/branch machinery measured ~250 ns — a third of the
    # per-pair budget on bounce waves. Two levers:
    #   * processing PAIR_UNROLL pairs per iteration divides the
    #     machinery (all but the first slot are guarded — segment
    #     lengths are arbitrary);
    #   * the loop CARRIES the tile's done condition (far break /
    #     any-hit all-occluded — see pair_body) and stops iterating
    #     outright when it trips, instead of paying the machinery for
    #     every remaining pair just to skip its body. Front-to-back
    #     pair order makes this a real traversal exit: once every
    #     lane's best t beats the next entry bound, the segment ends.
    # DMA slots alternate by PAIR index (rem(p, 2)) so the double-buffer
    # chain is identical to the one-pair-per-iteration form; on an early
    # exit exactly one prefetched copy (pair p_final) is in flight and is
    # drained below to keep the slot semaphores balanced across grid
    # steps.
    def cond(carry):
        p, done = carry
        return (p < e) & ~done

    def body(carry):
        p, _ = carry
        pair_body(p)
        for k in range(1, unroll):

            @pl.when(p + k < e)
            def _(k=k):
                pair_body(p + k)

        nxt = p + unroll
        # done check for the next block = the early-out pair_body(nxt)
        # would compute: every lane's best t already beats nxt's entry
        # lower bound, or (any-hit) every lane is occluded or dead
        nv = read_entry(jnp.minimum(nxt, e - 1))
        deq = (nv >> 16).astype(jnp.float32) * sc_ref[0]
        done = jnp.all(out_ref[0:SUB, :] < deq)
        if not lean_any:
            done = done | (is_any & jnp.all(
                (out_ref[3 * SUB:4 * SUB, :] >= 0.0)
                | (out_ref[0:SUB, :] < 0.0)
            ))
        return (nxt, done)

    p_final, _ = jax.lax.while_loop(
        cond, body, (s, jnp.zeros((), jnp.bool_))
    )
    if smem_tri:
        # drain the in-flight prefetch on early exit: every executed pair
        # waited its own copy and started pair p+1's, so exactly the
        # p_final copy is pending iff the loop stopped before e
        @pl.when(p_final < e)
        def _():
            cluster_dma(
                jax.lax.rem(p_final, 2), read_entry(p_final) & 0xFFFF
            ).wait()


# scenes with at most this many clusters take the static all-pairs path
# (no sort, no mask, no expansion — zero per-trace XLA machinery)
ALLPAIRS_MAX_CLUSTERS = 8

# Hard cap on one kernel launch's pair list: the packed scalar-prefetch
# operand lives in SMEM (1 MiB total on v5e — a 360k-pair bounce trace
# failed AOT with "would exceed memory (space=smem)"). Waves whose
# budget exceeds this are split into sequential tile-range launches of
# the SAME kernel — back-to-back kernel-only chains are safe on this
# backend (unlike Pallas calls with shading fusions between them,
# render/staged.py). 96k pairs = 384 KiB, leaving room for the
# two-level prefetch tables, kernel scratch, and compiler SMEM use.
MAX_PAIRS_PER_LAUNCH = 96 * 1024

# pair-loop mode: ray tiles per kernel launch. Fixed (wave-independent)
# so every wave kind of a config shares one Mosaic kernel variant.
TILES_PER_LAUNCH = 256

# entry-row mode: tiles per entry-row DMA group — VMEM source slices of
# a DMA must be 8-sublane aligned (measured Mosaic verifier error in
# benchmarks/probe_entry_rows.py); grouping also amortizes the DMA.
ENTRY_GROUP = 8

# Dense entry rows cost O(n_clusters) per TILE (the (T, Cp) build/sort
# and the per-group SMEM entry DMA) regardless of how many pairs are
# live. Hardware A/Bs (round 4, honest baselines): bunny (C=854) 9.62
# vs 9.37 Mrays/s — win; sponza (C≈2400, two-level) QUICK 2.82 vs 2.80
# — wash, while the entry-row single-launch compiles 3–6× faster than
# the budget path's chunked pallas sites. (An earlier "entry rows lose
# 2.5× on sponza" reading compared against the pre-budget-correction
# inflated 7.05 row — worktree re-runs of the r2/r3 tips measured
# 1.90/1.84 on the same config, see ab_results `sponza_honest_base`.)
# "auto" (default) enables entry rows whenever the dense (T, Cp) i32
# entries operand fits the kernel's VMEM budget — the only hard
# constraint; TPURT_ENTRY_ROWS=1/0 forces either path. Waves too large
# for a single launch still use entry rows per 256-tile launch chunk
# (4.3 MB at C=4096) via the budget path's chunking.
ENTRY_ROWS_MAX_CLUSTERS = 4096
ENTRY_VMEM_BYTES = 48 * 1024 * 1024

# Supercluster auto threshold (round 5, measured): the dense mask +
# entry sort scale with C while the kernel-side cost of the sc
# expansion is ~flat, so sc pays only at large C — bunny C=854 measured
# −6% (9.44 vs 10.07), sponza C=2430 measured +1.7% (4.88 vs 4.80) with
# the mask halved (95.5 → 48.7 ms at 1080p scale,
# probe_sponza_decomp.json). sc also engages whenever the
# cluster-granular entries exceed the VMEM gate (then it replaces the
# budget path's chunked launches outright).
SC_AUTO_MIN_CLUSTERS = 2000


def _entry_rows_enabled(n_clusters: int, n_tiles: int = 0) -> bool:
    v = _os.environ.get("TPURT_ENTRY_ROWS", "auto")
    if v != "auto":
        return v == "1"
    if n_clusters > ENTRY_ROWS_MAX_CLUSTERS:
        return False
    cp = ((n_clusters + 127) // 128) * 128
    return (n_tiles + ENTRY_GROUP) * cp * 4 <= ENTRY_VMEM_BYTES


def _trace_tiles_loop(org, dirn, t_max_vec, lo, hi, tri_rows, *,
                      n_clusters, pcap, per_tile_clamp, interpret,
                      any_hit, all_pairs=False, pair_meta=None,
                      inv_xform=None, exact_ok=True,
                      sc_lo=None, sc_hi=None, sc_meta=None):
    """Pair-loop twin of ``_trace_tiles``: builds per-tile pair SEGMENTS
    (offsets + tile-major cluster list, no sentinels — a tile with zero
    pairs simply iterates nothing; its output block is always initialized
    by the kernel) and launches ``_tileloop_kernel``."""
    n = org.shape[0]
    n_tiles = n // TILE
    assert n % TILE == 0, "caller pads rays to TILE"
    assert n_clusters < 65536, "pair entries pack cluster ids in 16 bits"
    if all_pairs:
        import numpy as _np

        assert pcap == n_tiles * n_clusters
        off = jnp.asarray(
            _np.arange(n_tiles + 1, dtype=_np.int32) * n_clusters
        )
        pair_cl = jnp.asarray(_np.tile(
            _np.arange(n_clusters, dtype=_np.int32), n_tiles
        ))
        n_pairs = jnp.asarray(n_tiles * n_clusters, jnp.int32)
        overflow = jnp.zeros((), bool)
        return _launch_tiles_loop(
            off, pair_cl, org, dirn, t_max_vec, tri_rows,
            n_tiles=n_tiles, interpret=interpret, any_hit=any_hit,
            n_pairs=n_pairs, overflow=overflow, pair_meta=pair_meta,
            inv_xform=inv_xform, tn_scale=None,
        )
    # default ON (hardware A/B 2026-08-18: bunny 7.38 → 8.26 Mrays/s with
    # the Pallas mask gated to sorted waves); "0" reverts to the
    # interval-frustum mask, "all" forces it onto coherent waves too
    exact_env = _os.environ.get("TPURT_EXACT_MASK", "1")
    use_exact = exact_env == "all" or (exact_env == "1" and exact_ok)
    if use_exact:
        # exact-ANY mask + the exact min-entry far-break key (strictly
        # tighter than the interval tn: the far break actually fires on
        # closest waves, and the front-to-back order is truer). The
        # exact mask is a subset of the interval-frustum one, so the
        # interval pass is skipped entirely. TPURT_EXACT_IMPL=xla keeps
        # the lax.map reference implementation for A/B and tests.
        # Gated to SORTED (incoherent) waves by default: coherent
        # screen-tile primary waves match ~18 pairs/tile where the dense
        # mask (~4 µs/tile) cannot pay for itself ("all" forces it on).
        if _os.environ.get("TPURT_EXACT_IMPL", "pallas") == "xla":
            mask_fn = functools.partial(_exact_any_mask, return_tn=True)
        else:
            mask_fn = functools.partial(_exact_any_mask_pallas,
                                        interpret=interpret)
    else:
        mask_fn = functools.partial(_tile_mask, return_tn=True)
    # Fused mask→entry kernel (round 5): skip the XLA entry expansion
    # entirely when the pallas exact mask feeds an UNCLAMPED entry-row
    # launch (the production default). TPURT_FUSED_ENTRIES=0 reverts to
    # mask + XLA expansion for A/B.
    use_fused = (
        use_exact
        and _os.environ.get("TPURT_EXACT_IMPL", "pallas") != "xla"
        and _os.environ.get("TPURT_FUSED_ENTRIES", "1") == "1"
    )
    int_max = jnp.int32(2 ** 31 - 1)
    if (sc_meta is not None and per_tile_clamp <= 0
            and _entry_rows_enabled(sc_lo.shape[0], n_tiles)):
        # SUPERCLUSTER entry rows (round 5): the exact mask, the entry
        # build, and the per-tile front-to-back lane sort all run over
        # the S ≈ C/8 superboxes instead of C cluster boxes — the dense
        # N·C mask flops and the (T, Cp) sort were the two largest
        # measured per-sorted-trace machinery terms (PARITY.md round-3
        # probe_occl_decomp: 56.8 + 39.2 ms vs a ~29 ms traversal
        # kernel). The kernel expands each surviving supercluster with
        # the exact per-child box pre-test, so per-ray exactness is
        # unchanged. The superbox mask is conservative vs children —
        # never loses hits (same soundness argument as the interval
        # frustum mask).
        n_sc = sc_lo.shape[0]
        scene_diag = jnp.linalg.norm(
            jnp.max(sc_hi, axis=0) - jnp.min(sc_lo, axis=0))
        tn_scale = jnp.maximum(scene_diag, 1e-12) / 32766.0
        overflow = jnp.zeros((), bool)
        if use_fused:
            entry = _exact_entries_pallas(
                org, dirn, t_max_vec, sc_lo, sc_hi, n_tiles, tn_scale,
                interpret=interpret)
            counts = (entry != int_max).sum(axis=1, dtype=jnp.int32
                                            )[:n_tiles]
            total = counts.sum(dtype=jnp.int32)
        else:
            mask, tn_lower = mask_fn(org, dirn, t_max_vec, sc_lo, sc_hi,
                                     n_tiles)
            counts = mask.sum(axis=1, dtype=jnp.int32)
            total = counts.sum(dtype=jnp.int32)
            tn_q = jnp.clip(
                (jnp.maximum(tn_lower, 0.0) / tn_scale
                 ).astype(jnp.int32),
                0, 32766,
            )
            cl_of = jax.lax.broadcasted_iota(
                jnp.int32, (n_tiles, n_sc), 1)
            entry = jnp.where(mask, (tn_q << 16) | cl_of, int_max)
            cp = ((n_sc + 127) // 128) * 128
            tpad = (-n_tiles) % ENTRY_GROUP
            if cp != n_sc or tpad:
                entry = jnp.pad(entry, ((0, tpad), (0, cp - n_sc)),
                                constant_values=2**31 - 1)
        entry = jax.lax.sort(entry)  # per-row (lane-axis) front-to-back
        return _launch_tiles_loop(
            None, None, org, dirn, t_max_vec, tri_rows,
            n_tiles=n_tiles, interpret=interpret, any_hit=any_hit,
            n_pairs=total, overflow=overflow, pair_meta=pair_meta,
            inv_xform=inv_xform, tn_scale=tn_scale, entries=entry,
            counts=counts, sc_meta=sc_meta,
        )
    if (use_fused and per_tile_clamp <= 0
            and _entry_rows_enabled(n_clusters, n_tiles)):
        # fused mask→entry path (no clamp: keep == n_clusters, so the
        # rank/overflow plumbing below is vacuous — skip it entirely)
        scene_diag = jnp.linalg.norm(
            jnp.max(hi, axis=0) - jnp.min(lo, axis=0))
        tn_scale = jnp.maximum(scene_diag, 1e-12) / 32766.0
        entry = _exact_entries_pallas(
            org, dirn, t_max_vec, lo, hi, n_tiles, tn_scale,
            interpret=interpret)
        counts = (entry != int_max).sum(axis=1, dtype=jnp.int32
                                        )[:n_tiles]
        total = counts.sum(dtype=jnp.int32)
        entry = jax.lax.sort(entry)  # per-row front-to-back
        return _launch_tiles_loop(
            None, None, org, dirn, t_max_vec, tri_rows,
            n_tiles=n_tiles, interpret=interpret, any_hit=any_hit,
            n_pairs=total, overflow=jnp.zeros((), bool),
            pair_meta=pair_meta, inv_xform=inv_xform,
            tn_scale=tn_scale, entries=entry, counts=counts,
        )
    mask, tn_lower = mask_fn(org, dirn, t_max_vec, lo, hi, n_tiles)
    if _entry_rows_enabled(n_clusters, n_tiles):
        # Dense entry-row plumbing (round 3): ONE single-operand
        # lane-axis lax.sort orders each tile's (tn_q << 16 | cluster)
        # entries front-to-back with INT32_MAX (no hit) at the back —
        # replacing the global 2-key expansion sort + cumsum offsets +
        # packed SMEM pair list. The kernel DMAs entry rows to SMEM in
        # ENTRY_GROUP chunks and loops to the tile's live count, so no
        # pair capacity exists: pcap / MAX_PAIRS_PER_LAUNCH and budget
        # overflow CANNOT trigger on this path (per-tile clamp is still
        # honored for semantic parity when explicitly configured).
        keep = (n_clusters if per_tile_clamp <= 0
                else min(per_tile_clamp - 1, n_clusters))
        counts_raw = mask.sum(axis=1, dtype=jnp.int32)
        if keep < n_clusters:
            rank = jnp.cumsum(mask.astype(jnp.int32), axis=1)
            mask = mask & (rank <= keep)
            overflow = jnp.any(counts_raw > keep)
        else:
            overflow = jnp.zeros((), bool)
        counts = jnp.minimum(counts_raw, keep)
        total = counts.sum(dtype=jnp.int32)
        scene_diag = jnp.linalg.norm(
            jnp.max(hi, axis=0) - jnp.min(lo, axis=0))
        tn_scale = jnp.maximum(scene_diag, 1e-12) / 32766.0
        tn_q = jnp.clip(
            (jnp.maximum(tn_lower, 0.0) / tn_scale).astype(jnp.int32),
            0, 32766,
        )
        cl_of = jax.lax.broadcasted_iota(
            jnp.int32, (n_tiles, n_clusters), 1)
        int_max = jnp.int32(2**31 - 1)
        entry = jnp.where(mask, (tn_q << 16) | cl_of, int_max)
        cp = ((n_clusters + 127) // 128) * 128
        tpad = (-n_tiles) % ENTRY_GROUP
        if cp != n_clusters or tpad:
            entry = jnp.pad(entry, ((0, tpad), (0, cp - n_clusters)),
                            constant_values=2**31 - 1)
        entry = jax.lax.sort(entry)  # per-row (lane-axis) front-to-back
        return _launch_tiles_loop(
            None, None, org, dirn, t_max_vec, tri_rows,
            n_tiles=n_tiles, interpret=interpret, any_hit=any_hit,
            n_pairs=total, overflow=overflow, pair_meta=pair_meta,
            inv_xform=inv_xform, tn_scale=tn_scale, entries=entry,
            counts=counts,
        )
    # per-tile clamp (an overfull tile drops its trailing Morton-order
    # clusters — flagged), then the global SMEM capacity cap (trailing
    # tiles lose pairs — also flagged; render_scene auto-retries with
    # doubled budgets on either flag)
    # per_tile_clamp keeps the documented grid-mode meaning (budget slots
    # per tile INCLUDING the tile's guaranteed sentinel slot), so configs
    # and tests behave identically across modes: real pairs = clamp − 1
    keep = n_clusters if per_tile_clamp <= 0 else min(per_tile_clamp - 1,
                                                      n_clusters)
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    counts_raw = rank[:, -1]
    overflow = jnp.any(counts_raw > keep)
    mask = mask & (rank <= keep)
    counts = jnp.minimum(counts_raw, keep)
    total = counts.sum(dtype=jnp.int32)
    overflow = overflow | (total > pcap)
    off = jnp.minimum(
        jnp.concatenate([
            jnp.zeros(1, jnp.int32),
            jnp.cumsum(counts, dtype=jnp.int32),
        ]),
        pcap,
    )
    # FRONT-TO-BACK pair order: compact + order the (T, C) entries with
    # one 2-key lax.sort — (tile, packed entry) — instead of nonzero
    # (sort is the fast data-movement primitive on this backend,
    # PARITY.md law 2). The packed entry carries a FLOOR-quantized slab
    # entry distance in its high bits (deq ≤ true tn — the kernel's
    # exact far-break key) and the cluster id in its low 16; sorting by
    # it is front-to-back. Dead entries key to (n_tiles, INT32_MAX) and
    # land past every real segment; truncation at pcap stays aligned
    # with the clamped offsets because tiles sort in index order.
    scene_diag = jnp.linalg.norm(jnp.max(hi, axis=0) - jnp.min(lo, axis=0))
    tn_scale = jnp.maximum(scene_diag, 1e-12) / 32766.0
    tn_q = jnp.clip(
        (jnp.maximum(tn_lower, 0.0) / tn_scale).astype(jnp.int32),
        0, 32766,
    )
    tile_of = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, n_clusters),
                                       0)
    cl_of = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, n_clusters), 1)
    entry = (tn_q << 16) | cl_of
    k_tile = jnp.where(mask, tile_of, n_tiles).ravel()
    k_entry = jnp.where(mask, entry, jnp.int32(2**31 - 1)).ravel()
    _, pair_cl = jax.lax.sort((k_tile, k_entry), num_keys=2)
    pair_cl = pair_cl[:pcap]
    return _launch_tiles_loop(
        off, pair_cl, org, dirn, t_max_vec, tri_rows, n_tiles=n_tiles,
        interpret=interpret, any_hit=any_hit, n_pairs=total,
        overflow=overflow, pair_meta=pair_meta, inv_xform=inv_xform,
        tn_scale=tn_scale,
    )


def _launch_tiles_loop(off, pair_cl, org, dirn, t_max_vec, tri_rows, *,
                       n_tiles, interpret, any_hit, n_pairs, overflow,
                       pair_meta=None, inv_xform=None, tn_scale=None,
                       entries=None, counts=None, sc_meta=None):
    two_level = pair_meta is not None
    entry_rows = entries is not None
    sc_mode = sc_meta is not None
    assert not sc_mode or entry_rows, "sc_mode rides the entry-row path"
    n_out = 5 if two_level else 4
    n = org.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                            jnp.where(dirn >= 0.0, 1e-12, -1e-12), dirn)
    ray_pack = jnp.concatenate(
        [a.reshape(n_tiles, SUB, 128) for a in (
            org[:, 0], org[:, 1], org[:, 2],
            dirn[:, 0], dirn[:, 1], dirn[:, 2], t_max_vec,
            inv_d[:, 0], inv_d[:, 1], inv_d[:, 2])],
        axis=1,
    ).reshape(n_tiles * 10 * SUB, 128)
    # runtime any-hit flag + far-break scale: operand VALUES, not kernel
    # structure — every stage shares one Mosaic compile. tn_scale=None
    # (all-pairs path: entries carry no distance bits) → scale 0 makes
    # the far break vacuous (deq = 0 beats no live lane).
    flags = jnp.full((1,), 1 if any_hit else 0, jnp.int32)
    scale = jnp.reshape(
        jnp.asarray(tn_scale if tn_scale is not None else 0.0,
                    jnp.float32), (1,)
    )
    n_prefetch = 6 if two_level else 4

    def _by_i(i, *prefetch):
        del prefetch
        return (i, 0)

    in_spec = pl.BlockSpec((10 * SUB, 128), _by_i,
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_out * SUB, 128), _by_i,
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_tiles * n_out * SUB, 128),
                                     jnp.float32)
    (ray_pack,) = jax.lax.optimization_barrier((ray_pack,))
    smem_tri = _os.environ.get(
        "TPURT_SMEM_TRI", "" if interpret else "1") == "1"
    # TPURT_LEAN_OCCL (default on): occlusion traces compile their own
    # lean variant (division-free OR-fold body) instead of sharing the
    # closest-hit kernel via the runtime flag — one extra Mosaic compile
    # per config, cheaper occlusion inner loop (A/B: +1.7% e2e).
    lean_any = any_hit and _os.environ.get("TPURT_LEAN_OCCL", "1") == "1"
    scratch = []
    if entry_rows:
        cp = entries.shape[1]
        scratch += [
            pltpu.SMEM((2, ENTRY_GROUP, cp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if smem_tri:
        # sc_mode DMAs a whole supercluster (SC_SIZE clusters) per copy
        rows_per_copy = (
            _SC_SIZE * ROWS_PER_CLUSTER if sc_mode else ROWS_PER_CLUSTER
        )
        scratch += [
            pltpu.SMEM((2, rows_per_copy, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if entry_rows:
        n_prefetch -= 1  # counts replaces (off, pair_cl)
        if sc_mode:
            n_prefetch += 1  # the sc_meta child table
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM), in_spec]
        scm = (sc_meta,) if sc_mode else ()
        operands = (counts, flags, scale, *scm, tri_rows, entries,
                    ray_pack)
        if two_level:
            operands = (counts, flags, scale, *scm, pair_meta,
                        inv_xform.reshape(-1), tri_rows, entries,
                        ray_pack)
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM), in_spec]
        operands = (off, pair_cl, flags, scale, tri_rows, ray_pack)
        if two_level:
            operands = (off, pair_cl, flags, scale, pair_meta,
                        inv_xform.reshape(-1), tri_rows, ray_pack)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[out_spec],
        scratch_shapes=scratch,
    )
    # sc_mode processes a whole supercluster (up to SC_SIZE clusters)
    # per loop iteration — the while-loop machinery is already amortized
    # ~8×, and unrolling superclusters would multiply kernel code size
    unroll = 1 if sc_mode else (
        PAIR_UNROLL if not interpret else PAIR_UNROLL_INTERP
    )
    out = pl.pallas_call(
        functools.partial(_tileloop_kernel, two_level=two_level,
                          n_out=n_out, smem_tri=smem_tri,
                          lean_any=lean_any,
                          unroll=unroll,
                          entry_rows=entry_rows, sc_mode=sc_mode),
        grid_spec=grid_spec,
        out_shape=[out_shape],
        interpret=interpret,
        # entry-row mode runs ONE launch over the whole wave: the dense
        # entries operand alone is ~13 MB VMEM at bench scale, over the
        # 16 MB default cap (v5e has 128 MB physical VMEM)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(*operands)[0]
    (out,) = jax.lax.optimization_barrier((out,))
    out = out.reshape(n_tiles, n_out, SUB, 128)
    bt = out[:, 0].reshape(n)
    bu = out[:, 1].reshape(n)
    bv = out[:, 2].reshape(n)
    bs = out[:, 3].reshape(n)
    bi = out[:, 4].reshape(n) if two_level else jnp.zeros_like(bt)
    stats = jnp.stack(
        [n_pairs.astype(jnp.float32), overflow.astype(jnp.float32)]
    )
    return bt, bu, bv, bs, bi, stats


def make_tile_intersector(ds, accel: PairAccel, *,
                          interpret: bool | None = None,
                          pairs_per_tile: int = 0,
                          pairs_avg: int = 0,
                          ray_sort: str = "none",
                          shadow_ray_sort: str = "octant",
                          shadow_pairs_avg: int = 0,
                          pairs_avg_cap: int = 0,
                          lean: bool = False,
                          live_cap: int = 0,
                          shadow_live_cap: int = 0):
    """Closest/any-hit pair over uniform Morton clusters, tile-granular
    (same interface as make_brute_force / make_packet_intersector).

    ``pairs_per_tile`` sizes the static (tile, cluster) pair budget — the
    kernel grid AND the SMEM scalar-prefetch array. An overfull tile is
    clamped to the budget (its trailing Morton-order clusters are
    dropped; flagged in ``closest.with_stats`` stats[1]); all other
    tiles stay exact. 0 = all clusters (exact but the grid pays a step
    per (tile, cluster) slot). ``pairs_avg`` sizes the global cap (the
    kernel grid = n_tiles · pairs_avg); shadow/any-hit traces get their
    own sort mode and budget (``shadow_ray_sort``/``shadow_pairs_avg``,
    0 = same as pairs_avg) because occlusion waves have a different
    coherence structure than camera waves (measured in PARITY.md).

    ``pairs_avg_cap`` (pair-loop mode, TPURT_PAIR_LOOP=1 default): the
    UNIFIED per-tile average sizing the SMEM pair-segment capacity for
    every wave kind — callers pass max(primary, bounce, shadow) so all
    six stage instances of a config share one Mosaic kernel variant
    (capacity is SMEM footprint only; tiles iterate their real pair
    count, so an oversized cap costs no compute)."""
    if interpret is None:
        interpret = _use_interpret()
    use_loop = _os.environ.get("TPURT_PAIR_LOOP", "1") == "1"
    lo = accel.cluster_lo
    hi = accel.cluster_hi
    tri_rows = accel.tri_rows
    prim_tri = accel.prim_tri
    prim_inst = accel.prim_inst
    n_clusters = int(accel.cluster_lo.shape[0])
    n_prims = prim_tri.shape[0]
    # two-level (TLAS/BLAS) accel: per-instance-cluster row bases +
    # world→object transforms ride as extra scalar-prefetch operands
    pair_meta = getattr(accel, "pair_meta", None)
    inv_xform = getattr(accel, "inv_xform", None)
    two_level = pair_meta is not None
    # supercluster level (round 5): present on freshly-built accels;
    # None on hand-built test accels (→ per-cluster path, unchanged)
    sc_lo_h = getattr(accel, "sc_lo", None)
    sc_hi_h = getattr(accel, "sc_hi", None)
    sc_meta_h = getattr(accel, "sc_meta", None)

    def _run(org, dirn, t_max, any_hit=False, sort=None, avg_over=None,
             live_trunc=0):
        """``live_trunc`` (static, rays): live-wave truncation for internally
        sorted waves (round 4 — the default-pipeline analog of the
        sorted-wave pipeline's G8 compaction). The forward octant sort
        puts dead rays (tmv < 0) at the back, so slicing the sorted wave
        at a cap ≥ its live count drops only dead rays — the mask
        kernel, entry build, and traversal grid all shrink to the live
        prefix. Any ALIVE ray past the cap is counted into stats[2]
        (live overflow): render_scene re-renders uncapped, so a
        truncated wave never silently survives (same contract as the
        sorted-wave caps). Caps come from measured autotune tables."""
        sort = ray_sort if sort is None else sort
        n = org.shape[0]
        tmv = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        tmv = jnp.where(jnp.isfinite(tmv), tmv, BIG)
        pad = (-n) % TILE
        if pad:
            org = jnp.concatenate(
                [org, jnp.zeros((pad, 3), jnp.float32)]
            )
            dirn = jnp.concatenate(
                [dirn, jnp.ones((pad, 3), jnp.float32)]
            )
            tmv = jnp.concatenate(
                [tmv, jnp.full(pad, -1.0, jnp.float32)]
            )
        n_tiles = (n + pad) // TILE
        # Scene-exit tmax cap (EXACT, not heuristic): every primitive lies
        # inside the accel bounds, so a lane's closest hit satisfies
        # t ≤ its scene-AABB slab-exit distance. Capping tmv there gives
        # MISS lanes a finite best-t, which (a) unblocks the kernel's far
        # break / early loop exit on miss-heavy bounce waves (a single
        # sky-bound lane with bt=BIG otherwise pins its whole tile to the
        # full pair list), (b) tightens every best-t-limited cluster/row
        # box test, and (c) turns rays that miss the scene box entirely
        # into dead lanes excluded from the frustum masks. +1e-4 relative
        # and +1e-4·diag absolute fp padding keep it conservative.
        lo_all = jnp.min(jnp.asarray(lo), axis=0)
        hi_all = jnp.max(jnp.asarray(hi), axis=0)
        diag = jnp.linalg.norm(hi_all - lo_all)
        inv_c = 1.0 / jnp.where(
            jnp.abs(dirn) < 1e-12,
            jnp.where(dirn >= 0.0, 1e-12, -1e-12), dirn,
        )
        t_lo = (lo_all[None, :] - org) * inv_c
        t_hi = (hi_all[None, :] - org) * inv_c
        texit = jnp.min(jnp.maximum(t_lo, t_hi), axis=1)
        cap = texit * (1.0 + 1e-4) + 1e-4 * diag
        tmv = jnp.where(tmv >= 0.0, jnp.minimum(tmv, cap), tmv)
        # packed-prefetch encoding limits (tile·2^16 + cluster + 1, i32);
        # the tile index is per LAUNCH (chunking below keeps it small)
        assert n_clusters < 65535, "pair encoding caps clusters at 65534"
        tlkw = dict(
            pair_meta=(None if pair_meta is None
                       else jnp.asarray(pair_meta)),
            inv_xform=(None if inv_xform is None
                       else jnp.asarray(inv_xform)),
        )
        if n_clusters <= ALLPAIRS_MAX_CLUSTERS:
            assert n_tiles < 32768, "pair encoding caps tiles at 32767"
            trace_fn = _trace_tiles_loop if use_loop else _trace_tiles
            capkw = (dict(pcap=n_tiles * n_clusters) if use_loop
                     else dict(pair_cap=n_tiles * n_clusters))
            bt, bu, bv, bs, bi, stats = trace_fn(
                org, dirn, tmv, jnp.asarray(lo), jnp.asarray(hi),
                jnp.asarray(tri_rows), n_clusters=n_clusters,
                per_tile_clamp=0,
                interpret=interpret, any_hit=any_hit, all_pairs=True,
                **capkw, **tlkw,
            )
            stats = jnp.concatenate(
                [stats, jnp.zeros(1, jnp.float32)]  # live overflow slot
            )
            return bt[:n], bu[:n], bv[:n], bs[:n], bi[:n], stats
        clamp = (
            n_clusters + 1 if pairs_per_tile <= 0
            else min(pairs_per_tile, n_clusters + 1)
        )
        eff_avg = pairs_avg if avg_over is None else avg_over
        avg = clamp if eff_avg <= 0 else min(eff_avg, clamp)
        # Supercluster gate — measured round 5 (ab_results.jsonl):
        # bunny 800×600 sc 9.44 vs per-cluster 10.07 (−6%: superbox
        # conservatism costs ~185 child pre-tests/tile vs 96.9 direct
        # cluster pairs — probe_sc_grouping.py — which eats the ~8×
        # mask/entry machinery saving), sponza quick 3.75 vs 3.74
        # (wash), sponza 1080p 4.88 vs 4.80 (+1.7%, and the budget
        # path's chunked launches/overflow retries disappear). So
        # "auto" = sc ONLY where the cluster-granular entry path is
        # VMEM-INFEASIBLE (large waves × large C — sponza-1080p class);
        # everywhere else the per-cluster entries stay. "1" forces sc
        # wherever S-granular entries fit (A/B); "0" disables.
        sc_env = _os.environ.get("TPURT_SUPERCLUSTER", "auto")
        sc_possible = (
            sc_meta_h is not None
            and sc_env != "0"
            and use_loop
            and pairs_per_tile <= 0
            and _entry_rows_enabled(sc_lo_h.shape[0], n_tiles)
        )
        cluster_entries_ok = _entry_rows_enabled(n_clusters, n_tiles)
        sc_active = sc_possible and (
            sc_env == "1"
            or not cluster_entries_ok
            or n_clusters >= SC_AUTO_MIN_CLUSTERS
        )
        entry_rows_on = sc_active or cluster_entries_ok
        if use_loop and entry_rows_on:
            # entry-row mode has no SMEM pair list, so the SMEM-capacity
            # launch chunking is pointless — and actively harmful: each
            # chunk is its own pallas_call SITE, and the remote Mosaic
            # service compiles every site (a 15-chunk bunny bounce trace
            # paid 15 identical kernel compiles per stage program,
            # round-4 warmup finding). One launch over the whole wave:
            # grid=(n_tiles,), entries as a VMEM operand (13 MB at bench
            # scale — under the raised vmem cap), counts via scalar
            # prefetch.
            chunk_tiles = n_tiles
            pcap = 0  # unused on the entry-row path
        elif use_loop:
            # pair-loop mode: fixed tiles-per-launch; capacity comes
            # from the UNIFIED budget so every wave shares one variant
            cap_avg = pairs_avg_cap if pairs_avg_cap > 0 else max(
                pairs_avg, shadow_pairs_avg, eff_avg or 0
            )
            chunk_tiles = min(TILES_PER_LAUNCH, n_tiles)
            if cap_avg <= 0:
                pcap = min(chunk_tiles * n_clusters,
                           MAX_PAIRS_PER_LAUNCH)
            else:
                pcap = min(chunk_tiles * min(cap_avg, n_clusters),
                           MAX_PAIRS_PER_LAUNCH)
        else:
            # SMEM-bounded launch chunking: split the wave into equal
            # tile ranges so each launch's pair list fits
            # MAX_PAIRS_PER_LAUNCH; ray padding (dead rays) makes every
            # chunk the same shape, so ONE Mosaic kernel variant serves
            # all chunks.
            chunk_tiles = min(
                n_tiles, max(1, MAX_PAIRS_PER_LAUNCH // avg), 32767
            )
        n_chunks = -(-n_tiles // chunk_tiles)
        extra_tiles = n_chunks * chunk_tiles - n_tiles
        if extra_tiles:
            e = extra_tiles * TILE
            org = jnp.concatenate([org, jnp.zeros((e, 3), jnp.float32)])
            dirn = jnp.concatenate([dirn, jnp.ones((e, 3), jnp.float32)])
            tmv = jnp.concatenate([tmv, jnp.full(e, -1.0, jnp.float32)])
            n_tiles = n_chunks * chunk_tiles
        restore_key = None
        # sort="pre": the CALLER already put the wave in a coherent
        # (octant/Morton) order and consumes results in that same order —
        # no forward or restore sort here, but the exact Pallas any-mask
        # stays enabled exactly as for internally-sorted waves (the
        # staged sorted-wave pipeline, render/staged.py: one
        # payload-through lax.sort per bounce replaces the per-trace
        # forward+restore sorts that measured ~100 ms/trace at bench
        # scale — benchmarks/probe_trace_machinery.py).
        if sort in ("morton", "octant"):
            # Tile-coherence reorder for incoherent (bounce/shadow)
            # waves. Both the forward permutation and the un-permute ride
            # multi-operand lax.sort — XLA gather on this backend runs at
            # ~19 ns/element while sort_key_val moves the same data
            # orders of magnitude faster (benchmarks/probe_sort_grid.py).
            # Dead rays sort to the back into all-dead tiles that emit
            # only their sentinel pair. "morton" = origin-major (coherent
            # secondary waves); "octant" = direction-sign-major (measured
            # 2.4–6× tighter tile unions for diffuse-bounce and shadow
            # waves — see _octant_sort_keys).
            scene_lo = jnp.min(jnp.asarray(lo), axis=0)
            scene_hi = jnp.max(jnp.asarray(hi), axis=0)
            keyfn = (_ray_sort_keys if sort == "morton"
                     else _octant_sort_keys)
            keys = keyfn(org, dirn, tmv, scene_lo, scene_hi)
            np_ = org.shape[0]
            (_, ox_s, oy_s, oz_s, dx_s, dy_s, dz_s, tm_s,
             restore_key) = jax.lax.sort(
                (keys, org[:, 0], org[:, 1], org[:, 2], dirn[:, 0],
                 dirn[:, 1], dirn[:, 2], tmv,
                 jnp.arange(np_, dtype=jnp.int32)),
                num_keys=1,
            )
            org = jnp.stack([ox_s, oy_s, oz_s], axis=1)
            dirn = jnp.stack([dx_s, dy_s, dz_s], axis=1)
            tmv = tm_s
        # live-wave truncation (see _run docstring): only meaningful when
        # the wave was just sorted dead-to-back
        live_over = jnp.zeros((), jnp.float32)
        n_full = n_tiles * TILE
        if live_trunc and restore_key is not None:
            kt = min(n_tiles, -(-int(live_trunc) // TILE))
            if entry_rows_on and use_loop:
                chunk_aligned = kt  # single-launch path: any tile count
            else:
                # budget path launches fixed-shape chunks; keep the
                # truncated wave a whole number of chunks
                chunk_aligned = min(
                    n_tiles, -(-kt // chunk_tiles) * chunk_tiles
                )
            kt = chunk_aligned
            if kt < n_tiles:
                live_over = jnp.sum(
                    (tmv[kt * TILE:] >= 0.0).astype(jnp.float32)
                )
                org = org[: kt * TILE]
                dirn = dirn[: kt * TILE]
                tmv = tmv[: kt * TILE]
                n_tiles = kt
                if entry_rows_on and use_loop:
                    chunk_tiles = kt
                n_chunks = -(-n_tiles // chunk_tiles)
        lo_d, hi_d = jnp.asarray(lo), jnp.asarray(hi)
        rows_d = jnp.asarray(tri_rows)
        outs = []
        for k in range(n_chunks):
            s = k * chunk_tiles * TILE
            e = s + chunk_tiles * TILE
            if use_loop:
                sckw = (dict(
                    sc_lo=jnp.asarray(sc_lo_h),
                    sc_hi=jnp.asarray(sc_hi_h),
                    sc_meta=jnp.asarray(sc_meta_h),
                ) if sc_active else {})
                outs.append(_trace_tiles_loop(
                    org[s:e], dirn[s:e], tmv[s:e], lo_d, hi_d, rows_d,
                    n_clusters=n_clusters, pcap=pcap,
                    per_tile_clamp=pairs_per_tile, interpret=interpret,
                    any_hit=any_hit,
                    exact_ok=sort in ("morton", "octant", "pre"),
                    **sckw, **tlkw,
                ))
            else:
                outs.append(_trace_tiles(
                    org[s:e], dirn[s:e], tmv[s:e], lo_d, hi_d, rows_d,
                    n_clusters=n_clusters, pair_cap=chunk_tiles * avg,
                    per_tile_clamp=clamp, interpret=interpret,
                    any_hit=any_hit, **tlkw,
                ))
        if n_chunks == 1:
            bt, bu, bv, bs, bi, stats = outs[0]
        else:
            bt, bu, bv, bs, bi = (
                jnp.concatenate([o[f] for o in outs])
                for f in range(5)
            )
            stats = jnp.stack(
                [sum(o[5][0] for o in outs),
                 jnp.max(jnp.stack([o[5][1] for o in outs]))]
            )
        if bt.shape[0] < n_full:
            # truncated wave: the dropped tail is dead rays (or counted
            # live overflow) — pad with the kernel's dead-lane init
            # values (bt −1, bs −1, bi −1) before un-permuting
            pad_n = n_full - bt.shape[0]
            bt = jnp.concatenate([bt, jnp.full(pad_n, -1.0, jnp.float32)])
            bu = jnp.concatenate([bu, jnp.zeros(pad_n, jnp.float32)])
            bv = jnp.concatenate([bv, jnp.zeros(pad_n, jnp.float32)])
            bs = jnp.concatenate([bs, jnp.full(pad_n, -1.0, jnp.float32)])
            bi = jnp.concatenate([bi, jnp.full(
                pad_n, -1.0 if pair_meta is not None else 0.0,
                jnp.float32)])
        if restore_key is not None:
            # Un-permute ONLY the fields the caller consumes: any-hit
            # waves read just bs (occluded = bs ≥ 0), and bi is all-zero
            # unless two_level — multi-operand lax.sort cost scales with
            # operand count (PARITY.md law 2), so shadow traces restore
            # 2 operands instead of 6.
            if any_hit:
                _, bs = jax.lax.sort((restore_key, bs), num_keys=1)
            elif two_level:
                _, bt, bu, bv, bs, bi = jax.lax.sort(
                    (restore_key, bt, bu, bv, bs, bi), num_keys=1
                )
            else:
                _, bt, bu, bv, bs = jax.lax.sort(
                    (restore_key, bt, bu, bv, bs), num_keys=1
                )
        stats = jnp.concatenate([stats, live_over[None]])
        return bt[:n], bu[:n], bv[:n], bs[:n], bi[:n], stats

    def _hit_from(bt, bu, bv, bs, bi):
        slot = bs.astype(jnp.int32)
        valid = slot >= 0
        slot_c = jnp.clip(slot, 0, n_prims - 1)
        if two_level:
            # the winning instance comes from the kernel's fifth output
            # field (the slot is a shared mesh slot); the packed TL
            # resolver needs BOTH, so inst is never poisoned here
            inst = jnp.where(valid, bi.astype(jnp.int32), -1)
            tri = (jnp.full_like(slot_c, -1) if lean
                   else jnp.asarray(prim_tri)[slot_c])
        elif lean:
            # render pipelines shade via the packed resolver, which reads
            # only ``slot`` — the prim_tri/prim_inst gathers (~4 ns/elt
            # on this backend, 2×N per trace) would be dead weight. tri/
            # inst are poisoned to −1 (not plausible-looking wrong ids)
            # so any consumer that needs them semantically fails loudly.
            tri = jnp.full_like(slot_c, -1)
            inst = jnp.full_like(slot_c, -1)
        else:
            tri = jnp.asarray(prim_tri)[slot_c]
            inst = jnp.asarray(prim_inst)[slot_c]
        return Hit(
            t=jnp.where(valid, bt, jnp.inf),
            u=bu,
            v=bv,
            tri=tri,
            inst=inst,
            valid=valid,
            slot=jnp.where(valid, slot_c, -1),
        )

    def closest(org, dirn, t_min, t_max) -> Hit:
        del t_min
        bt, bu, bv, bs, bi, _ = _run(org, dirn, t_max,
                                     live_trunc=live_cap)
        return _hit_from(bt, bu, bv, bs, bi)

    def any_hit(org, dirn, t_min, t_max):
        del t_min
        _, _, _, bs, _, _ = _run(org, dirn, t_max, any_hit=True,
                                 sort=shadow_ray_sort,
                                 avg_over=shadow_pairs_avg or None,
                                 live_trunc=shadow_live_cap)
        return bs >= 0.0

    def closest_with_stats(org, dirn, t_min, t_max):
        del t_min
        bt, bu, bv, bs, bi, stats = _run(org, dirn, t_max,
                                         live_trunc=live_cap)
        return _hit_from(bt, bu, bv, bs, bi), stats

    def any_hit_with_stats(org, dirn, t_min, t_max):
        del t_min
        _, _, _, bs, _, stats = _run(org, dirn, t_max, any_hit=True,
                                     sort=shadow_ray_sort,
                                     avg_over=shadow_pairs_avg or None,
                                     live_trunc=shadow_live_cap)
        return bs >= 0.0, stats

    closest.with_stats = closest_with_stats
    any_hit.with_stats = any_hit_with_stats
    return closest, any_hit
