"""Packet BVH traversal — the Pallas TPU replacement for ``traceRayEXT``.

A *packet* of 1024 rays (one (8, 128) VPU tile per SoA field) walks the
packet-BVH (tpurt.bvh.cluster) in lockstep behind ONE scalar node pointer:

  * node AABB/first/count/skip scalars live in SMEM, so the walk is pure
    scalar control flow — no gathers anywhere;
  * every box test is ~20 dense VPU ops over the whole packet; descent rule:
    enter a subtree iff ANY ray in the packet hits the node box;
  * a leaf fetches triangle rows (12 tris packed per 128-lane row) with a
    data-dependent row fetch and tests each triangle against all 1024 rays
    via static lane extracts.

The per-step critical path is a serialized scalar→vector→scalar round trip
(SMEM node fetch → box test → any() reduction → next pointer), a few
hundred ns in which the VPU is mostly idle. To hide that latency the kernel
**interleaves ILEAVE independent packet walks per instance** — the TPU
analog of GPU warp scheduling: while walk 0 waits on its scalar chain,
walks 1..K-1 issue their vector work. Best-hit state lives in the output
refs (mutated under ``pl.when``), so the march loop carries only scalars.

Rays with t_max < 0 are dead lanes (their best_t starts negative, so every
box/triangle test fails). The wrapper pre-sorts rays by origin-Morton ×
direction-Morton (Garanzha & Loop style), which tightens packet frusta AND
sweeps dead lanes into trailing packets that exit after one root test.
Any-hit mode (shadow rays, SURVEY.md G4) kills a lane on its first hit and
exits the whole walk once every live lane is occluded.

No recursion, no per-ray stack, no gathers — cf. SURVEY.md §7 "divergent
traversal on a lockstep machine".
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.bvh.cluster import LANES_PER_TRI, TPR, PacketAccel
from tpurt.render.intersectors import Hit

import os as _os

# Packet geometry (env-tunable for benchmarking; defaults are the measured
# sweet spot on TPU v5e):
#   PACKET — rays per walk; a (PACKET/128, 128) VPU tile per SoA field.
#     The per-node scalar chain (SMEM fetch → box test → any() → next) is
#     latency-bound, so wider packets amortize it over more rays.
#   ILEAVE — independent walks per kernel instance.
PACKET = int(_os.environ.get("TPURT_PACKET_SIZE", 2048))
ILEAVE = int(_os.environ.get("TPURT_ILEAVE", 1))
STRIP = 8  # masked steps per outer while iteration
EPS_DENOM = 1e-12
BIG = 3.4e38


def _safe_inv(d):
    tiny = 1e-12
    ds = jnp.where(jnp.abs(d) < tiny, jnp.where(d >= 0.0, tiny, -tiny), d)
    return 1.0 / ds


def _tri_rows_test(row, ox, oy, oz, dx, dy, dz, bt, bu, bv, bs, any_hit):
    """Test the 12 triangles of one fetched row against one packet.

    Möller–Trumbore, double-sided, identical epsilons to
    tpurt.core.vecmath.intersect_tris (the jnp twin, SURVEY.md §4.1).

    The 12 tests are computed INDEPENDENTLY (no best-t threading between
    them) and combined with a min-tree afterwards: a serial bt chain makes
    ~300 dependent vector ops per row (each paying full VPU latency), while
    independent tests pipeline at issue rate.
    """
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
        cand.append((jnp.where(ok, t, BIG), u, v, sl))

    # min-tree over the 12 candidates (4 levels, independent ops)
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
    if any_hit:
        bt = jnp.where(win, -1.0, bt)  # kill the lane on first hit
    else:
        bt = jnp.where(win, tm, bt)
        bu = jnp.where(win, um, bu)
        bv = jnp.where(win, vm, bv)
    bs = jnp.where(win, sm, bs)
    return bt, bu, bv, bs


def _packet_kernel(
    bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,  # SMEM f32 (n_nodes,)
    first_r, count_r, skip_r,  # SMEM i32 (n_nodes,)
    tri_ref,  # VMEM (R, 128) f32
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,  # (SUB·K,128)
    bt_ref, bu_ref, bv_ref, bs_ref, stat_ref,  # outs (SUB·K,128)
    *,
    n_nodes: int,
    any_hit: bool,
):
    K = ILEAVE
    SUB = PACKET // 128  # sublanes per walk
    sl = lambda ref, k: ref[k * SUB:(k + 1) * SUB, :]
    walks = []
    for k in range(K):
        ox = sl(ox_ref, k)
        oy = sl(oy_ref, k)
        oz = sl(oz_ref, k)
        dx = sl(dx_ref, k)
        dy = sl(dy_ref, k)
        dz = sl(dz_ref, k)
        ivx = _safe_inv(dx)
        ivy = _safe_inv(dy)
        ivz = _safe_inv(dz)
        tmax = sl(tmax_ref, k)
        alive = tmax >= 0.0
        # best-hit state lives in the output refs, mutated under pl.when —
        # the march loop carries only the K node-pointer scalars
        bt_ref[k * SUB:(k + 1) * SUB, :] = jnp.where(alive, tmax, -1.0)
        bu_ref[k * SUB:(k + 1) * SUB, :] = jnp.zeros_like(tmax)
        bv_ref[k * SUB:(k + 1) * SUB, :] = jnp.zeros_like(tmax)
        bs_ref[k * SUB:(k + 1) * SUB, :] = jnp.full_like(tmax, -1.0)
        walks.append(
            dict(ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                 ivx=ivx, ivy=ivy, ivz=ivz,
                 oix=ox * ivx, oiy=oy * ivy, oiz=oz * ivz, alive=alive)
        )

    def step_walk(k, node, n_steps, n_rows):
        w = walks[k]
        live = node < n_nodes
        nid = jnp.where(live, node, 0)
        bnx = bminx[nid]
        bny = bminy[nid]
        bnz = bminz[nid]
        bxx = bmaxx[nid]
        bxy = bmaxy[nid]
        bxz = bmaxz[nid]
        cnt = count_r[nid]
        skp = skip_r[nid]

        bt = sl(bt_ref, k)
        t0x = bnx * w["ivx"] - w["oix"]
        t1x = bxx * w["ivx"] - w["oix"]
        t0y = bny * w["ivy"] - w["oiy"]
        t1y = bxy * w["ivy"] - w["oiy"]
        t0z = bnz * w["ivz"] - w["oiz"]
        t1z = bxz * w["ivz"] - w["oiz"]
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), bt),
        )
        boxhit = tn <= tf
        want = jnp.any(boxhit) & live
        is_leaf = cnt > 0
        do_leaf = want & is_leaf

        @pl.when(do_leaf)
        def _():
            fst = first_r[nid]

            def row_body(r, c):
                row = tri_ref[pl.ds(fst + r, 1), :]
                nbt, nbu, nbv, nbs = _tri_rows_test(
                    row, w["ox"], w["oy"], w["oz"],
                    w["dx"], w["dy"], w["dz"],
                    sl(bt_ref, k), sl(bu_ref, k), sl(bv_ref, k),
                    sl(bs_ref, k), any_hit,
                )
                bt_ref[k * SUB:(k + 1) * SUB, :] = nbt
                bu_ref[k * SUB:(k + 1) * SUB, :] = nbu
                bv_ref[k * SUB:(k + 1) * SUB, :] = nbv
                bs_ref[k * SUB:(k + 1) * SUB, :] = nbs
                return c

            jax.lax.fori_loop(0, cnt, row_body, 0)

        nxt = jnp.where(want & ~is_leaf, nid + 1, skp)
        node = jnp.where(live, nxt, node)
        # profiling counters (SURVEY.md §5: node visits / leaf rows per
        # frame accumulated inside G2)
        n_steps = n_steps + jnp.where(live, 1, 0)
        n_rows = n_rows + jnp.where(do_leaf, cnt, 0)
        return node, n_steps, n_rows

    def inner(_, carry):
        nodes, n_steps, n_rows = carry
        new_nodes = []
        for k in range(K):
            nk, n_steps, n_rows = step_walk(k, nodes[k], n_steps, n_rows)
            new_nodes.append(nk)
        return tuple(new_nodes), n_steps, n_rows

    def outer(carry):
        nodes, n_steps, n_rows = jax.lax.fori_loop(
            0, STRIP, inner, carry[:3]
        )
        # No ref reads here: reading output refs mutated under nested
        # pl.when from the while carry risks Mosaic sync hazards. Any-hit
        # "early exit" is implicit anyway — occluded lanes carry bt = -1,
        # so a fully-occluded walk fails every box test and fast-forwards
        # through the skip chain to the end in O(depth) steps.
        done = jnp.asarray(True)
        for k in range(K):
            done = done & (nodes[k] >= n_nodes)
        return nodes, n_steps, n_rows, done

    def cond(carry):
        return ~carry[3]

    init = (
        tuple(jnp.int32(0) for _ in range(K)),
        jnp.int32(0),
        jnp.int32(0),
        jnp.asarray(False),
    )
    _, n_steps, n_rows, _ = jax.lax.while_loop(cond, outer, init)

    if any_hit:
        # occluded lanes carry bs >= 0; normalize bt for the wrapper
        bt_ref[:] = jnp.where(bs_ref[:] >= 0.0, 0.0, BIG)
    # group totals: sublanes 0–3 node steps, 4–7 leaf rows (summed walks)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB * K, 128), 0)
    stat_ref[:] = jnp.where(
        sub % 8 < 4,
        n_steps.astype(jnp.float32),
        n_rows.astype(jnp.float32),
    )


def _expand_bits7(v):
    """Spread the low 7 bits so there are 2 zero bits between each."""
    v = v.astype(jnp.uint32)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _ray_sort_keys(org, dirn, t_max_vec, scene_lo, scene_hi):
    """Coherence keys for packet formation (Garanzha & Loop 2010 style).

    Origin-major, direction-minor: 18-bit Morton of the ray origin
    (quantized to the scene box) in the high bits, 12-bit Morton of the
    direction below it. Rays sharing an origin cell (e.g. ALL camera rays)
    are then clustered by direction cone — a packet becomes a tight frustum
    instead of a screen-wide pixel strip. Dead rays (t_max < 0) get the max
    key — the sort sweeps them into trailing packets whose root box test
    fails immediately (packet-granularity stream compaction, the G8 analog
    at trace level)."""
    ext = jnp.maximum(scene_hi - scene_lo, 1e-12)
    q = jnp.clip((org - scene_lo) / ext, 0.0, 1.0)
    g = jnp.minimum((q * 64.0).astype(jnp.uint32), jnp.uint32(63))
    morton_o = (
        (_expand_bits7(g[:, 0]) << 2)
        | (_expand_bits7(g[:, 1]) << 1)
        | _expand_bits7(g[:, 2])
    )  # 18 bits
    d = jnp.clip(dirn * 0.5 + 0.5, 0.0, 1.0)
    gd = jnp.minimum((d * 16.0).astype(jnp.uint32), jnp.uint32(15))
    morton_d = (
        (_expand_bits7(gd[:, 0]) << 2)
        | (_expand_bits7(gd[:, 1]) << 1)
        | _expand_bits7(gd[:, 2])
    )  # 12 bits
    key = (morton_o << 12) | morton_d
    return jnp.where(t_max_vec < 0.0, jnp.uint32(0xFFFFFFFF), key)


def _octant_partition(dirn, t_max_vec):
    """Cheap coherence reorder: stable 9-bin counting partition by
    direction octant (dead rays → trailing bin). No argsort — two cumsums.

    Returns (perm, pos): ``perm`` gathers rays into partitioned order,
    ``pos`` is its inverse (ray i's partitioned position), used to
    un-permute results for free."""
    n = dirn.shape[0]
    octant = (
        (dirn[:, 0] >= 0).astype(jnp.int32) * 4
        + (dirn[:, 1] >= 0).astype(jnp.int32) * 2
        + (dirn[:, 2] >= 0).astype(jnp.int32)
    )
    bins = jnp.where(t_max_vec < 0.0, 8, octant)
    onehot = (bins[:, None] == jnp.arange(9)[None, :]).astype(jnp.int32)
    rank = jnp.take_along_axis(
        jnp.cumsum(onehot, axis=0) - 1, bins[:, None], axis=1
    )[:, 0]
    counts = onehot.sum(axis=0)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    pos = offsets[bins] + rank
    perm = jnp.zeros(n, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return perm, pos


def _pack(flat: jnp.ndarray, padded: int, fill: float) -> jnp.ndarray:
    n = flat.shape[0]
    if padded != n:
        flat = jnp.concatenate(
            [flat, jnp.full(padded - n, fill, jnp.float32)]
        )
    return flat.reshape(padded // 128, 128)


def _trace(org, dirn, t_max_vec, tables, *, n_nodes, any_hit, interpret,
           ray_sort):
    (bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
     first_r, count_r, skip_r, tri_rows) = tables
    n = org.shape[0]
    group = PACKET * ILEAVE
    n_groups = max(1, math.ceil(n / group))
    padded = n_groups * group

    perm = pos = None
    if ray_sort and ray_sort != "none" and n > PACKET:
        if ray_sort == "octant":
            perm, pos = _octant_partition(dirn, t_max_vec)
        else:  # "morton": full origin×direction Morton argsort
            # scene bounds = root AABB (computed here so it is traced/
            # constant-folded rather than an eagerly captured device array)
            scene_lo = jnp.stack(
                [jnp.asarray(bminx)[0], jnp.asarray(bminy)[0],
                 jnp.asarray(bminz)[0]]
            )
            scene_hi = jnp.stack(
                [jnp.asarray(bmaxx)[0], jnp.asarray(bmaxy)[0],
                 jnp.asarray(bmaxz)[0]]
            )
            keys = _ray_sort_keys(org, dirn, t_max_vec, scene_lo, scene_hi)
            perm = jnp.argsort(keys).astype(jnp.int32)
        org = org[perm]
        dirn = dirn[perm]
        t_max_vec = t_max_vec[perm]

    ox = _pack(org[:, 0], padded, 0.0)
    oy = _pack(org[:, 1], padded, 0.0)
    oz = _pack(org[:, 2], padded, 0.0)
    dx = _pack(dirn[:, 0], padded, 1.0)
    dy = _pack(dirn[:, 1], padded, 1.0)
    dz = _pack(dirn[:, 2], padded, 1.0)
    tm = _pack(t_max_vec, padded, -1.0)

    rows = (PACKET // 128) * ILEAVE
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)

    kernel = functools.partial(
        _packet_kernel, n_nodes=n_nodes, any_hit=any_hit
    )
    # Barrier the kernel operands/results: letting XLA fuse shading code
    # across the pallas custom-call boundary was reproduced crashing the
    # TPU worker when ≥2 traces share a program with shading between them.
    ox, oy, oz, dx, dy, dz, tm = jax.lax.optimization_barrier(
        (ox, oy, oz, dx, dy, dz, tm)
    )
    bt, bu, bv, bs, stat = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[smem()] * 9 + [full()] + [tile()] * 7,
        out_specs=[tile()] * 5,
        out_shape=[out_shape] * 5,
        interpret=interpret,
    )(
        bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
        first_r, count_r, skip_r, tri_rows,
        ox, oy, oz, dx, dy, dz, tm,
    )
    bt, bu, bv, bs, stat = jax.lax.optimization_barrier(
        (bt, bu, bv, bs, stat)
    )
    # per-group counters: node steps at sublane 0, leaf rows at sublane 4
    stats = stat.reshape(n_groups, rows, 128)[:, ::4, 0][:, :2]  # (G, 2)
    unpack = lambda a: a.reshape(padded)[:n]
    bt, bu, bv, bs = unpack(bt), unpack(bu), unpack(bv), unpack(bs)
    if perm is not None:
        if pos is None:
            pos = jnp.zeros(n, jnp.int32).at[perm].set(
                jnp.arange(n, dtype=jnp.int32)
            )
        bt, bu, bv, bs = bt[pos], bu[pos], bv[pos], bs[pos]
    return bt, bu, bv, bs, stats


def _use_interpret() -> bool:
    import os

    if os.environ.get("TPURT_INTERPRET_PALLAS") == "1":
        return True
    return jax.devices()[0].platform != "tpu"


def make_packet_intersector(ds, accel: PacketAccel, *,
                            interpret: bool | None = None,
                            ray_sort: str = "octant"):
    """Closest/any-hit pair over the packet BVH (same interface as
    tpurt.render.intersectors.make_brute_force).

    ``accel`` fields may be host numpy arrays, traced values (when this is
    called inside a jit — the render pipelines do), or device arrays. The
    closures hold them AS GIVEN: no eager ``jnp.asarray`` here, because a
    later jit capturing an eager device array must read its bytes back to
    embed the constant — a device→host transfer that permanently poisons
    dispatch latency on the axon backend (benchmarks/profile_poison.py).
    """
    if interpret is None:
        interpret = _use_interpret()
    tables = (
        accel.node_bminx,
        accel.node_bminy,
        accel.node_bminz,
        accel.node_bmaxx,
        accel.node_bmaxy,
        accel.node_bmaxz,
        accel.node_first,
        accel.node_count,
        accel.node_skip,
        accel.tri_rows,
    )
    prim_tri = accel.prim_tri
    prim_inst = accel.prim_inst
    n_nodes = accel.n_nodes
    n_prims = prim_tri.shape[0]

    def _tmax_vec(org, t_max):
        n = org.shape[0]
        tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        return jnp.where(jnp.isfinite(tm), tm, BIG)

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
        del t_min  # bounce origins are offset; the kernel uses t > 0
        bt, bu, bv, bs, _ = _trace(
            org, dirn, _tmax_vec(org, t_max), tables,
            n_nodes=n_nodes, any_hit=False, interpret=interpret,
            ray_sort=ray_sort,
        )
        return _hit_from(bt, bu, bv, bs)

    def any_hit(org, dirn, t_min, t_max) -> jnp.ndarray:
        del t_min
        _, _, _, bs, _ = _trace(
            org, dirn, _tmax_vec(org, t_max), tables,
            n_nodes=n_nodes, any_hit=True, interpret=interpret,
            ray_sort=ray_sort,
        )
        return bs >= 0.0

    def closest_with_stats(org, dirn, t_min, t_max):
        """closest() plus per-group (node steps, leaf rows) counters —
        the SURVEY.md §5 profiling interface."""
        del t_min
        bt, bu, bv, bs, stats = _trace(
            org, dirn, _tmax_vec(org, t_max), tables,
            n_nodes=n_nodes, any_hit=False, interpret=interpret,
            ray_sort=ray_sort,
        )
        return _hit_from(bt, bu, bv, bs), stats

    closest.with_stats = closest_with_stats
    return closest, any_hit
