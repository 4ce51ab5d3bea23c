"""Packet BVH traversal — the Pallas TPU replacement for ``traceRayEXT``.

One kernel instance owns a *packet* of 1024 rays (an (8, 128) register tile
per SoA field) and walks the packet-BVH (tpurt.bvh.cluster) in lockstep:

  * ONE scalar node pointer per packet — node AABB/first/count/skip live in
    SMEM (scalar memory), so the walk is pure scalar control flow;
  * every box test is ~20 dense VPU ops over the whole packet;
  * a leaf fetches triangle rows (12 tris packed per 128-lane row) with a
    data-dependent row fetch and tests each triangle against all 1024 rays
    via static lane extracts — measured 2.9 ns per triangle-vs-packet;
  * descent rule: enter a subtree iff ANY ray in the packet hits the node
    box (one vector→scalar reduction per node). The outer loop is
    strip-mined (STRIP masked steps per while-iteration) because
    per-step data-dependent loop conditions cost ~50× (measured 244 ns vs
    5 ns per step).

Rays with t_max < 0 are dead lanes (their best_t starts negative, so every
box/triangle test fails). Any-hit mode (shadow rays, SURVEY.md G4) reuses
closest-hit: a confirmed hit sets the lane's best_t to -1 (killing it) and
the whole packet exits early once every live lane has a hit.

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

PACKET = 1024  # rays per packet: one (8, 128) VPU tile
STRIP = 8  # masked steps per outer while iteration
EPS_DENOM = 1e-12
BIG = 3.4e38


def _safe_inv(d):
    tiny = 1e-12
    ds = jnp.where(jnp.abs(d) < tiny, jnp.where(d >= 0.0, tiny, -tiny), d)
    return 1.0 / ds


def _tri_rows_test(row, ox, oy, oz, dx, dy, dz, bt, bu, bv, bs, any_hit):
    """Test the 12 triangles of one fetched row against the packet.

    Möller–Trumbore, double-sided, identical epsilons to
    tpurt.core.vecmath.intersect_tris (the jnp twin, SURVEY.md §4.1).
    """
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
            & (t < bt)
        )
        if any_hit:
            bt = jnp.where(ok, -1.0, bt)  # kill the lane on first hit
        else:
            bt = jnp.where(ok, t, bt)
            bu = jnp.where(ok, u, bu)
            bv = jnp.where(ok, v, bv)
        bs = jnp.where(ok, sl, bs)
    return bt, bu, bv, bs


def _packet_kernel(
    bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,  # SMEM f32 (n_nodes,)
    first_r, count_r, skip_r,  # SMEM i32 (n_nodes,)
    tri_ref,  # VMEM (R, 128) f32
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,  # (8,128)
    bt_ref, bu_ref, bv_ref, bs_ref,  # outs (8,128)
    *,
    n_nodes: int,
    any_hit: bool,
):
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    ivx = _safe_inv(dx)
    ivy = _safe_inv(dy)
    ivz = _safe_inv(dz)
    tmax = tmax_ref[:]
    alive = tmax >= 0.0
    bt0 = jnp.where(alive, tmax, -1.0)

    def inner(_, carry):
        node, bt, bu, bv, bs = carry
        live = node < n_nodes
        nid = jnp.where(live, node, 0)
        bnx = bminx[nid]
        bny = bminy[nid]
        bnz = bminz[nid]
        bxx = bmaxx[nid]
        bxy = bmaxy[nid]
        bxz = bmaxz[nid]
        fst = first_r[nid]
        cnt = count_r[nid]
        skp = skip_r[nid]

        t0x = (bnx - ox) * ivx
        t1x = (bxx - ox) * ivx
        t0y = (bny - oy) * ivy
        t1y = (bxy - oy) * ivy
        t0z = (bnz - oz) * ivz
        t1z = (bxz - oz) * ivz
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

        def do_leaf(args):
            def row_body(r, b):
                row = tri_ref[pl.ds(fst + r, 1), :]
                return _tri_rows_test(
                    row, ox, oy, oz, dx, dy, dz, *b, any_hit
                )

            return jax.lax.fori_loop(0, cnt, row_body, args)

        bt, bu, bv, bs = jax.lax.cond(
            want & is_leaf, do_leaf, lambda a: a, (bt, bu, bv, bs)
        )
        nxt = jnp.where(want & ~is_leaf, nid + 1, skp)
        node = jnp.where(live, nxt, node)
        return node, bt, bu, bv, bs

    def outer(carry):
        return jax.lax.fori_loop(0, STRIP, inner, carry)

    def cond(carry):
        node = carry[0]
        running = node < n_nodes
        if any_hit:
            # early exit once every live lane found an occluder
            running = running & jnp.any(carry[1] >= 0.0)
        return running

    init = (
        jnp.int32(0),
        bt0,
        jnp.zeros_like(bt0),
        jnp.zeros_like(bt0),
        jnp.full_like(bt0, -1.0),
    )
    _, bt, bu, bv, bs = jax.lax.while_loop(cond, outer, init)
    if any_hit:
        # occluded lanes carry bt == -1 with bs >= 0; report via bs only
        bt = jnp.where(bs >= 0.0, 0.0, BIG)
    bt_ref[:] = bt
    bu_ref[:] = bu
    bv_ref[:] = bv
    bs_ref[:] = bs


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

    21-bit Morton of the ray origin (quantized to the scene box) in the
    high bits, direction octant in the low 3. Dead rays (t_max < 0) get the
    max key — the sort sweeps them into trailing packets whose root box
    test fails immediately (packet-granularity stream compaction, the G8
    analog at trace level)."""
    ext = jnp.maximum(scene_hi - scene_lo, 1e-12)
    q = jnp.clip((org - scene_lo) / ext, 0.0, 1.0)
    g = jnp.minimum((q * 128.0).astype(jnp.uint32), jnp.uint32(127))
    morton = (
        (_expand_bits7(g[:, 0]) << 2)
        | (_expand_bits7(g[:, 1]) << 1)
        | _expand_bits7(g[:, 2])
    )
    octant = (
        (dirn[:, 0] >= 0).astype(jnp.uint32) << 2
        | (dirn[:, 1] >= 0).astype(jnp.uint32) << 1
        | (dirn[:, 2] >= 0).astype(jnp.uint32)
    )
    key = (morton << 3) | octant
    return jnp.where(t_max_vec < 0.0, jnp.uint32(0xFFFFFFFF), key)


def _pack(flat: jnp.ndarray, padded: int, fill: float) -> jnp.ndarray:
    n = flat.shape[0]
    if padded != n:
        flat = jnp.concatenate(
            [flat, jnp.full(padded - n, fill, jnp.float32)]
        )
    return flat.reshape(padded // 128, 128)


def _trace(org, dirn, t_max_vec, tables, *, n_nodes, any_hit, interpret,
           ray_sort, scene_lo, scene_hi):
    (bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
     first_r, count_r, skip_r, tri_rows) = tables
    n = org.shape[0]
    n_packets = max(1, math.ceil(n / PACKET))
    padded = n_packets * PACKET

    perm = None
    if ray_sort and n > PACKET:
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

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_packets * 8, 128), jnp.float32)

    kernel = functools.partial(
        _packet_kernel, n_nodes=n_nodes, any_hit=any_hit
    )
    bt, bu, bv, bs = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=[smem()] * 9 + [full()] + [tile()] * 7,
        out_specs=[tile()] * 4,
        out_shape=[out_shape] * 4,
        interpret=interpret,
    )(
        bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
        first_r, count_r, skip_r, tri_rows,
        ox, oy, oz, dx, dy, dz, tm,
    )
    unpack = lambda a: a.reshape(padded)[:n]
    bt, bu, bv, bs = unpack(bt), unpack(bu), unpack(bv), unpack(bs)
    if perm is not None:
        inv = jnp.zeros(n, jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        bt, bu, bv, bs = bt[inv], bu[inv], bv[inv], bs[inv]
    return bt, bu, bv, bs


def _use_interpret() -> bool:
    import os

    if os.environ.get("TPURT_INTERPRET_PALLAS") == "1":
        return True
    return jax.devices()[0].platform != "tpu"


def make_packet_intersector(ds, accel: PacketAccel, *,
                            interpret: bool | None = None,
                            ray_sort: bool = True):
    """Closest/any-hit pair over the packet BVH (same interface as
    tpurt.render.intersectors.make_brute_force)."""
    if interpret is None:
        interpret = _use_interpret()
    scene_lo = jnp.asarray(
        [accel.node_bminx[0], accel.node_bminy[0], accel.node_bminz[0]],
        jnp.float32,
    )
    scene_hi = jnp.asarray(
        [accel.node_bmaxx[0], accel.node_bmaxy[0], accel.node_bmaxz[0]],
        jnp.float32,
    )
    tables = (
        jnp.asarray(accel.node_bminx),
        jnp.asarray(accel.node_bminy),
        jnp.asarray(accel.node_bminz),
        jnp.asarray(accel.node_bmaxx),
        jnp.asarray(accel.node_bmaxy),
        jnp.asarray(accel.node_bmaxz),
        jnp.asarray(accel.node_first),
        jnp.asarray(accel.node_count),
        jnp.asarray(accel.node_skip),
        jnp.asarray(accel.tri_rows),
    )
    prim_tri = jnp.asarray(accel.prim_tri)
    prim_inst = jnp.asarray(accel.prim_inst)
    n_nodes = accel.n_nodes
    n_prims = prim_tri.shape[0]

    def _tmax_vec(org, t_max):
        n = org.shape[0]
        tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        return jnp.where(jnp.isfinite(tm), tm, BIG)

    def closest(org, dirn, t_min, t_max) -> Hit:
        del t_min  # bounce origins are offset; the kernel uses t > 0
        bt, bu, bv, bs = _trace(
            org, dirn, _tmax_vec(org, t_max), tables,
            n_nodes=n_nodes, any_hit=False, interpret=interpret,
            ray_sort=ray_sort, scene_lo=scene_lo, scene_hi=scene_hi,
        )
        slot = bs.astype(jnp.int32)
        valid = slot >= 0
        slot_c = jnp.clip(slot, 0, n_prims - 1)
        return Hit(
            t=jnp.where(valid, bt, jnp.inf),
            u=bu,
            v=bv,
            tri=prim_tri[slot_c],
            inst=prim_inst[slot_c],
            valid=valid,
        )

    def any_hit(org, dirn, t_min, t_max) -> jnp.ndarray:
        del t_min
        _, _, _, bs = _trace(
            org, dirn, _tmax_vec(org, t_max), tables,
            n_nodes=n_nodes, any_hit=True, interpret=interpret,
            ray_sort=ray_sort, scene_lo=scene_lo, scene_hi=scene_hi,
        )
        return bs >= 0.0

    return closest, any_hit
