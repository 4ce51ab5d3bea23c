"""Pair-cluster acceleration structure: uniform Morton clusters for the
dense (ray, cluster) wavefront traversal (tpurt.kernels.pairwave).

Motivation (measured, benchmarks/sweep_packet.py): the lockstep packet
kernel is VPU-THROUGHPUT-bound on redundant work — a 2048-ray packet on
the bunny visits ~80% of the BVH and tests ~40k triangles while each ray
only needs ~10²; incoherent bounce waves run at 0.9 Mrays/s. The fix is
not latency hiding but cutting redundancy: match rays to the clusters
they actually pierce, then do the per-(ray, cluster) triangle tests
densely. This is this framework's equivalent of the GPU's hardware
ray-reordering — instead of SIMT divergence handling, a sort-free
mask→pair expansion in XLA (SURVEY.md §2.2 G2, §7 hard parts).

Structure (host-numpy build, like cluster.py — the analog of
``vkCmdBuildAccelerationStructuresKHR``, SURVEY.md §3.3):

  * instances flattened to world space, triangles Morton-sorted;
  * consecutive runs of TRIS_PER_CLUSTER triangles form one cluster —
    uniform size, so cluster c's rows are exactly
    [c · rows_per_cluster, (c+1) · rows_per_cluster) in the packed
    (R, 128) triangle table (12 tris/row, same record layout as
    tpurt.bvh.cluster);
  * per-cluster world AABB (padded clusters get an empty box that fails
    every slab test).

Like PacketAccel, fields may be host numpy or device arrays; wrappers
must pass them as jit ARGUMENTS (never closure-capture device arrays —
the axon D2H poison, benchmarks/profile_poison.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from tpurt.bvh.cluster import LANES_PER_TRI, TPR, _host_tris, _morton
from tpurt.render.intersectors import SceneMeta
from tpurt.scene.device import DeviceScene

# 8 rows × 12 tris per cluster. Swept on TPU v5e (benchmarks/sweep_tile
# .py): 96 beats 192 on both coherent (12.6 vs 11.2 Mrays/s) and
# shuffled (7.2 vs 6.5) — the per-row cost is dominated by the 120
# scalar lane-extracts of packed tri fields (~240 ns/row), so smaller
# clusters that cull tighter win over fewer fatter steps.
TRIS_PER_CLUSTER = 96
ROWS_PER_CLUSTER = TRIS_PER_CLUSTER // TPR
BIG = np.float32(3.4e38)

# Hierarchical SUPERCLUSTER level (round 5, VERDICT r4 next #2): groups
# of SC_SIZE consecutive clusters under one parent AABB. The exact tile
# mask + entry build/sort then run at supercluster granularity (flops
# and the (T, Cp) entry sort both scale with the box count — ~8× less),
# and the traversal kernel expands each surviving supercluster with the
# in-kernel exact per-child box pre-test (~26 ops/child, best-t
# far-limited) before any row work. Children are CONSECUTIVE clusters in
# the final cluster order (Morton-of-centroid adjacency keeps parents
# tight), so one 64-row DMA fetches a whole supercluster.
SC_SIZE = 8
# the kernel always DMAs SC_SIZE clusters of rows from the first
# child's base — pad tri_rows so the last supercluster can't overrun
SC_PAD_ROWS = (SC_SIZE - 1) * ROWS_PER_CLUSTER


def _supercluster_groups(lo: np.ndarray, hi: np.ndarray,
                         base0: int = 0):
    """Group consecutive clusters into superclusters of SC_SIZE.

    Returns (sc_lo, sc_hi, sc_meta) where sc_meta packs
    ``first_child_cluster | n_children << 16`` (cluster ids < 2^16,
    enforced by the kernel's entry encoding)."""
    n_c = lo.shape[0]
    sc_lo, sc_hi, sc_meta = [], [], []
    for b in range(0, n_c, SC_SIZE):
        e = min(b + SC_SIZE, n_c)
        sc_lo.append(lo[b:e].min(0))
        sc_hi.append(hi[b:e].max(0))
        sc_meta.append((base0 + b) | ((e - b) << 16))
    return (
        np.asarray(sc_lo, np.float32),
        np.asarray(sc_hi, np.float32),
        np.asarray(sc_meta, np.int32),
    )


SHADE_LANES = 32  # record stride (one (n_slots, 32) row per slot)
# record layout (lane offsets within the 32-lane record):
#   0:3   world geometric normal (inst normal matrix · object cross, raw)
#   3:6   world shading normal at v0 (raw; interpolate then normalize)
#   6:9   .. at v1      9:12  .. at v2
#   12    material kind  13:16 albedo  16:19 emission
#   19    param0  20 param1  21 material id
#   22:24 uv at v0  24:26 uv at v1  26:28 uv at v2  28 texture id
#   29    alpha cutoff (0 = opaque; > 0 = alpha-tested, SURVEY.md G4)
SHADE_USED = 30


class PairAccel(NamedTuple):
    """Uniform-cluster table for the pair wavefront kernel.

    cluster_lo/hi: (C, 3) f32 world AABBs (empty box when padded).
    tri_rows: (C · ROWS_PER_CLUSTER, 128) f32 packed triangle records
        (v0.xyz, e1.xyz, e2.xyz, slot-id; 12 per row; zero padding rows
        have det 0 ⇒ Möller–Trumbore miss, slot −1).
    prim_tri/prim_inst: flat slot → (global tri id, instance id).
    shade_rows: (n_slots, SHADE_LANES) f32 — per-slot WORLD-space shading
        record (layout above), one direct row per slot. One row gather
        per hit replaces ~10 per-field XLA gathers + the instance
        normal-matrix einsum (each measured ~10 ms per 960k-ray bounce).
        Direct 32-lane rows (vs the earlier 4-records-per-128-lane-row
        packing) drop the 4-way sub-record select AND shrink the
        gather-output relayout copy XLA inserts before shading math
        (measured 17.6 ms per 960k-ray shade on the (N, 128) form).
    """

    cluster_lo: np.ndarray
    cluster_hi: np.ndarray
    tri_rows: np.ndarray
    prim_tri: np.ndarray
    prim_inst: np.ndarray
    shade_rows: np.ndarray
    # supercluster level (see SC_SIZE): parent AABBs over SC_SIZE
    # consecutive clusters + packed (first_child | n_children << 16)
    sc_lo: np.ndarray | None = None
    sc_hi: np.ndarray | None = None
    sc_meta: np.ndarray | None = None

    @property
    def n_clusters(self) -> int:
        return self.cluster_lo.shape[0]


def flatten_world_tris(ds: DeviceScene | None, meta: SceneMeta, scene=None):
    """Instances → world-space triangle soup, Morton-sorted.

    Returns (v0, v1, v2, tri_id, inst_id) host numpy arrays. Shared by the
    packet-BVH and pair-cluster builders."""
    tv0, tv1, tv2, inst_tf = _host_tris(ds, meta, scene)
    v0l, v1l, v2l, tril, instl = [], [], [], [], []
    for inst_id, mesh_id in enumerate(meta.inst_mesh):
        start, count = meta.mesh_tri_ranges[mesh_id]
        if count == 0:
            continue
        m = inst_tf[inst_id]
        xf = lambda v: v @ m[:, :3].T + m[:, 3]
        v0l.append(xf(tv0[start:start + count]))
        v1l.append(xf(tv1[start:start + count]))
        v2l.append(xf(tv2[start:start + count]))
        tril.append(np.arange(start, start + count, dtype=np.int32))
        instl.append(np.full(count, inst_id, np.int32))
    v0 = np.concatenate(v0l).astype(np.float32)
    v1 = np.concatenate(v1l).astype(np.float32)
    v2 = np.concatenate(v2l).astype(np.float32)
    tri_id = np.concatenate(tril)
    inst_id = np.concatenate(instl)

    centro = (v0 + v1 + v2) / 3.0
    lo = np.minimum(np.minimum(v0, v1), v2).min(0)
    hi = np.maximum(np.maximum(v0, v1), v2).max(0)
    order = np.argsort(_morton(centro, lo, hi), kind="stable")
    return (v0[order], v1[order], v2[order], tri_id[order],
            inst_id[order])


def kd_cluster_order(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                     size: int = TRIS_PER_CLUSTER,
                     sah: bool = True, n_cand: int = 5) -> np.ndarray:
    """Permutation grouping triangles into kd-tight uniform clusters.

    Recursive centroid partition whose split counts are multiples of
    ``size``: every consecutive run of ``size`` tris in the returned
    order is one spatially-compact cluster (the single remainder cluster
    lands last). Versus chopping the global Morton order (which jumps
    diagonally at code boundaries), cluster AABBs tighten substantially
    at identical cluster count/memory/machinery — measured on the bunny
    bounce wave (benchmarks/probe_cluster.py): exact-ANY pairs/tile
    138.8 → 99.4 (−28%), frustum pairs 302 → 296.

    ``sah=True`` (default) picks the split axis AND position by scanning
    all 3 axes × ``n_cand`` size-multiple positions with the SAH-style
    cost area(L)·nL + area(R)·nR over true triangle-box unions
    (prefix/suffix scans along each axis order), instead of the widest-
    centroid-axis midpoint: exact-ANY 99.4 → 96.0, mean cluster box
    volume −14% (benchmarks/probe_cluster2.py; the k-means capacity
    refinements measured there were strictly worse and were rejected).

    Clusters are emitted in Morton order of their centroid and tris
    WITHIN a cluster are Morton-ordered so the per-row 12-tri sub-boxes
    stay tight.
    """
    centro = ((v0 + v1 + v2) / 3.0).astype(np.float64)
    if sah:
        pmin = np.minimum(np.minimum(v0, v1), v2).astype(np.float64)
        pmax = np.maximum(np.maximum(v0, v1), v2).astype(np.float64)

        def _area(lo, hi):
            d = np.maximum(hi - lo, 0.0)
            return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    n = v0.shape[0]
    groups = []
    stack = [np.arange(n)]
    while stack:
        s = stack.pop()
        if s.shape[0] <= size:
            groups.append(s)
            continue
        c = centro[s]
        if sah:
            n_cl = s.shape[0] // size
            mid = max(1, int(round(n_cl / 2.0)))
            cands = sorted({
                max(1, min(n_cl, mid + d))
                for d in range(-(n_cand // 2), n_cand // 2 + 1)
            })
            best = None
            for ax in range(3):
                o = np.argsort(c[:, ax], kind="stable")
                so = s[o]
                pre_lo = np.minimum.accumulate(pmin[so], axis=0)
                pre_hi = np.maximum.accumulate(pmax[so], axis=0)
                suf_lo = np.minimum.accumulate(
                    pmin[so][::-1], axis=0)[::-1]
                suf_hi = np.maximum.accumulate(
                    pmax[so][::-1], axis=0)[::-1]
                for m in cands:
                    k = m * size
                    if k >= s.shape[0]:
                        continue
                    cost = (
                        _area(pre_lo[k - 1], pre_hi[k - 1]) * k
                        + _area(suf_lo[k], suf_hi[k])
                        * (s.shape[0] - k)
                    )
                    if best is None or cost < best[0]:
                        best = (cost, so[:k], so[k:])
            if best is not None:
                stack.append(best[1])
                stack.append(best[2])
                continue
            # every candidate k >= len(s) (single full cluster +
            # remainder): fall through to the midpoint split below
        ax = int(np.argmax(c.max(0) - c.min(0)))
        n_cl = s.shape[0] / size
        k = max(1, int(round(n_cl / 2.0))) * size
        if k >= s.shape[0]:
            k = (s.shape[0] - 1) // size * size
        part = np.argpartition(c[:, ax], k)
        stack.append(s[part[:k]])
        stack.append(s[part[k:]])
    # remainder cluster (size < ``size``) must land last so padding only
    # ever hits the final cluster's rows
    full = [g for g in groups if g.shape[0] == size]
    rest = [g for g in groups if g.shape[0] < size]
    assert len(rest) <= 1
    if full:
        lo = centro.min(0)
        hi = centro.max(0)
        cen = np.stack([centro[g].mean(0) for g in full])
        c_ord = np.argsort(
            _morton(cen.astype(np.float32), lo.astype(np.float32),
                    hi.astype(np.float32)), kind="stable"
        )
        full = [full[i] for i in c_ord]
    order = []
    for g in full + rest:
        if sah and g.shape[0] > 12:
            # within-cluster kd-sah into 12-tri rows: the kernel's
            # per-row sub-AABBs come from chopping this order every 12,
            # so kd-tight 12-groups prune rows harder than Morton runs —
            # measured row-box pass rate 37.2% → 26.6% on the bunny
            # bounce wave (benchmarks/probe_kernel_sim.py::main_rows),
            # i.e. −29% Möller–Trumbore row work at zero kernel change.
            order.append(g[kd_cluster_order(
                v0[g], v1[g], v2[g], size=12, sah=True)])
            continue
        m = _morton(centro[g].astype(np.float32),
                    centro[g].min(0).astype(np.float32),
                    centro[g].max(0).astype(np.float32))
        order.append(g[np.argsort(m, kind="stable")])
    return np.concatenate(order) if order else np.arange(0)


def hier_cluster_order(v0, v1, v2, size: int = TRIS_PER_CLUSTER,
                       parent: int = SC_SIZE * TRIS_PER_CLUSTER):
    """Two-level kd-SAH order: kd-tight PARENT blocks of ``parent`` tris
    first, then kd-tight ``size`` clusters within each block — so the
    SC_SIZE consecutive clusters forming each supercluster share a
    kd-tight parent AABB instead of whatever Morton adjacency gave.
    Measured on the bunny bounce wave (benchmarks/probe_sc_grouping.py):
    cluster quality unchanged (exact pairs/tile 96.9 → 96.5) while
    supercluster survivors drop 23.2 → 19.9/tile (−14% of the sc
    kernel's per-child pre-test/DMA work). kd_cluster_order guarantees
    every non-last parent block is exactly ``parent`` tris and the
    single sub-size remainder lands last, so the final cluster is still
    the only padded one."""
    outer = kd_cluster_order(v0, v1, v2, size=parent, sah=True)
    order = []
    n = v0.shape[0]
    for b in range(0, n, parent):
        blk = outer[b:min(b + parent, n)]
        inner = kd_cluster_order(v0[blk], v1[blk], v2[blk], size=size,
                                 sah=True)
        order.append(blk[inner])
    return (np.concatenate(order) if order
            else np.arange(0))


def cluster_order(v0, v1, v2, size: int = TRIS_PER_CLUSTER):
    """Production triangle order for uniform clustering: hierarchical
    kd-SAH (supercluster-aligned parents) by default;
    ``TPURT_CLUSTERING=kdsah`` is the round-2..4 flat kd-SAH order,
    ``=kd`` the cheaper widest-axis-midpoint splits, ``=morton`` keeps
    the input (Morton) order — all for A/B measurement."""
    import os

    mode = os.environ.get("TPURT_CLUSTERING", "hier")
    if mode == "hier":
        return hier_cluster_order(v0, v1, v2, size)
    if mode == "kdsah":
        return kd_cluster_order(v0, v1, v2, size, sah=True)
    if mode == "kd":
        return kd_cluster_order(v0, v1, v2, size, sah=False)
    return np.arange(v0.shape[0])


def pack_tri_rows(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                  n_rows: int):
    """Pack triangles into the (n_rows, 128) kernel record table.

    Returns (tri_rows, pmin, pmax) where pmin/pmax are per-slot triangle
    AABBs (±BIG on padding slots) for cluster/leaf box fitting."""
    t = v0.shape[0]
    slots = n_rows * TPR
    pad = slots - t

    def padf(a, fill=0.0):
        return np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
        )

    v0p, v1p, v2p = padf(v0), padf(v1), padf(v2)
    slot_id = np.concatenate(
        [np.arange(t, dtype=np.float32), np.full(pad, -1.0, np.float32)]
    )
    rec = np.zeros((slots, LANES_PER_TRI), np.float32)
    rec[:, 0:3] = v0p
    rec[:, 3:6] = v1p - v0p
    rec[:, 6:9] = v2p - v0p
    rec[:, 9] = slot_id
    tri_rows = np.zeros((n_rows, 128), np.float32)
    tri_rows[:, : TPR * LANES_PER_TRI] = rec.reshape(
        n_rows, TPR * LANES_PER_TRI
    )
    valid = (slot_id >= 0)[:, None]
    pmin = np.where(valid, np.minimum(np.minimum(v0p, v1p), v2p), BIG)
    pmax = np.where(valid, np.maximum(np.maximum(v0p, v1p), v2p), -BIG)
    return tri_rows, pmin, pmax


def _pack_cluster_box_lanes(tri_rows: np.ndarray, lo: np.ndarray,
                            hi: np.ndarray) -> None:
    """Stuff each cluster's own AABB into the last free spare lanes of
    its first three rows (lanes 126–127; 120–125 hold the per-row
    sub-boxes): row0 → (lox, loy), row1 → (loz, hix), row2 → (hiy, hiz).
    The kernel slab-tests this box (far-limited by the tile's current
    best t) ONCE per pair and skips all 8 per-row box tests when no lane
    can reach the cluster — on divergent waves over half the
    conservatively-matched pairs fail exactly here (measured: frustum
    302 vs exact-ANY 139 clusters/tile on the bunny bounce wave)."""
    n_c = lo.shape[0]
    box = np.concatenate([lo, hi], axis=1).astype(np.float32)  # (C, 6)
    rows = tri_rows.reshape(n_c, ROWS_PER_CLUSTER, 128)
    rows[:, 0, 126:128] = box[:, 0:2]
    rows[:, 1, 126:128] = box[:, 2:4]
    rows[:, 2, 126:128] = box[:, 4:6]


def _host_shading(ds: DeviceScene | None, meta: SceneMeta, scene=None):
    """Host-side per-global-tri (n0, n1, n2, mat_id), per-inst (normal
    matrix, material override), and material tables."""
    if scene is not None:
        n0s, n1s, n2s, mats = [], [], [], []
        uv0s, uv1s, uv2s = [], [], []
        for mesh in scene.meshes:
            idx = mesh.indices
            nrm = (mesh.normals if mesh.normals is not None
                   else mesh.compute_vertex_normals())
            n0s.append(nrm[idx[:, 0]])
            n1s.append(nrm[idx[:, 1]])
            n2s.append(nrm[idx[:, 2]])
            uv = (mesh.uvs if mesh.uvs is not None
                  else np.zeros((mesh.vertices.shape[0], 2), np.float32))
            uv0s.append(uv[idx[:, 0]])
            uv1s.append(uv[idx[:, 1]])
            uv2s.append(uv[idx[:, 2]])
            mats.append(mesh.material_ids)
        tn0 = np.concatenate(n0s).astype(np.float32)
        tn1 = np.concatenate(n1s).astype(np.float32)
        tn2 = np.concatenate(n2s).astype(np.float32)
        tuv = tuple(
            np.concatenate(x).astype(np.float32)
            for x in (uv0s, uv1s, uv2s)
        )
        tmat = np.concatenate(mats).astype(np.int32)
        inst_nrm = np.stack([
            np.linalg.inv(i.transform[:, :3]).T for i in scene.instances
        ]).astype(np.float32)
        inst_over = np.array(
            [i.material_override for i in scene.instances], np.int32
        )
        k = max(len(scene.materials), 1)
        mk = np.zeros(k, np.float32)
        ma = np.zeros((k, 3), np.float32)
        me = np.zeros((k, 3), np.float32)
        mp0 = np.zeros(k, np.float32)
        mp1 = np.zeros(k, np.float32)
        mtex = np.full(k, -1, np.float32)
        mcut = np.zeros(k, np.float32)
        for j, m in enumerate(scene.materials):
            mk[j] = m.kind
            ma[j] = m.albedo
            me[j] = m.emission
            mp0[j] = m.param0
            mp1[j] = m.param1
            mtex[j] = getattr(m, "base_color_texture", -1)
            mcut[j] = getattr(m, "alpha_cutoff", 0.0)
        return tn0, tn1, tn2, tmat, inst_nrm, inst_over, mk, ma, me, \
            mp0, mp1, tuv, mtex, mcut
    import jax

    # D2H fallback — poisons axon dispatch; see _host_tris
    (tn0, tn1, tn2, tmat, inst_nrm, inst_over, mk, ma, me, mp0,
     mp1, uv0, uv1, uv2, mtex, mcut) = jax.device_get(
        (ds.tri_n0, ds.tri_n1, ds.tri_n2, ds.tri_mat, ds.inst_nrm,
         ds.inst_mat_override, ds.mat_kind, ds.mat_albedo,
         ds.mat_emission, ds.mat_param0, ds.mat_param1,
         ds.tri_uv0, ds.tri_uv1, ds.tri_uv2, ds.mat_texture,
         ds.mat_alpha_cutoff)
    )
    return (tn0, tn1, tn2, tmat, inst_nrm, inst_over,
            mk.astype(np.float32), ma, me, mp0, mp1,
            (uv0, uv1, uv2), mtex.astype(np.float32),
            np.asarray(mcut, np.float32))


def build_shade_rows(ds: DeviceScene, meta: SceneMeta, v0, v1, v2,
                     tri_id, inst_id, n_slots: int, scene=None):
    """(n_slots, SHADE_LANES) world-space shading records."""
    (tn0, tn1, tn2, tmat, inst_nrm, inst_over, mk, ma, me, mp0,
     mp1, tuv, mtex, mcut) = _host_shading(ds, meta, scene)
    t = tri_id.shape[0]
    nm = inst_nrm[inst_id]  # (t, 3, 3)
    xf = lambda n: np.einsum("tij,tj->ti", nm, n).astype(np.float32)
    # v0/v1/v2 are WORLD-space: their cross is already the world normal
    # up to det(A) — flip by its sign to match the legacy direction
    # (nrm_mat · object-cross); applying nrm_mat again would rotate it.
    det_sign = np.sign(np.linalg.det(np.linalg.inv(nm))).astype(
        np.float32
    )[:, None]
    n_geom = (np.cross(v1 - v0, v2 - v0) * det_sign).astype(np.float32)
    n0w = xf(tn0[tri_id])
    n1w = xf(tn1[tri_id])
    n2w = xf(tn2[tri_id])
    over = inst_over[inst_id]
    mid = np.where(over >= 0, over, tmat[tri_id])
    mid = np.clip(mid, 0, mk.shape[0] - 1)

    rec = np.zeros((n_slots, SHADE_LANES), np.float32)
    rec[:t, 0:3] = n_geom
    rec[:t, 3:6] = n0w
    rec[:t, 6:9] = n1w
    rec[:t, 9:12] = n2w
    rec[:t, 12] = mk[mid]
    rec[:t, 13:16] = ma[mid]
    rec[:t, 16:19] = me[mid]
    rec[:t, 19] = mp0[mid]
    rec[:t, 20] = mp1[mid]
    rec[:t, 21] = mid.astype(np.float32)
    # lanes 22–28: per-corner UVs + base-color texture id (-1 = none)
    rec[:t, 22:24] = tuv[0][tri_id]
    rec[:t, 24:26] = tuv[1][tri_id]
    rec[:t, 26:28] = tuv[2][tri_id]
    rec[:t, 28] = mtex[mid]
    rec[:t, 29] = mcut[mid]
    return rec


class PairAccelTL(NamedTuple):
    """Two-level (TLAS/BLAS) variant of PairAccel (SURVEY.md §2.1 C9).

    The reference instancing model (VkAccelerationStructureInstanceKHR:
    3×4 transform + BLAS address) maps to: ONE shared object-space
    triangle/shade table per mesh (the BLAS), plus per-INSTANCE-CLUSTER
    entries that carry a world AABB (for the XLA tile mask), the base
    row of the shared mesh cluster, and the world→object transform the
    kernel applies to the ray tile before testing (SURVEY.md §3.3
    "rays transformed into object space at BLAS entry"). Unique-triangle
    memory scales with BLAS size, not instance count.

    cluster_lo/hi: (IC, 3) world boxes per instance-cluster.
    tri_rows: (R, 128) OBJECT-space packed rows (shared across
        instances; per-row object-space sub-AABBs in lanes 120–125).
    pair_meta: (IC,) i32 — row_base | instance_id << 20 (row_base
        < 2^20 rows, instance < 2^11).
    inv_xform: (IC, 12) f32 — world→object 3×4, row-major.
    prim_tri: mesh-slot → global triangle id. prim_inst: all −1
        (instance comes from the hit's inst field, not the slot).
    shade_rows: object-space per-mesh-slot records (SHADE_LANES layout,
        normals in OBJECT space; resolver applies the instance normal
        matrix + material override from inst_table).
    inst_table: (I, 24) f32 — [nrm_mat(9), det_sign, override_flag,
        o_kind, o_albedo(3), o_emission(3), o_p0, o_p1, o_mid, pad(2)].
    """

    cluster_lo: np.ndarray
    cluster_hi: np.ndarray
    tri_rows: np.ndarray
    pair_meta: np.ndarray
    inv_xform: np.ndarray
    prim_tri: np.ndarray
    prim_inst: np.ndarray
    shade_rows: np.ndarray
    inst_table: np.ndarray
    # supercluster level (never spans an instance: children share one
    # world→object transform and contiguous BLAS rows — see SC_SIZE)
    sc_lo: np.ndarray | None = None
    sc_hi: np.ndarray | None = None
    sc_meta: np.ndarray | None = None

    @property
    def n_clusters(self) -> int:
        return self.cluster_lo.shape[0]


INST_SHIFT = 20  # pair_meta bit split: row_base low 20 bits, instance above


def build_pair_accel_two_level(ds: DeviceScene, meta: SceneMeta,
                               scene=None) -> PairAccelTL:
    """Object-space per-mesh clusters + per-instance cluster instances."""
    tv0, tv1, tv2, inst_tf = _host_tris(ds, meta, scene)
    (tn0, tn1, tn2, tmat, inst_nrm, inst_over, mk, ma, me, mp0,
     mp1, tuv, mtex, mcut) = _host_shading(ds, meta, scene)

    # --- per-mesh (BLAS): morton-sort object tris, uniform clusters
    mesh_rows = []
    mesh_cluster_base = []  # first cluster row of each mesh
    mesh_cluster_boxes = []  # per mesh: (n_c, 2, 3) object-space boxes
    slot_tri = []  # mesh-slot → global tri id
    n_rows_total = 0
    for mesh_id, (start, count) in enumerate(meta.mesh_tri_ranges):
        if count == 0:
            mesh_cluster_base.append(n_rows_total)
            mesh_cluster_boxes.append(np.zeros((0, 2, 3), np.float32))
            continue
        v0 = tv0[start:start + count]
        v1 = tv1[start:start + count]
        v2 = tv2[start:start + count]
        centro = (v0 + v1 + v2) / 3.0
        lo = np.minimum(np.minimum(v0, v1), v2).min(0)
        hi = np.maximum(np.maximum(v0, v1), v2).max(0)
        order = np.argsort(_morton(centro, lo, hi), kind="stable")
        ko = cluster_order(v0[order], v1[order], v2[order])
        order = order[ko]
        v0, v1, v2 = v0[order], v1[order], v2[order]
        n_c = -(-count // TRIS_PER_CLUSTER)
        n_rows = n_c * ROWS_PER_CLUSTER
        rows, pmin, pmax = pack_tri_rows(v0, v1, v2, n_rows)
        # global mesh-slot ids: local slot + base
        base_slot = sum(len(s) for s in slot_tri)
        rec_slots = rows[:, 9:TPR * LANES_PER_TRI:LANES_PER_TRI]
        valid = rec_slots >= 0
        rows[:, 9:TPR * LANES_PER_TRI:LANES_PER_TRI] = np.where(
            valid, rec_slots + base_slot, -1.0
        )
        row_lo = pmin.reshape(n_rows, TPR, 3).min(1)
        row_hi = pmax.reshape(n_rows, TPR, 3).max(1)
        rows[:, 120:123] = row_lo.astype(np.float32)
        rows[:, 123:126] = row_hi.astype(np.float32)
        clo = pmin.reshape(n_c, TRIS_PER_CLUSTER, 3).min(1)
        chi = pmax.reshape(n_c, TRIS_PER_CLUSTER, 3).max(1)
        _pack_cluster_box_lanes(rows, clo, chi)
        mesh_rows.append(rows)
        mesh_cluster_base.append(n_rows_total)
        mesh_cluster_boxes.append(
            np.stack([clo, chi], axis=1).astype(np.float32)
        )
        n_rows_total += n_rows
        slot_tri.append((start + order).astype(np.int32))
    tri_rows = (
        np.concatenate(mesh_rows) if mesh_rows
        else np.zeros((0, 128), np.float32)
    )
    prim_tri = (
        np.concatenate(slot_tri) if slot_tri
        else np.zeros(0, np.int32)
    )
    n_slots = prim_tri.shape[0]

    # --- per-instance cluster entries (the TLAS leaves)
    ic_lo, ic_hi, ic_meta, ic_xf = [], [], [], []
    sc_lo_l, sc_hi_l, sc_meta_l = [], [], []
    ic_base = 0  # running global instance-cluster index
    for inst_id, mesh_id in enumerate(meta.inst_mesh):
        boxes = mesh_cluster_boxes[mesh_id]
        if boxes.shape[0] == 0:
            continue
        m = inst_tf[inst_id]  # (3, 4) object→world
        a = m[:, :3]
        t = m[:, 3]
        # world box of each object box: transform the 8 corners
        corners = np.stack(
            [boxes[:, (i >> k) & 1, k] for i in range(8)
             for k in range(3)], 0
        ).T.reshape(-1, 8, 3)
        wc = corners @ a.T + t
        ic_lo.append(wc.min(1))
        ic_hi.append(wc.max(1))
        n_c = boxes.shape[0]
        base_rows = (
            mesh_cluster_base[mesh_id]
            + np.arange(n_c, dtype=np.int64) * ROWS_PER_CLUSTER
        )
        assert base_rows.max(initial=0) < (1 << INST_SHIFT), \
            "row_base exceeds pair_meta encoding"
        assert inst_id < (1 << (31 - INST_SHIFT)), \
            "instance id exceeds pair_meta encoding"
        ic_meta.append(
            (base_rows | (inst_id << INST_SHIFT)).astype(np.int32)
        )
        ainv = np.linalg.inv(a)
        xf = np.concatenate(
            [ainv, (-ainv @ t)[:, None]], axis=1
        ).astype(np.float32)  # world→object 3×4
        ic_xf.append(np.tile(xf.reshape(1, 12), (n_c, 1)))
        # superclusters per INSTANCE (never spanning one): children are
        # consecutive instance-clusters of this instance, whose shared
        # BLAS rows are contiguous (base_rows is an arithmetic sequence)
        # and whose world→object transform is identical
        s_lo, s_hi, s_meta = _supercluster_groups(
            ic_lo[-1].astype(np.float32), ic_hi[-1].astype(np.float32),
            base0=ic_base,
        )
        sc_lo_l.append(s_lo)
        sc_hi_l.append(s_hi)
        sc_meta_l.append(s_meta)
        ic_base += n_c
    cluster_lo = np.concatenate(ic_lo).astype(np.float32)
    cluster_hi = np.concatenate(ic_hi).astype(np.float32)
    pair_meta = np.concatenate(ic_meta)
    inv_xform = np.concatenate(ic_xf)
    sc_lo = np.concatenate(sc_lo_l).astype(np.float32)
    sc_hi = np.concatenate(sc_hi_l).astype(np.float32)
    sc_meta = np.concatenate(sc_meta_l)

    # --- object-space shade records per mesh slot
    gt = np.clip(prim_tri, 0, max(tmat.shape[0] - 1, 0))
    n_geom_obj = np.cross(
        tv1[gt] - tv0[gt], tv2[gt] - tv0[gt]
    ).astype(np.float32)
    mid = np.clip(tmat[gt], 0, mk.shape[0] - 1)
    rec = np.zeros((n_slots, SHADE_LANES), np.float32)
    rec[:, 0:3] = n_geom_obj
    rec[:, 3:6] = tn0[gt]
    rec[:, 6:9] = tn1[gt]
    rec[:, 9:12] = tn2[gt]
    rec[:, 12] = mk[mid]
    rec[:, 13:16] = ma[mid]
    rec[:, 16:19] = me[mid]
    rec[:, 19] = mp0[mid]
    rec[:, 20] = mp1[mid]
    rec[:, 21] = mid.astype(np.float32)
    # lanes 22-28: per-corner UVs + base-color texture id (-1 = none)
    rec[:, 22:24] = tuv[0][gt]
    rec[:, 24:26] = tuv[1][gt]
    rec[:, 26:28] = tuv[2][gt]
    rec[:, 28] = mtex[mid]
    rec[:, 29] = mcut[mid]
    shade_rows = rec

    # --- per-instance normal matrix + material override table
    n_inst = len(meta.inst_mesh)
    it = np.zeros((n_inst, 24), np.float32)
    for i in range(n_inst):
        nm = inst_nrm[i]  # inv(A)^T (legacy convention)
        it[i, 0:9] = nm.reshape(-1)
        it[i, 9] = np.sign(np.linalg.det(np.linalg.inv(nm)))
        over = int(inst_over[i])
        if over >= 0:
            om = min(over, mk.shape[0] - 1)
            it[i, 10] = 1.0
            it[i, 11] = mk[om]
            it[i, 12:15] = ma[om]
            it[i, 15:18] = me[om]
            it[i, 18] = mp0[om]
            it[i, 19] = mp1[om]
            it[i, 20] = float(om)
    return PairAccelTL(
        cluster_lo=cluster_lo,
        cluster_hi=cluster_hi,
        # 64-row supercluster DMA overrun pad (see build_pair_accel)
        tri_rows=np.concatenate(
            [tri_rows, np.zeros((SC_PAD_ROWS, 128), np.float32)]
        ),
        pair_meta=pair_meta,
        inv_xform=inv_xform,
        prim_tri=prim_tri,
        prim_inst=np.full(n_slots, -1, np.int32),
        shade_rows=shade_rows,
        inst_table=it,
        sc_lo=sc_lo,
        sc_hi=sc_hi,
        sc_meta=sc_meta,
    )


def build_pair_accel(ds: DeviceScene, meta: SceneMeta,
                     scene=None) -> PairAccel:
    """Flatten instances → kd-tight uniform clusters + AABBs."""
    v0, v1, v2, tri_id, inst_id = flatten_world_tris(ds, meta, scene)
    ko = cluster_order(v0, v1, v2)
    v0, v1, v2 = v0[ko], v1[ko], v2[ko]
    tri_id, inst_id = tri_id[ko], inst_id[ko]
    t = v0.shape[0]
    n_clusters = -(-t // TRIS_PER_CLUSTER)
    n_rows = n_clusters * ROWS_PER_CLUSTER
    tri_rows, pmin, pmax = pack_tri_rows(v0, v1, v2, n_rows)

    lo = pmin.reshape(n_clusters, TRIS_PER_CLUSTER, 3).min(1)
    hi = pmax.reshape(n_clusters, TRIS_PER_CLUSTER, 3).max(1)

    # stuff each ROW's 12-tri sub-AABB into its own spare lanes
    # (12 tris × 10 lanes = 120 used, lanes 120–125 free on every row):
    # the kernel's SMEM copy then carries one box per triangle row for
    # the exact per-row skip test (with best-t far limit) at zero extra
    # transport — Morton-ordered rows are spatially tight, so divergent
    # (bounce) tiles skip most rows of the clusters they conservatively
    # matched. Padding rows get an empty box (+BIG/−BIG) that fails
    # every slab test.
    row_lo = pmin.reshape(n_rows, TPR, 3).min(1)
    row_hi = pmax.reshape(n_rows, TPR, 3).max(1)
    tri_rows[:, 120:123] = row_lo.astype(np.float32)
    tri_rows[:, 123:126] = row_hi.astype(np.float32)
    _pack_cluster_box_lanes(tri_rows, lo, hi)

    shade_rows = build_shade_rows(
        ds, meta, v0, v1, v2, tri_id, inst_id, n_slots=t, scene=scene
    )
    lo32 = lo.astype(np.float32)
    hi32 = hi.astype(np.float32)
    sc_lo, sc_hi, sc_meta = _supercluster_groups(lo32, hi32)
    # pad rows so the kernel's fixed 64-row supercluster DMA can't
    # overrun on a short last group (zero rows: det=0 ⇒ MT miss, and the
    # kernel's n_children guard never tests them anyway)
    tri_rows = np.concatenate(
        [tri_rows, np.zeros((SC_PAD_ROWS, 128), np.float32)]
    )
    return PairAccel(
        cluster_lo=lo32,
        cluster_hi=hi32,
        tri_rows=tri_rows,
        prim_tri=tri_id,
        prim_inst=inst_id,
        shade_rows=shade_rows,
        sc_lo=sc_lo,
        sc_hi=sc_hi,
        sc_meta=sc_meta,
    )
