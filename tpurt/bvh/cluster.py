"""Packet-BVH build: the acceleration structure for the Pallas packet kernel.

Rationale (SURVEY.md §7 hard parts): TPUs have no per-lane gather — Mosaic
supports data-dependent *row* fetches (``ref[pl.ds(i,1), :]``), static lane
extracts from a fetched row, and scalar SMEM reads, but not per-element
table lookups. Per-ray pointer-chasing traversal (what the Vulkan driver's
RT hardware does behind ``traceRayEXT``, SURVEY.md G2) is therefore hostile
to the hardware. The TPU-native formulation is **packet traversal**:

  * triangles are Morton-sorted and packed 12-per-row into a (R, 128) f32
    VMEM table — each triangle owns 10 lanes (v0.xyz, e1.xyz, e2.xyz,
    slot-id-as-f32); a fetched row yields 12 full triangle records via
    static lane extracts (measured 2.9 ns per tri-vs-1024-ray test);
  * a shallow median-split BVH is built over *leaf row-groups*; its node
    scalars (AABB + first/count/skip links) live in SMEM (≤256 KB budget,
    measured limit) so the tree walk is pure scalar control;
  * a *packet* of 1024 rays (one (8, 128) register tile per field) walks
    the tree in lockstep behind ONE scalar node pointer; every box test
    and triangle test is a dense VPU op over the whole packet — zero
    gathers anywhere.

This trades redundant tests (every ray in a packet tests every leaf the
packet's union reaches) for perfect vectorization — the classic packet
tracing bargain (Wald et al. 2001), which is the right side of the trade
on an 8×128-lane lockstep machine.

Instances are flattened to world space at build time (the packet kernel is
single-level; the two-level TLAS/BLAS structure — SURVEY.md C9 — is kept by
the jnp traversal in tpurt.bvh.two_level and by this builder's per-instance
slot bookkeeping, which lets shading recover (instance, triangle) pairs).
Build runs on host numpy once per scene — the analog of the reference's
``vkCmdBuildAccelerationStructuresKHR`` call (SURVEY.md §3.3).
"""

from __future__ import annotations

import sys
from typing import NamedTuple

import numpy as np

from tpurt.render.intersectors import SceneMeta
from tpurt.scene.device import DeviceScene

TPR = 12  # triangles per 128-lane row: 12 × 10 lanes + 8 spare
LANES_PER_TRI = 10
SMEM_NODE_BUDGET = 5000  # 9 arrays × 4 B × 5000 ≈ 180 KB < 256 KB measured


class PacketAccel(NamedTuple):
    """Packed packet-BVH (host numpy; moved to device by the kernel wrapper).

    node_*: per-node scalars (→ SMEM). ``count`` rows >0 = leaf over tri
    rows [first, first+count); 0 = internal (hit successor = node+1).
    ``skip`` >= n_nodes ⇒ traversal done.
    tri_rows: (R, 128) f32 — triangle t of row r at lanes [10t, 10t+10):
        v0.xyz, e1.xyz, e2.xyz, slot (exact in f32 up to 2^24). Padding
        triangles are all-zero (Möller–Trumbore det = 0 ⇒ miss) with
        slot -1.
    prim_tri/prim_inst: flat slot → (global triangle id, instance id).
    """

    node_bminx: np.ndarray
    node_bminy: np.ndarray
    node_bminz: np.ndarray
    node_bmaxx: np.ndarray
    node_bmaxy: np.ndarray
    node_bmaxz: np.ndarray
    node_first: np.ndarray
    node_count: np.ndarray
    node_skip: np.ndarray
    tri_rows: np.ndarray
    prim_tri: np.ndarray
    prim_inst: np.ndarray

    @property
    def n_nodes(self) -> int:
        return self.node_first.shape[0]

    @property
    def n_rows(self) -> int:
        return self.tri_rows.shape[0]


def _expand_bits(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint32)
    v = (v | (v << 16)) & np.uint32(0x030000FF)
    v = (v | (v << 8)) & np.uint32(0x0300F00F)
    v = (v | (v << 4)) & np.uint32(0x030C30C3)
    v = (v | (v << 2)) & np.uint32(0x09249249)
    return v


def _morton(c: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    q = np.clip((c - lo) / np.maximum(hi - lo, 1e-12), 0.0, 1.0)
    g = np.minimum((q * 1024.0).astype(np.uint32), 1023)
    return (
        (_expand_bits(g[:, 0]) << 2)
        | (_expand_bits(g[:, 1]) << 1)
        | _expand_bits(g[:, 2])
    )


class _Tree(NamedTuple):
    bmin: np.ndarray
    bmax: np.ndarray
    first: np.ndarray
    count: np.ndarray
    skip: np.ndarray


def _median_split_tree(bmin: np.ndarray, bmax: np.ndarray) -> _Tree:
    """Preorder median-split BVH over items with skip links.

    The C++ builder (native/tpurt_native.cpp, the reference's native-tier
    analog) is the fast path; this Python twin is the fallback and the
    differential-test oracle. Split quality matters more than build speed
    because every extra node visit costs the whole packet a step.
    """
    from tpurt.utils import native

    built = native.bvh_build(bmin, bmax)
    if built is not None:
        nb, nx, first, count, skip = built
        return _Tree(nb, nx, first, count, skip)

    n = bmin.shape[0]
    centro = 0.5 * (bmin + bmax)
    nb, nx, firsts, counts = [], [], [], []

    def emit(idx: np.ndarray) -> None:
        me = len(firsts)
        nb.append(bmin[idx].min(0))
        nx.append(bmax[idx].max(0))
        firsts.append(int(idx[0]))
        counts.append(0)
        if idx.size == 1:
            counts[me] = 1
            return
        ext = centro[idx].max(0) - centro[idx].min(0)
        axis = int(np.argmax(ext))
        # Tree leaves reference whole leaf-groups (count==1 ⇒ rows
        # [first·leaf_rows, +leaf_rows)), so any leaf permutation is valid —
        # split at the centroid median along the widest axis.
        part = idx[np.argsort(centro[idx, axis], kind="stable")]
        half = idx.size // 2
        emit(part[:half])
        emit(part[half:])

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * n + 64))
    try:
        emit(np.arange(n))
    finally:
        sys.setrecursionlimit(old)

    m = len(firsts)
    counts_a = np.asarray(counts, np.int32)
    sizes = np.ones(m, np.int32)
    stack: list[int] = []
    for i in range(m - 1, -1, -1):
        if counts_a[i] > 0:
            sizes[i] = 1
        else:
            a = stack.pop()
            b = stack.pop()
            sizes[i] = 1 + sizes[a] + sizes[b]
        stack.append(i)
    skip = np.arange(m, dtype=np.int32) + sizes
    return _Tree(
        np.asarray(nb, np.float32),
        np.asarray(nx, np.float32),
        np.asarray(firsts, np.int32),
        counts_a,
        skip,
    )


def _host_tris(ds: DeviceScene | None, meta: SceneMeta, scene=None):
    """Host-side (v0, v1, v2, inst_transform) for the accel build.

    STRONGLY prefer the host Scene: on the tunneled `axon` TPU backend the
    FIRST device→host transfer of a process permanently degrades every
    subsequent program dispatch ~100× (measured: 0.3 µs → 45 µs per Pallas
    grid step; benchmarks/profile_poison.py reproduces it). The accel build
    therefore must never read device arrays. The device_get path is kept
    only for callers that genuinely have no host scene.
    """
    if scene is not None:
        v0s, v1s, v2s = [], [], []
        for mesh in scene.meshes:
            v = mesh.vertices
            idx = mesh.indices
            v0s.append(v[idx[:, 0]])
            v1s.append(v[idx[:, 1]])
            v2s.append(v[idx[:, 2]])
        tv0 = np.concatenate(v0s).astype(np.float32)
        tv1 = np.concatenate(v1s).astype(np.float32)
        tv2 = np.concatenate(v2s).astype(np.float32)
        inst_tf = np.stack(
            [i.transform for i in scene.instances]
        ).astype(np.float32)
        return tv0, tv1, tv2, inst_tf
    import jax

    # one batched device→host readback — POISONS the axon dispatch path,
    # see docstring; only hit when no host scene exists
    return jax.device_get(
        (ds.tri_v0, ds.tri_v1, ds.tri_v2, ds.inst_transform)
    )


def build_packet_accel(ds: DeviceScene, meta: SceneMeta,
                       leaf_rows: int | None = None,
                       scene=None) -> PacketAccel:
    """Flatten instances → Morton sort → pack rows → median-split tree."""
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
    t = v0.shape[0]

    centro = (v0 + v1 + v2) / 3.0
    lo = np.minimum(np.minimum(v0, v1), v2).min(0)
    hi = np.maximum(np.maximum(v0, v1), v2).max(0)
    order = np.argsort(_morton(centro, lo, hi), kind="stable")
    v0, v1, v2 = v0[order], v1[order], v2[order]
    tri_id, inst_id = tri_id[order], inst_id[order]

    n_rows = -(-t // TPR)
    if leaf_rows is None:
        # largest tree whose ~2·leaves nodes fit the SMEM budget
        leaf_rows = max(1, -(-n_rows // (SMEM_NODE_BUDGET // 2)))
    n_leaves = -(-n_rows // leaf_rows)
    n_rows = n_leaves * leaf_rows  # pad rows so leaves are uniform
    slots = n_rows * TPR
    pad = slots - t

    def padf(a, fill=0.0):
        return np.concatenate([a, np.full((pad,) + a.shape[1:], fill,
                                          a.dtype)])

    v0, v1, v2 = padf(v0), padf(v1), padf(v2)
    slot_id = np.concatenate(
        [np.arange(t, dtype=np.float32), np.full(pad, -1.0, np.float32)]
    )

    e1 = v1 - v0
    e2 = v2 - v0
    rec = np.zeros((slots, LANES_PER_TRI), np.float32)
    rec[:, 0:3] = v0
    rec[:, 3:6] = e1
    rec[:, 6:9] = e2
    rec[:, 9] = slot_id
    tri_rows = np.zeros((n_rows, 128), np.float32)
    tri_rows[:, : TPR * LANES_PER_TRI] = rec.reshape(
        n_rows, TPR * LANES_PER_TRI
    )

    # leaf AABBs over valid tris only
    valid = (slot_id >= 0)[:, None]
    big = np.float32(3.4e38)
    pmin = np.where(valid, np.minimum(np.minimum(v0, v1), v2), big)
    pmax = np.where(valid, np.maximum(np.maximum(v0, v1), v2), -big)
    lt = leaf_rows * TPR
    lbmin = pmin.reshape(n_leaves, lt, 3).min(1)
    lbmax = pmax.reshape(n_leaves, lt, 3).max(1)

    tree = _median_split_tree(lbmin, lbmax)
    # leaf ids → row ranges
    first_rows = np.where(
        tree.count > 0, tree.first * leaf_rows, 0
    ).astype(np.int32)
    count_rows = (tree.count * leaf_rows).astype(np.int32)

    return PacketAccel(
        node_bminx=tree.bmin[:, 0].copy(),
        node_bminy=tree.bmin[:, 1].copy(),
        node_bminz=tree.bmin[:, 2].copy(),
        node_bmaxx=tree.bmax[:, 0].copy(),
        node_bmaxy=tree.bmax[:, 1].copy(),
        node_bmaxz=tree.bmax[:, 2].copy(),
        node_first=first_rows,
        node_count=count_rows,
        node_skip=tree.skip,
        tri_rows=tri_rows,
        prim_tri=tri_id,
        prim_inst=inst_id,
    )
