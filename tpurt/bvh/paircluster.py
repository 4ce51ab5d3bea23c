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

# 16 rows × 12 tris: sized so one (tile, cluster) kernel step does ~16
# unrolled row tests — the Mosaic grid machinery costs ~1 µs/step
# regardless of body size (profiled), so fatter steps amortize it
TRIS_PER_CLUSTER = 192
ROWS_PER_CLUSTER = TRIS_PER_CLUSTER // TPR
BIG = np.float32(3.4e38)


class PairAccel(NamedTuple):
    """Uniform-cluster table for the pair wavefront kernel.

    cluster_lo/hi: (C, 3) f32 world AABBs (empty box when padded).
    tri_rows: (C · ROWS_PER_CLUSTER, 128) f32 packed triangle records
        (v0.xyz, e1.xyz, e2.xyz, slot-id; 12 per row; zero padding rows
        have det 0 ⇒ Möller–Trumbore miss, slot −1).
    prim_tri/prim_inst: flat slot → (global tri id, instance id).
    """

    cluster_lo: np.ndarray
    cluster_hi: np.ndarray
    tri_rows: np.ndarray
    prim_tri: np.ndarray
    prim_inst: np.ndarray

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


def build_pair_accel(ds: DeviceScene, meta: SceneMeta,
                     scene=None) -> PairAccel:
    """Flatten instances → Morton sort → uniform clusters + AABBs."""
    v0, v1, v2, tri_id, inst_id = flatten_world_tris(ds, meta, scene)
    t = v0.shape[0]
    n_clusters = -(-t // TRIS_PER_CLUSTER)
    n_rows = n_clusters * ROWS_PER_CLUSTER
    tri_rows, pmin, pmax = pack_tri_rows(v0, v1, v2, n_rows)

    lo = pmin.reshape(n_clusters, TRIS_PER_CLUSTER, 3).min(1)
    hi = pmax.reshape(n_clusters, TRIS_PER_CLUSTER, 3).max(1)

    return PairAccel(
        cluster_lo=lo.astype(np.float32),
        cluster_hi=hi.astype(np.float32),
        tri_rows=tri_rows,
        prim_tri=tri_id,
        prim_inst=inst_id,
    )
