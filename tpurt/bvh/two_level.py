"""Two-level TLAS/BLAS acceleration + stackless traversal (SURVEY.md C9, G2).

The reference's TLAS holds ``VkAccelerationStructureInstanceKHR`` records
(3x4 transform + BLAS device address) and the driver traverses both levels
in hardware (SURVEY.md §2.1 C9, §3.3 [VK-API]). The TPU rebuild:

  * one LBVH per mesh (BLAS) + one LBVH over instance world AABBs (TLAS),
    all built on device by ``tpurt.bvh.lbvh`` (BASELINE.json:5);
  * all node arrays concatenated into ONE unified address space
    [TLAS | BLAS_0 | BLAS_1 | ...] — the analog of buffer device addresses;
  * traversal is a single vectorized lockstep loop over all rays
    (SURVEY.md §2.3 X3: SoA wavefront on the VPU), stackless via preorder
    skip links. Two-level nesting needs a stack of depth exactly 1, so it
    is two registers per ray (`ret` + current instance) instead of a stack:
    entering a TLAS instance-leaf transforms the ray into object space and
    jumps to the BLAS entry; a BLAS skip that runs off the end returns to
    `ret` and restores the world-space ray.

Node encoding (unified arrays):
  count == 0  internal  → hit successor is node+1 (preorder), miss → skip
  count  > 0  tri leaf  → ``count`` sorted prims from ``first`` (global slot)
  count  < 0  TLAS instance leaf → ``first`` = instance id
  skip sentinels: DONE (-2) = traversal over, EXIT (-1) = leave current BLAS.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpurt.bvh.lbvh import Bvh, build_lbvh, tri_aabbs
from tpurt.core.vecmath import intersect_tris, ray_aabb, safe_inv_dir
from tpurt.render.intersectors import Hit, SceneMeta, transform_ray
from tpurt.scene.device import DeviceScene

# numpy scalars: module-level jnp constants would initialize the XLA
# backend at import, breaking jax.distributed.initialize() (init_multihost)
import numpy as _np

DONE = _np.int32(-2)
EXIT = _np.int32(-1)


class SceneAccel(NamedTuple):
    """Unified two-level acceleration structure (pytree of device arrays)."""

    node_bmin: jnp.ndarray  # (Ntot, 3) f32
    node_bmax: jnp.ndarray  # (Ntot, 3) f32
    node_first: jnp.ndarray  # (Ntot,) i32
    node_count: jnp.ndarray  # (Ntot,) i32
    node_skip: jnp.ndarray  # (Ntot,) i32 — global, with DONE/EXIT sentinels
    inst_entry: jnp.ndarray  # (I,) i32 — BLAS entry node per instance
    prim_v0: jnp.ndarray  # (Ttot, 3) f32 — Morton-sorted object-space tris
    prim_v1: jnp.ndarray
    prim_v2: jnp.ndarray
    prim_id: jnp.ndarray  # (Ttot,) i32 — global triangle id (DeviceScene)

    @property
    def num_nodes(self) -> int:
        return self.node_bmin.shape[0]


def instance_world_aabbs(ds: DeviceScene, root_bmin: jnp.ndarray,
                         root_bmax: jnp.ndarray):
    """World AABB per instance: transform the 8 corners of its BLAS root box
    (root_bmin/bmax are (M, 3) per-mesh)."""
    bmin = root_bmin[ds.inst_mesh]  # (I, 3)
    bmax = root_bmax[ds.inst_mesh]
    corners = jnp.stack(
        [
            jnp.where(
                jnp.asarray([(k >> 0) & 1, (k >> 1) & 1, (k >> 2) & 1], bool),
                bmax,
                bmin,
            )
            for k in range(8)
        ],
        axis=1,
    )  # (I, 8, 3)
    m = ds.inst_transform  # (I, 3, 4)
    world = (
        jnp.einsum("iab,ikb->ika", m[:, :, :3], corners) + m[:, None, :, 3]
    )
    return jnp.min(world, axis=1), jnp.max(world, axis=1)


def build_scene_accel(ds: DeviceScene, meta: SceneMeta,
                      leaf_size: int = 4) -> SceneAccel:
    """Build all BLASes + the TLAS and pack the unified node arrays.

    Jittable (static ``meta``/``leaf_size``); the reference's equivalent is
    the BLAS loop + TLAS build in SURVEY.md §3.1 ``build_acceleration_
    structures()``.
    """
    n_inst = len(meta.inst_mesh)
    blas: Tuple[Bvh, ...] = tuple(
        build_lbvh(
            *tri_aabbs(
                ds.tri_v0[start : start + count],
                ds.tri_v1[start : start + count],
                ds.tri_v2[start : start + count],
            ),
            leaf_size=leaf_size,
        )
        for start, count in meta.mesh_tri_ranges
    )

    root_bmin = jnp.stack([b.bmin[0] for b in blas])  # (M, 3)
    root_bmax = jnp.stack([b.bmax[0] for b in blas])
    inst_bmin, inst_bmax = instance_world_aabbs(ds, root_bmin, root_bmax)
    tlas = build_lbvh(inst_bmin, inst_bmax, leaf_size=1)

    # --- static layout of the unified node address space
    tlas_cap = tlas.capacity
    blas_off = []
    off = tlas_cap
    for b in blas:
        blas_off.append(off)
        off += b.capacity
    total_nodes = off

    # --- TLAS: leaves become instance leaves (count=-1, first=instance id)
    t_count = jnp.where(tlas.count > 0, -1, 0).astype(jnp.int32)
    t_first = jnp.where(
        tlas.count > 0, tlas.perm[jnp.clip(tlas.first, 0, n_inst - 1)], 0
    ).astype(jnp.int32)
    t_skip = jnp.where(tlas.skip >= tlas.n_active, DONE, tlas.skip)

    bmin_parts = [tlas.bmin]
    bmax_parts = [tlas.bmax]
    first_parts = [t_first]
    count_parts = [t_count]
    skip_parts = [t_skip]
    pv0, pv1, pv2, pid = [], [], [], []
    tri_slot_off = 0
    for b, (start, count), off_m in zip(blas, meta.mesh_tri_ranges, blas_off):
        bmin_parts.append(b.bmin)
        bmax_parts.append(b.bmax)
        # leaf first: mesh-local sorted slot → global sorted slot
        first_parts.append(
            jnp.where(b.count > 0, b.first + tri_slot_off, 0).astype(jnp.int32)
        )
        count_parts.append(b.count)
        skip_parts.append(
            jnp.where(b.skip >= b.n_active, EXIT, b.skip + off_m)
        )
        # Morton-sorted copies of this mesh's triangles (object space)
        pv0.append(ds.tri_v0[start : start + count][b.perm])
        pv1.append(ds.tri_v1[start : start + count][b.perm])
        pv2.append(ds.tri_v2[start : start + count][b.perm])
        pid.append(b.perm + start)
        tri_slot_off += count

    entry_static = jnp.asarray(blas_off, jnp.int32)
    return SceneAccel(
        node_bmin=jnp.concatenate(bmin_parts),
        node_bmax=jnp.concatenate(bmax_parts),
        node_first=jnp.concatenate(first_parts),
        node_count=jnp.concatenate(count_parts),
        node_skip=jnp.concatenate(skip_parts),
        inst_entry=entry_static[ds.inst_mesh],
        prim_v0=jnp.concatenate(pv0),
        prim_v1=jnp.concatenate(pv1),
        prim_v2=jnp.concatenate(pv2),
        prim_id=jnp.concatenate(pid),
    )


class _TravState(NamedTuple):
    step: jnp.ndarray
    node: jnp.ndarray  # (N,) i32 — current unified node or DONE
    ret: jnp.ndarray  # (N,) i32 — TLAS node to resume after BLAS exit
    inst: jnp.ndarray  # (N,) i32 — instance whose BLAS we are inside
    org_c: jnp.ndarray  # (N, 3) current-space ray origin
    dir_c: jnp.ndarray  # (N, 3) current-space ray direction (unnormalized ok)
    best_t: jnp.ndarray
    best_u: jnp.ndarray
    best_v: jnp.ndarray
    best_slot: jnp.ndarray
    best_inst: jnp.ndarray
    found: jnp.ndarray


def _traverse(ds: DeviceScene, accel: SceneAccel, org, dirn, t_min, t_max,
              leaf_size: int, any_hit: bool):
    """Lockstep vectorized two-level traversal (G2 + G4 any-hit mode).

    All rays advance one node per iteration; the loop runs until every ray
    reaches DONE (or, in any_hit mode, finds any intersection). Control flow
    is a single ``lax.while_loop`` with masked updates — XLA-friendly, no
    per-ray recursion or stacks (SURVEY.md §7 "divergent traversal on a
    lockstep machine").
    """
    n = org.shape[0]
    n_prims = accel.prim_v0.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    max_steps = accel.num_nodes + ds.num_instances + 64

    init = _TravState(
        step=jnp.int32(0),
        node=jnp.zeros(n, jnp.int32),
        ret=jnp.full(n, DONE, jnp.int32),
        inst=jnp.zeros(n, jnp.int32),
        org_c=org,
        dir_c=dirn,
        best_t=jnp.where(jnp.isfinite(t_max), t_max, jnp.float32(3.4e38)),
        best_u=jnp.zeros(n, jnp.float32),
        best_v=jnp.zeros(n, jnp.float32),
        best_slot=jnp.zeros(n, jnp.int32),
        best_inst=jnp.zeros(n, jnp.int32),
        found=jnp.zeros(n, bool),
    )

    def cond(s: _TravState):
        running = s.node != DONE
        if any_hit:
            running = running & (~s.found)
        return jnp.any(running) & (s.step < max_steps)

    def body(s: _TravState) -> _TravState:
        active = s.node >= 0
        if any_hit:
            active = active & (~s.found)
        nid = jnp.clip(s.node, 0, accel.num_nodes - 1)
        bmin = accel.node_bmin[nid]
        bmax = accel.node_bmax[nid]
        skipv = accel.node_skip[nid]
        cnt = accel.node_count[nid]
        fst = accel.node_first[nid]

        inv_d = safe_inv_dir(s.dir_c)
        hit_box = (
            ray_aabb(s.org_c, inv_d, bmin, bmax, t_min, s.best_t) & active
        )
        is_internal = cnt == 0
        is_tri_leaf = cnt > 0
        is_inst_leaf = cnt < 0

        # --- leaf triangle tests (masked; leaf_size is static)
        best_t, best_u, best_v = s.best_t, s.best_u, s.best_v
        best_slot, best_inst, found = s.best_slot, s.best_inst, s.found
        do_tris = hit_box & is_tri_leaf
        for k in range(leaf_size):
            m = do_tris & (k < cnt)
            slot = jnp.clip(fst + k, 0, n_prims - 1)
            t, u, v, h = intersect_tris(
                s.org_c,
                s.dir_c,
                accel.prim_v0[slot],
                accel.prim_v1[slot],
                accel.prim_v2[slot],
                t_min,
                best_t,
            )
            upd = m & h
            best_t = jnp.where(upd, t, best_t)
            best_u = jnp.where(upd, u, best_u)
            best_v = jnp.where(upd, v, best_v)
            best_slot = jnp.where(upd, slot, best_slot)
            best_inst = jnp.where(upd, s.inst, best_inst)
            found = found | upd

        # --- next node
        enter = hit_box & is_inst_leaf
        descend = hit_box & is_internal
        nxt = jnp.where(descend, s.node + 1, skipv)
        new_inst = jnp.where(enter, fst, s.inst)
        entry = accel.inst_entry[jnp.clip(new_inst, 0, ds.num_instances - 1)]
        nxt = jnp.where(enter, entry, nxt)
        new_ret = jnp.where(enter, skipv, s.ret)

        exited = active & (nxt == EXIT)
        node_next = jnp.where(exited, s.ret, nxt)
        node_next = jnp.where(active, node_next, s.node)
        new_ret = jnp.where(exited, DONE, new_ret)

        # --- ray space changes (enter: world→object; exit: back to world)
        inv = ds.inst_inv[jnp.clip(new_inst, 0, ds.num_instances - 1)]
        obj_org = (
            jnp.einsum("nab,nb->na", inv[:, :, :3], org) + inv[:, :, 3]
        )
        obj_dir = jnp.einsum("nab,nb->na", inv[:, :, :3], dirn)
        org_c = jnp.where(
            enter[:, None], obj_org, jnp.where(exited[:, None], org, s.org_c)
        )
        dir_c = jnp.where(
            enter[:, None], obj_dir, jnp.where(exited[:, None], dirn, s.dir_c)
        )

        return _TravState(
            step=s.step + 1,
            node=node_next,
            ret=new_ret,
            inst=new_inst,
            org_c=org_c,
            dir_c=dir_c,
            best_t=best_t,
            best_u=best_u,
            best_v=best_v,
            best_slot=best_slot,
            best_inst=best_inst,
            found=found,
        )

    final = jax.lax.while_loop(cond, body, init)
    return final


def make_two_level_intersector(ds: DeviceScene, accel: SceneAccel,
                               leaf_size: int = 4):
    """Intersector pair over the two-level accel (matches the brute-force
    interface in tpurt.render.intersectors)."""

    def closest(org, dirn, t_min, t_max) -> Hit:
        s = _traverse(ds, accel, org, dirn, t_min, t_max, leaf_size, False)
        tri = accel.prim_id[jnp.clip(s.best_slot, 0, accel.prim_id.shape[0] - 1)]
        return Hit(
            t=jnp.where(s.found, s.best_t, jnp.inf),
            u=s.best_u,
            v=s.best_v,
            tri=tri,
            inst=s.best_inst,
            valid=s.found,
            slot=jnp.full_like(tri, -1),
        )

    def any_hit(org, dirn, t_min, t_max) -> jnp.ndarray:
        s = _traverse(ds, accel, org, dirn, t_min, t_max, leaf_size, True)
        return s.found

    return closest, any_hit
