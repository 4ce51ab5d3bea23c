"""Intersector interface: the rebuild's ``traceRayEXT`` (SURVEY.md §2.2 G2/G4).

An *intersector* is a pair of pure functions built for a scene:

  closest(org, dirn, t_min, t_max) -> Hit      (closest-hit query, G2)
  any_hit(org, dirn, t_min, t_max) -> bool[N]  (occlusion query, G4)

Rays are world space; returned ``t`` is a world ray parameter (object-space
directions are intentionally NOT renormalized under instance transforms, so
``t`` means the same thing in both spaces).

Implementations:
  * brute force (this module) — O(rays × instanced tris) dense all-pairs
    test. It is both the oracle for property tests (SURVEY.md §4.2) and the
    *fastest* choice for tiny scenes (hello-triangle/Cornell: the all-pairs
    test is a dense VPU workload with zero gathers).
  * BVH traversal (tpurt.bvh) — LBVH + stackless skip links for large
    scenes, the reference's hardware-traversal replacement.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax.numpy as jnp

from tpurt.core.vecmath import intersect_tris
from tpurt.scene.device import DeviceScene


class SceneMeta(NamedTuple):
    """Static (hashable) scene shape info used to build intersector closures.

    ``mesh_tri_ranges[m]`` is the (start, count) slice of mesh ``m`` in the
    global triangle arrays; ``inst_mesh`` maps instance → mesh. Keeping these
    as Python ints lets jit specialize slices instead of gathering.
    """

    mesh_tri_ranges: Tuple[Tuple[int, int], ...]
    inst_mesh: Tuple[int, ...]
    num_real_tris: int
    # any material is alpha-TESTED (cutoff > 0 with a base-color
    # texture)? Static: selects the alpha-aware occlusion path
    # (integrator.make_occluder) vs the lean opaque any-hit kernel
    has_alpha_cutout: bool = False


def scene_meta(scene) -> SceneMeta:
    """Build the static meta from a host Scene (pair of to_device)."""
    ranges = []
    start = 0
    for m in scene.meshes:
        ranges.append((start, m.num_triangles))
        start += m.num_triangles
    return SceneMeta(
        mesh_tri_ranges=tuple(ranges),
        inst_mesh=tuple(i.mesh_id for i in scene.instances),
        num_real_tris=start,
        has_alpha_cutout=any(
            getattr(m, "alpha_cutoff", 0.0) > 0.0
            and getattr(m, "base_color_texture", -1) >= 0
            for m in scene.materials
        ),
    )


class Hit(NamedTuple):
    t: jnp.ndarray  # (N,) f32 — world ray parameter (inf on miss)
    u: jnp.ndarray  # (N,) f32 barycentric
    v: jnp.ndarray  # (N,) f32 barycentric
    tri: jnp.ndarray  # (N,) i32 global triangle id (clamped garbage on miss)
    inst: jnp.ndarray  # (N,) i32 instance id
    valid: jnp.ndarray  # (N,) bool
    # flattened world-space prim slot in the accel (cluster builds), or
    # -1 when the intersector has no flattened table (brute/two-level) —
    # indexes PairAccel.shade_rows for gather-free-ish shading
    slot: jnp.ndarray = None  # type: ignore[assignment]


Intersector = Callable[..., Hit]


def transform_ray(inv: jnp.ndarray, org: jnp.ndarray, dirn: jnp.ndarray):
    """World ray → object space with a (3,4) affine; dir NOT renormalized."""
    org_o = org @ inv[:, :3].T + inv[:, 3]
    dir_o = dirn @ inv[:, :3].T
    return org_o, dir_o


def make_brute_force(ds: DeviceScene, meta: SceneMeta):
    """Dense all-pairs intersector (the "no acceleration structure" oracle —
    what the reference's single-triangle demo effectively exercises, B:7).

    The winner per ray is reduced with a min-tree over per-triangle
    candidate tuples — NO argmin + fancy-index selection: that pattern was
    reproduced MISCOMPILING on the axon TPU backend (hit distances ~99%
    wrong vs the CPU oracle; the min/where form agrees 100%)."""

    def closest(org, dirn, t_min, t_max) -> Hit:
        n = org.shape[0]
        best_t = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32), (n,)
        ).astype(jnp.float32)
        best_t = jnp.where(jnp.isfinite(best_t), best_t, jnp.float32(3.4e38))
        best_u = jnp.zeros(n, jnp.float32)
        best_v = jnp.zeros(n, jnp.float32)
        best_tri = jnp.zeros(n, jnp.int32)
        best_inst = jnp.zeros(n, jnp.int32)
        found = jnp.zeros(n, bool)
        t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))

        for inst_id, mesh_id in enumerate(meta.inst_mesh):
            start, count = meta.mesh_tri_ranges[mesh_id]
            if count == 0:
                continue
            org_o, dir_o = transform_ray(ds.inst_inv[inst_id], org, dirn)
            v0 = ds.tri_v0[start : start + count]
            v1 = ds.tri_v1[start : start + count]
            v2 = ds.tri_v2[start : start + count]
            t, u, v, hit = intersect_tris(
                org_o[:, None, :],
                dir_o[:, None, :],
                v0[None],
                v1[None],
                v2[None],
                t_min_b[:, None],
                best_t[:, None],
            )
            # winner via min-reduce + one-hot sum-select over the triangle
            # axis — no argmin and no gather
            big = jnp.float32(3.4e38)
            t_masked = jnp.where(hit, t, big)
            tm = jnp.min(t_masked, axis=1)
            iota = jnp.arange(count, dtype=jnp.int32)[None, :]
            win = t_masked == tm[:, None]
            jm_local = jnp.min(
                jnp.where(win, iota, jnp.int32(2 ** 30)), axis=1
            )
            first = win & (iota == jm_local[:, None])  # one-hot winner
            um = jnp.sum(jnp.where(first, u, 0.0), axis=1)
            vm = jnp.sum(jnp.where(first, v, 0.0), axis=1)
            jm = jnp.clip(jm_local, 0, count - 1) + jnp.int32(start)
            better = tm < best_t
            best_u = jnp.where(better, um, best_u)
            best_v = jnp.where(better, vm, best_v)
            best_tri = jnp.where(better, jm, best_tri)
            best_inst = jnp.where(better, jnp.int32(inst_id), best_inst)
            best_t = jnp.where(better, tm, best_t)
            found = found | better

        return Hit(
            t=jnp.where(found, best_t, jnp.inf),
            u=best_u,
            v=best_v,
            tri=best_tri,
            inst=best_inst,
            valid=found,
            slot=jnp.full_like(best_tri, -1),
        )

    def any_hit(org, dirn, t_min, t_max) -> jnp.ndarray:
        n = org.shape[0]
        occluded = jnp.zeros(n, bool)
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        for inst_id, mesh_id in enumerate(meta.inst_mesh):
            start, count = meta.mesh_tri_ranges[mesh_id]
            if count == 0:
                continue
            org_o, dir_o = transform_ray(ds.inst_inv[inst_id], org, dirn)
            v0 = ds.tri_v0[start : start + count]
            v1 = ds.tri_v1[start : start + count]
            v2 = ds.tri_v2[start : start + count]
            t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
            _, _, _, hit = intersect_tris(
                org_o[:, None, :],
                dir_o[:, None, :],
                v0[None],
                v1[None],
                v2[None],
                t_min_b[:, None],
                t_max[:, None],
            )
            occluded = occluded | jnp.any(hit, axis=1)
        return occluded

    return closest, any_hit
