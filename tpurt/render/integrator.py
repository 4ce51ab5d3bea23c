"""The wavefront/megakernel integrator — L4, the hot loop (SURVEY.md §3.2).

The reference records ``vkCmdTraceRaysKHR`` per frame and the GPU runs
raygen → hardware traversal → closest-hit/miss shaders through the SBT
(SURVEY.md §3.2 left column). Here one jitted ``render_batch`` call is the
equivalent dispatch: raygen (G1) → intersect (G2/G4) → masked shading
(G3/G5) → accumulate (G10), with the bounce loop unrolled at trace time
(static ``max_bounces``, BASELINE.json:10 "4-bounce").

Design notes (TPU-first):
  * All per-ray state is SoA f32/i32/bool vectors over a flat pixel axis —
    dense VPU tiles under XLA, no scatter/gather except material/geometry
    lookups.
  * Dead rays are masked, not compacted, in the megakernel path; the
    compaction/wavefront pipeline (G8/G9) lives in tpurt.render.wavefront.
  * RNG: threefry fold_in per batch and per bounce — deterministic for a
    fixed seed (SURVEY.md §4.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpurt import materials
from tpurt.core.camera import Camera, camera_rays, full_frame_pixels
from tpurt.core.prng import PixelSampler, TAG_JITTER
from tpurt.core.vecmath import dot
from tpurt.render.intersectors import (
    Hit,
    SceneMeta,
    make_brute_force,
    scene_meta,
)
from tpurt.scene.device import DeviceScene, to_device
from tpurt.utils.config import RenderConfig

SHADOW_EPS = 1e-3


def path_trace_rays(
    ds: DeviceScene,
    closest,
    any_hit,
    org: jnp.ndarray,
    dirn: jnp.ndarray,
    sampler,
    *,
    max_bounces: int,
    use_nee: bool,
    shading_mode: str = "full",
    resolver=None,
) -> jnp.ndarray:
    """Trace a batch of rays to completion; returns (N, 3) radiance.

    This is the payload loop the reference expresses as recursive
    ``traceRayEXT`` calls from its closest-hit shader (SURVEY.md G3); here it
    is an unrolled masked loop — XLA-friendly, no recursion.
    """
    n = org.shape[0]
    radiance = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones(n, bool)
    # ray counters [closest-hit rays, shadow rays, pair-budget overflow
    # events] — the profiling stats buffer (SURVEY.md §5 tracing/
    # profiling; BASELINE.json:2 Mrays metric). Slot 2 counts traces whose
    # tile/pair budget overflowed (hits silently dropped) — render_scene
    # reads it and auto-retries the frame with a doubled budget.
    rays_traced = jnp.zeros(3, jnp.float32)

    def _closest(o, d, tmin, tmax, rays):
        if hasattr(closest, "with_stats"):
            hit, tstats = closest.with_stats(o, d, tmin, tmax)
            return hit, rays.at[2].add(tstats[1])
        return closest(o, d, tmin, tmax), rays

    def _any_hit(o, d, tmin, tmax, rays):
        if hasattr(any_hit, "with_stats"):
            occ, tstats = any_hit.with_stats(o, d, tmin, tmax)
            return occ, rays.at[2].add(tstats[1])
        return any_hit(o, d, tmin, tmax), rays

    if resolver is None:
        def resolver(o, d, t, u, v, tri, inst, slot):
            return materials.resolve_hit(ds, o, d, t, u, v, tri, inst)

    if shading_mode == "flat":
        # hello-triangle: unlit albedo (BASELINE.json:7 "flat shading")
        rays_traced = rays_traced.at[0].add(jnp.float32(n))
        hit, rays_traced = _closest(org, dirn, 0.0, jnp.inf, rays_traced)
        attrs = resolver(
            org, dirn, hit.t, hit.u, hit.v, hit.tri, hit.inst, hit.slot
        )
        radiance = jnp.where(
            hit.valid[:, None], attrs.albedo, ds.background
        )
        return radiance, rays_traced

    # The bounce loop is a STATIC Python unroll. A lax.fori_loop would keep
    # the traced program smaller, but a pallas_call inside fori_loop was
    # reproduced crashing the TPU worker at specific grid sizes (e.g.
    # 480k rays / 235 packet groups) — unrolling routes around the backend
    # fault, and max_bounces ≤ 4 keeps compiles manageable.
    def bounce_step(bounce, carry):
        org, dirn, radiance, throughput, alive, allow_emission, rays = carry
        rays = rays.at[0].add(jnp.sum(alive.astype(jnp.float32)))
        # dead lanes get t_max=-1: their traversal root test fails and they
        # reach DONE in one step instead of walking the tree with garbage
        hit, rays = _closest(
            org, dirn, 0.0, jnp.where(alive, jnp.inf, -1.0), rays
        )
        hit_valid = hit.valid & alive

        # miss shader (G5): background radiance, ray dies
        radiance = radiance + jnp.where(
            (alive & ~hit.valid)[:, None], throughput * ds.background, 0.0
        )

        attrs = resolver(
            org, dirn, hit.t, hit.u, hit.v, hit.tri, hit.inst, hit.slot
        )

        # Emission is credited on camera hits and after specular bounces;
        # NEE covers it after diffuse bounces (no double counting).
        radiance = radiance + jnp.where(
            (hit_valid & allow_emission)[:, None],
            throughput * attrs.emission,
            0.0,
        )

        if use_nee:
            shadow_org = materials.bounce_origin(attrs, jnp.ones(n))
            wi_l, dist_l, l_over_pdf, l_valid = materials.sample_light(
                ds, shadow_org, sampler, bounce
            )
            brdf_l = materials.eval_brdf(attrs, -dirn, wi_l)
            cos_s = jnp.maximum(dot(attrs.n_shade, wi_l), 0.0)
            contrib = throughput * brdf_l * cos_s[:, None] * l_over_pdf
            want = (
                hit_valid
                & l_valid
                & (jnp.max(contrib, axis=-1) > 0.0)
            )
            rays = rays.at[1].add(jnp.sum(want.astype(jnp.float32)))
            occluded, rays = _any_hit(
                shadow_org,
                wi_l,
                0.0,
                jnp.where(want, dist_l * (1.0 - SHADOW_EPS), -1.0),
                rays,
            )
            radiance = radiance + jnp.where(
                (want & ~occluded)[:, None], contrib, 0.0
            )

        bs = materials.sample_bounce(attrs, -dirn, sampler, bounce)
        throughput = jnp.where(
            hit_valid[:, None], throughput * bs.weight, throughput
        )
        # dead/miss lanes carry inf hit positions — sanitize so no
        # non-finite ray values ever reach the traversal kernel
        org = jnp.where(
            hit_valid[:, None],
            materials.bounce_origin(attrs, bs.offset_sign),
            0.0,
        )
        dirn = jnp.where(hit_valid[:, None], bs.wi, 1.0)
        allow_emission = bs.is_specular | (not use_nee)
        alive = (
            hit_valid
            & (bounce < max_bounces)
            & (jnp.max(throughput, axis=-1) > 1e-6)
        )
        return org, dirn, radiance, throughput, alive, allow_emission, rays

    carry = (
        org,
        dirn,
        radiance,
        throughput,
        alive,
        jnp.ones(n, bool),  # allow_emission
        rays_traced,
    )
    for bounce in range(max_bounces + 1):
        carry = bounce_step(bounce, carry)
    radiance, rays_traced = carry[2], carry[6]
    return radiance, rays_traced


def make_intersectors(ds: DeviceScene, accel, *, meta: SceneMeta,
                      config: RenderConfig, wave: str = "bounce",
                      lean: bool = False, live_cap: int = 0,
                      shadow_live_cap: int = 0):
    """Closest/any-hit pair: Pallas packet kernel (PacketAccel), two-level
    jnp BVH (SceneAccel), or dense brute force (tiny scenes / oracle).

    ``wave`` selects the tile intersector's closest-trace sort/budget:
    "primary" (camera waves — static screen-tile order, small budget) or
    "bounce" (incoherent waves — octant sort, large budget). The staged
    pipeline compiles one trace stage per kind; the megakernel uses the
    conservative "bounce" settings for all depths.

    ``lean`` (tile intersector only): the in-tree render pipelines shade
    through the packed slot resolver and pass ``lean=True`` to skip the
    dead-weight Hit.tri/Hit.inst gathers (~4 ns/elt × 2N per trace) —
    those fields come back POISONED to −1 sentinels (never plausible-
    looking wrong ids). The DEFAULT is ``lean=False``: external callers
    get real triangle/instance ids without needing to know about the
    resolver (VERDICT r4 weak #6 — the default is the API guard)."""
    if accel is None:
        return make_brute_force(ds, meta)
    from tpurt.bvh.cluster import PacketAccel

    from tpurt.bvh.paircluster import PairAccel

    if isinstance(accel, PairAccel) or (
        isinstance(accel, tuple) and hasattr(accel, "cluster_lo")
    ):
        if config.intersector == "bvh_pair":
            from tpurt.kernels.pairwave import make_pair_intersector

            return make_pair_intersector(
                ds, accel, pairs_per_ray=config.pairs_per_ray
            )
        from tpurt.kernels.tilewave import make_tile_intersector

        if wave == "primary":
            sort = config.tile_primary_sort
            avg = config.pairs_avg
        elif wave == "presorted":
            # staged sorted-wave pipeline: the stage already permuted the
            # wave into octant+origin-Morton order (payload-through sort)
            # and consumes results in that order — skip the intersector's
            # forward/restore sorts but keep the exact-mask path
            sort = "pre"
            avg = config.pairs_avg_bounce
        else:
            sort = config.tile_ray_sort
            avg = config.pairs_avg_bounce
        return make_tile_intersector(
            ds, accel, pairs_per_tile=config.pairs_per_tile,
            pairs_avg=avg, ray_sort=sort,
            shadow_ray_sort=("pre" if wave == "presorted"
                             else config.tile_shadow_sort),
            shadow_pairs_avg=config.pairs_avg_shadow,
            # unified SMEM pair capacity (pair-loop mode): identical for
            # every wave kind so trace0/traceN/occlude share ONE Mosaic
            # kernel variant per config
            pairs_avg_cap=max(config.pairs_avg, config.pairs_avg_bounce,
                              config.pairs_avg_shadow),
            lean=lean,
            # measured live-wave truncation (round 4): static per-bounce
            # caps on the internally-sorted closest/shadow waves — the
            # default-pipeline G8 compaction (see tilewave._run)
            live_cap=live_cap,
            shadow_live_cap=shadow_live_cap,
        )
    if isinstance(accel, PacketAccel) or (
        isinstance(accel, tuple) and hasattr(accel, "tri_rows")
    ):
        from tpurt.kernels.packet import make_packet_intersector

        return make_packet_intersector(
            ds, accel, ray_sort=config.packet_ray_sort
        )
    from tpurt.bvh.two_level import make_two_level_intersector

    return make_two_level_intersector(ds, accel, leaf_size=config.bvh_leaf_size)


# Max alpha-skip re-traces per shadow ray (the reference's any-hit shader
# re-enters traversal per transparent candidate; 4 transparent layers
# covers foliage/fence cards — deeper stacks count as occluded, a
# conservative bias shared with production GPU tracers).
ALPHA_OCCLUSION_ROUNDS = 4


def make_occluder(ds: DeviceScene, accel, closest, any_hit, *,
                  meta: SceneMeta):
    """G4 occlusion query with alpha-cutout (SURVEY.md G4 "alpha/shadow
    filtering", VERDICT r2 missing #4).

    Opaque scenes (``meta.has_alpha_cutout`` False — every ladder preset)
    keep the lean any-hit kernel untouched. Alpha-tested scenes run the
    TPU-shaped equivalent of the reference's any-hit shader: a bounded
    loop of CLOSEST-hit traces; each candidate occluder samples its
    base-color alpha at the hit UV, texels below the material cutoff are
    skipped by advancing the ray origin past the hit and re-tracing.
    Alpha evaluation is pure XLA between the Pallas traversal calls
    (texture-pool gathers never enter the kernel).

    Must be called INSIDE jit with traced ds/accel (closure discipline:
    device arrays ride as jit args on the axon backend)."""
    if not meta.has_alpha_cutout:
        return any_hit
    shade_rows = getattr(accel, "shade_rows", None)

    def _alpha_skip(hit):
        """True where the candidate occluder's texel is below the
        material's alpha cutoff (the blocker is see-through there)."""
        w = 1.0 - hit.u - hit.v
        if shade_rows is not None:
            rec = jnp.asarray(shade_rows)[jnp.maximum(hit.slot, 0)]
            uv = (w[:, None] * rec[:, 22:24]
                  + hit.u[:, None] * rec[:, 24:26]
                  + hit.v[:, None] * rec[:, 26:28])
            tex_id = rec[:, 28].astype(jnp.int32)
            cut = rec[:, 29]
        else:
            tri = jnp.clip(hit.tri, 0, ds.tri_v0.shape[0] - 1)
            inst = jnp.clip(hit.inst, 0, ds.inst_mesh.shape[0] - 1)
            uv = (w[:, None] * ds.tri_uv0[tri]
                  + hit.u[:, None] * ds.tri_uv1[tri]
                  + hit.v[:, None] * ds.tri_uv2[tri])
            override = ds.inst_mat_override[inst]
            mid = jnp.where(override >= 0, override, ds.tri_mat[tri])
            mid = jnp.clip(mid, 0, ds.mat_kind.shape[0] - 1)
            tex_id = ds.mat_texture[mid]
            cut = ds.mat_alpha_cutoff[mid]
        a = materials.sample_alpha(
            ds.tex_alpha, ds.tex_meta, tex_id, uv[:, 0], uv[:, 1]
        )
        return (cut > 0.0) & (a < cut)

    from tpurt.core.vecmath import EPS_RAY

    def _occluded(org, dirn, t_min, t_max, want_stats):
        del t_min
        n = org.shape[0]
        tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        occ = jnp.zeros(n, bool)
        live = tmax > 0.0
        o = org
        stats = None
        for _ in range(ALPHA_OCCLUSION_ROUNDS):
            tq = jnp.where(live, tmax, -1.0)
            if want_stats and hasattr(closest, "with_stats"):
                hit, st = closest.with_stats(o, dirn, 0.0, tq)
                stats = st if stats is None else jnp.stack(
                    [stats[0] + st[0], jnp.maximum(stats[1], st[1])]
                )
            else:
                hit = closest(o, dirn, 0.0, tq)
            skip = hit.valid & _alpha_skip(hit)
            occ = occ | (live & hit.valid & ~skip)
            live = live & skip
            # advance past the transparent candidate (scale-aware eps —
            # a fixed 1e-4 vanishes in f32 at Cornell's 555-unit scale)
            pos = o + hit.t[:, None] * dirn
            eps = EPS_RAY * jnp.maximum(
                1.0, jnp.max(jnp.abs(pos), axis=-1)
            )
            o = jnp.where(live[:, None], pos + eps[:, None] * dirn, o)
            tmax = jnp.where(live, tmax - (hit.t + eps), tmax)
            live = live & (tmax > 0.0)
        occ = occ | live  # rounds exhausted → conservatively occluded
        if want_stats:
            if stats is None:
                stats = jnp.zeros(2, jnp.float32)
            return occ, stats
        return occ

    def occluded(org, dirn, t_min, t_max):
        return _occluded(org, dirn, t_min, t_max, False)

    def occluded_with_stats(org, dirn, t_min, t_max):
        return _occluded(org, dirn, t_min, t_max, True)

    if hasattr(closest, "with_stats"):
        occluded.with_stats = occluded_with_stats
    occluded.alpha_skip = _alpha_skip  # shared by make_cutout_closest
    return occluded


def make_cutout_closest(ds: DeviceScene, accel, closest, *,
                        meta: SceneMeta):
    """Closest-hit query that DISCARDS alpha-failed intersections (glTF
    alphaMode=MASK applies to every ray kind, not just shadows): bounded
    re-trace loop advancing past transparent candidates, accumulating the
    advance into the returned world-space ``t``. Opaque scenes return
    ``closest`` unchanged. Call inside jit (closure discipline)."""
    if not meta.has_alpha_cutout:
        return closest
    # reuse the occluder's alpha probe (same record/ds layout logic)
    alpha_skip = make_occluder(
        ds, accel, closest, None, meta=meta
    ).alpha_skip
    from tpurt.core.vecmath import EPS_RAY

    def _trace(org, dirn, t_min, t_max, want_stats):
        del t_min
        n = org.shape[0]
        tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        live = tmax > 0.0
        o = org
        t_off = jnp.zeros(n, jnp.float32)
        best = None
        stats = None
        for _ in range(ALPHA_OCCLUSION_ROUNDS):
            tq = jnp.where(live, tmax, -1.0)
            if want_stats and hasattr(closest, "with_stats"):
                hit, st = closest.with_stats(o, dirn, 0.0, tq)
                stats = st if stats is None else jnp.stack(
                    [stats[0] + st[0], jnp.maximum(stats[1], st[1])]
                )
            else:
                hit = closest(o, dirn, 0.0, tq)
            skip = hit.valid & alpha_skip(hit)
            accept = live & ~skip  # miss or alpha-passing hit: final
            shifted = hit._replace(t=t_off + hit.t)
            if best is None:
                best = shifted
            else:
                sel = lambda a, b: jnp.where(accept, a, b)
                best = Hit(*(
                    sel(fa, fb) for fa, fb in zip(shifted, best)
                ))
            live = live & skip
            pos = o + hit.t[:, None] * dirn
            eps = EPS_RAY * jnp.maximum(
                1.0, jnp.max(jnp.abs(pos), axis=-1)
            )
            o = jnp.where(live[:, None], pos + eps[:, None] * dirn, o)
            t_off = jnp.where(live, t_off + hit.t + eps, t_off)
            tmax = jnp.where(live, tmax - (hit.t + eps), tmax)
        # rounds exhausted with a still-transparent stack: the first
        # candidate stands as an opaque hit (conservative, mirrors the
        # occluder's exhausted-rounds bias)
        if want_stats:
            if stats is None:
                stats = jnp.zeros(2, jnp.float32)
            return best, stats
        return best

    def cutout_closest(org, dirn, t_min, t_max):
        return _trace(org, dirn, t_min, t_max, False)

    def cutout_with_stats(org, dirn, t_min, t_max):
        return _trace(org, dirn, t_min, t_max, True)

    if hasattr(closest, "with_stats"):
        cutout_closest.with_stats = cutout_with_stats
    return cutout_closest


def render_pixels(
    ds: DeviceScene,
    cam: Camera,
    seed,
    sample0,
    accel,
    px: jnp.ndarray,
    py: jnp.ndarray,
    *,
    meta: SceneMeta,
    config: RenderConfig,
) -> jnp.ndarray:
    """Sum of ``config.spp_per_batch`` radiance samples for each pixel in
    (px, py), using global sample indices [sample0, sample0 + spp_per_batch).
    Returns (P, 3) f32. This is the unit the distributed layer shards: X1
    tile-parallelism passes row slices, X2 sample-parallelism passes
    disjoint sample-index windows (SURVEY.md §2.3). Randomness is a pure
    function of (seed, sample index, absolute pixel id) — bit-identical
    under any sharding (SURVEY.md §4.4)."""
    w, h = config.width, config.height
    closest, any_hit = make_intersectors(ds, accel, meta=meta,
                                         config=config, lean=True)
    any_hit = make_occluder(ds, accel, closest, any_hit, meta=meta)
    closest = make_cutout_closest(ds, accel, closest, meta=meta)
    spp = config.spp_per_batch
    n_px = px.shape[0]

    # Samples are flattened into the ray axis (sample-major blocks, so each
    # sample's rays keep their screen-tile packet order): the whole batch is
    # ONE trace per path segment instead of a fori over samples. Bigger
    # dispatches amortize fixed costs — and a Mosaic fault was reproduced
    # when a pallas_call sat inside a sample fori_loop at some grid sizes.
    px_r = jnp.tile(px, spp)
    py_r = jnp.tile(py, spp)
    pixel_id = (
        py_r.astype(jnp.uint32) * jnp.uint32(w) + px_r.astype(jnp.uint32)
    )
    sample_idx = jnp.asarray(sample0, jnp.uint32) + jnp.repeat(
        jnp.arange(spp, dtype=jnp.uint32), n_px
    )
    sampler = PixelSampler.make(seed, sample_idx, pixel_id)
    uj = sampler.u2(TAG_JITTER)
    org, dirn = camera_rays(
        cam, px_r, py_r, w, h, jitter=(uj[..., 0], uj[..., 1])
    )
    radiance, rays = path_trace_rays(
        ds,
        closest,
        any_hit,
        org,
        dirn,
        sampler,
        max_bounces=config.max_bounces,
        use_nee=config.use_nee,
        shading_mode=config.shading_mode,
        resolver=materials.make_resolver(
            ds, accel, texture_filter=config.texture_filter),
    )
    return radiance.reshape(spp, n_px, 3).sum(axis=0), rays


def render_batch(
    ds: DeviceScene,
    cam: Camera,
    seed,
    sample0,
    accel=None,
    *,
    meta: SceneMeta,
    config: RenderConfig,
) -> jnp.ndarray:
    """One progressive batch over the full frame: returns
    ((H, W, 3) f32 radiance *sum*, (3,) ray counts [closest, shadow,
    pair-budget overflow events]).
    FrameState divides the sum by its sample count at resolve time.

    Pixels are traced in 32×32 screen-tile order (a STATIC permutation) so
    the packet intersector's 1024-ray packets are tight frusta without any
    runtime sort; radiance is scattered back to row-major by absolute pixel
    id (order never affects values — RNG keys off pixel id, SURVEY.md §4.4).
    """
    w, h = config.width, config.height
    from tpurt.core.camera import full_frame_pixels_tiled

    px, py = full_frame_pixels_tiled(w, h)
    total, counts = render_pixels(
        ds, cam, seed, sample0, accel, px, py, meta=meta, config=config
    )
    linear = py.astype(jnp.int32) * w + px.astype(jnp.int32)
    img = jnp.zeros((h * w, 3), jnp.float32).at[linear].set(total)
    return img.reshape(h, w, 3), counts


@functools.partial(jax.jit, static_argnames=("meta", "config"))
def render_batch_jit(ds, cam, seed, sample0, accel=None, *, meta, config):
    return render_batch(ds, cam, seed, sample0, accel, meta=meta,
                        config=config)
