"""Wavefront path-tracing pipeline: ray compaction + material sort (G8/G9).

The reference's GPU hides ray scheduling inside ``vkCmdTraceRaysKHR`` — the
hardware SIMT scheduler keeps warps dense and the SBT dispatches per-material
hit shaders (SURVEY.md §2.2 G8/G9 "n/a (hw scheduler)" / "(SBT dispatch)").
On a lockstep TPU both must be explicit. This module is the streaming
counterpart of the megakernel in ``tpurt.render.integrator``:

  * A fixed-capacity SoA **ring buffer** of path states is kept full by
    refilling dead lanes with fresh primary rays from the (pixel × sample)
    work stream — the "unbounded logical ray stream through a fixed-size
    buffer" trick (SURVEY.md §5 long-context entry). Refill ranks are a
    prefix sum over the dead mask: that prefix-sum + scatter IS the G8
    stream compaction, fused with regeneration.
  * Before shading, lanes are **sorted by material kind** (dead lanes sink
    to the end) — one stable sort implements both G9 material batching and
    G8 compaction of the survivors. Correctness does not depend on lane
    order because all randomness is a pure function of
    (seed, sample index, pixel id) — see tpurt.core.prng.
  * Radiance is committed to the framebuffer by scatter-add at every event
    (miss/emission/NEE), so a lane is free for reuse the moment it dies.

Equivalent estimator to the megakernel: for a given (seed, sample, pixel)
both pipelines draw the same RNG stream and make identical path decisions;
images differ only by float summation order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpurt import materials
from tpurt.core.camera import Camera, camera_rays
from tpurt.core.prng import TAG_JITTER, PixelSampler, bounce_tag
from tpurt.core.vecmath import dot
from tpurt.render.integrator import SHADOW_EPS, make_intersectors
from tpurt.render.intersectors import SceneMeta
from tpurt.scene.device import DeviceScene
from tpurt.utils.config import RenderConfig


class WaveState(NamedTuple):
    """SoA ring buffer of in-flight path states (capacity C lanes)."""

    pixel: jnp.ndarray  # (C,) uint32 linear pixel id
    sample: jnp.ndarray  # (C,) uint32 global sample index
    bounce: jnp.ndarray  # (C,) uint32 current path depth
    org: jnp.ndarray  # (C, 3) f32
    dirn: jnp.ndarray  # (C, 3) f32
    throughput: jnp.ndarray  # (C, 3) f32
    allow_emission: jnp.ndarray  # (C,) bool
    active: jnp.ndarray  # (C,) bool


class WaveLoop(NamedTuple):
    state: WaveState
    fb: jnp.ndarray  # (H*W, 3) f32 radiance sum
    next_path: jnp.ndarray  # () uint32 — next work item in the stream
    rays: jnp.ndarray  # (3,) f32 [closest, shadow, overflow] counters
    waves: jnp.ndarray  # () i32


def _empty_state(capacity: int) -> WaveState:
    z3 = jnp.zeros((capacity, 3), jnp.float32)
    zu = jnp.zeros(capacity, jnp.uint32)
    return WaveState(
        pixel=zu,
        sample=zu,
        bounce=zu,
        org=z3,
        dirn=z3,
        throughput=z3,
        allow_emission=jnp.zeros(capacity, bool),
        active=jnp.zeros(capacity, bool),
    )


def _refill(state: WaveState, next_path, seed, sample0, cam: Camera,
            w: int, h: int, total_paths) -> tuple[WaveState, jnp.ndarray]:
    """G8 regeneration: dead lanes claim consecutive work items.

    Work item k is (sample = sample0 + k // (W·H), pixel = k % (W·H)) —
    sample-major so early waves cover whole frames first (progressive
    preview order, matching the reference's accumulation semantics B:10).
    """
    dead = ~state.active
    rank = jnp.cumsum(dead.astype(jnp.uint32)) - 1  # prefix sum (G8)
    k = next_path + rank
    take = dead & (k < total_paths)

    n_px = jnp.uint32(w * h)
    pixel_new = (k % n_px).astype(jnp.uint32)
    sample_new = jnp.asarray(sample0, jnp.uint32) + (k // n_px).astype(
        jnp.uint32
    )
    sampler = PixelSampler.make(seed, sample_new, pixel_new)
    uj = sampler.u2(TAG_JITTER)
    px = (pixel_new % jnp.uint32(w)).astype(jnp.float32)
    py = (pixel_new // jnp.uint32(w)).astype(jnp.float32)
    org, dirn = camera_rays(cam, px, py, w, h, jitter=(uj[..., 0], uj[..., 1]))

    sel = lambda a, b: jnp.where(take, a, b)
    sel3 = lambda a, b: jnp.where(take[:, None], a, b)
    new_state = WaveState(
        pixel=sel(pixel_new, state.pixel),
        sample=sel(sample_new, state.sample),
        bounce=sel(jnp.zeros_like(state.bounce), state.bounce),
        org=sel3(org, state.org),
        dirn=sel3(dirn, state.dirn),
        throughput=sel3(jnp.ones_like(state.throughput), state.throughput),
        allow_emission=sel(jnp.ones_like(take), state.allow_emission),
        active=state.active | take,
    )
    consumed = jnp.sum(take.astype(jnp.uint32))
    return new_state, next_path + consumed


def _material_sort(ds: DeviceScene, state: WaveState,
                   hit_kind: jnp.ndarray) -> jnp.ndarray:
    """G9: permutation putting live lanes in material-kind batches, dead
    lanes last (the SBT-hit-group analog: one dense batch per shader)."""
    big = jnp.uint32(0xFFFF)
    key = jnp.where(state.active, hit_kind.astype(jnp.uint32), big)
    return jnp.argsort(key, stable=True).astype(jnp.int32)


def _permute(state: WaveState, perm: jnp.ndarray) -> WaveState:
    return jax.tree.map(lambda a: a[perm], state)


def render_batch_wavefront(
    ds: DeviceScene,
    cam: Camera,
    seed,
    sample0,
    accel=None,
    *,
    meta: SceneMeta,
    config: RenderConfig,
):
    """Wavefront equivalent of ``integrator.render_batch``: returns
    ((H, W, 3) f32 radiance sum over spp_per_batch samples, (3,) ray counts).
    """
    w, h = config.width, config.height
    capacity = min(config.wavefront_capacity, w * h * config.spp_per_batch)
    total_paths = jnp.uint32(w * h * config.spp_per_batch)
    closest, any_hit = make_intersectors(ds, accel, meta=meta,
                                         config=config, lean=True)
    from tpurt.render.integrator import make_cutout_closest, make_occluder

    any_hit = make_occluder(ds, accel, closest, any_hit, meta=meta)
    closest = make_cutout_closest(ds, accel, closest, meta=meta)
    resolver = materials.make_resolver(
        ds, accel, texture_filter=config.texture_filter)
    use_nee = config.use_nee

    def wave(loop: WaveLoop) -> WaveLoop:
        state, next_path = _refill(
            loop.state, loop.next_path, seed, sample0, cam, w, h, total_paths
        )
        fb, rays = loop.fb, loop.rays
        n_alive = jnp.sum(state.active.astype(jnp.float32))
        rays = rays.at[0].add(n_alive)

        # --- trace (G2): dead lanes carry t_max = -1 → immediate DONE
        tmax = jnp.where(state.active, jnp.inf, -1.0)
        if hasattr(closest, "with_stats"):
            hit, tstats = closest.with_stats(state.org, state.dirn, 0.0,
                                             tmax)
            rays = rays.at[2].add(tstats[1])
        else:
            hit = closest(state.org, state.dirn, 0.0, tmax)
        hit_valid = hit.valid & state.active

        # --- miss shader (G5): commit background, lane dies
        missed = state.active & ~hit.valid
        fb = fb.at[state.pixel].add(
            jnp.where(missed[:, None], state.throughput * ds.background, 0.0)
        )

        attrs = resolver(
            state.org, state.dirn, hit.t, hit.u, hit.v, hit.tri,
            hit.inst, hit.slot,
        )

        # --- G9 material sort (+ G8 compaction: dead lanes sink last).
        # The scatter-adds above already committed miss events, so
        # permuting afterwards is safe; hit attributes are permuted along.
        if config.material_sort:
            perm = _material_sort(ds, state, attrs.kind)
            state = _permute(state, perm)
            attrs = jax.tree.map(lambda a: a[perm], attrs)
            hit_valid = hit_valid[perm]

        # Per-lane sampler; materials index draw sites with the traced
        # per-lane bounce depth (bounce_tag is plain arithmetic).
        sampler = PixelSampler.make(seed, state.sample, state.pixel)

        # --- emission (camera hits and post-specular hits; NEE covers rest)
        fb = fb.at[state.pixel].add(
            jnp.where(
                (hit_valid & state.allow_emission)[:, None],
                state.throughput * attrs.emission,
                0.0,
            )
        )

        # --- NEE shadow rays (G4 occlusion query)
        if use_nee:
            n_lanes = state.pixel.shape[0]
            shadow_org = materials.bounce_origin(attrs, jnp.ones(n_lanes))
            wi_l, dist_l, l_over_pdf, l_valid = materials.sample_light(
                ds, shadow_org, sampler, state.bounce
            )
            brdf_l = materials.eval_brdf(attrs, -state.dirn, wi_l)
            cos_s = jnp.maximum(dot(attrs.n_shade, wi_l), 0.0)
            contrib = state.throughput * brdf_l * cos_s[:, None] * l_over_pdf
            want = hit_valid & l_valid & (jnp.max(contrib, axis=-1) > 0.0)
            rays = rays.at[1].add(jnp.sum(want.astype(jnp.float32)))
            s_tmax = jnp.where(want, dist_l * (1.0 - SHADOW_EPS), -1.0)
            if hasattr(any_hit, "with_stats"):
                occluded, tstats = any_hit.with_stats(
                    shadow_org, wi_l, 0.0, s_tmax
                )
                rays = rays.at[2].add(tstats[1])
            else:
                occluded = any_hit(shadow_org, wi_l, 0.0, s_tmax)
            fb = fb.at[state.pixel].add(
                jnp.where((want & ~occluded)[:, None], contrib, 0.0)
            )

        # --- bounce (G3): sample next segment, lane survives or dies
        bs = materials.sample_bounce(attrs, -state.dirn, sampler, state.bounce)
        throughput = jnp.where(
            hit_valid[:, None], state.throughput * bs.weight, state.throughput
        )
        alive = (
            hit_valid
            & (state.bounce < config.max_bounces)
            & (jnp.max(throughput, axis=-1) > 1e-6)
        )
        state = WaveState(
            pixel=state.pixel,
            sample=state.sample,
            bounce=state.bounce + 1,
            org=materials.bounce_origin(attrs, bs.offset_sign),
            dirn=bs.wi,
            throughput=throughput,
            allow_emission=bs.is_specular | (not use_nee),
            active=alive,
        )
        return WaveLoop(
            state=state,
            fb=fb,
            next_path=next_path,
            rays=rays,
            waves=loop.waves + 1,
        )

    def cond(loop: WaveLoop):
        pending = loop.next_path < total_paths
        return pending | jnp.any(loop.state.active)

    init = WaveLoop(
        state=_empty_state(capacity),
        fb=jnp.zeros((w * h, 3), jnp.float32),
        next_path=jnp.uint32(0),
        rays=jnp.zeros(3, jnp.float32),
        waves=jnp.int32(0),
    )
    final = jax.lax.while_loop(cond, wave, init)
    return final.fb.reshape(h, w, 3), final.rays


@functools.partial(jax.jit, static_argnames=("meta", "config"))
def render_batch_wavefront_jit(ds, cam, seed, sample0, accel=None, *, meta,
                               config):
    return render_batch_wavefront(
        ds, cam, seed, sample0, accel, meta=meta, config=config
    )
