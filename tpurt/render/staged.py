"""Staged wave driver: one XLA executable per pipeline stage (L4 hot loop).

Motivation: on this backend, XLA programs that contain TWO OR MORE Pallas
traversal calls with shading fusions between them miscompile and crash the
TPU worker (reproduced and bisected at several shapes; single-kernel
programs and kernel-only chains are always fine). This driver restructures
the megakernel into per-stage executables — trace (1 Pallas call), shade
(pure XLA), occlusion trace (1 Pallas call), commit (pure XLA) — looping
bounces and progressive batches in Python. Each stage compiles once and is
reused for every bounce/batch (the bounce index rides in as a device
scalar), which also suits the slow remote-compile service far better than
one giant program.

Closure discipline (critical on the axon backend): the jitted stages close
over HOST data only (numpy pixel orders, Python ints); every device-resident
array — the DeviceScene and the acceleration tables — is passed per call as
a jit ARGUMENT. Capturing an eager device array in a jitted closure forces
a device→host read at trace time to embed the constant, and the first D2H
of a process permanently degrades all later dispatch latency ~100×
(benchmarks/profile_poison.py).

Estimator-identical to tpurt.render.integrator (same RNG tags, same masks,
same event ordering) — tests diff the two pipelines. Inter-stage state is
HBM-resident SoA; the extra boundary traffic is ~60 MB per wave at 1080p,
microseconds at HBM bandwidth, versus worker-crash-free execution.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurt import materials
from tpurt.core.camera import Camera, camera_rays, full_frame_pixels_tiled
from tpurt.core.prng import TAG_JITTER, PixelSampler
from tpurt.core.vecmath import dot
from tpurt.render.integrator import SHADOW_EPS, make_intersectors
from tpurt.render.intersectors import SceneMeta
from tpurt.utils.aotcache import cached_jit
from tpurt.utils.config import RenderConfig


class WaveState(NamedTuple):
    """Inter-stage SoA path state (flattened samples × pixels).

    ``pix``/``ds`` make every ray self-describing (linear pixel id with
    pad pixels ≥ w·h, and the within-batch sample index): the sorted-wave
    pipeline permutes the wave between bounces, so pixel identity and the
    RNG stream key ride WITH the ray instead of being implied by array
    position."""

    org: jnp.ndarray  # (N, 3)
    dirn: jnp.ndarray  # (N, 3)
    radiance: jnp.ndarray  # (N, 3)
    throughput: jnp.ndarray  # (N, 3)
    alive: jnp.ndarray  # (N,) bool
    allow_emission: jnp.ndarray  # (N,) bool
    pix: jnp.ndarray  # (N,) i32 linear pixel id (pads ≥ w·h)
    ds: jnp.ndarray  # (N,) u32 within-batch sample index [0, spp)
    # (4 + bounces,) f32 counters: [closest, shadow, pair_overflow,
    # live_overflow, live-after-bounce-0, live-after-bounce-1, …]
    rays: jnp.ndarray


class PixOrders(NamedTuple):
    """Per-ray pixel-order arrays, passed to every stage as a jit
    ARGUMENT pytree (device-resident, uploaded once at renderer build).

    These used to be numpy closure constants embedded into each stage
    program — but a single embedded 15 MB constant measures +4.6 s of
    remote compile and +41 MB of serialized executable on this backend
    (benchmarks/probe_par_compile.py follow-up, round 4), and the five
    per-ray arrays inflated the fused bunny stages to 190–360 MB each.
    As arguments they cost one H2D upload and nothing at compile time.

    In mesh mode the per-ray fields are GLOBAL arrays over the flat ray
    axis, sharded by shard_map exactly like WaveState — each shard's
    slice equals what the old axis_index-based closure computed."""

    px: jnp.ndarray  # (N,) i32 pixel x (screen-tile order)
    py: jnp.ndarray  # (N,) i32 pixel y
    pid: jnp.ndarray  # (N,) u32 RNG pixel key (y * w + x)
    lin: jnp.ndarray  # (N,) i32 linear pixel id (pads ≥ w·h)
    ds: jnp.ndarray  # (N,) u32 within-batch sample index
    soff: jnp.ndarray  # (N,) u32 sample-shard offset (s_id * spp)
    linear: jnp.ndarray  # (n_px_padded,) i32 tile→raster ids (resolve)


def make_staged_renderer(ds, accel, *, meta: SceneMeta,
                         config: RenderConfig, mesh=None):
    """Build the per-stage jitted functions for a scene + config.

    Returns ``render_batch(cam, seed, sample0) -> ((H, W, 3) sum,
    (3,) counts)`` whose results match integrator.render_batch bit-for-bit
    up to float reassociation. The camera/scene/accel are ARGUMENTS of the
    compiled stages (not closure constants) so flythrough frames reuse the
    executables and no device constant is ever read back to host.

    ``mesh``: optional ("sample", "tile") jax.sharding.Mesh (SURVEY.md
    §2.3 X1/X2). Each stage is then wrapped in shard_map over the flat
    ray axis — every shard runs the SAME per-stage programs (including
    the single Pallas traversal call), so the TPU-stable staged pipeline
    IS the distributed pipeline (VERDICT r1 §5); tile shards own pixel
    chunks of the screen-tile order, sample shards cover disjoint sample
    windows, and the only collectives are tiny per-stage counter psums
    plus one radiance psum at resolve (rides ICI). Results are
    bit-identical to the single-chip render of the same sample window up
    to float reassociation.
    """
    w, h = config.width, config.height
    spp = config.spp_per_batch
    # counter-vector length (WaveState.rays): fixed slots + one live-
    # wave count per bounce depth (feeds the live-cap autotune)
    # counter layout (WaveState.rays): [closest, shadow, pair_overflow,
    # live_overflow, live-after-bounce-0..MB, want-at-bounce-0..MB]
    NCOUNT = 4 + 2 * (config.max_bounces + 1)
    WANT0 = 4 + config.max_bounces + 1  # first want-count slot
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        n_tile = mesh.shape["tile"]
        n_sample = mesh.shape["sample"]
        rp = P(("sample", "tile"))  # flat ray axis over both mesh axes
    else:
        n_tile = 1
        n_sample = 1
    # host numpy pixel orders (closure constants embedded from host bytes)
    px, py = full_frame_pixels_tiled(w, h)
    px = np.asarray(px)
    py = np.asarray(py)
    n_px = px.shape[0]
    # pad the pixel stream to a tile-shard multiple; pad pixels trace
    # normally but their linear ids are ≥ w·h so resolve's sort drops them
    pad = (-n_px) % n_tile
    px_p = np.concatenate([px, np.zeros(pad, px.dtype)])
    py_p = np.concatenate([py, np.zeros(pad, py.dtype)])
    linear_p = np.concatenate(
        [
            py.astype(np.int32) * w + px.astype(np.int32),
            w * h + np.arange(pad, dtype=np.int32),
        ]
    )
    local_px = (n_px + pad) // n_tile
    px_r = np.tile(px_p, spp)
    py_r = np.tile(py_p, spp)
    pixel_id = (
        py_r.astype(np.uint32) * np.uint32(w) + px_r.astype(np.uint32)
    )
    n = local_px * spp  # rays per shard

    # per-tile-shard pixel chunks (the global flat-ray-axis composition
    # below concatenates them in shard order)
    px_c = px_p.reshape(n_tile, local_px)
    py_c = py_p.reshape(n_tile, local_px)
    pid_c = pixel_id[: n_px + pad].reshape(n_tile, local_px)
    lin_c = linear_p.reshape(n_tile, local_px).astype(np.int32)
    ds_r = np.repeat(np.arange(spp, dtype=np.uint32), local_px)

    # GLOBAL per-ray pixel-order arrays over the flat ray axis (shard
    # order: sample-major, then tile — exactly shard_map's split of
    # P(("sample", "tile"))); single-chip is the 1×1 degenerate case.
    # Device arrays passed as stage ARGUMENTS — see PixOrders.
    def _per_tile(chunks):
        return np.concatenate(
            [np.tile(chunks[t], spp) for t in range(n_tile)]
        )

    px_g = np.tile(_per_tile(px_c), n_sample)
    py_g = np.tile(_per_tile(py_c), n_sample)
    pid_g = np.tile(_per_tile(pid_c), n_sample)
    lin_g = np.tile(_per_tile(lin_c), n_sample)
    ds_g = np.tile(ds_r, n_tile * n_sample)
    soff_g = np.repeat(
        np.arange(n_sample, dtype=np.uint32) * np.uint32(spp),
        n_tile * n,
    )
    pox = PixOrders(
        px=jnp.asarray(px_g, jnp.int32),
        py=jnp.asarray(py_g, jnp.int32),
        pid=jnp.asarray(pid_g, jnp.uint32),
        lin=jnp.asarray(lin_g, jnp.int32),
        ds=jnp.asarray(ds_g, jnp.uint32),
        soff=jnp.asarray(soff_g, jnp.uint32),
        linear=jnp.asarray(linear_p, jnp.int32),
    )

    def _sampler(pox, seed, sample0):
        sample_idx = (
            jnp.asarray(sample0, jnp.uint32) + pox.soff + pox.ds
        )
        return PixelSampler.make(seed, sample_idx, pox.pid)

    def _psum_counts(x):
        """Per-shard counter increments → replicated totals (mesh mode)."""
        if mesh is None:
            return x
        return jax.lax.psum(x, ("sample", "tile"))

    if mesh is not None:
        state_spec = WaveState(
            org=rp, dirn=rp, radiance=rp, throughput=rp, alive=rp,
            allow_emission=rp, pix=rp, ds=rp, rays=P(),
        )
        pox_spec = PixOrders(px=rp, py=rp, pid=rp, lin=rp, ds=rp,
                             soff=rp, linear=P())
        from tpurt.render.intersectors import Hit

        hit_spec = Hit(t=rp, u=rp, v=rp, tri=rp, inst=rp, valid=rp,
                       slot=rp)
        shadow_spec = (rp, rp, rp, rp, rp)

        def _smap(body, in_specs, out_specs):
            return jax.jit(
                jax.shard_map(
                    body, mesh=mesh, in_specs=in_specs,
                    out_specs=out_specs, check_vma=False,
                )
            )
    else:

        def _smap(body, in_specs, out_specs):
            return jax.jit(body)

    # Single-chip stages go through the AOT executable cache: the remote
    # Mosaic service ignores the XLA persistent cache (~100–140 s per
    # Pallas-bearing program, 840 s cold bunny warmup in round 2), but
    # serialized executables reload in milliseconds
    # (benchmarks/probe_aot_cache.py; tpurt.utils.aotcache). Mesh-mode
    # (shard_map) programs stay on plain jit — multi-chip layouts are not
    # exercised on this box and sharding metadata is the risky surface.
    cfg_key = repr(config)

    def _cjit(body, name):
        if mesh is not None:
            return jax.jit(body)
        return cached_jit(body, name, cfg_key)

    def raygen_body(pox: PixOrders, cam: Camera, seed,
                    sample0) -> WaveState:
        sampler = _sampler(pox, seed, sample0)
        uj = sampler.u2(TAG_JITTER)
        org, dirn = camera_rays(
            cam, pox.px, pox.py, w, h, jitter=(uj[..., 0], uj[..., 1])
        )
        return WaveState(
            org=org,
            dirn=dirn,
            radiance=jnp.zeros((n, 3), jnp.float32),
            throughput=jnp.ones((n, 3), jnp.float32),
            alive=jnp.ones(n, bool),
            allow_emission=jnp.ones(n, bool),
            pix=pox.lin,
            ds=pox.ds,
            rays=jnp.zeros(NCOUNT, jnp.float32),
        )

    if mesh is None:
        raygen = _cjit(raygen_body, "raygen")
    else:
        raygen = _smap(
            raygen_body,
            in_specs=(pox_spec, Camera(P(), P(), P(), P()), P(), P()),
            out_specs=state_spec,
        )

    def _trace_body(ds, accel, state: WaveState, *, wave, live_cap=0):
        """Stage with ONE Pallas call (closest hit) for opaque scenes;
        alpha-cutout scenes re-trace past transparent candidates
        (integrator.make_cutout_closest)."""
        from tpurt.render.integrator import make_cutout_closest

        closest, _ = make_intersectors(ds, accel, meta=meta,
                                       config=config, wave=wave,
                                       lean=True, live_cap=live_cap)
        closest = make_cutout_closest(ds, accel, closest, meta=meta)
        inc = jnp.zeros(NCOUNT, jnp.float32).at[0].set(
            jnp.sum(state.alive.astype(jnp.float32))
        )
        tmax = jnp.where(state.alive, jnp.inf, -1.0)
        if hasattr(closest, "with_stats"):
            hit, tstats = closest.with_stats(
                state.org, state.dirn, 0.0, tmax
            )
            inc = inc.at[2].add(tstats[1])
            if tstats.shape[0] > 2:  # live-cap overflow (tilewave)
                inc = inc.at[3].add(tstats[2])
        else:
            hit = closest(state.org, state.dirn, 0.0, tmax)
        rays = state.rays + _psum_counts(inc)
        return hit, state._replace(rays=rays)

    def _make_trace(wave, live_cap=0):
        body = functools.partial(_trace_body, wave=wave,
                                 live_cap=live_cap)
        if mesh is None:
            suffix = f"_c{live_cap}" if live_cap else ""
            return _cjit(body, f"trace_{wave}{suffix}")
        return _smap(
            body,
            in_specs=(P(), P(), state_spec),
            out_specs=(hit_spec, state_spec),
        )

    # one trace executable per wave kind: camera waves keep the static
    # screen-tile order + small pair budget, bounce waves get the octant
    # sort + large budget (two Mosaic kernel variants; bounces ≥ 1 share
    # one executable — the bounce index rides in as a device scalar).
    # With measured live caps (config.live_caps, single-chip fused path
    # only) later bounces get their OWN truncated-shape executables —
    # the bounce-(b+1) trace runs on the live prefix of its internally
    # sorted wave (bunny bench: bounce-2 wave is 28% live).
    trace0 = _make_trace("primary")
    traceN = _make_trace("bounce")
    import os as _osmod

    use_caps = (
        mesh is None
        and _osmod.environ.get("TPURT_LIVE_TRUNC", "1") == "1"
        and hasattr(accel, "cluster_lo")
    )
    traceN_by = [traceN] * (config.max_bounces + 1)
    if use_caps and config.live_caps:
        by_cap = {0: traceN}
        for b in range(1, config.max_bounces + 1):
            cap = (int(config.live_caps[b - 1])
                   if b - 1 < len(config.live_caps) else 0)
            if cap <= 0 or cap >= n:
                cap = 0
            if cap not in by_cap:
                by_cap[cap] = _make_trace("bounce", live_cap=cap)
            traceN_by[b] = by_cap[cap]

    def shade_body(ds, accel, pox, state: WaveState, hit, seed, sample0,
                   bounce, presorted=False):
        """Pure-XLA stage: miss/emission events, NEE shadow-ray setup,
        bounce sampling. ``bounce`` is a device scalar — one executable
        serves every bounce depth.

        ``presorted`` (sorted-wave pipeline): the wave is permuted, so
        the RNG stream is keyed by the CARRIED per-ray ids instead of
        array position (pad rays draw from a different stream than the
        positional path — invisible: resolve drops them)."""
        if presorted:
            sampler = PixelSampler.make(
                jnp.asarray(seed, jnp.uint32),
                jnp.asarray(sample0, jnp.uint32) + state.ds,
                state.pix.astype(jnp.uint32),
            )
        else:
            sampler = _sampler(pox, seed, sample0)
        resolver = materials.make_resolver(
            ds, accel, texture_filter=config.texture_filter)
        hit_valid = hit.valid & state.alive
        radiance = state.radiance + jnp.where(
            (state.alive & ~hit.valid)[:, None],
            state.throughput * ds.background,
            0.0,
        )
        attrs = resolver(
            state.org, state.dirn, hit.t, hit.u, hit.v, hit.tri,
            hit.inst, hit.slot,
        )
        radiance = radiance + jnp.where(
            (hit_valid & state.allow_emission)[:, None],
            state.throughput * attrs.emission,
            0.0,
        )

        if config.use_nee:
            shadow_org = materials.bounce_origin(
                attrs, jnp.ones(state.org.shape[0])
            )
            wi_l, dist_l, l_over_pdf, l_valid = materials.sample_light(
                ds, shadow_org, sampler, bounce
            )
            brdf_l = materials.eval_brdf(attrs, -state.dirn, wi_l)
            cos_s = jnp.maximum(dot(attrs.n_shade, wi_l), 0.0)
            contrib = (
                state.throughput * brdf_l * cos_s[:, None] * l_over_pdf
            )
            want = hit_valid & l_valid & (jnp.max(contrib, axis=-1) > 0.0)
            shadow = (
                jnp.where(want[:, None], shadow_org, 0.0),
                jnp.where(want[:, None], wi_l, 1.0),
                jnp.where(want, dist_l * (1.0 - SHADOW_EPS), -1.0),
                contrib,
                want,
            )
        else:
            shadow = None

        bs = materials.sample_bounce(attrs, -state.dirn, sampler, bounce)
        throughput = jnp.where(
            hit_valid[:, None], state.throughput * bs.weight,
            state.throughput,
        )
        alive = (
            hit_valid
            & (bounce < config.max_bounces)
            & (jnp.max(throughput, axis=-1) > 1e-6)
        )
        rays = state.rays
        if not presorted:
            # record the NEXT wave's live count (feeds the live-cap
            # autotune; the sorted pipeline records its own after
            # truncation, so presorted skips this)
            live_inc = jnp.zeros(NCOUNT, jnp.float32).at[
                4 + bounce.astype(jnp.int32)
            ].add(jnp.sum(alive.astype(jnp.float32)))
            rays = rays + _psum_counts(live_inc)
        new = WaveState(
            org=jnp.where(
                hit_valid[:, None],
                materials.bounce_origin(attrs, bs.offset_sign),
                0.0,
            ),
            dirn=jnp.where(hit_valid[:, None], bs.wi, 1.0),
            radiance=radiance,
            throughput=throughput,
            alive=alive,
            allow_emission=bs.is_specular | (not config.use_nee),
            pix=state.pix,
            ds=state.ds,
            rays=rays,
        )
        return new, shadow

    if mesh is None:
        shade = _cjit(shade_body, "shade")
    else:
        shade = _smap(
            shade_body,
            in_specs=(P(), P(), pox_spec, state_spec, hit_spec, P(),
                      P(), P()),
            out_specs=(state_spec,
                       shadow_spec if config.use_nee else None),
        )

    def occlude_body(ds, accel, state: WaveState, shadow, bounce,
                     presorted=False, shadow_cap=0):
        """Stage with ONE Pallas call (shadow/any-hit) for opaque scenes;
        alpha-cutout scenes run make_occluder's bounded closest-trace
        loop (ALPHA_OCCLUSION_ROUNDS traversal calls — the multi-
        traversal program shape is qualified by TPURT_FUSE_BOUNCES).

        ``presorted``: trace shadow rays in the CURRENT wave order (the
        sorted-wave pipeline's coherent order) — no forward/restore sort
        inside the intersector. ``shadow_cap``: measured live-wave
        truncation of the occlusion trace (non-want rays sort to the
        back; NEE want fractions measured 52/12/6% per bounce on the
        bunny ladder). ``bounce`` (device scalar) indexes the per-bounce
        want-count slot that feeds the shadow-cap autotune."""
        from tpurt.render.integrator import make_occluder

        closest, any_hit = make_intersectors(
            ds, accel, meta=meta, config=config,
            wave="presorted" if presorted else "bounce",
            lean=True, shadow_live_cap=shadow_cap,
        )
        any_hit = make_occluder(ds, accel, closest, any_hit, meta=meta)
        s_org, s_dir, s_tmax, contrib, want = shadow
        n_want = jnp.sum(want.astype(jnp.float32))
        inc = jnp.zeros(NCOUNT, jnp.float32).at[1].set(n_want)
        inc = inc.at[WANT0 + bounce.astype(jnp.int32)].add(n_want)
        if hasattr(any_hit, "with_stats"):
            occluded, tstats = any_hit.with_stats(s_org, s_dir, 0.0, s_tmax)
            inc = inc.at[2].add(tstats[1])
            if tstats.shape[0] > 2:  # live-cap overflow (tilewave)
                inc = inc.at[3].add(tstats[2])
        else:
            occluded = any_hit(s_org, s_dir, 0.0, s_tmax)
        rays = state.rays + _psum_counts(inc)
        radiance = state.radiance + jnp.where(
            (want & ~occluded)[:, None], contrib, 0.0
        )
        return state._replace(radiance=radiance, rays=rays)

    if mesh is None:
        occlude = _cjit(occlude_body, "occlude")
    else:
        occlude = _smap(
            occlude_body,
            in_specs=(P(), P(), state_spec, shadow_spec, P()),
            out_specs=state_spec,
        )

    def resolve_body(state: WaveState):
        """Per-shard per-pixel sums (+ the X2 sample-axis merge).

        The sample merge is an all_gather + FIXED-ORDER unrolled sum
        (sample 0 + sample 1 + …) instead of psum: psum's reduction
        order is layout-dependent (float reassociation), while this
        order is exactly the single-chip progressive loop's — an N-chip
        render is BIT-IDENTICAL to the 1-chip render of the same sample
        window (SURVEY.md §4.4; tests/distributed asserts exact
        equality). Same ICI traffic as psum at these sizes."""
        total = state.radiance.reshape(spp, local_px, 3).sum(axis=0)
        if mesh is not None:
            g = jax.lax.all_gather(total, "sample")  # (n_sample, px, 3)
            total = g[0]
            for s in range(1, n_sample):
                total = total + g[s]
        return total, state.rays

    def _to_raster(pox, total, rays):
        """(padded_px, 3) tile-order sums → (H, W, 3) raster image.

        The tile→raster permutation rides a 4-operand lax.sort: XLA
        scatter cost ~19 ms per batch here, sort ~2 ms (the axon
        gather/scatter-vs-sort law, PARITY.md). Padding pixels carry
        linear ids ≥ w·h, sort to the back, and are sliced off."""
        _, r, g, b = jax.lax.sort(
            (pox.linear, total[:, 0], total[:, 1], total[:, 2]),
            num_keys=1,
        )
        img = jnp.stack([r, g, b], axis=1)[: w * h]
        return img.reshape(h, w, 3), rays

    if mesh is None:
        resolve = _cjit(
            lambda pox, state: _to_raster(pox, *resolve_body(state)),
            "resolve",
        )
    else:
        _resolve_sharded = _smap(
            resolve_body,
            in_specs=(state_spec,),
            out_specs=(P("tile", None), P()),
        )

        @jax.jit
        def resolve(pox, state):
            return _to_raster(pox, *_resolve_sharded(state))

    # TPURT_FUSE_STAGES=1: halve the program count per bounce by fusing
    # raygen into the primary trace and shade into the occlusion trace.
    # Every fused program still contains at most ONE traversal Pallas
    # call with shading fused around it (the documented miscompile needs
    # TWO translation kernels with shading between them), and the
    # stage-blocked walls show ~40 ms of tunnel dispatch baseline per
    # program on this backend — fewer programs is a direct e2e win if
    # the fused forms compile clean (hardware A/B gates the default).
    def raygen_trace0_body(ds, accel, pox, cam, seed, sample0):
        state = raygen_body(pox, cam, seed, sample0)
        return _trace_body(ds, accel, state, wave="primary")

    def shade_occlude_body(ds, accel, pox, state, hit, seed, sample0,
                           bounce, shadow_cap=0):
        state, shadow = shade_body(ds, accel, pox, state, hit, seed,
                                   sample0, bounce)
        if config.use_nee:
            state = occlude_body(ds, accel, state, shadow, bounce,
                                 shadow_cap=shadow_cap)
        return state

    if mesh is None:
        raygen_trace0 = _cjit(raygen_trace0_body, "raygen_trace0")
        shade_occlude = _cjit(shade_occlude_body, "shade_occlude")
        # per-bounce shadow-capped fused stages (measured want caps —
        # same dedupe-by-cap pattern as traceN_by; bounce still rides
        # as a device scalar so equal caps share one executable)
        shade_occlude_by = [shade_occlude] * (config.max_bounces + 1)
        if use_caps and config.shadow_caps and config.use_nee:
            so_by_cap = {0: shade_occlude}
            for b in range(config.max_bounces + 1):
                cap = (int(config.shadow_caps[b])
                       if b < len(config.shadow_caps) else 0)
                if cap <= 0 or cap >= n:
                    cap = 0
                if cap not in so_by_cap:
                    so_by_cap[cap] = _cjit(
                        functools.partial(shade_occlude_body,
                                          shadow_cap=cap),
                        f"shade_occlude_c{cap}",
                    )
                shade_occlude_by[b] = so_by_cap[cap]
    else:
        raygen_trace0 = _smap(
            raygen_trace0_body,
            in_specs=(P(), P(), pox_spec, Camera(P(), P(), P(), P()),
                      P(), P()),
            out_specs=(hit_spec, state_spec),
        )
        shade_occlude = _smap(
            shade_occlude_body,
            in_specs=(P(), P(), pox_spec, state_spec, hit_spec, P(),
                      P(), P()),
            out_specs=state_spec,
        )
        shade_occlude_by = [shade_occlude] * (config.max_bounces + 1)

    # TPURT_FUSE_BOUNCES=1 (default OFF, single-chip only): the WHOLE
    # batch — raygen, every bounce's trace + shade + occlusion, resolve —
    # as ONE program. This is the multi-traversal program shape this
    # backend is documented to miscompile (module docstring), but the
    # trace program already carries mask-kernel + traversal Pallas calls
    # and runs fine, so the law may really be about shading fused BETWEEN
    # traversal kernels at specific shapes. Cutting 7 programs → 1 is
    # worth ~0.24 s of dispatch baseline on the bunny bench (~+25%) if it
    # compiles clean — qualify with an expendable-subprocess hardware A/B
    # before ever defaulting it on.
    def whole_batch_body(ds, accel, pox, cam, seed, sample0):
        state = raygen_body(pox, cam, seed, sample0)
        for bounce in range(config.max_bounces + 1):
            hit, state = _trace_body(
                ds, accel, state,
                wave="primary" if bounce == 0 else "bounce",
            )
            state, shadow = shade_body(
                ds, accel, pox, state, hit, seed, sample0,
                jnp.uint32(bounce)
            )
            if shadow is not None:
                state = occlude_body(ds, accel, state, shadow,
                                     jnp.uint32(bounce))
        return _to_raster(pox, *resolve_body(state))

    whole_batch = (_cjit(whole_batch_body, "whole_batch")
                   if mesh is None else None)

    # ---- sorted-wave pipeline (TPURT_SORTED_WAVE; single-chip) ----
    # The per-trace sort machinery inside the intersector measured
    # ~100 ms/trace at bunny bench scale (9-operand forward sort 24.9 ms
    # + 5/2-operand restore sorts 16–18/8.7 ms, ×2 traces per bounce —
    # benchmarks/probe_trace_machinery.py). This pipeline replaces the
    # four per-bounce sorts with ONE payload-through lax.sort: the
    # shade_occlude stage ends by permuting the NEXT wave (rays + their
    # radiance/throughput/ids) into octant+origin-Morton order with dead
    # rays at the back; the bounce trace then runs sort-free on the
    # presorted wave (wave="presorted" → exact mask stays on), the
    # shadow trace rides the current order, and nothing is ever
    # un-permuted — resolve maps rays to pixels through the carried
    # ``pix``/``ds`` ids with one 4-operand sort.
    from tpurt.kernels.tilewave import BIG as _BIG
    from tpurt.kernels.tilewave import _octant_sort_keys

    def _sort_wave(accel, state: WaveState) -> WaveState:
        """Permute the wave into next-trace coherence order (payload-
        through: 15-operand single sort; alive/allow_emission/ds pack
        into one u32 lane)."""
        lo_all = jnp.min(accel.cluster_lo, axis=0)
        hi_all = jnp.max(accel.cluster_hi, axis=0)
        tmv = jnp.where(state.alive, _BIG, -1.0)
        keys = _octant_sort_keys(
            state.org, state.dirn, tmv, lo_all, hi_all
        )
        flags = (
            state.alive.astype(jnp.uint32)
            | (state.allow_emission.astype(jnp.uint32) << 1)
            | (state.ds << 2)
        )
        (_, ox, oy, oz, dx, dy, dz, r0, r1, r2, t0, t1, t2, pix,
         fl) = jax.lax.sort(
            (keys,
             state.org[:, 0], state.org[:, 1], state.org[:, 2],
             state.dirn[:, 0], state.dirn[:, 1], state.dirn[:, 2],
             state.radiance[:, 0], state.radiance[:, 1],
             state.radiance[:, 2],
             state.throughput[:, 0], state.throughput[:, 1],
             state.throughput[:, 2],
             state.pix, flags),
            num_keys=1,
        )
        return WaveState(
            org=jnp.stack([ox, oy, oz], axis=1),
            dirn=jnp.stack([dx, dy, dz], axis=1),
            radiance=jnp.stack([r0, r1, r2], axis=1),
            throughput=jnp.stack([t0, t1, t2], axis=1),
            alive=(fl & 1) == 1,
            allow_emission=(fl & 2) == 2,
            pix=pix,
            ds=fl >> 2,
            rays=state.rays,
        )

    def shade_occlude_sorted_body(ds, accel, pox, state, hit, seed,
                                  sample0, bounce, last=False, cap=0):
        """Sorted-mode fused stage: shade + occlude in the carried order,
        then (mid bounces) the payload-through sort of the NEXT wave.

        ``cap`` (static, live-wave truncation): keep only the first
        ``cap`` rays of the sorted wave — dead rays sort to the back, so
        with a cap ≥ the wave's live count this drops only dead rays and
        every later stage (sorts, masks, expansion, kernel launches)
        shrinks to the live prefix. The dropped tail's radiance/ids are
        returned for resolve; any ALIVE ray past the cap is counted into
        the live_overflow slot (render_scene re-renders uncapped — a
        truncated wave never silently survives, same contract as the
        pair budgets)."""
        state, shadow = shade_body(ds, accel, pox, state, hit, seed,
                                   sample0, bounce, presorted=True)
        if config.use_nee:
            state = occlude_body(ds, accel, state, shadow, bounce,
                                 presorted=True)
        live = jnp.sum(state.alive.astype(jnp.float32))
        state = state._replace(
            rays=state.rays.at[4 + bounce.astype(jnp.int32)].add(live)
        )
        if last:
            return state, None
        state = _sort_wave(accel, state)
        if cap:
            over = jnp.sum(state.alive[cap:].astype(jnp.float32))
            tail = (state.radiance[cap:], state.pix[cap:],
                    state.ds[cap:])
            state = WaveState(
                org=state.org[:cap],
                dirn=state.dirn[:cap],
                radiance=state.radiance[:cap],
                throughput=state.throughput[:cap],
                alive=state.alive[:cap],
                allow_emission=state.allow_emission[:cap],
                pix=state.pix[:cap],
                ds=state.ds[:cap],
                rays=state.rays.at[3].add(over),
            )
            return state, tail
        return state, None

    def resolve_sorted_body(state: WaveState, tails=()):
        """Permutation-independent resolve: rays → (pixel, sample) by the
        carried ids; per-pixel sample sums run in ds order (s0 + s1 + …,
        the same order as the positional resolve). Pad pixels carry
        pix ≥ w·h, sort to the back, and are sliced off. ``tails`` are
        the truncated waves' (radiance, pix, ds) from the capped
        shade_occlude stages."""
        rad = [state.radiance]
        pix = [state.pix]
        dss = [state.ds]
        for tr, tp, td in tails:
            rad.append(tr)
            pix.append(tp)
            dss.append(td)
        rad = jnp.concatenate(rad) if len(rad) > 1 else rad[0]
        pix = jnp.concatenate(pix) if len(pix) > 1 else pix[0]
        dss = jnp.concatenate(dss) if len(dss) > 1 else dss[0]
        key = pix * spp + dss.astype(jnp.int32)
        _, r, g, b = jax.lax.sort(
            (key, rad[:, 0], rad[:, 1], rad[:, 2]),
            num_keys=1,
        )
        img = jnp.stack([r, g, b], axis=1)[: w * h * spp]
        img = img.reshape(w * h, spp, 3).sum(axis=1)
        return img.reshape(h, w, 3), state.rays

    if mesh is None and hasattr(accel, "cluster_lo"):
        from tpurt.kernels.tilewave import TILE as _TILE

        trace_sorted = _cjit(
            functools.partial(_trace_body, wave="presorted"),
            "trace_presorted",
        )
        # per-bounce shade_occlude stages: mid bounces share ONE wrapper
        # when uncapped; a live cap gives the bounce its own wrapper
        # (static output shapes)
        _so_shared = _cjit(
            shade_occlude_sorted_body, "shade_occlude_sorted"
        )
        _so_last = _cjit(
            functools.partial(shade_occlude_sorted_body, last=True),
            "shade_occlude_sorted_last",
        )
        so_sorted = []
        so_bodies = []  # underlying body per stage (prewarm eval_shape)
        n_cur = n
        for b in range(config.max_bounces + 1):
            if b == config.max_bounces:
                so_sorted.append(_so_last)
                so_bodies.append(functools.partial(
                    shade_occlude_sorted_body, last=True))
                continue
            cap = 0
            if b < len(config.live_caps) and config.live_caps[b] > 0:
                cap = -(-int(config.live_caps[b]) // _TILE) * _TILE
                if cap >= n_cur:
                    cap = 0
            if cap:
                body_b = functools.partial(shade_occlude_sorted_body,
                                           cap=cap)
                so_sorted.append(_cjit(
                    body_b, f"shade_occlude_sorted_b{b}",
                ))
                so_bodies.append(body_b)
                n_cur = cap
            else:
                so_sorted.append(_so_shared)
                so_bodies.append(shade_occlude_sorted_body)
        resolve_sorted = _cjit(resolve_sorted_body, "resolve_sorted")
    else:
        trace_sorted = None

    import os
    import time

    # default ON: 9.27 vs 8.91 Mrays/s unfused on the hardware bunny bench
    # (benchmarks/ab_results.jsonl); bit-exact vs the unfused path
    fuse = os.environ.get("TPURT_FUSE_STAGES", "1") == "1"
    fuse_bounces = os.environ.get("TPURT_FUSE_BOUNCES", "0") == "1"
    debug = os.environ.get("TPURT_DEBUG_STAGES") == "1"
    # TPURT_CAPTURE_WAVES=<dir>: dump the real inter-stage waves (bounce
    # ray states + shadow tuples) as .npz for offline kernel/machinery
    # decomposition probes (benchmarks/probe_occl_decomp.py). Forces the
    # unfused path; D2H reads poison later dispatch (PARITY law 1), so
    # capture runs are for data only, never timing.
    capture = os.environ.get("TPURT_CAPTURE_WAVES")
    if capture:
        fuse = fuse_bounces = False
    # sorted-wave pipeline gate (see block above): single-chip tile-accel
    # configs only; config default rides RenderConfig.sorted_wave, env
    # forces for A/B
    use_sorted = (
        trace_sorted is not None
        and not capture
        and not fuse_bounces
        and os.environ.get(
            "TPURT_SORTED_WAVE",
            "1" if getattr(config, "sorted_wave", False) else "0",
        ) == "1"
    )

    def _capture(name, **arrays):
        if capture:
            os.makedirs(capture, exist_ok=True)
            np.savez(
                os.path.join(capture, name + ".npz"),
                **{k: np.asarray(v) for k, v in arrays.items()},
            )

    def _dbg(name, value):
        if debug:
            t0 = time.perf_counter()
            jax.block_until_ready(value)
            print(f"    [stage] {name}: {time.perf_counter() - t0:.2f}s",
                  flush=True)

    def render_batch(cam, seed, sample0):
        if (fuse_bounces and whole_batch is not None
                and config.shading_mode != "flat"):
            return whole_batch(ds, accel, pox, cam, seed, sample0)
        if use_sorted and config.shading_mode != "flat":
            hit = state = None
            tails = []
            for bounce in range(config.max_bounces + 1):
                if bounce == 0:
                    hit, state = raygen_trace0(ds, accel, pox, cam,
                                               seed, sample0)
                else:
                    hit, state = trace_sorted(ds, accel, state)
                _dbg(f"trace[{bounce}]", hit.t)
                state, tail = so_sorted[bounce](
                    ds, accel, pox, state, hit, seed, sample0,
                    jnp.uint32(bounce)
                )
                if tail is not None:
                    tails.append(tail)
                _dbg(f"shade_occlude[{bounce}]", state.radiance)
            return resolve_sorted(state, tuple(tails))
        if fuse and config.shading_mode != "flat":
            hit = state = None
            for bounce in range(config.max_bounces + 1):
                if bounce == 0:
                    hit, state = raygen_trace0(ds, accel, pox, cam,
                                               seed, sample0)
                else:
                    hit, state = traceN_by[bounce](ds, accel, state)
                _dbg(f"trace[{bounce}]", hit.t)
                state = shade_occlude_by[bounce](
                    ds, accel, pox, state, hit, seed, sample0,
                    jnp.uint32(bounce))
                _dbg(f"shade_occlude[{bounce}]", state.radiance)
            return resolve(pox, state)
        state = raygen(pox, cam, seed, sample0)
        _dbg("raygen", state.org)
        if config.shading_mode == "flat":
            hit, state = trace0(ds, accel, state)
            return _flat_resolve(ds, accel, pox, state, hit)
        for bounce in range(config.max_bounces + 1):
            if capture and bounce > 0:
                _capture(f"bounce{bounce}_wave", org=state.org,
                         dirn=state.dirn, alive=state.alive)
            hit, state = (trace0 if bounce == 0 else traceN)(
                ds, accel, state
            )
            _dbg(f"trace[{bounce}]", hit.t)
            b = jnp.uint32(bounce)
            state, shadow = shade(ds, accel, pox, state, hit, seed,
                                  sample0, b)
            _dbg(f"shade[{bounce}]", state.radiance)
            if shadow is not None:
                if capture:
                    _capture(f"shadow{bounce}_wave", org=shadow[0],
                             dirn=shadow[1], tmax=shadow[2],
                             want=shadow[4])
                state = occlude(ds, accel, state, shadow, b)
                _dbg(f"occlude[{bounce}]", state.radiance)
        return resolve(pox, state)

    def prewarm(cam, seed=0, sample0=0):
        """Compile (or AOT-load) every stage executable of the ACTIVE
        pipeline path concurrently, before the first batch runs.

        The remote Mosaic compile service accepts parallel requests
        (benchmarks/probe_par_compile.py: 6.35x thread concurrency), so
        a cold start pays ~max(stage compile) instead of the sum —
        the round-2/3 cold bunny warmup was 500–1800 s of SEQUENTIAL
        stage compiles. Stage argument avals are derived by chaining
        jax.eval_shape through the stage bodies; seed/sample0 must be
        Python ints exactly like render_scene's real calls (the AOT
        cache keys on argument avals). Returns the number of stage
        executables made ready, 0 when prewarm does not apply (mesh
        mode, flat shading, CPU, cache disabled)."""
        from tpurt.utils import aotcache

        if mesh is not None or config.shading_mode == "flat":
            return 0
        if not aotcache.enabled():
            return 0
        b0 = jnp.uint32(0)
        jobs = []  # (cached_jit wrapper, args)
        if fuse_bounces and whole_batch is not None:
            jobs.append(
                (whole_batch, (ds, accel, pox, cam, seed, sample0)))
        elif use_sorted:
            hs, ss = jax.eval_shape(
                raygen_trace0_body, ds, accel, pox, cam, seed, sample0)
            jobs.append(
                (raygen_trace0, (ds, accel, pox, cam, seed, sample0)))
            trace_sorted_body = functools.partial(
                _trace_body, wave="presorted")
            tails = []
            for b in range(config.max_bounces + 1):
                if b > 0:
                    jobs.append((trace_sorted, (ds, accel, ss)))
                    hs, ss = jax.eval_shape(
                        trace_sorted_body, ds, accel, ss)
                jobs.append(
                    (so_sorted[b], (ds, accel, pox, ss, hs, seed,
                                    sample0, b0)))
                ss, tail = jax.eval_shape(
                    so_bodies[b], ds, accel, pox, ss, hs, seed, sample0,
                    b0)
                if tail is not None:
                    tails.append(tail)
            jobs.append((resolve_sorted, (ss, tuple(tails))))
        elif fuse:
            hs, ss = jax.eval_shape(
                raygen_trace0_body, ds, accel, pox, cam, seed, sample0)
            jobs.append(
                (raygen_trace0, (ds, accel, pox, cam, seed, sample0)))
            # per-bounce capped wrappers dedupe by identity (equal caps
            # share one executable); capped traces keep full-shape
            # outputs, so one aval chain serves them all
            for w in dict.fromkeys(traceN_by[1:]):
                jobs.append((w, (ds, accel, ss)))
            for w in dict.fromkeys(shade_occlude_by):
                jobs.append(
                    (w, (ds, accel, pox, ss, hs, seed, sample0, b0)))
            jobs.append((resolve, (pox, ss)))
        else:
            ss = jax.eval_shape(raygen_body, pox, cam, seed, sample0)
            jobs.append((raygen, (pox, cam, seed, sample0)))
            jobs.append((trace0, (ds, accel, ss)))
            hs, ss1 = jax.eval_shape(
                functools.partial(_trace_body, wave="primary"),
                ds, accel, ss)
            jobs.append((traceN, (ds, accel, ss)))
            jobs.append(
                (shade, (ds, accel, pox, ss1, hs, seed, sample0, b0)))
            ss2, shadow = jax.eval_shape(
                shade_body, ds, accel, pox, ss1, hs, seed, sample0, b0)
            if shadow is not None:
                jobs.append((occlude, (ds, accel, ss2, shadow, b0)))
            jobs.append((resolve, (pox, ss2)))

        runnable = [(fnw, a) for fnw, a in jobs
                    if getattr(fnw, "prewarm", None) is not None]
        if not runnable:
            return 0
        import concurrent.futures as _cf

        with _cf.ThreadPoolExecutor(max_workers=len(runnable)) as ex:
            done = list(ex.map(
                lambda job: job[0].prewarm(*job[1]), runnable))
        return sum(bool(d) for d in done)

    render_batch.prewarm = prewarm

    def _flat_resolve_body(ds, accel, pox, state: WaveState, hit):
        attrs = materials.make_resolver(
            ds, accel, texture_filter=config.texture_filter)(
            state.org, state.dirn, hit.t, hit.u, hit.v, hit.tri,
            hit.inst, hit.slot,
        )
        radiance = jnp.where(
            hit.valid[:, None], attrs.albedo, ds.background
        )
        return resolve(pox, state._replace(radiance=radiance))

    _flat_resolve = _cjit(_flat_resolve_body, "flat_resolve")

    return render_batch
