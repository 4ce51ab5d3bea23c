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
from tpurt.utils.config import RenderConfig


class WaveState(NamedTuple):
    """Inter-stage SoA path state (flattened samples × pixels)."""

    org: jnp.ndarray  # (N, 3)
    dirn: jnp.ndarray  # (N, 3)
    radiance: jnp.ndarray  # (N, 3)
    throughput: jnp.ndarray  # (N, 3)
    alive: jnp.ndarray  # (N,) bool
    allow_emission: jnp.ndarray  # (N,) bool
    rays: jnp.ndarray  # (3,) f32 [closest, shadow, overflow] counters


def make_staged_renderer(ds, accel, *, meta: SceneMeta,
                         config: RenderConfig):
    """Build the per-stage jitted functions for a scene + config.

    Returns ``render_batch(cam, seed, sample0) -> ((H, W, 3) sum,
    (2,) counts)`` whose results match integrator.render_batch bit-for-bit
    up to float reassociation. The camera/scene/accel are ARGUMENTS of the
    compiled stages (not closure constants) so flythrough frames reuse the
    executables and no device constant is ever read back to host.
    """
    w, h = config.width, config.height
    spp = config.spp_per_batch
    # host numpy pixel orders (closure constants embedded from host bytes)
    px, py = full_frame_pixels_tiled(w, h)
    px = np.asarray(px)
    py = np.asarray(py)
    px_r = np.tile(px, spp)
    py_r = np.tile(py, spp)
    pixel_id = (
        py_r.astype(np.uint32) * np.uint32(w) + px_r.astype(np.uint32)
    )
    n = pixel_id.shape[0]
    linear = py.astype(np.int32) * w + px.astype(np.int32)

    def _sampler(seed, sample0):
        sample_idx = jnp.asarray(sample0, jnp.uint32) + jnp.repeat(
            jnp.arange(spp, dtype=jnp.uint32), px.shape[0]
        )
        return PixelSampler.make(seed, sample_idx, pixel_id)

    @jax.jit
    def raygen(cam: Camera, seed, sample0) -> WaveState:
        sampler = _sampler(seed, sample0)
        uj = sampler.u2(TAG_JITTER)
        org, dirn = camera_rays(
            cam, px_r, py_r, w, h, jitter=(uj[..., 0], uj[..., 1])
        )
        return WaveState(
            org=org,
            dirn=dirn,
            radiance=jnp.zeros((n, 3), jnp.float32),
            throughput=jnp.ones((n, 3), jnp.float32),
            alive=jnp.ones(n, bool),
            allow_emission=jnp.ones(n, bool),
            rays=jnp.zeros(3, jnp.float32),
        )

    @jax.jit
    def trace(ds, accel, state: WaveState):
        """Stage with exactly ONE Pallas call (closest hit)."""
        closest, _ = make_intersectors(ds, accel, meta=meta, config=config)
        rays = state.rays.at[0].add(
            jnp.sum(state.alive.astype(jnp.float32))
        )
        tmax = jnp.where(state.alive, jnp.inf, -1.0)
        if hasattr(closest, "with_stats"):
            hit, tstats = closest.with_stats(
                state.org, state.dirn, 0.0, tmax
            )
            rays = rays.at[2].add(tstats[1])
        else:
            hit = closest(state.org, state.dirn, 0.0, tmax)
        return hit, state._replace(rays=rays)

    @jax.jit
    def shade(ds, accel, state: WaveState, hit, seed, sample0, bounce):
        """Pure-XLA stage: miss/emission events, NEE shadow-ray setup,
        bounce sampling. ``bounce`` is a device scalar — one executable
        serves every bounce depth."""
        sampler = _sampler(seed, sample0)
        resolver = materials.make_resolver(ds, accel)
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
            shadow_org = materials.bounce_origin(attrs, jnp.ones(n))
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
            rays=state.rays,
        )
        return new, shadow

    @jax.jit
    def occlude(ds, accel, state: WaveState, shadow):
        """Stage with exactly ONE Pallas call (shadow/any-hit)."""
        _, any_hit = make_intersectors(ds, accel, meta=meta, config=config)
        s_org, s_dir, s_tmax, contrib, want = shadow
        rays = state.rays.at[1].add(jnp.sum(want.astype(jnp.float32)))
        if hasattr(any_hit, "with_stats"):
            occluded, tstats = any_hit.with_stats(s_org, s_dir, 0.0, s_tmax)
            rays = rays.at[2].add(tstats[1])
        else:
            occluded = any_hit(s_org, s_dir, 0.0, s_tmax)
        radiance = state.radiance + jnp.where(
            (want & ~occluded)[:, None], contrib, 0.0
        )
        return state._replace(radiance=radiance, rays=rays)

    @jax.jit
    def resolve(state: WaveState):
        """Per-pixel sums in row-major image layout + ray counters.

        The tile→raster permutation rides a 4-operand lax.sort: XLA
        scatter cost ~19 ms per batch here, sort ~2 ms (the axon
        gather/scatter-vs-sort law, PARITY.md)."""
        total = state.radiance.reshape(spp, px.shape[0], 3).sum(axis=0)
        _, r, g, b = jax.lax.sort(
            (jnp.asarray(linear), total[:, 0], total[:, 1],
             total[:, 2]),
            num_keys=1,
        )
        return jnp.stack([r, g, b], axis=1).reshape(h, w, 3), state.rays

    import os
    import time

    debug = os.environ.get("TPURT_DEBUG_STAGES") == "1"

    def _dbg(name, value):
        if debug:
            t0 = time.perf_counter()
            jax.block_until_ready(value)
            print(f"    [stage] {name}: {time.perf_counter() - t0:.2f}s",
                  flush=True)

    def render_batch(cam, seed, sample0):
        state = raygen(cam, seed, sample0)
        _dbg("raygen", state.org)
        if config.shading_mode == "flat":
            hit, state = trace(ds, accel, state)
            return _flat_resolve(ds, accel, state, hit)
        for bounce in range(config.max_bounces + 1):
            hit, state = trace(ds, accel, state)
            _dbg(f"trace[{bounce}]", hit.t)
            b = jnp.uint32(bounce)
            state, shadow = shade(ds, accel, state, hit, seed, sample0, b)
            _dbg(f"shade[{bounce}]", state.radiance)
            if shadow is not None:
                state = occlude(ds, accel, state, shadow)
                _dbg(f"occlude[{bounce}]", state.radiance)
        return resolve(state)

    @jax.jit
    def _flat_resolve(ds, accel, state: WaveState, hit):
        attrs = materials.make_resolver(ds, accel)(
            state.org, state.dirn, hit.t, hit.u, hit.v, hit.tri,
            hit.inst, hit.slot,
        )
        radiance = jnp.where(
            hit.valid[:, None], attrs.albedo, ds.background
        )
        return resolve(state._replace(radiance=radiance))

    return render_batch
