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
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpurt import materials
from tpurt.core.camera import Camera, camera_rays, full_frame_pixels
from tpurt.core import sampling
from tpurt.core.vecmath import dot
from tpurt.render.intersectors import SceneMeta, make_brute_force, scene_meta
from tpurt.scene.device import DeviceScene, to_device
from tpurt.utils.config import RenderConfig

SHADOW_EPS = 1e-3


def path_trace_rays(
    ds: DeviceScene,
    closest,
    any_hit,
    org: jnp.ndarray,
    dirn: jnp.ndarray,
    key: jax.Array,
    *,
    max_bounces: int,
    use_nee: bool,
    shading_mode: str = "full",
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
    # Emission is credited on camera hits and after specular bounces; NEE
    # covers it after diffuse bounces (no double counting).
    allow_emission = jnp.ones(n, bool)

    for bounce in range(max_bounces + 1):
        hit = closest(org, dirn, 0.0, jnp.inf)
        hit_valid = hit.valid & alive

        # miss shader (G5): background radiance, ray dies
        radiance = radiance + jnp.where(
            (alive & ~hit.valid)[:, None], throughput * ds.background, 0.0
        )

        attrs = materials.resolve_hit(
            ds, org, dirn, hit.t, hit.u, hit.v, hit.tri, hit.inst
        )

        if shading_mode == "flat":
            # hello-triangle: unlit albedo (BASELINE.json:7 "flat shading")
            radiance = radiance + jnp.where(
                hit_valid[:, None], throughput * attrs.albedo, 0.0
            )
            break

        radiance = radiance + jnp.where(
            (hit_valid & allow_emission)[:, None],
            throughput * attrs.emission,
            0.0,
        )

        k_bounce = jax.random.fold_in(key, bounce)
        k_light, k_mat = jax.random.split(k_bounce)

        if use_nee:
            shadow_org = materials.bounce_origin(attrs, jnp.ones(n))
            wi_l, dist_l, l_over_pdf, l_valid = materials.sample_light(
                ds, shadow_org, k_light
            )
            brdf_l = materials.eval_brdf(attrs, -dirn, wi_l)
            cos_s = jnp.maximum(dot(attrs.n_shade, wi_l), 0.0)
            contrib = throughput * brdf_l * cos_s[:, None] * l_over_pdf
            want = (
                hit_valid
                & l_valid
                & (jnp.max(contrib, axis=-1) > 0.0)
            )
            occluded = any_hit(
                shadow_org, wi_l, 0.0, dist_l * (1.0 - SHADOW_EPS)
            )
            radiance = radiance + jnp.where(
                (want & ~occluded)[:, None], contrib, 0.0
            )

        if bounce == max_bounces:
            break

        bs = materials.sample_bounce(attrs, -dirn, k_mat)
        throughput = jnp.where(
            hit_valid[:, None], throughput * bs.weight, throughput
        )
        org = materials.bounce_origin(attrs, bs.offset_sign)
        dirn = bs.wi
        allow_emission = bs.is_specular | (~use_nee)
        alive = hit_valid & (jnp.max(throughput, axis=-1) > 1e-6)

    return radiance


def render_batch(
    ds: DeviceScene,
    cam: Camera,
    key: jax.Array,
    accel=None,
    *,
    meta: SceneMeta,
    config: RenderConfig,
) -> jnp.ndarray:
    """One progressive batch: sum of ``config.spp_per_batch`` radiance
    samples for every pixel. Returns (H, W, 3) f32 (a *sum*, not a mean —
    FrameState divides by its sample count at resolve time).

    ``accel``: a SceneAccel pytree → two-level BVH traversal (G2); None →
    dense brute force (tiny scenes / oracle)."""
    w, h = config.width, config.height
    px, py = full_frame_pixels(w, h)

    if accel is None:
        closest, any_hit = make_brute_force(ds, meta)
    else:
        from tpurt.bvh.two_level import make_two_level_intersector

        closest, any_hit = make_two_level_intersector(
            ds, accel, leaf_size=config.bvh_leaf_size
        )

    def one_sample(s, acc):
        k_s = jax.random.fold_in(key, s)
        k_jitter, k_path = jax.random.split(k_s)
        uj = sampling.uniform2(k_jitter, px.shape)
        org, dirn = camera_rays(
            cam, px, py, w, h, jitter=(uj[:, 0], uj[:, 1])
        )
        radiance = path_trace_rays(
            ds,
            closest,
            any_hit,
            org,
            dirn,
            k_path,
            max_bounces=config.max_bounces,
            use_nee=config.use_nee,
            shading_mode=config.shading_mode,
        )
        return acc + radiance

    total = jax.lax.fori_loop(
        0, config.spp_per_batch, one_sample, jnp.zeros((px.shape[0], 3), jnp.float32)
    )
    return total.reshape(h, w, 3)


@functools.partial(jax.jit, static_argnames=("meta", "config"))
def render_batch_jit(ds, cam, key, accel=None, *, meta, config):
    return render_batch(ds, cam, key, accel, meta=meta, config=config)
