"""Monte-Carlo sampling helpers + RNG key discipline (SURVEY.md §7 step 1).

RNG discipline: one base threefry key per render; per sample-batch key =
``jax.random.fold_in(base, batch_index)``; inside a batch, shaped draws cover
all rays at once (no per-ray splitting — stays dense on the VPU). Fixed base
key ⇒ bit-identical framebuffers across runs (SURVEY.md §4.4 determinism).

The Pallas wavefront kernels use ``pltpu.prng_*`` seeded from the same fold-in
value; determinism tests compare only same-backend runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_key(base_key: jax.Array, batch_index) -> jax.Array:
    """Key for one progressive sample batch (SURVEY.md §3.5 FrameState)."""
    return jax.random.fold_in(base_key, batch_index)


def uniform2(key: jax.Array, shape) -> jnp.ndarray:
    """(… , 2) uniforms in [0, 1) — pixel jitter / BSDF sampling."""
    return jax.random.uniform(key, tuple(shape) + (2,), dtype=jnp.float32)


def cosine_hemisphere(u: jnp.ndarray):
    """Cosine-weighted hemisphere sample about +z from uniforms u (..., 2).

    Returns (dir_local, pdf). pdf = cos_theta / pi. Used by the Lambertian
    bounce (BASELINE.json:8,10).
    """
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 0]))
    d = jnp.stack([x, y, z], axis=-1)
    pdf = z / jnp.pi
    return d, pdf


def uniform_sphere(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the unit sphere from uniforms u (..., 2)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def to_world(d_local: jnp.ndarray, t: jnp.ndarray, b: jnp.ndarray,
             n: jnp.ndarray) -> jnp.ndarray:
    """Rotate a local (+z = normal) direction into the world frame."""
    return (
        d_local[..., 0:1] * t
        + d_local[..., 1:2] * b
        + d_local[..., 2:3] * n
    )


def power_heuristic(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """MIS power heuristic (beta=2) — used when combining NEE + BSDF sampling."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)
