"""Vector math and intersection primitives, pure jnp.

TPU-first design notes:
  * Everything is SoA-friendly and broadcasting-based: all functions accept
    arbitrary leading batch dimensions with a trailing 3-axis, so they lower
    to dense VPU element-wise ops under jit — no per-ray Python control flow.
  * These are the jnp reference twins for the Pallas kernels in
    ``tpurt.kernels`` (SURVEY.md §4 test strategy: kernel-vs-twin testing).

Parity (SURVEY.md §2.2; reference mount empty, see SURVEY.md §0):
  * ``intersect_tris``  — G2 triangle intersection (Möller–Trumbore, the math
    the reference's hardware `traceRayEXT` performs).
  * ``ray_aabb``        — G2 BVH slab test.
  * ``reflect/refract`` — G3 closest-hit shading math (mirror/dielectric,
    BASELINE.json configs 3–4).
"""

from __future__ import annotations

import jax.numpy as jnp

# A conservative epsilon for f32 geometry. Rays are offset by EPS_RAY along
# the surface normal when respawned to avoid self-intersection.
EPS_DENOM = 1e-9
EPS_RAY = 1e-4


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis, keeps no dims."""
    return jnp.sum(a * b, axis=-1)


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Normalize over the trailing axis (safe for zero vectors)."""
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(dot(v, v), eps)))[..., None]


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of direction ``d`` about normal ``n``."""
    return d - 2.0 * dot(d, n)[..., None] * n


def refract(d: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray):
    """Snell refraction of unit direction ``d`` about unit normal ``n``.

    ``eta`` = n_incident / n_transmitted. Returns ``(t, tir)`` where ``t`` is
    the refracted direction (garbage when ``tir``) and ``tir`` flags total
    internal reflection. ``d`` must point *into* the surface (dot(d, n) < 0).
    """
    eta = jnp.asarray(eta)
    cos_i = -dot(d, n)
    sin2_t = (eta**2) * jnp.maximum(0.0, 1.0 - cos_i**2)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    t = eta[..., None] * d + (eta * cos_i - cos_t)[..., None] * n
    return normalize(t), tir


def schlick_fresnel(cos_i: jnp.ndarray, ior_i: jnp.ndarray, ior_t: jnp.ndarray):
    """Schlick's approximation to the Fresnel reflectance."""
    r0 = ((ior_i - ior_t) / (ior_i + ior_t)) ** 2
    return r0 + (1.0 - r0) * (1.0 - jnp.abs(cos_i)) ** 5


def build_onb(n: jnp.ndarray):
    """Branchless orthonormal basis from a unit normal (Duff et al. 2017).

    Returns ``(t, b)`` tangent and bitangent with the same batch shape as
    ``n``. Fully element-wise — ideal for the VPU.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def safe_inv_dir(d: jnp.ndarray) -> jnp.ndarray:
    """Reciprocal of a ray direction with sign-preserving clamp away from 0.

    Avoids inf*0=nan inside the slab test while keeping the test conservative
    (a clamped axis yields a huge slab interval, never a false miss).
    """
    tiny = 1e-12
    d_safe = jnp.where(jnp.abs(d) < tiny, jnp.where(d >= 0.0, tiny, -tiny), d)
    return 1.0 / d_safe


def ray_aabb(
    org: jnp.ndarray,
    inv_dir: jnp.ndarray,
    bmin: jnp.ndarray,
    bmax: jnp.ndarray,
    t_min: jnp.ndarray,
    t_max: jnp.ndarray,
):
    """Slab test: does the ray hit the AABB within (t_min, t_max)?

    All args broadcast; ``inv_dir`` must come from :func:`safe_inv_dir`.
    Returns a boolean mask. [SURVEY.md §2.2 G2 — ray-AABB slab tests]
    """
    t0 = (bmin - org) * inv_dir
    t1 = (bmax - org) * inv_dir
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_max)


def intersect_tris(
    org: jnp.ndarray,
    dirn: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    t_min: jnp.ndarray,
    t_max: jnp.ndarray,
):
    """Möller–Trumbore ray/triangle intersection, double-sided.

    All inputs broadcast over leading dims with trailing 3-axis; e.g. pass
    ``org[:, None, :]`` against ``v0[None, :, :]`` for an all-pairs test.

    Returns ``(t, u, v, hit)``: distance, barycentrics, and a hit mask.
    Misses have undefined t/u/v — always gate on ``hit``.
    [SURVEY.md §2.2 G2 — Möller–Trumbore; BASELINE.json:5]
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(dirn, e2)
    det = dot(e1, pvec)
    # Double-sided: reject only near-degenerate determinants.
    valid = jnp.abs(det) > EPS_DENOM
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    tvec = org - v0
    u = dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = dot(dirn, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (
        valid
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, u, v, hit


def closest_hit_brute_force(org, dirn, v0, v1, v2, t_min, t_max):
    """O(N_rays × N_tris) closest-hit reference (the "no BVH" oracle).

    org/dirn: (R, 3); v0/v1/v2: (T, 3). Returns ``(t, u, v, tri_id, hit)``
    each of shape (R,). This is the ground truth the BVH traversal kernels
    are property-tested against (SURVEY.md §4.2) and the renderer for the
    hello-triangle / Cornell configs where T is tiny (BASELINE.json:7–8).
    """
    t, u, v, hit = intersect_tris(
        org[:, None, :],
        dirn[:, None, :],
        v0[None, :, :],
        v1[None, :, :],
        v2[None, :, :],
        t_min[:, None],
        t_max[:, None],
    )
    t_masked = jnp.where(hit, t, jnp.inf)
    tri_id = jnp.argmin(t_masked, axis=1)
    r = jnp.arange(org.shape[0])
    any_hit = jnp.any(hit, axis=1)
    return (
        t_masked[r, tri_id],
        u[r, tri_id],
        v[r, tri_id],
        tri_id,
        any_hit,
    )
