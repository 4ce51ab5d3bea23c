"""Unit tests for core intersection math vs numpy oracles (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.core.vecmath import (
    build_onb,
    closest_hit_brute_force,
    intersect_tris,
    normalize,
    ray_aabb,
    reflect,
    refract,
    safe_inv_dir,
)


def np_moller_trumbore(org, d, v0, v1, v2, t_min=0.0, t_max=np.inf):
    """Scalar numpy oracle."""
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d, e2)
    det = e1 @ p
    if abs(det) < 1e-9:
        return None
    inv = 1.0 / det
    tv = org - v0
    u = (tv @ p) * inv
    q = np.cross(tv, e1)
    v = (d @ q) * inv
    t = (e2 @ q) * inv
    if u < 0 or v < 0 or u + v > 1 or t <= t_min or t >= t_max:
        return None
    return t, u, v


def test_normalize_unit_and_zero():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    out = normalize(v)
    np.testing.assert_allclose(out[0], [0.6, 0.0, 0.8], atol=1e-6)
    assert np.isfinite(np.asarray(out[1])).all()


def test_reflect():
    d = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(reflect(d, n)[0], [1.0, 1.0, 0.0], atol=1e-6)


def test_refract_straight_through():
    d = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    t, tir = refract(d, n, jnp.array([1.0]))
    assert not bool(tir[0])
    np.testing.assert_allclose(t[0], [0.0, -1.0, 0.0], atol=1e-6)


def test_refract_tir():
    # grazing exit from dense medium: eta > 1 and large angle → TIR
    d = normalize(jnp.array([[1.0, -0.1, 0.0]]))
    n = jnp.array([[0.0, 1.0, 0.0]])
    _, tir = refract(d, n, jnp.array([1.5]))
    assert bool(tir[0])


def test_onb_orthonormal(rng):
    n = normalize(jnp.asarray(rng.normal(size=(100, 3)), jnp.float32))
    t, b = build_onb(n)
    for a, c in [(t, b), (t, n), (b, n)]:
        np.testing.assert_allclose(np.sum(np.asarray(a * c), -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(np.asarray(t * t), -1), 1.0, atol=1e-5)


def test_intersect_tris_vs_oracle(rng):
    n = 200
    org = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    v0 = rng.normal(size=(n, 3)).astype(np.float32)
    v1 = v0 + rng.normal(size=(n, 3)).astype(np.float32)
    v2 = v0 + rng.normal(size=(n, 3)).astype(np.float32)
    # aim the first half at a random interior point so hits are plentiful
    b = rng.uniform(0.05, 0.9, size=(n // 2, 2)).astype(np.float32)
    b1 = b[:, 0] * (1 - b[:, 1])
    b2 = b[:, 1] * (1 - b[:, 0])
    target = (
        (1 - b1 - b2)[:, None] * v0[: n // 2]
        + b1[:, None] * v1[: n // 2]
        + b2[:, None] * v2[: n // 2]
    )
    d[: n // 2] = target - org[: n // 2]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, u, v, hit = intersect_tris(
        jnp.asarray(org), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(v1),
        jnp.asarray(v2), jnp.float32(0.0), jnp.float32(np.inf),
    )
    t, u, v, hit = map(np.asarray, (t, u, v, hit))
    n_hits = 0
    for i in range(n):
        ref = np_moller_trumbore(
            org[i].astype(np.float64), d[i].astype(np.float64),
            v0[i].astype(np.float64), v1[i].astype(np.float64),
            v2[i].astype(np.float64),
        )
        if ref is None:
            # allow borderline f32/f64 disagreement only very near edges
            if hit[i]:
                assert min(u[i], v[i], 1 - u[i] - v[i], t[i]) < 1e-3
            continue
        rt, ru, rv = ref
        if not hit[i]:
            assert min(ru, rv, 1 - ru - rv, rt) < 1e-3
            continue
        n_hits += 1
        np.testing.assert_allclose(t[i], rt, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(u[i], ru, rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(v[i], rv, rtol=2e-2, atol=2e-3)
    assert n_hits > 5  # sanity: the test actually exercised hits


def test_intersect_double_sided():
    v0 = jnp.array([[-1.0, -1.0, 0.0]])
    v1 = jnp.array([[1.0, -1.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    for z in (-2.0, 2.0):
        org = jnp.array([[0.0, 0.0, z]])
        d = jnp.array([[0.0, 0.0, -np.sign(z)]])
        *_, hit = intersect_tris(org, d, v0, v1, v2, 0.0, jnp.inf)
        assert bool(hit[0]), f"missed from z={z}"


def test_ray_aabb_basic():
    org = jnp.array([[0.0, 0.0, -5.0]] * 3)
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    inv = safe_inv_dir(d)
    bmin = jnp.array([-1.0, -1.0, -1.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    hit = ray_aabb(org, inv, bmin, bmax, jnp.float32(0.0), jnp.float32(np.inf))
    assert list(np.asarray(hit)) == [True, False, False]


def test_ray_aabb_axis_parallel_inside():
    # ray starts inside the box, parallel to a face (dir has zero components)
    org = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    inv = safe_inv_dir(d)
    hit = ray_aabb(org, inv, jnp.array([-1.0, -1.0, -1.0]),
                   jnp.array([1.0, 1.0, 1.0]), 0.0, jnp.inf)
    assert bool(hit[0])


def test_brute_force_closest_picks_nearest():
    # two parallel triangles, the closer one must win
    mk = lambda z: (
        np.array([-5, -5, z], np.float32),
        np.array([5, -5, z], np.float32),
        np.array([0, 5, z], np.float32),
    )
    tris = [mk(2.0), mk(1.0)]
    v0 = jnp.asarray([t[0] for t in tris])
    v1 = jnp.asarray([t[1] for t in tris])
    v2 = jnp.asarray([t[2] for t in tris])
    org = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, u, v, tri, hit = closest_hit_brute_force(
        org, d, v0, v1, v2, jnp.zeros(1), jnp.full((1,), np.inf)
    )
    assert bool(hit[0]) and int(tri[0]) == 1
    np.testing.assert_allclose(float(t[0]), 4.0, rtol=1e-5)
