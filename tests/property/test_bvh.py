"""BVH property tests (SURVEY.md §4.2): structural invariants + traversal
equivalence against the brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh.lbvh import build_lbvh, tri_aabbs
from tpurt.bvh.two_level import build_scene_accel, make_two_level_intersector
from tpurt.render.intersectors import make_brute_force, scene_meta
from tpurt.scene.device import to_device
from tpurt.scene.procedural import bunny_standin, cornell_box, hello_triangle


def random_tris(rng, n, spread=10.0, size=1.0):
    c = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v0 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    v1 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    v2 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    return jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)


def walk_bvh(bvh):
    """Host-side recursive check of the flattened preorder layout. Returns
    the set of (first, count) leaf ranges discovered."""
    bmin = np.asarray(bvh.bmin)
    bmax = np.asarray(bvh.bmax)
    first = np.asarray(bvh.first)
    count = np.asarray(bvh.count)
    skip = np.asarray(bvh.skip)
    n_active = int(bvh.n_active)

    leaves = []

    def visit(node):
        """Returns the skip (one-past-subtree) of this node."""
        assert 0 <= node < n_active
        if count[node] > 0:
            leaves.append((int(first[node]), int(count[node])))
            return skip[node]
        # internal: children are node+1 .. ; subtree ends at skip[node]
        child = node + 1
        while child < skip[node]:
            # child AABB contained in parent AABB
            assert (bmin[node] <= bmin[child] + 1e-5).all(), (node, child)
            assert (bmax[node] >= bmax[child] - 1e-5).all(), (node, child)
            child = visit(child)
        assert child == skip[node]
        return skip[node]

    end = visit(0)
    assert end == n_active
    return leaves


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 257])
@pytest.mark.parametrize("leaf_size", [1, 4])
def test_lbvh_invariants(rng, n, leaf_size):
    v0, v1, v2 = random_tris(rng, n)
    bvh = build_lbvh(*tri_aabbs(v0, v1, v2), leaf_size=leaf_size)
    leaves = walk_bvh(bvh)
    # every sorted slot appears in exactly one leaf range
    covered = np.zeros(n, np.int32)
    for f, c in leaves:
        covered[f : f + c] += 1
    assert (covered == 1).all(), "leaf ranges must partition the prims"
    if leaf_size == 1 and n > 1:
        assert all(c == 1 for _, c in leaves)
    assert max(c for _, c in leaves) <= max(
        leaf_size, 1
    ), "no leaf may exceed leaf_size"
    # permutation is a bijection
    perm = np.asarray(bvh.perm)
    assert sorted(perm.tolist()) == list(range(n))
    # leaf AABBs actually contain their primitives
    pb_min, pb_max = map(np.asarray, tri_aabbs(v0, v1, v2))
    bmin = np.asarray(bvh.bmin)
    bmax = np.asarray(bvh.bmax)
    first = np.asarray(bvh.first)
    count = np.asarray(bvh.count)
    for node in range(int(bvh.n_active)):
        for k in range(count[node]):
            prim = perm[first[node] + k]
            assert (bmin[node] <= pb_min[prim] + 1e-5).all()
            assert (bmax[node] >= pb_max[prim] - 1e-5).all()


def test_lbvh_duplicate_centroids(rng):
    """Degenerate Morton input (identical codes) must still build a valid
    tree via the index tie-break."""
    v0 = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]]), (33, 1))
    v1 = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (33, 1))
    v2 = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (33, 1))
    bvh = build_lbvh(*tri_aabbs(v0, v1, v2), leaf_size=4)
    leaves = walk_bvh(bvh)
    covered = np.zeros(33, np.int32)
    for f, c in leaves:
        covered[f : f + c] += 1
    assert (covered == 1).all()


def _scene_intersectors(scene, leaf_size=4):
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_scene_accel(ds, meta, leaf_size=leaf_size)
    bf_closest, bf_any = make_brute_force(ds, meta)
    bvh_closest, bvh_any = make_two_level_intersector(ds, accel, leaf_size)
    return ds, bf_closest, bf_any, bvh_closest, bvh_any


def _random_rays(rng, n, lo, hi):
    span = np.asarray(hi) - np.asarray(lo)
    org = (rng.uniform(size=(n, 3)) * span * 1.6 + lo - 0.3 * span).astype(
        np.float32
    )
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


@pytest.mark.parametrize("scene_fn,lo,hi", [
    (hello_triangle, (-1, -1, -1), (1, 1, 1)),
    (lambda: cornell_box(False), (0, 0, 0), (555, 555, 555)),
])
def test_traversal_matches_brute_force(rng, scene_fn, lo, hi):
    scene = scene_fn()
    ds, bf_closest, bf_any, bvh_closest, bvh_any = _scene_intersectors(scene)
    org, d = _random_rays(rng, 512, lo, hi)
    hb = bf_closest(org, d, 0.0, jnp.inf)
    hv = bvh_closest(org, d, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hv.valid))
    m = np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-4, atol=1e-4
    )
    # same triangle+instance except at exact-tie distances
    same = (np.asarray(hb.tri)[m] == np.asarray(hv.tri)[m]) & (
        np.asarray(hb.inst)[m] == np.asarray(hv.inst)[m]
    )
    close_t = np.isclose(
        np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-4, atol=1e-4
    )
    assert (same | close_t).all()
    # any-hit occlusion agrees
    ab = np.asarray(bf_any(org, d, 0.0, jnp.full(org.shape[0], 100.0)))
    av = np.asarray(bvh_any(org, d, 0.0, jnp.full(org.shape[0], 100.0)))
    np.testing.assert_array_equal(ab, av)


def test_traversal_bunny_subset(rng):
    """Mid-size single-instance mesh: BVH vs brute force on a random ray
    set (SURVEY.md §4.2 "traversal(hit set) == brute-force(hit set)")."""
    scene = bunny_standin(subdivisions=3)  # 1280 tris — brute force feasible
    ds, bf_closest, _, bvh_closest, _ = _scene_intersectors(scene)
    org, d = _random_rays(rng, 256, (-6, 0, -6), (6, 6, 6))
    hb = bf_closest(org, d, 0.0, jnp.inf)
    hv = bvh_closest(org, d, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hv.valid))
    m = np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-4, atol=1e-4
    )


def test_two_level_instancing_transforms(rng):
    """A rotated/translated instance must intersect exactly like the same
    geometry baked into world space (two-level correctness, SURVEY.md C9)."""
    from tpurt.scene.types import Instance, Material, Mesh, Scene, make_transform
    from tpurt.scene.device import apply_transform

    v = rng.normal(size=(30, 3)).astype(np.float32)
    idx = np.arange(30, dtype=np.int32).reshape(10, 3)
    xform = make_transform((1.5, -2.0, 3.0), rotate_y=0.7, scale=1.7)

    s_inst = Scene()
    s_inst.add_material(Material())
    mid = s_inst.add_mesh(Mesh(v.copy(), idx, 0))
    s_inst.add_instance(Instance(mid, xform))

    s_baked = Scene()
    s_baked.add_material(Material())
    mid2 = s_baked.add_mesh(Mesh(apply_transform(xform, v), idx, 0))
    s_baked.add_instance(Instance(mid2))

    _, _, _, inst_closest, _ = _scene_intersectors(s_inst)
    _, _, _, baked_closest, _ = _scene_intersectors(s_baked)
    org, d = _random_rays(rng, 256, (-4, -6, -1), (6, 2, 7))
    hi_ = inst_closest(org, d, 0.0, jnp.inf)
    hb_ = baked_closest(org, d, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(hi_.valid), np.asarray(hb_.valid))
    m = np.asarray(hi_.valid)
    np.testing.assert_allclose(
        np.asarray(hi_.t)[m], np.asarray(hb_.t)[m], rtol=2e-4, atol=2e-4
    )
