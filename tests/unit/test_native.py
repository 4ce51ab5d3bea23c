"""C++ native host runtime vs the pure-Python twins (SURVEY.md §4.1).

Each native entry point (OBJ parse, PNG encode, BVH topology build) is
differential-tested against its Python reference implementation. Skipped
wholesale when the toolchain is unavailable (the framework then runs on
the Python fallbacks — functionality is identical).
"""

import os

import numpy as np
import pytest

from tpurt.utils import native

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


def test_png_roundtrip(tmp_path):
    from tpurt.render.png import read_png

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    path = os.path.join(tmp_path, "native.png")
    assert native.png_write(path, img)
    back = read_png(path)
    np.testing.assert_array_equal(back, img)


def test_obj_parse_matches_python(tmp_path):
    from tpurt.scene.obj import load_obj
    from tpurt.scene.procedural import icosphere
    from tpurt.scene.types import Mesh
    from tpurt.scene.obj import save_obj

    v, idx, vn = icosphere(3)
    mesh = Mesh(v, idx, np.zeros(idx.shape[0], np.int32), normals=vn,
                name="sphere")
    path = os.path.join(tmp_path, "sphere.obj")
    save_obj(path, mesh)

    scene_native = load_obj(path)
    os.environ["TPURT_NO_NATIVE"] = "1"
    try:
        # force a fresh decision in the wrapper (module state caches the
        # lib, but obj_parse checks the env var each call via get_lib)
        native._tried = False
        scene_py = load_obj(path)
    finally:
        del os.environ["TPURT_NO_NATIVE"]
        native._tried = False

    mn, mp = scene_native.meshes[0], scene_py.meshes[0]
    np.testing.assert_allclose(mn.vertices, mp.vertices, rtol=1e-6)
    np.testing.assert_array_equal(mn.indices, mp.indices)
    np.testing.assert_allclose(mn.normals, mp.normals, rtol=1e-6)


def test_obj_parse_quads_and_negative_indices(tmp_path):
    path = os.path.join(tmp_path, "quad.obj")
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("f -4 -3 -2 -1\n")  # negative refs, quad → 2-tri fan
    out = native.obj_parse(path)
    assert out is not None
    verts, normals, tri_v, tri_n, face_mat, names, mtllib = out
    assert verts.shape == (4, 3)
    np.testing.assert_array_equal(tri_v, [[0, 1, 2], [0, 2, 3]])
    assert (tri_n == -1).all()
    assert (face_mat == -1).all()


def _check_tree_invariants(n_items, bmin, bmax, first, count, skip):
    m = first.shape[0]
    assert m == 2 * n_items - 1
    # every item in exactly one leaf
    leaves = first[count > 0]
    assert sorted(leaves.tolist()) == list(range(n_items))
    # skip links: preorder rank + subtree size, root covers everything
    assert skip[0] == m
    assert (skip > np.arange(m)).all()
    # parent boxes contain children (walk: node i internal → children are
    # i+1 and skip[i+1])
    for i in range(m):
        if count[i] > 0:
            continue
        left = i + 1
        right = skip[left]
        for c in (left, right):
            assert (bmin[i] <= bmin[c] + 1e-6).all()
            assert (bmax[i] >= bmax[c] - 1e-6).all()


def test_bvh_build_matches_contract(rng):
    n = 137
    centers = rng.normal(size=(n, 3)).astype(np.float32)
    half = rng.uniform(0.01, 0.3, (n, 3)).astype(np.float32)
    bmin = centers - half
    bmax = centers + half
    out = native.bvh_build(bmin, bmax)
    assert out is not None
    _check_tree_invariants(n, *out)

    # Python twin obeys the same contract
    from tpurt.bvh.cluster import _median_split_tree

    os.environ["TPURT_NO_NATIVE"] = "1"
    try:
        native._tried = False
        t = _median_split_tree(bmin, bmax)
    finally:
        del os.environ["TPURT_NO_NATIVE"]
        native._tried = False
    _check_tree_invariants(n, t.bmin, t.bmax, t.first, t.count, t.skip)
