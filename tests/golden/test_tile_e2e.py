"""End-to-end equivalence of the TPU production path (bvh_tile + packed
shade records) against the brute-force reference pipeline, on CPU in
interpret mode. Guards the whole tilewave + resolve_hit_packed stack.
"""

import numpy as np

from tpurt.render import framebuffer as fb
from tpurt.render import render_scene
from tpurt.utils.config import get_config


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def test_cornell_tile_matches_brute():
    base = dict(width=96, height=96, spp=4)
    s_tile, _ = render_scene(
        get_config("cornell", intersector="bvh_tile", **base)
    )
    s_brute, _ = render_scene(
        get_config("cornell", intersector="brute", **base)
    )
    assert _rmse(fb.resolve(s_tile), fb.resolve(s_brute)) < 1e-4


def test_cornell_pt_tile_matches_brute():
    """Specular path tracing amplifies float-level t differences
    chaotically at low spp (brute vs the two-level BVH differ by rmse
    0.030 at 4 spp on this scene), so this is a sanity band, not an
    exactness check — resolver exactness is covered field-by-field in
    tests/unit/test_shade_records.py."""
    base = dict(width=64, height=64, spp=4)
    s_tile, _ = render_scene(
        get_config("cornell_pt", intersector="bvh_tile", **base)
    )
    s_brute, _ = render_scene(
        get_config("cornell_pt", intersector="brute", **base)
    )
    assert _rmse(fb.resolve(s_tile), fb.resolve(s_brute)) < 0.05


def test_bunny_standin_tile_matches_bvh():
    """Instanced multi-material scene through the tile+packed-record path
    vs the jnp two-level BVH (legacy resolver)."""
    from tpurt.scene.procedural import bunny_standin

    scene = bunny_standin(subdivisions=3)
    base = dict(width=64, height=48, spp=2)
    s_tile, _ = render_scene(
        get_config("bunny", intersector="bvh_tile", **base), scene=scene
    )
    s_bvh, _ = render_scene(
        get_config("bunny", intersector="bvh", **base), scene=scene
    )
    assert _rmse(fb.resolve(s_tile), fb.resolve(s_bvh)) < 1e-3
