"""Alpha-cutout any-hit + masked closest-hit (SURVEY.md G4, VERDICT r2 #6).

The geometric ground truth: with NEAREST sampling, an axis-aligned quad
whose UV grid aligns with the alpha texture's texels is EXACTLY
equivalent to a scene holding only the opaque texels' sub-quads — every
ray kind (primary, shadow, bounce) must agree between the two scenes up
to the fp rounding of the re-trace origin advance.
"""

import numpy as np
import pytest

from tpurt.core.camera import Camera
from tpurt.render import framebuffer as fb
from tpurt.render import render_scene
from tpurt.scene.types import LAMBERT, Instance, Material, Mesh, Scene
from tpurt.utils.config import get_config


def _quad(x0, z0, x1, z1, y, uv=False):
    """Two-triangle horizontal quad at height y (uv spans [0,1]² when
    asked)."""
    v = np.array(
        [[x0, y, z0], [x1, y, z0], [x1, y, z1], [x0, y, z1]], np.float32
    )
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = (np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
           if uv else None)
    return v, idx, uvs


def _base_scene():
    """Ground plane + area light; the cutout quad goes in between."""
    scene = Scene(background=(0.0, 0.0, 0.0))
    ground = scene.add_material(Material(kind=LAMBERT, albedo=(0.7, 0.7, 0.7)))
    light = scene.add_material(
        Material(kind=LAMBERT, albedo=(0, 0, 0), emission=(8.0, 8.0, 8.0))
    )
    v, i, _ = _quad(-4, -4, 4, 4, 0.0)
    scene.add_instance(Instance(scene.add_mesh(
        Mesh(vertices=v, indices=i, material_ids=ground))))
    v, i, _ = _quad(-0.7, -0.7, 0.7, 0.7, 4.0)
    scene.add_instance(Instance(scene.add_mesh(
        Mesh(vertices=v, indices=i, material_ids=light))))
    scene.camera = Camera.make(
        position=(0.0, 3.0, 3.5), look_at=(0.0, 0.0, 0.0), vfov_deg=55.0
    )
    return scene


def _add_cutout_quad(scene, alpha_img, cutoff):
    tex = scene.add_texture(alpha_img)
    mat = scene.add_material(Material(
        kind=LAMBERT, albedo=(0.4, 0.8, 0.4), base_color_texture=tex,
        alpha_cutoff=cutoff,
    ))
    v, i, uv = _quad(-1.5, -1.5, 1.5, 1.5, 2.0, uv=True)
    scene.add_instance(Instance(scene.add_mesh(
        Mesh(vertices=v, indices=i, material_ids=mat, uvs=uv))))
    return scene


def _render(scene, **overrides):
    cfg = get_config(
        "cornell", scene="custom", width=64, height=48, spp=4,
        spp_per_batch=2, max_bounces=1, **overrides,
    )
    state, stats = render_scene(cfg, scene=scene)
    return np.asarray(fb.resolve(state)), stats


def _checker(n=2):
    """(2n, 2n, 4) RGBA: white RGB, checkerboard alpha."""
    a = np.indices((2 * n, 2 * n)).sum(axis=0) % 2
    img = np.ones((2 * n, 2 * n, 4), np.float32)
    img[..., 3] = a
    return img


@pytest.mark.parametrize("intersector", ["auto", "bvh_tile"])
def test_fully_transparent_equals_no_quad(intersector):
    img_none, _ = _render(_base_scene(), intersector=intersector)
    img_clear, _ = _render(
        _add_cutout_quad(
            _base_scene(), np.zeros((2, 2, 4), np.float32) + [1, 1, 1, 0],
            0.5,
        ),
        intersector=intersector,
    )
    np.testing.assert_allclose(img_clear, img_none, atol=2e-3)


@pytest.mark.parametrize("intersector", ["auto", "bvh_tile"])
def test_fully_opaque_equals_opaque_quad(intersector):
    opaque_rgba = np.ones((2, 2, 4), np.float32)
    img_cut, _ = _render(_add_cutout_quad(_base_scene(), opaque_rgba, 0.5),
                         intersector=intersector)
    img_opq, _ = _render(_add_cutout_quad(_base_scene(), opaque_rgba, 0.0),
                         intersector=intersector)
    np.testing.assert_allclose(img_cut, img_opq, atol=1e-5)


@pytest.mark.parametrize("intersector,pipeline", [
    ("auto", "auto"), ("bvh_tile", "staged"), ("bvh_tile", "wavefront"),
])
def test_checkerboard_equals_geometric_cutout(intersector, pipeline):
    """A 2×2 checker alpha on a [-1.5,1.5]² quad ≡ the two opaque texel
    sub-quads as real geometry — primary, shadow AND bounce rays agree."""
    img_cut, _ = _render(
        _add_cutout_quad(_base_scene(), _checker(1), 0.5),
        intersector=intersector, pipeline=pipeline,
    )
    # opaque texels of the checker (alpha=1): (row 0, col 1), (row 1,
    # col 0) in image space; v-down convention maps uv quadrants to
    # [u 0.5:1, v 0:0.5] and [u 0:0.5, v 0.5:1]
    geo = _base_scene()
    mat = geo.add_material(Material(kind=LAMBERT, albedo=(0.4, 0.8, 0.4)))
    for (u0, v0) in ((0.5, 0.0), (0.0, 0.5)):
        x0 = -1.5 + u0 * 3.0
        z0 = -1.5 + v0 * 3.0
        v, i, _ = _quad(x0, z0, x0 + 1.5, z0 + 1.5, 2.0)
        geo.add_instance(Instance(geo.add_mesh(
            Mesh(vertices=v, indices=i, material_ids=mat))))
    img_geo, _ = _render(geo, intersector=intersector, pipeline=pipeline)
    np.testing.assert_allclose(img_cut, img_geo, atol=2e-3)


def test_opaque_scene_keeps_lean_path():
    """No alpha-tested material ⇒ make_occluder must return the original
    any-hit unchanged (the lean kernel keeps its perf)."""
    from tpurt.render.integrator import make_occluder
    from tpurt.render.intersectors import scene_meta

    meta = scene_meta(_base_scene())
    assert not meta.has_alpha_cutout
    sentinel = object()
    assert make_occluder(None, None, None, sentinel, meta=meta) is sentinel
