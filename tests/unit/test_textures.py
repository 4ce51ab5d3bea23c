"""Base-color texture support (SURVEY.md C6/G3 — glTF baseColorTexture).

Covers the sampler (nearest, REPEAT wrap, white fallback), the device
texture pool packing, UV interpolation through BOTH resolver paths
(legacy per-field gathers and the baked packed shade records the
production tile pipeline uses), and an end-to-end textured render."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt import materials
from tpurt.core.camera import Camera
from tpurt.render import framebuffer as fb
from tpurt.render import render_scene
from tpurt.scene.device import to_device
from tpurt.scene.types import LAMBERT, Instance, Material, Mesh, Scene
from tpurt.utils.config import get_config


def checkerboard():
    """2x2 texture: red / green // blue / white (rows top to bottom)."""
    return np.array(
        [[[1, 0, 0], [0, 1, 0]], [[0, 0, 1], [1, 1, 1]]], np.float32
    )


def textured_quad_scene(tex=None, albedo=(1.0, 1.0, 1.0)):
    """Unit quad in z=0 spanning [0,1]^2, uv = xy, camera looking at it."""
    scene = Scene(name="texquad")
    tid = scene.add_texture(tex if tex is not None else checkerboard())
    mid = scene.add_material(
        Material(kind=LAMBERT, albedo=albedo, base_color_texture=tid)
    )
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    m = scene.add_mesh(Mesh(verts, idx, np.full(2, mid), uvs=uvs))
    scene.add_instance(Instance(mesh_id=m))
    scene.camera = Camera.make(
        position=(0.5, 0.5, 1.75), look_at=(0.5, 0.5, 0.0), vfov_deg=45.0
    )
    scene.background = (0.0, 0.0, 0.0)
    return scene


def test_sampler_nearest_wrap_and_fallback():
    scene = textured_quad_scene()
    ds = to_device(scene)
    tid = jnp.asarray([0, 0, 0, 0, 0, -1], jnp.int32)
    # texture v=0 is the TOP image row (glTF convention)
    tu = jnp.asarray([0.25, 0.75, 0.25, 0.75, 1.25, 0.5])
    tv = jnp.asarray([0.25, 0.25, 0.75, 0.75, 0.25, 0.5])
    got = np.asarray(materials.sample_base_color(
        ds.tex_data, ds.tex_meta, tid, tu, tv
    ))
    want = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1],
         [0, 1, 0],  # u=1.25 wraps to 0.25 of the second column? no: 0.25
         [1, 1, 1]],  # tex_id -1 -> white fallback
        np.float32,
    )
    want[4] = [1, 0, 0]  # u wraps 1.25 -> 0.25: top-left red
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_device_pool_packing():
    scene = textured_quad_scene()
    scene.add_texture(np.full((4, 8, 3), 0.5, np.float32))
    scene.materials[0].base_color_texture = 0
    ds = to_device(scene)
    meta = np.asarray(ds.tex_meta)
    assert meta.shape == (2, 4)
    assert meta[0][:3].tolist() == [1.0, 2.0, 2.0]  # offset 1, 2x2
    assert meta[1][:3].tolist() == [5.0, 8.0, 4.0]  # offset 1+4, 8x4
    assert np.asarray(ds.tex_data).shape[0] == 1 + 4 + 32
    assert np.asarray(ds.tex_data)[0].tolist() == [1.0, 1.0, 1.0]
    uv1 = np.asarray(ds.tri_uv1[0])
    np.testing.assert_allclose(uv1, [1.0, 0.0])


@pytest.mark.parametrize("intersector", ["brute", "bvh_tile"])
def test_textured_quad_render(intersector):
    """Flat render of the checkerboard quad: each quadrant shows its
    texel color through the legacy (brute) and packed (bvh_tile)
    resolver paths."""
    cfg = get_config(
        "cornell", width=64, height=64, spp=1, max_bounces=0,
        shading_mode="flat", intersector=intersector,
    )
    scene = textured_quad_scene()
    state, _ = render_scene(cfg, scene=scene)
    img = np.asarray(fb.resolve(state))
    # quadrant centers (image row 0 = TOP of frame = quad y=1 = uv v=1)
    h, w = img.shape[:2]
    probe = lambda fx, fy: img[int(fy * h), int(fx * w)]
    np.testing.assert_allclose(probe(0.3, 0.7), [1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(probe(0.7, 0.7), [0, 1, 0], atol=1e-3)
    np.testing.assert_allclose(probe(0.3, 0.3), [0, 0, 1], atol=1e-3)
    np.testing.assert_allclose(probe(0.7, 0.3), [1, 1, 1], atol=1e-3)


def test_albedo_factor_multiplies_texture():
    cfg = get_config(
        "cornell", width=32, height=32, spp=1, max_bounces=0,
        shading_mode="flat", intersector="brute",
    )
    scene = textured_quad_scene(
        tex=np.full((1, 1, 3), 1.0, np.float32), albedo=(0.25, 0.5, 1.0)
    )
    state, _ = render_scene(cfg, scene=scene)
    img = np.asarray(fb.resolve(state))
    np.testing.assert_allclose(
        img[16, 16], [0.25, 0.5, 1.0], atol=1e-3
    )


def test_bilinear_sampler_analytic():
    """LINEAR filtering: exact interpolation between texel centers of a
    1x2 black/white texture, clamped at centers' outer halves (REPEAT
    wraps the edges toward the opposite texel)."""
    scene = textured_quad_scene(
        tex=np.array([[[0, 0, 0], [1, 1, 1]]], np.float32)  # (1, 2, 3)
    )
    ds = to_device(scene)
    tid = jnp.zeros(5, jnp.int32)
    # texel centers at u = 0.25 (black) and 0.75 (white)
    tu = jnp.asarray([0.25, 0.75, 0.5, 0.375, 0.625])
    tv = jnp.full(5, 0.5)
    got = np.asarray(materials.sample_base_color(
        ds.tex_data, ds.tex_meta, tid, tu, tv, bilinear=True
    ))[:, 0]
    np.testing.assert_allclose(got, [0.0, 1.0, 0.5, 0.25, 0.75], atol=1e-6)


def test_bilinear_render_smoke():
    """Bilinear filter through the packed resolver: the checkerboard
    quad's quadrant centers keep their colors; edges blend."""
    cfg = get_config(
        "cornell", width=64, height=64, spp=1, max_bounces=0,
        shading_mode="flat", intersector="bvh_tile",
        texture_filter="bilinear",
    )
    state, _ = render_scene(cfg, scene=textured_quad_scene())
    img = np.asarray(fb.resolve(state))
    h, w = img.shape[:2]
    probe = lambda fx, fy: img[int(fy * h), int(fx * w)]
    # texel centers of the 2x2 texture sit at quad uv 0.25/0.75, which
    # the camera (45° vfov at distance 1.75 → frame spans 1.45 world
    # units) maps to image fraction 0.5 + (uv − 0.5)/1.45
    fx = lambda uv: 0.5 + (uv - 0.5) / 1.45
    np.testing.assert_allclose(
        probe(fx(0.25), fx(0.75)), [1, 0, 0], atol=8e-2)
    np.testing.assert_allclose(
        probe(fx(0.75), fx(0.25)), [1, 1, 1], atol=8e-2)
    # the quad center blends all four texels toward the average
    center = probe(0.5, 0.5)
    assert 0.15 < center[0] < 0.85 and 0.15 < center[1] < 0.85
