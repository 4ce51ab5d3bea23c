"""Exporter round-trips at ladder scale (SURVEY.md §4.3; VERDICT r1 §4).

The bunny/sponza ladder configs (BASELINE.json:9,11) must exercise the
real loader path (C5 OBJ / C6 glTF) at full 70k+/260k-instanced-tri
scale, not just tiny generated fixtures: the procedural stand-ins are
exported with tpurt.scene.export and reloaded, and the resulting
world-space triangle soup must be bit-exact.
"""

import numpy as np
import pytest

from tpurt.render.intersectors import scene_meta
from tpurt.scene.export import save_glb, save_obj_scene
from tpurt.scene.loader import load_scene
from tpurt.scene.procedural import bunny_standin, sponza_standin


def _world_soup(scene):
    """Instance-flattened, Morton-sorted world triangle soup + per-slot
    material parameters (the full shading-relevant state)."""
    from tpurt.bvh.paircluster import flatten_world_tris

    meta = scene_meta(scene)
    v0, v1, v2, tri_id, inst_id = flatten_world_tris(None, meta, scene)
    # per-flattened-tri material record (resolve overrides)
    tri_mat = np.concatenate(
        [m.material_ids for m in scene.meshes]
    ) if scene.meshes else np.zeros(0, np.int32)
    inst_over = np.asarray(
        [i.material_override for i in scene.instances], np.int32
    )
    mid = np.where(
        inst_over[inst_id] >= 0, inst_over[inst_id], tri_mat[tri_id]
    )
    mats = np.asarray(
        [
            [
                scene.materials[j].kind,
                *scene.materials[j].albedo,
                *scene.materials[j].emission,
                scene.materials[j].param0,
                scene.materials[j].param1,
            ]
            for j in mid
        ],
        np.float32,
    )
    soup = np.concatenate([v0, v1, v2, mats], axis=1)
    order = np.lexsort(soup.T[::-1])
    return soup[order]


def test_obj_roundtrip_bunny_full_scale(tmp_path):
    scene = bunny_standin()  # full ladder scale: ~82k tris
    assert scene.num_triangles > 70_000
    path = str(tmp_path / "bunny.obj")
    save_obj_scene(path, scene)
    loaded = load_scene(path)
    loaded.validate()
    assert loaded.num_triangles == sum(
        scene.meshes[i.mesh_id].num_triangles for i in scene.instances
    )
    np.testing.assert_array_equal(_world_soup(loaded), _world_soup(scene))
    # camera/background ride the tpurt header comments
    np.testing.assert_allclose(
        np.asarray(loaded.camera.position),
        np.asarray(scene.camera.position),
    )
    np.testing.assert_allclose(
        np.asarray(loaded.camera.vfov_deg), np.asarray(scene.camera.vfov_deg)
    )
    assert loaded.background == pytest.approx(scene.background)


def test_glb_roundtrip_sponza_full_scale(tmp_path):
    scene = sponza_standin()  # ~230k instanced tris, 126 instances
    meta = scene_meta(scene)
    instanced = sum(meta.mesh_tri_ranges[m][1] for m in meta.inst_mesh)
    assert instanced > 200_000
    assert len(scene.instances) > 100
    path = str(tmp_path / "sponza.glb")
    save_glb(path, scene)
    loaded = load_scene(path)
    loaded.validate()
    assert len(loaded.instances) >= len(scene.instances)
    np.testing.assert_array_equal(_world_soup(loaded), _world_soup(scene))
    np.testing.assert_allclose(
        np.asarray(loaded.camera.position),
        np.asarray(scene.camera.position),
    )
    np.testing.assert_allclose(
        np.asarray(loaded.camera.look_at), np.asarray(scene.camera.look_at)
    )
    np.testing.assert_allclose(
        np.asarray(loaded.camera.vfov_deg),
        np.asarray(scene.camera.vfov_deg),
    )
    assert loaded.background == pytest.approx(scene.background)


def test_glb_roundtrip_small_render(tmp_path):
    """Small-scene GLB round trip renders identically (materials, camera,
    background, instancing all preserved through the binary format)."""
    from tpurt.render import framebuffer as fb
    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    scene = bunny_standin(subdivisions=2)
    path = str(tmp_path / "blob.glb")
    save_glb(path, scene)
    loaded = load_scene(path)
    cfg = get_config(
        "bunny", width=48, height=36, spp=2, spp_per_batch=2, max_bounces=1
    )
    s_a, _ = render_scene(cfg, scene=scene)
    s_b, _ = render_scene(cfg, scene=loaded)
    np.testing.assert_allclose(
        np.asarray(fb.resolve(s_a)), np.asarray(fb.resolve(s_b)),
        rtol=1e-5, atol=1e-5,
    )


def test_obj_roundtrip_small_render(tmp_path):
    from tpurt.render import framebuffer as fb
    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    scene = bunny_standin(subdivisions=2)
    path = str(tmp_path / "blob.obj")
    save_obj_scene(path, scene)
    loaded = load_scene(path)
    cfg = get_config(
        "bunny", width=48, height=36, spp=2, spp_per_batch=2, max_bounces=1
    )
    s_a, _ = render_scene(cfg, scene=scene)
    s_b, _ = render_scene(cfg, scene=loaded)
    np.testing.assert_allclose(
        np.asarray(fb.resolve(s_a)), np.asarray(fb.resolve(s_b)),
        rtol=1e-5, atol=1e-5,
    )
