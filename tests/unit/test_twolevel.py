"""Two-level (TLAS/BLAS) pair-cluster accel on the PRODUCTION tile path
(SURVEY.md C9; VERDICT r1 §3): shared object-space BLAS cluster tables +
per-instance-cluster world boxes and ray transforms, all through the
tilewave Pallas kernel (interpret mode on CPU).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh.paircluster import (
    ROWS_PER_CLUSTER,
    TRIS_PER_CLUSTER,
    build_pair_accel,
    build_pair_accel_two_level,
)
from tpurt.kernels.tilewave import make_tile_intersector
from tpurt.render.intersectors import make_brute_force, scene_meta
from tpurt.scene.device import to_device
from tpurt.scene.procedural import sponza_standin


def _small_sponza():
    return sponza_standin(column_segments=8, column_rings=3)


def _rand_rays(rng, n, ds):
    v0 = np.asarray(ds.tri_v0)
    center = (v0.min(0) + v0.max(0)) / 2
    radius = float(np.max(v0.max(0) - v0.min(0)))
    org = center + rng.normal(size=(n, 3)) * radius * 0.4
    target = center + rng.normal(size=(n, 3)) * radius * 0.2
    d = target - org
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32),
            radius)


@pytest.fixture(scope="module")
def tl_setup():
    scene = _small_sponza()
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel_two_level(ds, meta, scene=scene)
    return scene, meta, ds, accel


def test_memory_scales_with_blas(tl_setup):
    """Unique-triangle table rows ∝ BLAS size, not instance count."""
    scene, meta, ds, accel = tl_setup
    flat = build_pair_accel(ds, meta, scene=scene)
    unique = sum(r[1] for r in meta.mesh_tri_ranges)
    instanced = sum(meta.mesh_tri_ranges[m][1] for m in meta.inst_mesh)
    assert instanced >= 2 * unique  # the scene genuinely instances
    from tpurt.bvh.paircluster import SC_PAD_ROWS

    assert accel.tri_rows.shape[0] <= (
        -(-unique // TRIS_PER_CLUSTER) + len(scene.meshes)
    ) * ROWS_PER_CLUSTER + SC_PAD_ROWS  # fixed supercluster-DMA pad
    assert flat.tri_rows.shape[0] >= (
        accel.tri_rows.shape[0] - SC_PAD_ROWS) * 2
    # but the TLAS (cluster boxes) covers every instance
    assert accel.n_clusters > flat.n_clusters / 4


@pytest.mark.parametrize("smem", [False, True])
def test_tl_closest_matches_oracle(tl_setup, rng, monkeypatch, smem):
    scene, meta, ds, accel = tl_setup
    if smem:
        monkeypatch.setenv("TPURT_SMEM_TRI", "1")
    t_closest, t_any = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant"
    )
    b_closest, b_any = make_brute_force(ds, meta)
    org, dirn, radius = _rand_rays(rng, 2048, ds)
    th = t_closest(org, dirn, 0.0, jnp.inf)
    bh = b_closest(org, dirn, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(th.valid), np.asarray(bh.valid))
    hit = np.asarray(bh.valid)
    np.testing.assert_allclose(
        np.asarray(th.t)[hit], np.asarray(bh.t)[hit], rtol=2e-4, atol=1e-3
    )
    # instance ids decode correctly from the fifth kernel output
    np.testing.assert_array_equal(
        np.asarray(th.inst)[hit], np.asarray(bh.inst)[hit]
    )
    t_max = jnp.asarray(rng.uniform(0.1, radius, 2048), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(t_any(org, dirn, 0.0, t_max)),
        np.asarray(b_any(org, dirn, 0.0, t_max)),
    )


@pytest.mark.parametrize("smem", [False, True])
def test_tl_lean_occlusion_matches_oracle(tl_setup, rng, monkeypatch,
                                          smem):
    """TPURT_LEAN_OCCL=1 through the two-level (TLAS/BLAS) accel: the
    lean any-hit kernel must run the per-pair world→object ray transform
    and agree with the brute oracle on instanced geometry."""
    scene, meta, ds, accel = tl_setup
    monkeypatch.setenv("TPURT_LEAN_OCCL", "1")
    if smem:
        monkeypatch.setenv("TPURT_SMEM_TRI", "1")
    _, t_any = make_tile_intersector(
        ds, accel, interpret=True, ray_sort="octant"
    )
    _, b_any = make_brute_force(ds, meta)
    org, dirn, radius = _rand_rays(rng, 2048, ds)
    t_max = jnp.asarray(rng.uniform(0.1, radius, 2048), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(t_any(org, dirn, 0.0, t_max)),
        np.asarray(b_any(org, dirn, 0.0, t_max)),
    )


def test_tl_render_matches_flattened():
    """VERDICT r1 §3 acceptance: the instanced-cluster render matches the
    flattened render (same estimator, different accel) to ~1e-5."""
    from tpurt.render import framebuffer as fb
    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    scene = _small_sponza()
    cfg = get_config(
        "sponza", width=64, height=36, spp=2, spp_per_batch=2,
        max_bounces=1, intersector="bvh_tile",
    )
    s_tl, _ = render_scene(
        dataclasses.replace(cfg, instancing="two_level"), scene=scene
    )
    s_flat, _ = render_scene(
        dataclasses.replace(cfg, instancing="flatten"), scene=scene
    )
    a = np.asarray(fb.resolve(s_tl))
    b = np.asarray(fb.resolve(s_flat))
    assert float(np.sqrt(np.mean((a - b) ** 2))) < 1e-5


def test_tl_auto_selected_for_instanced_scene():
    from tpurt.render import build_accel
    from tpurt.utils.config import get_config

    scene = _small_sponza()
    meta = scene_meta(scene)
    ds = to_device(scene)
    cfg = get_config("sponza", intersector="bvh_tile")
    accel = build_accel(cfg, ds, meta, scene=scene)
    assert hasattr(accel, "pair_meta")  # two-level chosen automatically


def test_tl_material_override(rng):
    """Instance material overrides resolve through the per-instance
    table (object-space records are shared, the override is per node)."""
    from tpurt import materials
    from tpurt.scene.procedural import icosphere
    from tpurt.scene.types import (
        LAMBERT,
        MIRROR,
        Instance,
        Material,
        Mesh,
        Scene,
        make_transform,
    )

    scene = Scene(name="override")
    red = scene.add_material(Material(LAMBERT, (0.9, 0.1, 0.1)))
    mir = scene.add_material(Material(MIRROR, (0.9, 0.9, 0.9)))
    v, idx, vn = icosphere(2)
    mesh = scene.add_mesh(Mesh(v, idx, red, normals=vn))
    scene.add_instance(Instance(mesh, make_transform((-2, 0, 0))))
    scene.add_instance(
        Instance(mesh, make_transform((2, 0, 0)), material_override=mir)
    )
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel_two_level(ds, meta, scene=scene)
    closest, _ = make_tile_intersector(ds, accel, interpret=True)
    resolver = materials.make_resolver(ds, accel)
    # rays at both spheres
    org = jnp.asarray([[-2.0, 0, -5], [2.0, 0, -5]], jnp.float32)
    dirn = jnp.asarray([[0.0, 0, 1], [0.0, 0, 1]], jnp.float32)
    hit = closest(org, dirn, 0.0, jnp.inf)
    assert bool(hit.valid[0]) and bool(hit.valid[1])
    attrs = resolver(org, dirn, hit.t, hit.u, hit.v, hit.tri, hit.inst,
                     hit.slot)
    assert int(attrs.kind[0]) == LAMBERT
    assert int(attrs.kind[1]) == MIRROR
    np.testing.assert_allclose(
        np.asarray(attrs.albedo[0]), [0.9, 0.1, 0.1], atol=1e-6
    )
    # normals transformed per instance: both hit the -z side, n ≈ (0,0,-1)
    np.testing.assert_allclose(
        np.asarray(attrs.n_geom[:, 2]), [-1.0, -1.0], atol=0.1
    )
