"""resolve_hit_packed (baked world-space shade records, one row gather)
must reproduce resolve_hit (per-field gathers + instance normal
transforms) field-for-field on real hits — including rotated instances
(the n_geom double-transform bug regression) and every material kind.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt import materials
from tpurt.bvh.paircluster import build_pair_accel
from tpurt.kernels.tilewave import make_tile_intersector
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device
from tpurt.scene.procedural import bunny_standin, cornell_box


@pytest.mark.parametrize("scene_fn", [
    lambda: cornell_box(path_tracer=True),
    lambda: cornell_box(path_tracer=False),
    lambda: bunny_standin(subdivisions=3),
])
def test_packed_resolver_matches_legacy(scene_fn, rng):
    scene = scene_fn()
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    closest, _ = make_tile_intersector(ds, accel, interpret=True)

    lo = np.asarray(ds.tri_v0).min(0)
    hi = np.asarray(ds.tri_v0).max(0)
    center = (lo + hi) / 2
    radius = float(np.max(hi - lo)) or 1.0
    n = 1024
    org = jnp.asarray(center + rng.normal(size=(n, 3)) * radius * 0.4,
                      jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirn = jnp.asarray(d, jnp.float32)

    hit = closest(org, dirn, 0.0, jnp.inf)
    legacy = materials.resolve_hit(
        ds, org, dirn, hit.t, hit.u, hit.v, hit.tri, hit.inst
    )
    packed = materials.resolve_hit_packed(
        jnp.asarray(accel.shade_rows), org, dirn, hit.t, hit.u, hit.v,
        hit.slot,
    )
    m = np.asarray(hit.valid)
    assert m.any()
    for f in legacy._fields:
        a = np.asarray(getattr(legacy, f))[m]
        b = np.asarray(getattr(packed, f))[m]
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b, err_msg=f)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                       err_msg=f)
