"""Golden-image integration tests (SURVEY.md §4.3).

Acceptance: RMSE ≤ 1e-3 against stored goldens (BASELINE.json:5). The
goldens are brute-force-path-traced through the same scene/state API
(self-consistent — the Vulkan reference is not runnable here, SURVEY.md §0).
Also: the analytic white-furnace test, and cross-intersector agreement
(BVH traversal vs the dense brute-force oracle on a full render).
"""

import os

import numpy as np
import pytest

from tests.golden.generate_goldens import GOLDENS, render_golden
from tpurt.render import framebuffer as fb
from tpurt.render import render_scene
from tpurt.utils.config import get_config

DATA = os.path.join(os.path.dirname(__file__), "data")

RMSE_TOL = 1e-3  # BASELINE.json:5


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean((a - b) ** 2)))


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden_image(name):
    path = os.path.join(DATA, f"{name}.npz")
    assert os.path.exists(path), (
        f"golden missing — run python tests/golden/generate_goldens.py"
    )
    golden = np.load(path)["image"]
    img = render_golden(name)
    assert img.shape == golden.shape
    assert rmse(img, golden) <= RMSE_TOL


def test_cross_intersector_cornell():
    """BVH traversal and the dense oracle must render the same image."""
    base = dict(width=48, height=48, spp=4, spp_per_batch=4, max_bounces=2)
    img = {}
    for kind in ("brute", "bvh"):
        state, _ = render_scene(
            get_config("cornell_pt", intersector=kind, **base)
        )
        img[kind] = np.asarray(fb.resolve(state))
    assert rmse(img["brute"], img["bvh"]) <= RMSE_TOL


def test_white_furnace():
    """Analytic golden (SURVEY.md §7): a perfectly white Lambertian object
    in a uniform unit-radiance environment must render to 1 everywhere
    (up to path-truncation bias bounded by 2^-max_bounces)."""
    import numpy as np

    from tpurt.scene.procedural import icosphere
    from tpurt.scene.types import LAMBERT, Instance, Material, Mesh, Scene
    from tpurt.core.camera import Camera

    scene = Scene(name="furnace", background=(1.0, 1.0, 1.0))
    mat = scene.add_material(Material(LAMBERT, (1.0, 1.0, 1.0)))
    v, idx, vn = icosphere(2)
    mesh = scene.add_mesh(Mesh(v, idx, mat, normals=vn))
    scene.add_instance(Instance(mesh_id=mesh))
    scene.camera = Camera.make((0, 0, -3.2), (0, 0, 0), vfov_deg=45.0)

    config = get_config(
        "furnace", width=32, height=32, spp=32, spp_per_batch=8,
        max_bounces=16, use_nee=False, intersector="brute",
    )
    state, _ = render_scene(config, scene=scene)
    img = np.asarray(fb.resolve(state))
    # Monte-Carlo noise + truncation: generous 2% band on the mean,
    # tighter than any plausible energy-conservation bug (which shows 10%+).
    assert abs(img.mean() - 1.0) < 0.02
    assert np.all(img < 1.05)
