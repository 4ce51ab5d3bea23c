"""Acceleration structures (SURVEY.md §2.1 C8/C9, §2.2 G6/G7, §3.3).

The reference builds per-mesh BLAS + an instanced TLAS through
``vkCmdBuildAccelerationStructuresKHR`` (driver-internal). Here the builder
is an on-device LBVH (BASELINE.json:5): Morton codes + stable sort (G6),
Karras-style parallel hierarchy emit + bottom-up AABB refit (G7), leaf
collapse, and a depth-first reorder that makes stackless traversal links
implicit (skip[n] = n + subtree_size — SURVEY.md §7 step 4; stackless idea
after arxiv 2402.00665 [P]).
"""

from tpurt.bvh.lbvh import Bvh, build_lbvh
from tpurt.bvh.two_level import (
    SceneAccel,
    build_scene_accel,
    make_two_level_intersector,
)

__all__ = [
    "Bvh",
    "build_lbvh",
    "SceneAccel",
    "build_scene_accel",
    "make_two_level_intersector",
]
