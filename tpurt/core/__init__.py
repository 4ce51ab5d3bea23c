"""Core math: vectors, intersections, camera, sampling (SURVEY.md §7 step 1)."""

from tpurt.core.vecmath import (
    normalize,
    reflect,
    refract,
    build_onb,
    ray_aabb,
    intersect_tris,
)
from tpurt.core.camera import Camera, camera_rays
from tpurt.core import sampling

__all__ = [
    "normalize",
    "reflect",
    "refract",
    "build_onb",
    "ray_aabb",
    "intersect_tris",
    "Camera",
    "camera_rays",
    "sampling",
]
