"""Scene/state API + loaders (SURVEY.md §2.1 C5–C7, §3.4).

This package is the stability contract of the framework (BASELINE.json:5
"Scene loading ... keeps the reference's scene/state API"): `Scene`,
`Camera`, `Material`, `Mesh`, `Instance` plus `load_scene()` and
`to_device()`.
"""

from tpurt.scene.types import (
    Mesh,
    Material,
    Instance,
    Scene,
    LAMBERT,
    BLINN_PHONG,
    MIRROR,
    DIELECTRIC,
)
from tpurt.scene.device import DeviceScene, to_device
from tpurt.scene.loader import load_scene

__all__ = [
    "Mesh",
    "Material",
    "Instance",
    "Scene",
    "DeviceScene",
    "to_device",
    "load_scene",
    "LAMBERT",
    "BLINN_PHONG",
    "MIRROR",
    "DIELECTRIC",
]
