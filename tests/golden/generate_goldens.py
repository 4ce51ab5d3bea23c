"""Regenerate the golden images (SURVEY.md §4.3).

Goldens are self-consistent (brute-force-path-traced through the same
scene/state API) because the Vulkan reference is not runnable in this
environment (SURVEY.md §0); if /root/reference ever becomes runnable,
regenerate from it instead. Run from the repo root:

    python tests/golden/generate_goldens.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

from tpurt.render import framebuffer as fb  # noqa: E402
from tpurt.render import render_scene  # noqa: E402
from tpurt.utils.config import get_config  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "data")

# (name, config overrides) — the fixture ladder, smallest first (B:7–11);
# resolutions shrunk so the suite stays CPU-fast and the repo small.
GOLDENS = {
    "hello_triangle": dict(width=80, height=60, spp=1, spp_per_batch=1),
    "cornell": dict(width=64, height=64, spp=8, spp_per_batch=4,
                    max_bounces=0),
    "cornell_pt": dict(width=48, height=48, spp=8, spp_per_batch=4,
                       max_bounces=4),
    # configs 3 and 5 at FULL geometry scale (82k-tri bunny stand-in,
    # 230k-instanced-tri sponza stand-in) — resolution shrunk for CPU
    # runtime, geometry is the ladder's (BASELINE.json:9,11)
    "bunny": dict(width=64, height=48, spp=2, spp_per_batch=2,
                  max_bounces=2),
    "sponza": dict(width=80, height=45, spp=2, spp_per_batch=2,
                   max_bounces=2),
}


def render_golden(name: str) -> np.ndarray:
    config = get_config(name, **GOLDENS[name])
    state, _ = render_scene(config)
    return np.asarray(fb.resolve(state), np.float32)


def main():
    os.makedirs(DATA, exist_ok=True)
    for name in GOLDENS:
        img = render_golden(name)
        path = os.path.join(DATA, f"{name}.npz")
        np.savez_compressed(path, image=img)
        print(f"{path}: {img.shape} mean={img.mean():.4f}")


if __name__ == "__main__":
    main()
