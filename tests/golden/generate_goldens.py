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

# configs live in tests/golden/configs.py (side-effect-free: also
# imported by benchmarks/run.py inside a TPU process, which must not
# trip this module's jax_platforms=cpu update)
from tests.golden.configs import GOLDENS  # noqa: E402


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
