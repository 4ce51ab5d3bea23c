"""Test harness: force CPU backend with 8 virtual devices (SURVEY.md §4.5).

Multi-chip hardware is not available on the dev box; sharding tests run on a
virtual 8-device CPU mesh, and Pallas kernels run in interpret mode (the
"mock GPU" — SURVEY.md §4.1). Must run before jax initializes a backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TPURT_INTERPRET_PALLAS", "1")

# This box routes jax through a remote TPU tunnel registered by a
# sitecustomize hook *before* conftest runs, and it ignores the
# JAX_PLATFORMS env var set here. jax.config.update still wins as long as
# no backend has been initialized yet — tests must run on the virtual
# 8-device CPU mesh (SURVEY.md §4.5), never on the (single, lock-held) TPU.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
