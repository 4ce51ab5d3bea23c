"""Test harness: force CPU backend with 8 virtual devices (SURVEY.md §4.5).

Multi-chip hardware is not available on the dev box; sharding tests run on a
virtual 8-device CPU mesh, and Pallas kernels run in interpret mode (the
"mock GPU" — SURVEY.md §4.1). Must run before jax initializes a backend.
"""

import hashlib
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TPURT_INTERPRET_PALLAS", "1")

# Scope the persistent XLA cache BY HOST CPU for the (CPU-backend) test
# suite: XLA:CPU AOT executables are compiled against the build host's
# exact feature set, and jax's cache key does NOT include it — a cache
# dir carried to a different machine loads mismatched executables
# (cpu_aot_loader "machine type ... doesn't match" + SIGILL warnings)
# whose fma/scheduling differences break the suite's bit-exactness
# tests at the ULP level (seen: sorted-wave sponza, 3.5% of pixels off
# by ≤ 4.8e-7 when half the programs came from another box's cache).
# TPU runs (bench/probes) don't import this file and keep the shared
# dir — their executables come from the same remote Mosaic service
# regardless of host.
if "TPURT_JAX_CACHE_DIR" not in os.environ:
    import platform as _platform
    import socket as _socket

    # x86 reports "flags", ARM reports "Features"; accept either.
    try:
        with open("/proc/cpuinfo") as f:
            _flags_line = next(
                (ln for ln in f
                 if ln.startswith(("flags", "Features"))), "")
    except OSError:
        _flags_line = ""
    # When cpuinfo gives nothing (non-Linux, unreadable), fall back to a
    # per-host component so distinct machines never share a cache dir.
    _parts = [
        _flags_line,
        _platform.machine(),
        _platform.processor(),
        "" if _flags_line else _socket.gethostname(),
    ]
    _fp = hashlib.sha256("|".join(_parts).encode()).hexdigest()[:12]
    os.environ["TPURT_JAX_CACHE_DIR"] = os.path.expanduser(
        f"~/.cache/tpurt_jax_cache_cpu_{_fp}")

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
