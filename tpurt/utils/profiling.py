"""Tracing / profiling (SURVEY.md §5 "Tracing / profiling").

The reference brackets ``vkCmdTraceRaysKHR`` with GPU timestamp queries and
leans on RenderDoc/Nsight for capture; the TPU rebuild's equivalents:

  * ``trace(dir)``          — jax.profiler → Perfetto trace (the capture
                              tool analog; open in ui.perfetto.dev)
  * ``timed(name)``         — wall-clock bracket with block_until_ready
                              (the timestamp-query analog)
  * ``RayStats``            — per-frame ray counters accumulated on device
                              inside the integrators (rays traced split by
                              kind) and reported as Mrays/sec
                              (BASELINE.json:2); collected by render_scene
  * ``frame_log(...)``      — the structured per-frame log line
                              (SURVEY.md §5 metrics/observability),
                              optional JSONL sink for the benchmark table
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Perfetto trace of everything inside the block."""
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def timed(name: str, sink: Optional[dict] = None, verbose: bool = False):
    """Wall-clock bracket; forces device completion at exit so the number
    means what it says (jax dispatch is async)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.effects_barrier() if hasattr(jax, "effects_barrier") else None
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + dt
        if verbose:
            print(f"[tpurt] {name}: {dt * 1e3:.2f} ms")


def frame_log(frame: int, samples: int, rays: float, seconds: float,
              chips: int = 1, jsonl_path: Optional[str] = None) -> str:
    """Structured per-frame log line; optionally appended to a JSONL file
    consumed by benchmarks/run.py."""
    rec = {
        "frame": frame,
        "samples": samples,
        "rays": int(rays),
        "mrays_per_s": round(rays / max(seconds, 1e-9) / 1e6, 3),
        "frame_ms": round(seconds * 1e3, 2),
        "chips": chips,
    }
    line = json.dumps(rec)
    if jsonl_path:
        with open(jsonl_path, "a") as f:
            f.write(line + "\n")
    return line
