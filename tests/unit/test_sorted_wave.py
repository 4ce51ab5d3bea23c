"""Sorted-wave pipeline (render/staged.py, TPURT_SORTED_WAVE).

One payload-through sort per bounce replaces the intersector's per-trace
forward+restore sorts; live-wave truncation (the TPU-native G8 ray
compaction: dead rays sort to the back and the wave is cut at a measured
cap) must never change the image — a cap that would cut alive rays trips
live_overflow and render_scene re-renders uncapped.
"""

import dataclasses
import json
import warnings

import numpy as np
import pytest

from tpurt.render import framebuffer as fb
from tpurt.render import render_scene
from tpurt.utils.config import get_config


def _render(cfg, monkeypatch, sorted_wave, **env):
    monkeypatch.setenv("TPURT_SORTED_WAVE", "1" if sorted_wave else "0")
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    state, stats = render_scene(cfg)
    return np.asarray(fb.resolve(state)), stats


@pytest.mark.parametrize("preset,kwargs", [
    ("cornell_pt", {}),
    ("cornell_pt", {"use_nee": False}),
    ("sponza", {}),  # two-level instanced accel
])
def test_sorted_matches_default(preset, kwargs, monkeypatch):
    cfg = get_config(
        preset, width=48, height=32, spp=2, spp_per_batch=2,
        max_bounces=2, pipeline="staged", intersector="bvh_tile",
        **kwargs,
    )
    a, _ = _render(cfg, monkeypatch, sorted_wave=False)
    b, sb = _render(cfg, monkeypatch, sorted_wave=True)
    # same RNG streams, same events, same per-pixel sum order — the
    # permutation must be invisible
    np.testing.assert_array_equal(a, b)
    assert not sb["live_overflow"]
    assert len(sb["live_counts"]) == cfg.max_bounces + 1


def test_truncation_roundtrip(tmp_path, monkeypatch):
    """Uncapped render writes measured live counts; the capped re-render
    is bit-identical (caps only ever drop dead rays)."""
    at = tmp_path / "autotune.json"
    cfg = get_config(
        "cornell_pt", width=48, height=32, spp=2, spp_per_batch=2,
        max_bounces=2, pipeline="staged", intersector="bvh_tile",
    )
    monkeypatch.setenv("TPURT_AUTOTUNE_PATH", str(at))
    a, sa = _render(cfg, monkeypatch, sorted_wave=True,
                    TPURT_AUTOTUNE_WRITE="1")
    assert at.exists(), "autotune table not written"
    table = json.loads(at.read_text())
    assert len(table) == 1
    monkeypatch.setenv("TPURT_AUTOTUNE_WRITE", "0")
    b, sb = _render(cfg, monkeypatch, sorted_wave=True)
    np.testing.assert_array_equal(a, b)
    assert not sb["live_overflow"]


def test_truncation_overflow_is_loud_and_corrected(monkeypatch):
    """Absurdly tight caps cut alive rays: the render must warn, re-run
    uncapped, and return the correct image."""
    cfg = get_config(
        "cornell_pt", width=48, height=32, spp=2, spp_per_batch=2,
        max_bounces=2, pipeline="staged", intersector="bvh_tile",
    )
    a, _ = _render(cfg, monkeypatch, sorted_wave=True)
    # cornell waves stay ~fully alive: one tile cannot hold them
    tight = dataclasses.replace(cfg, live_caps=(1024, 1024))
    monkeypatch.setenv("TPURT_SORTED_WAVE", "1")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        state, stats = render_scene(tight)
    assert any("live-wave cap" in str(w.message) for w in rec)
    b = np.asarray(fb.resolve(state))
    np.testing.assert_array_equal(a, b)
