"""Live-wave truncation in the DEFAULT staged pipeline (round 4).

The intersector's internal octant sort puts dead (closest) / non-want
(shadow) rays at the back of every wave, so per-bounce static caps
truncate the mask/entry/traversal work to the live prefix
(tilewave._run ``live_trunc``). Contract mirrors the sorted-wave
pipeline's caps: adequate caps are invisible (bit-identical image), a
cap that cuts alive rays trips live_overflow and render_scene
re-renders uncapped — truncation is never silent.
"""

import dataclasses
import warnings

import numpy as np
import pytest

from tpurt.render import render_scene
from tpurt.scene.procedural import bunny_standin
from tpurt.utils.config import get_config


@pytest.fixture(scope="module")
def base():
    scene = bunny_standin(subdivisions=3)
    cfg = get_config(
        "bunny", width=64, height=48, spp=1, spp_per_batch=1,
        max_bounces=2, intersector="bvh_tile", pipeline="staged",
    )
    state, stats = render_scene(cfg, scene=scene)
    return scene, cfg, state, stats


def test_uncapped_records_live_and_want_counts(base):
    _, cfg, _, stats = base
    assert len(stats["live_counts"]) == cfg.max_bounces + 1
    assert len(stats["want_counts"]) == cfg.max_bounces + 1
    assert stats["live_counts"][0] > 0
    assert stats["want_counts"][0] > 0
    # the wave shrinks with depth; final bounce spawns no new rays
    assert stats["live_counts"][-1] == 0.0


def test_adequate_caps_bit_identical(base):
    scene, cfg, s0, stats = base
    n = cfg.width * cfg.height
    caps = tuple(
        min(n, int(v) + 1024)
        for v in stats["live_counts"][: cfg.max_bounces]
    )
    scaps = tuple(
        min(n, int(v) + 1024) for v in stats["want_counts"]
    )
    capped = dataclasses.replace(cfg, live_caps=caps,
                                 shadow_caps=scaps)
    s1, st1 = render_scene(capped, scene=scene)
    assert not st1["live_overflow"]
    np.testing.assert_array_equal(
        np.asarray(s0.accum), np.asarray(s1.accum)
    )


def test_tight_caps_loud_and_correct(base):
    """Caps that cut ALIVE rays must warn and re-render uncapped."""
    scene, cfg, s0, _ = base
    tiny = dataclasses.replace(
        cfg, live_caps=(1024, 1024), shadow_caps=(1024, 1024, 1024)
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        s2, st2 = render_scene(tiny, scene=scene)
    assert any("re-rendering uncapped" in str(w.message)
               for w in caught)
    np.testing.assert_array_equal(
        np.asarray(s0.accum), np.asarray(s2.accum)
    )


def test_autotune_roundtrip(base, tmp_path, monkeypatch):
    """record() then live_caps_for/want_caps_for produce margin'd caps."""
    _, cfg, _, stats = base
    from tpurt.utils import autotune

    monkeypatch.setenv("TPURT_AUTOTUNE_PATH",
                       str(tmp_path / "tune.json"))
    autotune.record(cfg, stats)
    caps = autotune.live_caps_for(cfg)
    scaps = autotune.want_caps_for(cfg)
    assert len(caps) == cfg.max_bounces
    assert len(scaps) == cfg.max_bounces + 1
    for c, v in zip(caps, stats["live_counts"]):
        assert c >= v  # margin'd above the measurement
    for c, v in zip(scaps, stats["want_counts"]):
        assert c >= v
