"""Pair-budget overflow terminal path (VERDICT r2 weak #4/#5).

A truncated traversal means a silently-wrong image — render_scene
auto-retries with doubled budgets, and when retries are exhausted the
failure must be LOUD: BudgetOverflowError by default,
TPURT_ALLOW_OVERFLOW=1 downgrades to a RuntimeWarning.
"""

import warnings

import pytest

from tpurt.render import BudgetOverflowError, render_scene
from tpurt.utils.config import get_config

# The budget machinery only exists on the packed-pair-list path; the
# round-4 default (dense entry rows) has no global pair capacity and
# cannot overflow (tests/unit/test_tilewave.py covers that). Pin the
# budgeted path here so the terminal-overflow contract stays tested.
pytestmark = pytest.mark.usefixtures("_budget_path")


@pytest.fixture
def _budget_path(monkeypatch):
    monkeypatch.setenv("TPURT_ENTRY_ROWS", "0")


def _overflow_setup():
    # a small standin with enough clusters for the masked pair path;
    # pairs_avg=1 underfits any wave so the on-device overflow flag trips
    from tpurt.scene.procedural import sponza_standin

    scene = sponza_standin(column_segments=8, column_rings=3)
    cfg = get_config(
        "sponza", width=48, height=24, spp=1,
        spp_per_batch=1, max_bounces=0, use_nee=False,
        intersector="bvh_tile", pipeline="staged",
        pairs_avg=1, pairs_avg_bounce=1, pairs_avg_shadow=1,
    )
    return cfg, scene


def test_terminal_overflow_raises():
    cfg, scene = _overflow_setup()
    with pytest.raises(BudgetOverflowError, match="truncated"):
        render_scene(cfg, scene=scene, max_budget_retries=0)


def test_terminal_overflow_env_optout(monkeypatch):
    monkeypatch.setenv("TPURT_ALLOW_OVERFLOW", "1")
    cfg, scene = _overflow_setup()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        state, stats = render_scene(cfg, scene=scene,
                                    max_budget_retries=0)
    assert stats["pair_overflow"]
    assert any(issubclass(w.category, RuntimeWarning) for w in caught)


def test_retry_clears_overflow():
    """The auto-retry loop doubles budgets until the trace is exact —
    the returned stats must show no overflow and ≥1 retry."""
    cfg, scene = _overflow_setup()
    state, stats = render_scene(cfg, scene=scene, max_budget_retries=10)
    assert not stats["pair_overflow"]
    assert stats["budget_retries"] >= 1
