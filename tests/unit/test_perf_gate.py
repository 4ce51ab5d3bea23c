"""Perf-regression gate logic (SURVEY.md §4.4 item 6, VERDICT r2 #3).

The hardware side (fresh-subprocess ladder runs) is exercised by
`python benchmarks/run.py --check` on the TPU box; here the gate's
decision function is tested directly — a deliberately slowed config
(measured below its committed floor) must trip it.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from benchmarks.run import FLOORS_PATH, LADDER, check_floors


def test_slow_config_trips_gate():
    floors = {"bunny": 6.8}
    rows = [{"config": "bunny", "mrays_per_s": 3.0}]  # "slowed kernel"
    failures, skipped = check_floors(rows, floors)
    assert len(failures) == 1 and "bunny" in failures[0]
    assert not skipped


def test_fast_config_passes_gate():
    floors = {"bunny": 6.8, "cornell": 3.7}
    rows = [
        {"config": "bunny", "mrays_per_s": 9.4},
        {"config": "cornell", "mrays_per_s": 4.7},
    ]
    failures, skipped = check_floors(rows, floors)
    assert not failures and not skipped


def test_errored_config_trips_gate():
    failures, _ = check_floors([{"config": "sponza", "error": True}], {})
    assert len(failures) == 1 and "sponza" in failures[0]


def test_unknown_config_skipped_not_failed():
    failures, skipped = check_floors(
        [{"config": "new_scene", "mrays_per_s": 1.0}], {"bunny": 6.8}
    )
    assert not failures and skipped == ["new_scene"]


def test_committed_floors_cover_ladder():
    """Every ladder config has a committed floor in both tables — a new
    ladder entry without a floor would silently bypass the gate."""
    with open(FLOORS_PATH) as f:
        doc = json.load(f)
    names = {name for name, _, _ in LADDER}
    for key in ("quick", "full"):
        missing = names - set(doc[key])
        assert not missing, f"no {key} floor for {missing}"
