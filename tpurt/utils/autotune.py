"""Measured live-wave caps for the sorted-wave pipeline (G8 analog).

The sorted-wave pipeline (tpurt/render/staged.py) sorts dead rays to the
back of every bounce wave; truncating the wave at a cap ≥ the live count
drops only dead rays and shrinks every downstream stage (sort, exact
mask, pair expansion, kernel launches) to the live prefix — the
TPU-native equivalent of the reference's hardware ray compaction
(SURVEY.md G8: the wavefront stays dense). Live counts are scene- and
sampling-dependent, so caps are MEASURED: an uncapped render records
per-bounce live-wave totals in its stats ("live_counts"), and this
module persists them keyed by the config's sampling signature.

Lookup order: the committed ladder table (benchmarks/autotune.json —
measured on TPU for the five BASELINE.json configs) then the user cache
(~/.cache/tpurt_autotune.json, written when TPURT_AUTOTUNE_WRITE=1).
Caps carry a safety margin and any cap that would cut alive rays trips
the live_overflow counter, which makes render_scene re-render uncapped —
truncation is never silent (same contract as the pair budgets,
VERDICT r2 #5).
"""

from __future__ import annotations

import json
import os

# margin over the measured per-batch average live count: covers
# batch-to-batch (sample window / seed) variation; the live_overflow
# retry path catches anything beyond it
MARGIN = 1.35


def autotune_key(config) -> str:
    """Sampling signature: everything the per-bounce live counts depend
    on (scene content + resolution + per-batch sample count + path
    termination rules)."""
    return (
        f"{config.scene}|{config.width}x{config.height}"
        f"|sppb{config.spp_per_batch}|b{config.max_bounces}"
        f"|nee{config.use_nee}|{config.shading_mode}"
    )


def _repo_table() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "benchmarks", "autotune.json",
    )


def _user_table() -> str:
    return os.environ.get(
        "TPURT_AUTOTUNE_PATH",
        os.path.expanduser("~/.cache/tpurt_autotune.json"),
    )


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def live_caps_for(config) -> tuple:
    """Measured live caps for ``config`` (empty tuple = no entry).

    Entry b caps the bounce-(b+1) trace wave; the last bounce's wave is
    never traced so it gets no cap. Caps are ceil(measured · MARGIN) in
    rays; staged.py rounds to the kernel tile size and drops caps that
    exceed the wave."""
    key = autotune_key(config)
    entry = _load(_user_table()).get(key) or _load(_repo_table()).get(key)
    if not entry:
        return ()
    live = entry.get("live_per_batch") or []
    if not live:
        return ()
    # live[b] = rays alive after bounce b's shade; the wave traced at
    # bounce b+1. The final entry caps nothing (no trace follows).
    return tuple(
        int(-(-v * MARGIN // 1)) for v in live[: config.max_bounces]
    )


def want_caps_for(config) -> tuple:
    """Measured NEE want caps (shadow-wave truncation, round 4): entry b
    caps bounce b's occlusion trace. Empty tuple = no entry."""
    key = autotune_key(config)
    entry = _load(_user_table()).get(key) or _load(_repo_table()).get(key)
    if not entry:
        return ()
    want = entry.get("want_per_batch") or []
    if not want:
        return ()
    return tuple(
        int(-(-v * MARGIN // 1)) for v in want[: config.max_bounces + 1]
    )


def record(config, stats) -> None:
    """Persist measured per-bounce live/want counts from an UNCAPPED
    render's stats into the user cache (call sites gate on
    TPURT_AUTOTUNE_WRITE=1)."""
    live = stats.get("live_counts") or []
    want = stats.get("want_counts") or []
    if (not live and not want) or stats.get("live_overflow"):
        return
    batches = max(
        1, -(-int(stats.get("spp", config.spp_per_batch))
             // config.spp_per_batch),
    )
    path = _user_table()
    table = _load(path)
    key = autotune_key(config)
    entry = dict(table.get(key, {}))
    for field, vals in (("live_per_batch", live),
                       ("want_per_batch", want)):
        if not vals:
            continue
        per_batch = [v / batches for v in vals]
        prev = entry.get(field)
        if prev:
            # keep the max ever observed (conservative caps)
            per_batch = [max(a, b) for a, b in zip(per_batch, prev)]
        entry[field] = per_batch
    table[key] = entry
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
