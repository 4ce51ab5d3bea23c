"""AOT executable cache: LRU size bound + stats (VERDICT r4 weak #4).

Pure-filesystem tests (no TPU, no jax): the eviction and accounting
logic must hold regardless of backend."""

import os
import time

from tpurt.utils import aotcache


def _mk(d, name, mb, age_s):
    p = os.path.join(d, name)
    with open(p, "wb") as f:
        f.write(b"\0" * (mb * 1024 * 1024))
    t = time.time() - age_s
    os.utime(p, (t, t))
    return p


def test_evict_lru_oldest_first(tmp_path, monkeypatch):
    d = str(tmp_path)
    monkeypatch.setenv("TPURT_AOT_CACHE_DIR", d)
    monkeypatch.setenv("TPURT_AOT_CACHE_MAX_GB", str(5 / 1024))  # 5 MB
    old = _mk(d, "stage_a-k1.bin", 2, age_s=300)
    mid = _mk(d, "stage_b-k2.bin", 2, age_s=200)
    new = _mk(d, "stage_c-k3.bin", 2, age_s=100)
    aotcache._evict_lru(keep_path=new)
    # 6 MB > 5 MB cap: the single oldest entry goes, the rest stay
    assert not os.path.exists(old)
    assert os.path.exists(mid)
    assert os.path.exists(new)


def test_evict_never_removes_keep_path(tmp_path, monkeypatch):
    d = str(tmp_path)
    monkeypatch.setenv("TPURT_AOT_CACHE_DIR", d)
    monkeypatch.setenv("TPURT_AOT_CACHE_MAX_GB", str(1 / 1024))  # 1 MB
    keep = _mk(d, "stage_k-old.bin", 2, age_s=500)  # oldest AND kept
    other = _mk(d, "stage_o-new.bin", 2, age_s=10)
    aotcache._evict_lru(keep_path=keep)
    assert os.path.exists(keep)
    assert not os.path.exists(other)  # everything else evictable


def test_evict_noop_under_cap(tmp_path, monkeypatch):
    d = str(tmp_path)
    monkeypatch.setenv("TPURT_AOT_CACHE_DIR", d)
    monkeypatch.setenv("TPURT_AOT_CACHE_MAX_GB", "1")
    p = _mk(d, "stage_a-k1.bin", 1, age_s=100)
    aotcache._evict_lru()
    assert os.path.exists(p)


def test_stats_counts_bin_entries(tmp_path, monkeypatch):
    d = str(tmp_path)
    monkeypatch.setenv("TPURT_AOT_CACHE_DIR", d)
    _mk(d, "stage_a-k1.bin", 1, age_s=10)
    _mk(d, "stage_b-k2.bin", 2, age_s=10)
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("not a cache entry")
    s = aotcache.stats()
    assert s["entries"] == 2
    assert s["bytes"] == 3 * 1024 * 1024
    assert s["dir"] == d
    assert s["max_bytes"] == aotcache._max_bytes()


def test_timers_shape():
    t = aotcache.timers()
    assert set(t) == {"compile_s", "load_s"}
    assert all(v >= 0.0 for v in t.values())
