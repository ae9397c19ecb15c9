"""Recrawl scheduling (remilia_spark.recrawl): hand-computed change
counts, clamping, single-fetch fallback, partitioning invariance."""

from __future__ import annotations

import pytest

from remilia_spark import recrawl

BASE = 1_704_067_200  # 2024-01-01T00:00:00Z


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "url string, fetch_idx long, fetch_epoch long, "
              "content_hash string")


@pytest.fixture(scope="module")
def history(spark):
    def fetches(url, hashes):
        return [(url, i, BASE + i * 86400, h) for i, h in enumerate(hashes)]

    rows = (
        fetches("u/hot", ["a", "b", "c", "d"])        # changes every visit
        + fetches("u/slow", ["a", "a", "a", "b"])      # one change
        + fetches("u/static", ["a", "a", "a", "a"])    # never changes
        + fetches("u/new", ["a"])                      # single fetch
    )
    return _hist(spark, rows)


def test_change_stats_by_hand(history):
    got = {r["url"]: r.asDict() for r in
           recrawl.change_stats(history).collect()}
    assert got["u/hot"]["n_changes"] == 3
    assert got["u/hot"]["change_rate"] == 1.0
    assert got["u/slow"]["n_changes"] == 1
    assert got["u/slow"]["change_rate"] == round(1 / 3, 6)
    assert got["u/static"]["n_changes"] == 0
    assert got["u/static"]["change_rate"] == 0.0
    assert got["u/new"] == {"url": "u/new", "n_fetches": 1, "n_changes": 0,
                            "change_rate": 0.0, "last_epoch": BASE}


def test_schedule_intervals_and_clamps(history):
    out = {r["url"]: r.asDict() for r in recrawl.recrawl_schedule(
        history, base_interval_s=8 * 86400, min_interval_s=3 * 86400,
        max_interval_s=6 * 86400).collect()}
    # hot: 8d div 4 = 2d -> clamped up to min 3d
    assert out["u/hot"]["next_interval_s"] == 3 * 86400
    # slow: 8d div 2 = 4d, inside the clamp
    assert out["u/slow"]["next_interval_s"] == 4 * 86400
    # static: 8d div 1 = 8d -> clamped down to max 6d
    assert out["u/static"]["next_interval_s"] == 6 * 86400
    last = BASE + 3 * 86400
    assert out["u/hot"]["next_fetch_epoch"] == last + 3 * 86400
    assert out["u/static"]["next_fetch_epoch"] == last + 6 * 86400
    # single fetch: last_epoch is the only fetch
    assert out["u/new"]["next_fetch_epoch"] == BASE + 6 * 86400


def test_partitioning_invariance(history):
    a = sorted(map(tuple, recrawl.recrawl_schedule(history).collect()))
    b = sorted(map(tuple, recrawl.recrawl_schedule(
        history.repartition(13)).collect()))
    assert a == b


def test_bad_clamp_raises(history):
    with pytest.raises(ValueError):
        recrawl.recrawl_schedule(history, min_interval_s=10,
                                 max_interval_s=5)


def test_revisit_compact_nulls_unchanged_text(spark, history):
    """Unchanged refetch -> revisit=true + text nulled; changed or brand-new
    urls keep their text.  The LAST history hash decides, not any earlier
    one."""
    import hashlib

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    # history fixture's last hashes: u/hot -> "d", u/static -> "a"
    results = spark.createDataFrame(
        [("u/hot", "d-text"),        # md5 != md5("d") fixture hash: changed
         ("u/static", "same"),       # crafted below to match last hash
         ("u/unseen", "fresh")],
        "url string, text string")
    # craft a history whose stored hash IS md5 of the current text so the
    # unchanged case actually triggers (fixture hashes are letters, not md5s)
    hist = _hist(spark, [
        ("u/hot", 0, BASE, md5("old")),           # changed since
        ("u/hot", 1, BASE + 1, md5("older")),     # (last = fetch_idx 1)
        ("u/static", 0, BASE, md5("not-this")),
        ("u/static", 1, BASE + 1, md5("same")),   # last matches current
    ])
    out = {r["url"]: r for r in
           recrawl.revisit_compact(results, hist).collect()}
    assert out["u/static"]["revisit"] is True
    assert out["u/static"]["text"] is None
    assert out["u/static"]["content_hash"] == md5("same")  # still addressable
    assert out["u/hot"]["revisit"] is False
    assert out["u/hot"]["text"] == "d-text"
    assert out["u/unseen"]["revisit"] is False
    assert out["u/unseen"]["text"] == "fresh"
