"""Delta-chain bounding: frontier fold broadcast choice is size-dependent,
seen compaction folds the chain without changing results, and the manifest
carries running totals (VERDICT r2 items #3/#5/#7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remilia_spark import storage as st
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.oracle import crawl as oracle_crawl


def _load(spark, corpus_dir):
    return (spark.read.parquet(str(corpus_dir / "pages.parquet")),
            spark.read.parquet(str(corpus_dir / "seeds.parquet")),
            spark.read.parquet(str(corpus_dir / "robots.parquet")))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fold_broadcast_strategy_is_size_dependent(spark, tiny_corpus,
                                                   tmp_path, monkeypatch):
    """Small recorded delta chains fold with a forced broadcast; chains
    above BROADCAST_FOLD_MAX_ROWS drop the hint (storage.py r2 flaw: the
    touched-keys set was force-broadcast unconditionally — an OOM at
    10^8-row waves)."""
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    cfg = CrawlConfig(max_depth=2, max_supersteps=40,
                      frontier_compact_every=10_000,
                      frontier_compact_rows=10_000_000)
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "s1")
    s = run.last_superstep
    ent = run.storage.manifest(s)["tables"]["frontier"]
    assert ent["deltas"], "test needs an uncompacted delta chain"
    assert ent["delta_rows"] > 0

    # Dump plans with stats-based auto-broadcast OFF so what remains is
    # exactly the engine's explicit choice (on real data the optimizer may
    # of course still pick a broadcast from true sizes — that's fine and
    # not what this test pins).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # recorded chain is tiny -> fold FORCES the broadcast via hint
        assert "broadcasthashjoin" in \
            _plan(run.storage.read_frontier(s)).lower()
        # bound forced to zero -> no hint -> shuffle anti-join
        monkeypatch.setattr(st, "BROADCAST_FOLD_MAX_ROWS", 0)
        plan = _plan(run.storage.read_frontier(s))
        assert "broadcasthashjoin" not in plan.lower()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # and the un-hinted fold still returns identical rows
    a = {tuple(r) for r in run.storage.read_frontier(s).drop("rev").collect()}
    monkeypatch.undo()
    b = {tuple(r) for r in run.storage.read_frontier(s).drop("rev").collect()}
    assert a == b


def test_compact_by_delta_mass(spark, tiny_corpus, tmp_path):
    """frontier_compact_rows=0 forces a base rewrite every busy superstep —
    the mass trigger — and the crawl still matches the oracle exactly."""
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    cfg = CrawlConfig(max_depth=2, max_supersteps=40,
                      frontier_compact_every=10_000,
                      frontier_compact_rows=0)
    want = oracle_crawl(c.pages, c.seeds, c.robots, cfg)
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "s2")
    ent = run.storage.manifest(run.last_superstep)["tables"]["frontier"]
    assert ent["deltas"] == []          # every commit became a base
    got = [
        (r["superstep"], r["depth"], r["host_rank"], r["discovery_order"],
         r["url"]) for r in run.fetch_events().collect()
    ]
    assert got == [tuple(e) for e in want.fetch_events]


@pytest.mark.parametrize("every", [1, 3])
def test_seen_compaction_preserves_results(spark, tiny_corpus, tmp_path,
                                           every):
    cfg_plain = CrawlConfig(max_depth=2, max_supersteps=40,
                            seen_compact_every=10_000)
    cfg_fold = CrawlConfig(max_depth=2, max_supersteps=40,
                           seen_compact_every=every)
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    r1 = Engine(spark, cfg_plain).run(pages, seeds, robots, tmp_path / "a")
    r2 = Engine(spark, cfg_fold).run(pages, seeds, robots, tmp_path / "b")
    seen1 = {tuple(r) for r in r1.seen().collect()}
    seen2 = {tuple(r) for r in r2.seen().collect()}
    assert seen1 == seen2
    ev1 = [tuple(r) for r in r1.fetch_events().collect()]
    ev2 = [tuple(r) for r in r2.fetch_events().collect()]
    assert ev1 == ev2
    # the fold actually happened: chain length stays under the cadence
    ent = r2.storage.manifest(r2.last_superstep)["tables"]["seen"]
    assert len(ent["deltas"]) < 10_000
    assert ent["base"] > 0


def test_manifest_running_totals(spark, tiny_corpus, tmp_path):
    """total_rows / delta_rows ride in the manifest: one O(1) read per
    superstep replaces the O(s) scan (VERDICT #7), and totals equal the
    actual table sizes."""
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    cfg = CrawlConfig(max_depth=2, max_supersteps=40, seen_compact_every=3)
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "s3")
    s = run.last_superstep
    ent = run.storage.manifest(s)["tables"]["seen"]
    assert ent["total_rows"] == run.seen().count()
    f_ent = run.storage.manifest(s)["tables"]["frontier"]
    assert f_ent["delta_rows"] >= 0


def test_resume_across_compacted_seen(spark, tiny_corpus, tmp_path):
    """Kill after a compaction commit, resume — no duplicate fetches and
    the chained seen reads stay consistent."""
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    cfg = CrawlConfig(max_depth=2, max_supersteps=40, seen_compact_every=2)
    want = oracle_crawl(c.pages, c.seeds, c.robots, cfg)
    full = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "full")

    part = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "st",
                                  max_supersteps=3)
    assert part.last_superstep == 3
    resumed = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "st",
                                     resume=True)
    ev_full = [tuple(r) for r in full.fetch_events().collect()]
    ev_res = [tuple(r) for r in resumed.fetch_events().collect()]
    assert ev_res == ev_full
    want_events = [tuple(e) for e in want.fetch_events]
    assert [(r["superstep"], r["depth"], r["host_rank"],
             r["discovery_order"], r["url"])
            for r in resumed.fetch_events().collect()] == want_events
    assert {tuple(r) for r in resumed.seen().collect()} == \
           {tuple(r) for r in full.seen().collect()}
