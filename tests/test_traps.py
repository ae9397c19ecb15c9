"""Spider-trap detection + per-host frontier budget (traps.py).

The engine-integration test pins the guarded crawl against the Python
oracle (which mirrors the cap) — ordering, seen set, terminal states —
and checks the invariant the guard exists for: no host's pending queue
ever exceeds the cap at any committed superstep.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remilia_spark import oracle
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.storage import ParquetSnapshotStorage
from remilia_spark.traps import cap_new_per_host, trap_signals


def test_trap_signals_values(spark):
    rows = []
    # trap host: 60 calendar URLs, every path collapses to '/cal/N/N';
    # every third one carries a query string
    for i in range(60):
        q = "?p=1" if i % 3 == 0 else ""
        rows.append((f"https://trap.test/cal/{2000 + i}/{i % 12}{q}",))
    # healthy host: 40 URLs whose templates keep a letter prefix
    for i in range(40):
        rows.append((f"https://ok.test/{'abcdefghij'[i % 10]}{i}/x{i // 10}",))
    df = spark.createDataFrame(rows, "url string")
    out = {r["host"]: r for r in trap_signals(
        df, min_urls=50, max_template_ratio=0.2).collect()}

    t = out["trap.test"]
    assert (t["n_urls"], t["n_templates"]) == (60, 1)
    assert t["sum_depth"] == 180          # 3 segments each
    assert t["n_query"] == 20
    assert t["is_trap"]

    o = out["ok.test"]
    assert (o["n_urls"], o["n_templates"]) == (40, 10)
    assert o["sum_depth"] == 80
    assert o["n_query"] == 0
    assert not o["is_trap"]               # under min_urls AND ratio 0.25


def test_trap_signals_approx_mode_runs(spark):
    df = spark.createDataFrame(
        [(f"https://h.test/p{i}",) for i in range(30)], "url string")
    r = trap_signals(df, approx=True).collect()[0]
    assert r["n_urls"] == 30 and r["n_templates"] >= 1


def _fresh_df(spark, rows):
    return spark.createDataFrame(
        rows, "host string, url string, parent_order long, "
              "link_index int, url_hash long")


def test_cap_new_per_host_keep_rule(spark):
    fresh = _fresh_df(spark, [
        # h1: pending 3, cap 5 => capacity 2 — first two by discovery order
        ("h1", "u10", 1, 0, 10), ("h1", "u11", 1, 1, 11),
        ("h1", "u12", 2, 0, 12), ("h1", "u13", 2, 1, 13),
        # h2: no pending row => full capacity 5 — all kept
        ("h2", "u20", 1, 2, 20), ("h2", "u21", 3, 0, 21),
        # h3: saturated (pending 7 >= cap) — all dropped via plain filter
        ("h3", "u30", 0, 0, 30), ("h3", "u31", 0, 1, 31),
    ])
    pend = spark.createDataFrame(
        [("h1", 3), ("h3", 7)], "host string, _n_pending long")
    kept = {r["url"] for r in
            cap_new_per_host(fresh, pend, cap=5).collect()}
    assert kept == {"u10", "u11", "u20", "u21"}

    # the small-wave shortcut (no salt stage) is the identical answer
    kept_small = {r["url"] for r in cap_new_per_host(
        fresh, pend, cap=5, approx_rows=8, small_max=100).collect()}
    assert kept_small == kept


def test_engine_trap_cap_matches_oracle(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages = spark.read.parquet(str(corpus_dir / "pages.parquet"))
    seeds = spark.read.parquet(str(corpus_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(corpus_dir / "robots.parquet"))
    cfg = CrawlConfig(max_depth=2, max_supersteps=40, trap_max_pending=3)

    want = oracle.crawl(c.pages, c.seeds, c.robots, cfg)
    state = tmp_path / "state"
    run = Engine(spark, cfg).run(pages, seeds, robots, state)

    got_events = [
        (r["superstep"], r["depth"], r["host_rank"], r["discovery_order"],
         r["url"]) for r in run.fetch_events().collect()]
    assert got_events == [tuple(e) for e in want.fetch_events]
    got_states = {r["url"]: r["state"] for r in run.frontier().collect()}
    assert got_states == want.states
    got_seen = {r["url"] for r in run.seen().collect()}
    assert got_seen == set(want.seen)

    # the invariant the guard exists for: pending-per-host <= cap at
    # every committed superstep
    storage = ParquetSnapshotStorage(spark, state)
    s = 0
    while True:
        try:
            fr = storage.read_frontier(s)
        except Exception:
            break
        if fr is None:
            break
        over = (fr.where(F.col("state") == "pending")
                .groupBy("host").count()
                .where(F.col("count") > cfg.trap_max_pending).count())
        assert over == 0, f"superstep {s} exceeds trap_max_pending"
        s += 1
    assert s >= 2  # the walk actually visited committed snapshots


def test_engine_trap_cap_with_allowlist_matches_oracle(
        spark, tiny_corpus, tmp_path):
    """Off-allowlist rows are terminal 'filtered' bookkeeping — they must
    bypass the trap cap exactly like robots-blocked rows do (the oracle's
    ``not blocked`` gate), or the two sides disagree on which candidates
    consume per-host capacity."""
    c, corpus_dir = tiny_corpus
    pages = spark.read.parquet(str(corpus_dir / "pages.parquet"))
    seeds = spark.read.parquet(str(corpus_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(corpus_dir / "robots.parquet"))
    cfg = CrawlConfig(
        max_depth=2, max_supersteps=40, trap_max_pending=2,
        allowed_domains=("host0.test", "host1.test", "host2.test"))

    want = oracle.crawl(c.pages, c.seeds, c.robots, cfg)
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "state")

    got_events = [
        (r["superstep"], r["depth"], r["host_rank"], r["discovery_order"],
         r["url"]) for r in run.fetch_events().collect()]
    assert got_events == [tuple(e) for e in want.fetch_events]
    got_states = {r["url"]: r["state"] for r in run.frontier().collect()}
    assert got_states == want.states
    # the allowlist actually bit: some rows are filtered on hosts with no
    # robots rule (i.e. filtered purely by the allowlist)
    assert any(s == "filtered" and ("host3.test" in u or "host4.test" in u)
               for u, s in got_states.items())


def test_trap_cap_drops_are_rediscoverable(spark, tiny_corpus, tmp_path):
    """A dropped candidate is not marked seen: the guarded run's seen set
    is a subset of the unguarded run's, never a divergent set."""
    c, corpus_dir = tiny_corpus
    cfg_open = CrawlConfig(max_depth=2, max_supersteps=40)
    cfg_cap = CrawlConfig(max_depth=2, max_supersteps=40, trap_max_pending=2)
    want_open = oracle.crawl(c.pages, c.seeds, c.robots, cfg_open)
    want_cap = oracle.crawl(c.pages, c.seeds, c.robots, cfg_cap)
    assert set(want_cap.seen) <= set(want_open.seen)
    assert len(want_cap.seen) < len(want_open.seen)  # the cap actually bit
