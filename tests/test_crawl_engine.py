"""End-to-end: Spark engine must reproduce the oracle crawl exactly —
ordering, seen set, extracted text, terminal states (SURVEY §5.2 item 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remilia_spark import oracle
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine


def _load(spark, corpus_dir):
    pages = spark.read.parquet(str(corpus_dir / "pages.parquet"))
    seeds = spark.read.parquet(str(corpus_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(corpus_dir / "robots.parquet"))
    return pages, seeds, robots


def _assert_match(run, want, cfg):
    # 1. crawl-ordering match (target: 100%)
    got_events = [
        (r["superstep"], r["depth"], r["host_rank"], r["discovery_order"],
         r["url"])
        for r in run.fetch_events().collect()
    ]
    want_events = [tuple(e) for e in want.fetch_events]
    assert got_events == want_events

    # 2. URL-seen set equality (urls AND xxhash64 values)
    got_seen = {(r["url"], r["url_hash"], r["first_seen_superstep"])
                for r in run.seen().collect()}
    want_seen = {
        (u, __import__("remilia_spark.xxh64", fromlist=["x"]).xxhash64_spark(u), fs)
        for u, fs in want.seen.items()
    }
    assert got_seen == want_seen

    # 3. byte-identical extracted text per url
    got_text = {r["url"]: r["text"] for r in run.results().collect()}
    assert got_text == want.texts

    # 4. terminal frontier states
    got_states = {r["url"]: r["state"] for r in run.frontier().collect()}
    assert got_states == want.states


@pytest.mark.parametrize("cfg", [
    CrawlConfig(max_depth=1),                       # the reference 2-layer crawl
    CrawlConfig(max_depth=2, max_supersteps=40),    # deeper + retries kick in
    CrawlConfig(max_depth=2, bucket_capacity=3, fill_quantum=1,
                initial_tokens=2, max_supersteps=60),  # tight budgets defer
    CrawlConfig(max_depth=2, wave_size=7, max_supersteps=80),  # global cap
    # force the scalable range-partitioned discovery rank (the path big
    # waves take at 10^10 scale) — values must equal the oracle's exactly
    CrawlConfig(max_depth=2, max_supersteps=40, rank_small_wave=0,
                rank_partitions=4),
    # bucketed fetch join (Iceberg bucket-transform stand-in) — identical
    # results to the broadcast fetch path
    # (min_pages=0 forces bucketing — the size-adaptive default would
    # pick broadcast at this corpus size)
    CrawlConfig(max_depth=2, max_supersteps=40, fetch_buckets=4,
                fetch_bucket_min_pages=0),
], ids=["two-layer", "deep", "tight-budget", "wave-cap", "scalable-rank",
        "bucketed-fetch"])
def test_engine_matches_oracle(spark, tiny_corpus, tmp_path, cfg):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    want = oracle.crawl(c.pages, c.seeds, c.robots, cfg)
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "state")
    _assert_match(run, want, cfg)


def test_metrics_and_lineage(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    cfg = CrawlConfig(max_depth=1)
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "st")
    m = run.metrics()
    totals = m.where(F.col("partition_id") == -1).collect()
    assert len(totals) >= 1
    # per-partition rows_in sums to the wave total for each superstep
    per_part = (
        m.where(F.col("partition_id") >= 0)
        .groupBy("superstep").agg(F.sum("rows_in").alias("n")).collect()
    )
    tot = {r["superstep"]: r["rows_in"] for r in totals}
    for r in per_part:
        assert r["n"] == tot[r["superstep"]]
    # manifests carry per-file lineage
    man = run.storage.manifest(1)
    assert man["tables"]["frontier"]["rows"] > 0
    assert all(isinstance(v, int)
               for v in man["tables"]["frontier"]["files"].values())


def test_failed_urls_exhaust_attempts(spark, tiny_corpus, tmp_path):
    """URLs absent from the corpus retry with backoff then fail terminally
    (reference: retry stops at maxAttempt, backoff.go:171-199)."""
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    cfg = CrawlConfig(max_depth=2, max_attempt=3, max_supersteps=64)
    want = oracle.crawl(c.pages, c.seeds, c.robots, cfg)
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "state")
    _assert_match(run, want, cfg)
    got_states = {r["url"]: r["state"] for r in run.frontier().collect()}
    assert "failed" in set(got_states.values())  # the path was exercised
    failed = [u for u, st in got_states.items() if st == "failed"]
    fr = {r["url"]: r["attempt"] for r in run.frontier().collect()}
    for u in failed:
        assert fr[u] == cfg.max_attempt
