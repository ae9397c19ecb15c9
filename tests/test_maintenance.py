"""Checkpoint maintenance: seen-TTL expiry (cuckoo in-place delete vs
bloom rebuild) and out-of-band seed merge — ending in the full standing-
crawl loop: crawl → expire → merge → resume, with the expired URL
re-fetched and everything still-seen left alone."""

from __future__ import annotations

from pyspark.sql import functions as F

from remilia_spark import cuckoo, maintenance
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.storage import ParquetSnapshotStorage


def _crawl(spark, corpus_dir, state, **cfg_kw):
    cfg = CrawlConfig(max_depth=2, max_supersteps=60, max_attempt=2,
                      bloom_min_seen=0, **cfg_kw)
    pages = spark.read.parquet(str(corpus_dir / "pages.parquet"))
    seeds = spark.read.parquet(str(corpus_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(corpus_dir / "robots.parquet"))
    run = Engine(spark, cfg).run(pages, seeds, robots, state)
    return cfg, run, (pages, seeds, robots)


def test_expire_seen_cuckoo_deletes_in_place(spark, tiny_corpus, tmp_path):
    _, corpus_dir = tiny_corpus
    cfg, run, _ = _crawl(spark, corpus_dir, tmp_path / "st",
                         seen_filter="cuckoo", cuckoo_bucket_slots=1 << 8)
    st = run.storage
    s = st.last_committed()
    before = [(r["url_hash"], r["url"], r["first_seen_superstep"])
              for r in st.read_seen(s).collect()]
    assert any(fs == 0 for _, _, fs in before)   # seeds
    assert any(fs >= 1 for _, _, fs in before)   # discoveries

    stats = maintenance.expire_seen(spark, st, cfg, older_than=1)
    assert stats["superstep"] == s + 1
    assert stats["kept"] + stats["expired"] == len(before)
    assert stats["expired"] == sum(1 for _, _, fs in before if fs < 1)

    after = {(r["url_hash"], r["url"])
             for r in st.read_seen(s + 1).collect()}
    assert after == {(h, u) for h, u, fs in before if fs >= 1}

    # the filter was updated IN PLACE (no rebuild): kept keys all flagged,
    # expired keys collapse to the background FP rate
    filt = st.read_snapshot("bloom", s + 1)
    cand = spark.createDataFrame([(h,) for h, _, _ in before],
                                 "url_hash long")
    flags = {r["url_hash"]: r["maybe_seen"]
             for r in cuckoo.split_candidates(
                 cand, filt, num_buckets=cfg.bloom_num_buckets).collect()}
    for h, _, fs in before:
        if fs >= 1:
            assert flags[h] is True              # kept: no false negatives
    expired_flagged = sum(flags[h] for h, _, fs in before if fs < 1)
    assert expired_flagged <= 1

    # frontier/budgets were aliased, not rewritten
    man = st.manifest(s + 1)["tables"]
    assert man["frontier"] == st.manifest(s)["tables"]["frontier"]


def test_expire_seen_bloom_rebuilds(spark, tiny_corpus, tmp_path):
    _, corpus_dir = tiny_corpus
    cfg, run, _ = _crawl(spark, corpus_dir, tmp_path / "st")
    st = run.storage
    s = st.last_committed()
    n_before = st.read_seen(s).count()
    stats = maintenance.expire_seen(spark, st, cfg, older_than=1)
    assert stats["kept"] + stats["expired"] == n_before
    # bloom cannot forget -> rebuilt from the kept exact set
    keys = st.read_snapshot("bloom", s + 1) \
        .agg(F.sum("n_keys")).collect()[0][0]
    assert keys == stats["kept"]


def test_merge_seeds_dedups_against_seen(spark, tiny_corpus, tmp_path):
    _, corpus_dir = tiny_corpus
    cfg, run, _ = _crawl(spark, corpus_dir, tmp_path / "st")
    st = run.storage
    known = [r["url"] for r in st.read_seen(st.last_committed()).collect()]
    new = spark.createDataFrame(
        [(known[0], 0), ("http://brandnew.test/x", 1)],
        "url string, seed_order long")
    stats = maintenance.merge_seeds(spark, st, cfg, new)
    assert stats["merged"] == 1                  # known URL dropped
    s = st.last_committed()
    f = st.read_frontier(s).where(F.col("url") == "http://brandnew.test/x")
    row = f.collect()[0]
    assert row["state"] == "pending" and row["depth"] == 0
    # appended after the existing order space
    assert row["discovery_order"] > 0
    assert st.read_seen(s).where(
        F.col("url") == "http://brandnew.test/x").count() == 1


def test_standing_loop_expire_merge_resume(spark, tiny_corpus, tmp_path):
    """crawl → expire the seeds' TTL → merge one expired seed back →
    resume: the expired URL is fetched a second time, the kept URLs are
    not, and the re-fetch's discovered links (all still seen) add
    nothing."""
    _, corpus_dir = tiny_corpus
    cfg, run, (pages, seeds, robots) = _crawl(
        spark, corpus_dir, tmp_path / "st",
        seen_filter="cuckoo", cuckoo_bucket_slots=1 << 8)
    st = run.storage
    first_events = [(r["superstep"], r["url"])
                    for r in run.fetch_events().collect()]
    fetched_urls = [u for _, u in first_events]
    seed_url = [r["url"] for r in st.read_seen(st.last_committed())
                .where(F.col("first_seen_superstep") == 0).collect()][0]
    assert seed_url in fetched_urls

    maintenance.expire_seen(spark, st, cfg, older_than=1)
    merged = maintenance.merge_seeds(
        spark, st, cfg,
        spark.createDataFrame([(seed_url, 0)],
                              "url string, seed_order long"),
        robots=robots)
    assert merged["merged"] == 1

    run2 = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "st",
                                  resume=True)
    second_events = [(r["superstep"], r["url"])
                     for r in run2.fetch_events().collect()]
    assert len(second_events) == len(first_events) + 1
    refetches = [e for e in second_events[len(first_events):]]
    assert refetches[0][1] == seed_url
    # exactly-once held for everything that stayed seen
    for u in set(fetched_urls) - {seed_url}:
        assert sum(1 for _, x in second_events if x == u) \
            == sum(1 for _, x in first_events if x == u)
