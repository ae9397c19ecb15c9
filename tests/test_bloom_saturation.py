"""Bloom saturation (VERDICT r2 #8): past the design FP point the
prefilter degrades toward pass-through — that must be VISIBLE (stats flag
+ metrics row) and correctness-neutral (the exact anti-join backstop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.oracle import crawl as oracle_crawl


def _load(spark, corpus_dir):
    return (spark.read.parquet(str(corpus_dir / "pages.parquet")),
            spark.read.parquet(str(corpus_dir / "seeds.parquet")),
            spark.read.parquet(str(corpus_dir / "robots.parquet")))


def test_saturated_bloom_visible_and_correct(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    # 2 buckets x 64 bits and an engaged prefilter from the first key:
    # the ~60-URL corpus saturates the bitmaps immediately
    cfg = CrawlConfig(max_depth=2, max_supersteps=40,
                      bloom_num_buckets=2, bloom_bucket_bits=64,
                      bloom_num_hashes=4, bloom_min_seen=0)
    want = oracle_crawl(c.pages, c.seeds, c.robots, cfg)
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "st")

    # 1. degradation is correctness-neutral: crawl matches the oracle
    got = [
        (r["superstep"], r["depth"], r["host_rank"], r["discovery_order"],
         r["url"]) for r in run.fetch_events().collect()
    ]
    assert got == [tuple(e) for e in want.fetch_events]

    # 2. saturation is visible: stats flag + keys/bucket measure ...
    sat = [s for s in run.stats if s.get("bloom_saturated")]
    assert sat, "tiny bloom must report saturation"
    assert sat[-1]["bloom_keys_per_bucket"] > 64 / 9.6

    # ... and the committed metrics carry the watchdog row
    m = run.metrics()
    rows = m.where(F.col("partition_id") == -3).collect()
    assert rows and all(r["rows_in"] > 0 for r in rows)


def test_unsaturated_bloom_stays_quiet(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    cfg = CrawlConfig(max_depth=1)  # default 16 KiB buckets, 60 URLs
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "st")
    assert not any(s.get("bloom_saturated") for s in run.stats)
    assert run.metrics().where(F.col("partition_id") == -3).count() == 0
