"""Bloom prefilter: numpy-level contracts + engine parity with bloom
on/off/saturated (correctness must never depend on the bloom)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from remilia_spark import bloom, oracle
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine


def test_set_and_contains_no_false_negatives():
    bm = np.zeros(1 << 11, dtype=np.uint8)  # 16384 bits
    rng = np.random.RandomState(1)
    keys = rng.randint(-2**63, 2**63 - 1, size=500, dtype=np.int64)
    bloom.set_bits(bm, keys, 6)
    assert bloom.contains(bm, keys, 6).all()  # zero false negatives, ever
    other = rng.randint(-2**63, 2**63 - 1, size=2000, dtype=np.int64)
    fresh = other[~np.isin(other, keys)]
    fp = bloom.contains(bm, fresh, 6).mean()
    assert fp < 0.05  # 16k bits / 500 keys ~ 32 b/key -> tiny FP rate


def test_split_candidates_spark(spark):
    seen_hashes = spark.createDataFrame(
        [(i * 7919,) for i in range(200)], "url_hash long")
    b = bloom.update_bloom(
        bloom.empty_bloom(spark, 8), seen_hashes,
        num_buckets=8, n_bits=1 << 14, n_hashes=6)
    cand = spark.createDataFrame(
        [(i * 7919,) for i in range(150, 250)]      # 50 seen, 50 fresh
        + [(i * 104729 + 13,) for i in range(50)],  # definitely fresh
        "url_hash long")
    out = bloom.split_candidates(cand, b, num_buckets=8).collect()
    got = {r["url_hash"]: r["maybe_seen"] for r in out}
    assert len(got) == 150
    for i in range(150, 200):   # truly seen -> must be flagged (no FN)
        assert got[i * 7919] is True
    flagged_fresh = sum(got[i * 104729 + 13] for i in range(50))
    assert flagged_fresh <= 5   # FPs allowed but rare


def test_engine_parity_bloom_on_off_and_saturated(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages = spark.read.parquet(str(corpus_dir / "pages.parquet"))
    seeds = spark.read.parquet(str(corpus_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(corpus_dir / "robots.parquet"))

    base = dict(max_depth=2, max_supersteps=24, max_attempt=2)
    runs = {}
    for name, cfg in {
        "off": CrawlConfig(**base, bloom_enabled=False),
        "on": CrawlConfig(**base, bloom_enabled=True, bloom_min_seen=0),
        # pathologically tiny bitmap -> every candidate is a 'maybe' FP;
        # the exact anti-join backstop must keep results identical
        "saturated": CrawlConfig(**base, bloom_enabled=True,
                                 bloom_min_seen=0,
                                 bloom_num_buckets=2, bloom_bucket_bits=64,
                                 bloom_num_hashes=2),
    }.items():
        run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / name)
        runs[name] = {
            "events": [(r["superstep"], r["url"])
                       for r in run.fetch_events().collect()],
            "seen": {r["url"] for r in run.seen().collect()},
        }
    assert runs["on"] == runs["off"] == runs["saturated"]

    want = oracle.crawl(c.pages, c.seeds, c.robots,
                        CrawlConfig(**base, bloom_enabled=True))
    assert runs["on"]["seen"] == set(want.seen)

    # bloom state is committed with lineage like any other table
    from remilia_spark.storage import ParquetSnapshotStorage
    st = ParquetSnapshotStorage(spark, tmp_path / "on")
    man = st.manifest(st.last_committed())
    assert man["tables"]["bloom"]["rows"] >= 1
    keys = st.read_snapshot("bloom", st.last_committed()) \
        .agg(F.sum("n_keys")).collect()[0][0]
    assert keys == len(want.seen)
