"""Cuckoo seen-filter: numpy contracts (no false negatives ever, FP rate,
duplicate-fp slots, deletion, saturation-on-overflow) + Spark seam +
engine parity with the bloom path (correctness must never depend on which
prefilter fills the manifest slot)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from remilia_spark import cuckoo, oracle
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine


def _keys(n, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randint(-2**63, 2**63 - 1, size=n, dtype=np.int64)


def test_insert_contains_no_false_negatives():
    tbl = cuckoo.new_table(1 << 10)  # 4096 slots
    keys = _keys(2000)               # ~49% load
    assert cuckoo.insert(tbl, keys) == 0
    assert cuckoo.contains(tbl, keys).all()  # zero false negatives, ever
    other = _keys(5000, seed=2)
    fresh = other[~np.isin(other, keys)]
    fp = cuckoo.contains(tbl, fresh).mean()
    # 16-bit fps, 2 buckets x 4 slots probed: FP ~ 8/2^16 ~ 0.012%
    assert fp < 0.01


def test_duplicate_fingerprints_occupy_own_slots():
    """Two keys that collide on (home bucket, fingerprint) must each get a
    slot — else deleting one would erase the other's membership."""
    tbl = cuckoo.new_table(1 << 6)
    base = _keys(1)[:1]
    # same key inserted twice IS the worst case: identical (bucket, fp)
    both = np.concatenate([base, base])
    assert cuckoo.insert(tbl, both) == 0
    fp = cuckoo._fingerprints(base)[0]
    assert (tbl == fp).sum() == 2  # two physical copies
    assert cuckoo.delete(tbl, base) == 1
    assert cuckoo.contains(tbl, base).all()  # second copy still answers
    assert cuckoo.delete(tbl, base) == 1
    assert not cuckoo.contains(tbl, base).any()


def test_delete_removes_membership():
    tbl = cuckoo.new_table(1 << 10)
    keys = _keys(1500)
    cuckoo.insert(tbl, keys)
    gone, kept = keys[:500], keys[500:]
    assert cuckoo.delete(tbl, gone) == 500
    assert cuckoo.contains(tbl, kept).all()      # untouched keys intact
    # deleted keys may still FP against other keys' fps, but the rate
    # must collapse to the background FP rate, not stay at 100%
    assert cuckoo.contains(tbl, gone).mean() < 0.01


def test_overflow_reports_failures():
    tbl = cuckoo.new_table(1 << 4)               # 64 slots
    failed = cuckoo.insert(tbl, _keys(200))      # 3x capacity
    assert failed >= 200 - 64                    # must not silently drop
    assert (tbl != 0).sum() <= 64


def test_power_of_two_enforced():
    with pytest.raises(ValueError):
        cuckoo.new_table(1000)


def test_spark_seam_update_split_delete(spark):
    keys = _keys(300, seed=7)
    first100 = keys[:100]
    seen = spark.createDataFrame([(int(k),) for k in keys], "url_hash long")
    sub100 = spark.createDataFrame([(int(k),) for k in first100],
                                   "url_hash long")
    filt = cuckoo.update_cuckoo(
        cuckoo.empty_cuckoo(spark, 8), seen, num_buckets=8, n_slots=1 << 8)
    cand = sub100.unionByName(
        spark.createDataFrame([(int(k),) for k in _keys(100, seed=9)],
                              "url_hash long"))
    out = {r["url_hash"]: r["maybe_seen"]
           for r in cuckoo.split_candidates(cand, filt,
                                            num_buckets=8).collect()}
    seen_set = {int(k) for k in first100}
    for k, flagged in out.items():
        if k in seen_set:
            assert flagged is True               # no false negatives
    fresh_flagged = sum(v for k, v in out.items() if k not in seen_set)
    assert fresh_flagged <= 2

    # delete those 100 seen keys -> they stop being flagged
    filt2 = cuckoo.delete_keys(filt, sub100, num_buckets=8)
    out2 = cuckoo.split_candidates(cand, filt2, num_buckets=8).collect()
    flagged2 = sum(r["maybe_seen"] for r in out2)
    assert flagged2 <= 2                         # only residual FPs remain
    n_keys = filt2.agg(F.sum("n_keys")).collect()[0][0]
    assert n_keys == 200


def test_saturated_shard_degrades_to_pass_through(spark):
    """An overfull shard must flag EVERY candidate (pass-through), never
    answer definitely-fresh for a key it failed to store."""
    seen = spark.createDataFrame(
        [(int(k),) for k in _keys(400, seed=3)], "url_hash long")
    filt = cuckoo.update_cuckoo(
        cuckoo.empty_cuckoo(spark, 1), seen, num_buckets=1, n_slots=1 << 4)
    rows = filt.collect()
    assert len(rows) == 1 and rows[0]["saturated"] is True
    cand = spark.createDataFrame(
        [(int(k),) for k in _keys(50, seed=11)], "url_hash long")
    out = cuckoo.split_candidates(cand, filt, num_buckets=1).collect()
    assert all(r["maybe_seen"] for r in out)


def test_engine_parity_cuckoo_vs_bloom(spark, tiny_corpus, tmp_path):
    """Identical crawl (fetch log + seen set) whichever filter fills the
    slot — including a pathologically tiny cuckoo that saturates."""
    c, corpus_dir = tiny_corpus
    pages = spark.read.parquet(str(corpus_dir / "pages.parquet"))
    seeds = spark.read.parquet(str(corpus_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(corpus_dir / "robots.parquet"))

    base = dict(max_depth=2, max_supersteps=24, max_attempt=2)
    runs = {}
    for name, cfg in {
        "bloom": CrawlConfig(**base, bloom_enabled=True, bloom_min_seen=0),
        "cuckoo": CrawlConfig(**base, bloom_enabled=True, bloom_min_seen=0,
                              seen_filter="cuckoo",
                              cuckoo_bucket_slots=1 << 8),
        "cuckoo_saturated": CrawlConfig(
            **base, bloom_enabled=True, bloom_min_seen=0,
            seen_filter="cuckoo", bloom_num_buckets=2,
            cuckoo_bucket_slots=1 << 2),
    }.items():
        run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / name)
        runs[name] = {
            "events": [(r["superstep"], r["url"])
                       for r in run.fetch_events().collect()],
            "seen": {r["url"] for r in run.seen().collect()},
        }
    assert runs["bloom"] == runs["cuckoo"] == runs["cuckoo_saturated"]

    want = oracle.crawl(c.pages, c.seeds, c.robots, CrawlConfig(**base))
    assert runs["cuckoo"]["seen"] == set(want.seen)

    # cuckoo state commits with lineage like any other table
    from remilia_spark.storage import ParquetSnapshotStorage
    st = ParquetSnapshotStorage(spark, tmp_path / "cuckoo")
    man = st.manifest(st.last_committed())
    assert man["tables"]["bloom"]["rows"] >= 1
    keys = st.read_snapshot("bloom", st.last_committed()) \
        .agg(F.sum("n_keys")).collect()[0][0]
    assert keys == len(want.seen)
