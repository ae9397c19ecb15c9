"""Structured Streaming ingest: out-of-band discovered URLs land
canonicalized, seen-filtered, and exactly-once; re-triggering with the same
checkpoint never re-processes a drained drop."""

from __future__ import annotations

import json

from remilia_spark.streaming import read_landing, start_url_ingest
from remilia_spark.urlnorm import normalize_url


def _drop(dirp, name, rows):
    (dirp / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run(spark, src, tmp, seen=None):
    q = start_url_ingest(spark, src, tmp / "landing", tmp / "ckpt",
                         seen=seen)
    q.awaitTermination(120)
    return read_landing(spark, tmp / "landing")


def test_ingest_canonicalizes_and_dedupes(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    _drop(src, "a.json", [
        {"url": "HTTP://Host0.TEST:80/b?x=1", "source": "sitemap",
         "ts": "2024-08-07T00:00:00Z"},
        {"url": "http://host0.test/b?x=1", "source": "feed",
         "ts": "2024-08-07T00:00:05Z"},          # same after canonicalize
        {"url": "javascript:void(0)", "source": "log",
         "ts": "2024-08-07T00:00:06Z"},          # invalid: dropped
        {"url": "http://host1.test/only", "source": "log",
         "ts": "2024-08-07T00:00:07Z"},
    ])
    landed = _run(spark, src, tmp_path)
    rows = {r.url: r for r in landed.collect()}
    assert set(rows) == {"http://host0.test/b?x=1", "http://host1.test/only"}
    # canonical form matches the engine's normalizer exactly
    assert normalize_url("HTTP://Host0.TEST:80/b?x=1") \
        == "http://host0.test/b?x=1"
    # first-ingest wins on the canonical collision
    assert rows["http://host0.test/b?x=1"].source == "sitemap"
    assert rows["http://host1.test/only"].host == "host1.test"


def test_ingest_filters_committed_seen(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    _drop(src, "a.json", [
        {"url": "http://host0.test/old", "source": "feed",
         "ts": "2024-08-07T00:00:00Z"},
        {"url": "http://host0.test/new", "source": "feed",
         "ts": "2024-08-07T00:00:01Z"},
    ])
    import pyspark.sql.functions as F
    seen = spark.createDataFrame(
        [("http://host0.test/old",)], "url string"
    ).select(F.xxhash64("url").alias("url_hash"), "url",
             F.lit(0).alias("first_seen_superstep"))
    landed = _run(spark, src, tmp_path, seen=seen)
    assert [r.url for r in landed.collect()] == ["http://host0.test/new"]


def test_ingest_exactly_once_across_triggers(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    _drop(src, "a.json", [{"url": "http://host2.test/x", "source": "log",
                           "ts": "2024-08-07T00:00:00Z"}])
    first = _run(spark, src, tmp_path).collect()
    assert len(first) == 1
    # second drop arrives; old drop must not reprocess (checkpoint offsets)
    _drop(src, "b.json", [{"url": "http://host2.test/y", "source": "log",
                           "ts": "2024-08-07T00:01:00Z"}])
    again = _run(spark, src, tmp_path)
    got = sorted(r.url for r in again.collect())
    assert got == ["http://host2.test/x", "http://host2.test/y"]
    # and a third run with nothing new is a no-op
    assert sorted(r.url for r in _run(spark, src, tmp_path).collect()) == got
