"""CDX(J) index connector: parse (plain + gz, malformed-skip), seed
derivation (latest capture, SURT order, parallelism-invariant), WARC
range-fetch planning, and cdx-derived seeds driving the real engine."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from remilia_spark.sources import cdx
from remilia_spark import urlnorm

TS = cdx.fixture_ts

RECORDS = [
    # url, ts, status, mime, digest, length, offset, filename
    ("http://host0.test/page/0", TS(1_700_000_000), 200, "text/html",
     "sha1:AAA", 512, 0, "seg-00001.warc.gz"),
    # an OLDER capture of the same url — must lose to the one above
    ("http://host0.test/page/0", TS(1_600_000_000), 200, "text/html",
     "sha1:OLD", 500, 9000, "seg-00009.warc.gz"),
    ("http://host1.test/a", TS(1_700_000_100), 200, "text/html",
     "sha1:BBB", 700, 512, "seg-00001.warc.gz"),
    ("http://host1.test/redir", TS(1_700_000_200), 301, "text/html",
     "sha1:CCC", 80, 1212, "seg-00001.warc.gz"),      # non-200: no seed
    ("http://host2.test/img.png", TS(1_700_000_300), 200, "image/png",
     "sha1:DDD", 2048, 1292, "seg-00002.warc.gz"),    # non-html: no seed
    ("http://a.sub.host3.test:8080/x?q=1", TS(1_700_000_400), 200,
     "text/html", "sha1:EEE", 300, 0, "seg-00002.warc.gz"),
]

GARBAGE = [
    "not a cdx line",                                  # 2 fields
    "com,bad)/ notatimestamp {\"url\": \"http://bad.test/\"}",
    "com,bad)/ 20240101000000 {not json at all",
    "com,bad)/ 20240101000000 {\"status\": \"200\"}",  # no url
]


def _write_fixture(tmp_path, gz=False):
    data = cdx.cdx_bytes(RECORDS, gz=gz)
    extra = ("\n".join(GARBAGE) + "\n").encode()
    if gz:
        extra = gzip.compress(extra, mtime=0)
    p = tmp_path / ("idx.cdx.gz" if gz else "idx.cdx")
    p.write_bytes(data + extra)
    return str(p)


def test_read_cdx_parses_and_skips_garbage(spark, tmp_path):
    for gz in (False, True):
        df = cdx.read_cdx(spark, _write_fixture(tmp_path, gz=gz))
        rows = {(r["url"], r["status"], r["mime"], r["offset"],
                 r["length"], r["warc_filename"]) for r in df.collect()}
        assert rows == {(u, st, m, off, ln, fn)
                        for u, _, st, m, _, ln, off, fn in RECORDS}
        got = df.where(F.col("url") == "http://host1.test/a").collect()[0]
        assert got["warc_ts"] == TS(1_700_000_100)
        assert got["digest"] == "sha1:BBB"
        # the index key is the pinned SURT spec
        assert got["surt"] == urlnorm.surt_key("http://host1.test/a")


def test_cdx_to_seeds_latest_capture_surt_order(spark, tmp_path):
    df = cdx.read_cdx(spark, _write_fixture(tmp_path))
    seeds = cdx.cdx_to_seeds(df).collect()
    by_url = {r["url"]: r["seed_order"] for r in seeds}
    # dup capture collapsed, non-200 and non-html dropped
    assert set(by_url) == {"http://host0.test/page/0",
                           "http://host1.test/a",
                           "http://a.sub.host3.test:8080/x?q=1"}
    # order = SURT sort (host-reversed): host0 < host1 < test,host3,sub,a
    ordered = sorted(by_url, key=lambda u: urlnorm.surt_key(u))
    assert [u for u, _ in sorted(by_url.items(), key=lambda kv: kv[1])] \
        == ordered
    assert sorted(by_url.values()) == [0, 1, 2]
    # parallelism-invariant rank
    seeds8 = {(r["url"], r["seed_order"])
              for r in cdx.cdx_to_seeds(df, num_partitions=8).collect()}
    assert seeds8 == {(u, o) for u, o in by_url.items()}


def test_warc_fetch_plan_groups_and_sorts(spark, tmp_path):
    df = cdx.read_cdx(spark, _write_fixture(tmp_path))
    plan = {r["warc_filename"]: r for r in
            cdx.warc_fetch_plan(df).collect()}
    seg1 = plan["seg-00001.warc.gz"]
    assert [x["offset"] for x in seg1["ranges"]] == [0, 512, 1212]
    assert seg1["n_records"] == 3 and seg1["total_bytes"] == 512 + 700 + 80
    assert [x["url"] for x in seg1["ranges"]][0] == "http://host0.test/page/0"


def test_cdx_seeds_drive_the_engine(spark, tiny_corpus, tmp_path):
    """Index → seeds → crawl: the connector output slots straight into
    Engine.run, and the crawl is identical to parquet-seeded runs."""
    from remilia_spark.config import CrawlConfig
    from remilia_spark.engine import Engine

    _, corpus_dir = tiny_corpus
    pages = spark.read.parquet(str(corpus_dir / "pages.parquet"))
    seeds_pq = spark.read.parquet(str(corpus_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(corpus_dir / "robots.parquet"))

    recs = [(r["url"], TS(1_700_000_000 + i), 200, "text/html",
             "sha1:X%d" % i, 100, i * 100, "seg.warc.gz")
            for i, r in enumerate(seeds_pq.orderBy("seed_order").collect())]
    p = tmp_path / "seeds.cdx"
    p.write_bytes(cdx.cdx_bytes(recs))
    seeds = cdx.cdx_to_seeds(cdx.read_cdx(spark, str(p)))

    cfg = CrawlConfig(max_depth=2, max_supersteps=30, max_attempt=2)
    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "st")
    fetched = {r["url"] for r in run.fetch_events().collect()}
    run_pq = Engine(spark, cfg).run(pages, seeds_pq, robots,
                                    tmp_path / "st_pq")
    assert fetched == {r["url"] for r in run_pq.fetch_events().collect()}
    assert len(fetched) > 0


def test_cdx_segments_roundtrip_and_order(spark, tmp_path):
    """Publishing path: capture rows -> SURT-ordered CDXJ shard blobs,
    byte-identical on any partitioning, readable by read_cdx, with
    (first_surt, last_surt) forming a non-overlapping ascending chain."""
    rows = [
        (f"http://h{i % 5}.test/p/{i}", cdx.fixture_ts(1_700_000_000 + i),
         200, "text/html", f"D{i}", 100 + i, 10 * i, f"seg{i % 3}.warc.gz")
        for i in range(25)
    ]
    schema = ("url string, warc_ts timestamp, status int, mime string, "
              "digest string, length long, offset long, filename string")

    def run(parts):
        df = spark.createDataFrame(rows, schema).repartition(parts)
        cleanup = []
        out = {r["segment_id"]: (r["n_records"], r["first_surt"],
                                 r["last_surt"], bytes(r["cdx_gz"]))
               for r in cdx.cdx_segments(df, records_per_segment=10,
                                         cleanup=cleanup).collect()}
        for f in cleanup:
            f.unpersist()
        return out

    s1, s8 = run(1), run(8)
    assert s1 == s8
    assert [s1[k][0] for k in sorted(s1)] == [10, 10, 5]
    # shard key ranges ascend without overlap (the cluster.idx contract)
    bounds = [(s1[k][1], s1[k][2]) for k in sorted(s1)]
    for (f1, l1), (f2, _) in zip(bounds, bounds[1:]):
        assert f1 <= l1 <= f2

    # land the shards and read them back through the normal reader
    out_dir = tmp_path / "pubcdx"
    out_dir.mkdir()
    for sid, (_, _, _, blob) in s1.items():
        (out_dir / f"cdx-{sid:05d}.gz").write_bytes(blob)
    back = cdx.read_cdx(spark, str(out_dir))
    got = sorted((r["url"], str(r["warc_ts"]), r["status"], r["digest"],
                  r["length"], r["offset"], r["warc_filename"])
                 for r in back.collect())
    want = sorted((u, str(ts), st, d, ln, off, fn)
                  for u, ts, st, m, d, ln, off, fn in rows)
    assert got == want
