"""WET (extracted-text) format: encoder/parser round-trip, the Spark
reader on plain + multi-member-gzip segments, and the distributed
segment exporter's determinism."""

from __future__ import annotations

import datetime as dt
import gzip

from remilia_spark.sources.warc import (
    parse_wet_records, read_wet, wet_bytes, wet_segments,
)

TS = dt.datetime(2024, 8, 7, 12, 0, 0)
RECS = [
    ("http://h0.test/", TS, "root page text"),
    ("http://h0.test/a", TS, "ünïcode — τext\nwith lines\n"),
    ("http://h1.test/b", TS, ""),
]


def test_roundtrip_plain_and_gz():
    for gz in (False, True):
        data = wet_bytes(RECS, gzip_members=gz)
        assert list(parse_wet_records(data)) == RECS
    # deterministic bytes
    assert wet_bytes(RECS) == wet_bytes(RECS)


def test_parser_skips_foreign_and_malformed():
    # a response (WARC) record in the stream is skipped, not parsed
    from remilia_spark.sources.warc import warc_bytes
    mixed = warc_bytes([("http://x.test/", TS, b"<p>html</p>")]) \
        + wet_bytes(RECS[:1])
    assert list(parse_wet_records(mixed)) == RECS[:1]
    # malformed tail stops cleanly
    assert list(parse_wet_records(wet_bytes(RECS[:1]) + b"garbage")) \
        == RECS[:1]
    assert list(parse_wet_records(b"")) == []


def test_read_wet_spark(spark, tmp_path):
    seg = tmp_path / "segs"
    seg.mkdir()
    (seg / "s0.wet").write_bytes(wet_bytes(RECS[:2]))
    (seg / "s1.wet.gz").write_bytes(wet_bytes(RECS[2:], gzip_members=True))
    got = sorted((r["url"], str(r["warc_ts"]), r["text"])
                 for r in read_wet(spark, str(seg)).collect())
    want = sorted((u, str(ts), t) for u, ts, t in RECS)
    assert got == want


def test_wet_segments_deterministic_and_readable(spark, tmp_path):
    rows = [(f"http://h{i % 3}.test/p/{i}", f"text {i}") for i in range(25)]

    def run(parts):
        df = spark.createDataFrame(rows, "url string, text string") \
            .repartition(parts)
        cleanup = []
        segs = {r["segment_id"]: (r["n_records"], bytes(r["wet_gz"]))
                for r in wet_segments(df, TS, records_per_segment=10,
                                      cleanup=cleanup).collect()}
        for f in cleanup:
            f.unpersist()
        return segs

    s1, s8 = run(1), run(8)
    assert s1 == s8  # byte-identical on any partitioning
    assert sorted(s1) == [0, 1, 2]
    assert [s1[k][0] for k in sorted(s1)] == [10, 10, 5]

    # land the blobs and read them back through the Spark reader
    out = tmp_path / "wet"
    out.mkdir()
    for sid, (_, blob) in s1.items():
        (out / f"part-{sid}.wet.gz").write_bytes(blob)
    back = sorted((r["url"], r["text"])
                  for r in read_wet(spark, str(out)).collect())
    assert back == sorted(rows)
