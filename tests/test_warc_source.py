"""WARC connector: round-trip fixture segments through read_warc and feed
the result straight into the engine's parse stage — the pages table a crawl
would join at Common-Crawl scale."""

from __future__ import annotations

import datetime as dt

from remilia_spark.extract import extract_text
from remilia_spark.sources import read_warc, warc_bytes
from remilia_spark.sources.warc import parse_warc_records

_TS = dt.datetime(2024, 8, 7, 1, 2, 3)

_PAGES = [
    ("http://host0.test/", _TS,
     b"<html><title>root</title><a href=\"/a\">a</a><p>hello world</p></html>"),
    ("http://host1.test/a?x=1", _TS + dt.timedelta(seconds=5),
     b"<html><h1>A</h1><a href='http://host0.test/'>back</a></html>"),
    ("http://host1.test/utf8", _TS + dt.timedelta(seconds=9),
     "<p>café — ok</p>".encode("utf-8")),
]


def _fixture_bytes(gz: bool) -> bytes:
    # prepend a warcinfo record (no WARC-Target-URI) — must be skipped
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"WARC-Date: 2024-08-07T00:00:00Z\r\n"
            b"Content-Length: 4\r\n\r\ninfo\r\n\r\n")
    body = warc_bytes(_PAGES, gzip_members=gz)
    if gz:
        import gzip as _g
        info = _g.compress(info, mtime=0)
    return info + body


def test_parse_warc_records_pure():
    for gz in (False, True):
        rows = list(parse_warc_records(_fixture_bytes(gz)))
        assert [(u, t) for u, t, _ in rows] == [(u, t) for u, t, _ in _PAGES]
        # html is byte-identical to what was written
        assert [h for _, _, h in rows] == [h for _, _, h in _PAGES]


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "seg-00000.warc").write_bytes(_fixture_bytes(False))
    (tmp_path / "seg-00001.warc.gz").write_bytes(_fixture_bytes(True))
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 2 * len(_PAGES)  # both segments carry the same pages
    got = {r.url: r for r in rows}
    assert len(got) == len(_PAGES)
    r = got["http://host0.test/"]
    assert bytes(r.html) == _PAGES[0][2]
    assert r.warc_ts == _TS
    assert r.text is None and r.lang is None
    # schema is the pages schema: union with a synthetic corpus must work
    from remilia_spark.corpus import generate_corpus
    c = generate_corpus(n_pages=10, n_hosts=2, seed=42)
    synth = spark.createDataFrame(c.pages)
    assert synth.unionByName(df).count() == 10 + 6


def test_crawl_over_warc_equals_parquet(spark, tiny_corpus, tmp_path):
    """End-to-end: the engine crawling a WARC-sourced pages table produces
    the identical fetch log, seen set and extracted text as the same pages
    read from parquet — the connector is a drop-in pages source."""
    from remilia_spark.config import CrawlConfig
    from remilia_spark.engine import Engine

    c, corpus_dir = tiny_corpus
    recs = [(r.url, r.warc_ts, bytes(r.html))
            for _, r in c.pages.iterrows()]
    seg = tmp_path / "corpus.warc.gz"
    seg.write_bytes(warc_bytes(recs, gzip_members=True))

    pages_pq = spark.read.parquet(str(corpus_dir / "pages.parquet"))
    pages_warc = read_warc(spark, str(seg))
    seeds = spark.read.parquet(str(corpus_dir / "seeds.parquet"))
    robots = spark.read.parquet(str(corpus_dir / "robots.parquet"))

    cfg = CrawlConfig(max_depth=2, max_supersteps=30)
    runs = []
    for tag, pages in (("pq", pages_pq), ("warc", pages_warc)):
        run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / tag)
        events = [(r.superstep, r.url, r.discovery_order)
                  for r in run.fetch_events().collect()]
        seen = {r.url for r in run.seen().collect()}
        texts = {r.url: r.text for r in run.results().collect()}
        runs.append((events, seen, texts))
    assert runs[0] == runs[1]
    assert len(runs[0][0]) > 5  # a real crawl happened


def test_warc_pages_feed_extractor(spark, tmp_path):
    """The connector's html bytes drive the pinned extractor identically to
    in-memory parsing — the byte-identical-text invariant crosses the seam."""
    (tmp_path / "seg.warc.gz").write_bytes(_fixture_bytes(True))
    df = read_warc(spark, str(tmp_path))
    rows = df.select("url", "html").collect()
    assert len(rows) == len(_PAGES)
    expected = {u: extract_text(h) for u, _, h in _PAGES}
    for r in rows:
        assert extract_text(bytes(r.html)) == expected[r.url]
    assert expected["http://host0.test/"] == "root\nhello world"
