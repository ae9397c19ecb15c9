"""Anchor-text extraction (extract._AnchorExtractor) and per-target
aggregation (graph.top_anchor_texts): pinned parser spec, Arrow plumbing,
hand-computed top-k."""

from __future__ import annotations

from remilia_spark.extract import ANCHOR_SCHEMA, anchors_map_in_pandas, \
    extract_anchors
from remilia_spark.datapipe.graph import top_anchor_texts


def test_parser_pinned_spec():
    html = b"""<html><body>
      <a href="/a">First  link</a>
      <a href="/b"><b>bold</b> text &amp; more</a>
      <a>no href</a>
      <a href="/c">outer <a href="/d">implicit close</a>
      <a href="/e"><img src="x.png"></a>
      <a href="/f">unclosed at EOF"""
    got = extract_anchors(html)
    assert got == [
        ("/a", "First link"),             # whitespace collapsed
        ("/b", "bold text & more"),       # nested tags + entity refs
        # <a> without href closes nothing-to-emit, emits nothing
        ("/c", "outer"),                  # new <a> start closes the open one
        ("/d", "implicit close"),
        ("/e", ""),                       # image-only anchor: kept, empty
        ("/f", "unclosed at EOF"),        # EOF flush
    ]


def test_parser_garbage_inputs():
    assert extract_anchors(None) == []
    assert extract_anchors(b"") == []
    assert extract_anchors(b"\xff\xfe\x00 not html") == []
    assert extract_anchors("plain text no tags") == []


def test_map_in_pandas_plumbing(spark):
    rows = [
        ("u1", b'<a href="/x">one</a><a href="/y">two</a>'),
        ("u2", None),
        ("u3", b'<a href="/x">ONE</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = sorted(map(tuple, df.mapInPandas(
        anchors_map_in_pandas(), ANCHOR_SCHEMA).collect()))
    assert out == [("u1", "/x", "one"), ("u1", "/y", "two"),
                   ("u3", "/x", "ONE")]


def test_top_anchor_texts(spark):
    rows = [("t1", "Click  Here"), ("t1", "click here"), ("t1", "docs"),
            ("t1", "about"), ("t2", "home")]
    df = spark.createDataFrame(rows, "href string, anchor string")
    got = {(r["dst"], r["anchor"]): (r["n"], r["rank"])
           for r in top_anchor_texts(df, k=2).collect()}
    # normalization merges the two "click here" variants -> n=2, rank 1;
    # "about" beats "docs" on the anchor tiebreak for rank 2
    assert got == {("t1", "click here"): (2, 1), ("t1", "about"): (1, 2),
                   ("t2", "home"): (1, 1)}


def test_top_anchor_no_normalize(spark):
    rows = [("t1", "Click Here"), ("t1", "click here")]
    df = spark.createDataFrame(rows, "href string, anchor string")
    assert top_anchor_texts(df, k=5, normalize=False).count() == 2
