"""Oracle-side xxh64 must equal Spark's F.xxhash64 (seed 42) exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from remilia_spark.xxh64 import xxhash64_spark


def test_parity_with_spark(spark):
    cases = [
        "",
        "a",
        "http://host0.test/page/0",
        "http://host1.test/private/page/44?q=1&b=2",
        "x" * 7, "x" * 8, "x" * 31, "x" * 32, "x" * 33, "x" * 100,
        "üñïçødé-ürl/ハロー",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    got = {r["s"]: r["h"] for r in
           df.select("s", F.xxhash64("s").alias("h")).collect()}
    for c in cases:
        assert got[c] == xxhash64_spark(c), c


def test_extract_pinned(tiny_corpus):
    """pages.text equals the pinned extractor's output (byte-identical)."""
    from remilia_spark.extract import extract

    c, _ = tiny_corpus
    for _, row in c.pages.head(20).iterrows():
        links, text = extract(row["html"])
        assert text == row["text"]


def test_extract_spec():
    from remilia_spark.extract import extract

    html = (b"<html><head><title> A  Title </title></head><body>"
            b"<h1>H<span>1</span></h1><p>one</p><p></p><p> two  words </p>"
            b'<a href="/x">x</a><a name="no-href">skip</a>'
            b'<a href="/x">dup kept</a></body></html>')
    links, text = extract(html)
    assert links == ["/x", "/x"]
    assert text == "A Title\nH1\none\ntwo words"


def test_extract_truncated_and_garbage():
    from remilia_spark.extract import extract

    assert extract(b"<html><p>unclosed") == ([], "unclosed")
    assert extract(None) == ([], "")
    links, text = extract(b"\xff\xfe garbage")
    assert links == []
