"""SURT keys (urlnorm.surt_key / surt_key_col): pinned spec examples and
Python-vs-JVM parity (the column expression must agree byte-for-byte with
the pure-Python twin on every input)."""

from __future__ import annotations

import pyspark.sql.functions as F

from remilia_spark.urlnorm import surt_key, surt_key_col

PINNED = [
    ("https://www.example.ac.uk/path?q=1", "uk,ac,example,www)/path?q=1"),
    ("http://host0.test/page/0", "test,host0)/page/0"),
    ("https://a.b.c.d.test/", "test,d,c,b,a)/"),
    ("https://example.test", "test,example)/"),           # empty path -> /
    ("http://example.test:8080/x", "test,example:8080)/x"),
    ("ftp://files.example.test/pub", "test,example,files)/pub"),
    ("https://example.test/?a=1&b=2", "test,example)/?a=1&b=2"),
    ("https://example.test/p%2Fq", "test,example)/p%2Fq"),
    ("", ""),
    ("not a url", ""),
]


def test_pinned_examples():
    for url, want in PINNED:
        assert surt_key(url) == want, url


def test_sorting_groups_hosts():
    urls = ["https://b.test/2", "https://a.test/1", "https://b.test/1",
            "https://sub.a.test/x", "https://a.test/2"]
    keys = sorted(surt_key(u) for u in urls)
    # all a.test URLs sort adjacent, then sub.a.test, then b.test
    assert keys == ["test,a)/1", "test,a)/2", "test,a,sub)/x",
                    "test,b)/1", "test,b)/2"]


def test_column_matches_python(spark):
    urls = [u for u, _ in PINNED] + [
        "https://x.test/deep/a/b/c?q=%20x&y=2",
        "http://h.test:99/",
        "https://single/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["k"] for r in
           df.select("url", surt_key_col(F.col("url")).alias("k")).collect()}
    for u in urls:
        assert got[u] == surt_key(u), u


def test_null_url_column(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(surt_key_col(F.col("url")).alias("k")) \
             .collect()[0]["k"] == ""


def test_fuzz_parity_500(spark):
    """Seeded adversarial fuzz: the JVM column and the Python twin must
    agree on every input, including garbage."""
    import random

    rng = random.Random(42)
    frags = ["http://", "https://", "ftp://", "", "www.", "a.b.", "host",
             ".test", ":8080", ":99", ":", "/", "/p/x", "?q=1", "?a=%20",
             "#frag", "..", "%2F", " ", "\t", "xn--", "127.0.0.1", "[::1]",
             "a" * 40, ".", "?", ")", ",", "//", "@user"]
    urls = ["".join(rng.choice(frags)
                    for _ in range(rng.randint(1, 6))) for _ in range(500)]
    df = spark.createDataFrame([(u,) for u in urls], "url string") \
              .select("url", surt_key_col(F.col("url")).alias("k"))
    got = {r["url"]: r["k"] for r in df.collect()}
    for u in set(urls):
        assert got[u] == surt_key(u), repr(u)
