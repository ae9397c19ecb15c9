"""URL canonicalization + the reference's accept-regex contract.

The accept/reject table re-expresses ``utils_test.go:33-56``; the
normalization table is the north-rule addition (the reference only does
naive concat, ``cmd/dev/main.go:51-56``).
"""

from __future__ import annotations

import pytest

from remilia_spark.urlnorm import (
    URL_PATTERN,
    host_of,
    matches_url,
    normalize_series,
    normalize_url,
    path_of,
)

# utils_test.go:33-56 re-expressed (same pattern, same verdicts)
ACCEPT = [
    "http://example.com",
    "https://example.com/path?query=1",
    "ftp://files.example.com/file.txt",
    "http://host0.test/page/3",
]
REJECT = [
    "example.com",            # no scheme
    "http:// example.com",    # space
    "javascript:void(0)",
    "mailto:a@b.test",
    "",
    "http:///nohost",
]


@pytest.mark.parametrize("u", ACCEPT)
def test_matcher_accepts(u):
    assert matches_url(u)


@pytest.mark.parametrize("u", REJECT)
def test_matcher_rejects(u):
    assert not matches_url(u)


NORMALIZE = [
    # (href, base, expected)
    ("/page/3", "http://host0.test/page/1", "http://host0.test/page/3"),
    ("../page/3", "http://host0.test/page/1", "http://host0.test/page/3"),
    ("3", "http://host0.test/page/1", "http://host0.test/page/3"),
    ("HTTP://HOST0.TEST:80/page/3", None, "http://host0.test/page/3"),
    ("https://a.test:443/x", None, "https://a.test/x"),
    ("https://a.test:8443/x", None, "https://a.test:8443/x"),
    ("http://a.test", None, "http://a.test/"),
    ("http://a.test/x#frag", None, "http://a.test/x"),
    ("#frag", "http://a.test/page/1", "http://a.test/page/1"),
    ("http://a.test/%2fx%2F", None, "http://a.test/%2Fx%2F"),
    ("http://a.test/x?b=2&a=1", None, "http://a.test/x?b=2&a=1"),  # query kept
    ("javascript:void(0)", "http://a.test/", None),
    ("mailto:a@b.test", "http://a.test/", None),
    ("tel:+1555", "http://a.test/", None),
    ("", "http://a.test/", None),
    ("   /page/2  ", "http://a.test/page/1", "http://a.test/page/2"),
    ("//other.test/y", "http://a.test/x", "http://other.test/y"),
]


@pytest.mark.parametrize("href,base,expected", NORMALIZE)
def test_normalize(href, base, expected):
    assert normalize_url(href, base) == expected


def test_normalize_idempotent():
    for href, base, expected in NORMALIZE:
        if expected is not None:
            assert normalize_url(expected) == expected


def test_helpers():
    assert host_of("http://Host0.test:8080/page/1") == "host0.test"
    assert path_of("http://a.test/private/page/4") == "/private/page/4"
    assert path_of("http://a.test") == "/"


def test_series_wrapper():
    import pandas as pd

    out = normalize_series(
        pd.Series(["/x", "javascript:void(0)"]),
        pd.Series(["http://a.test/b", "http://a.test/b"]),
    )
    assert list(out) == ["http://a.test/x", None]


def test_rlike_parity(spark):
    """Java regex (F.rlike) and Python re agree on the reference pattern."""
    from pyspark.sql import functions as F

    cases = ACCEPT + [r for r in REJECT if r]  # rlike on '' is trivially false
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {
        r["url"]: r["ok"]
        for r in df.select(
            "url", F.col("url").rlike(URL_PATTERN).alias("ok")
        ).collect()
    }
    for u in cases:
        assert got[u] == matches_url(u), u
