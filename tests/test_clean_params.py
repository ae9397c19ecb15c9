"""Query-parameter canonicalization (urlnorm.clean_params*).

Pins the frozen spec (tracking strip, empty-part drop, optional bytewise
sort, '?' removal when nothing survives) and proves the JVM column
expression is input-for-input identical to the pure-Python twin on a
generated URL mix — the same parity contract every other urlnorm column
carries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remilia_spark.urlnorm import (
    TRACKING_PARAMS, clean_params, clean_params_col, clean_params_series,
)

CASES = [
    # (input, strip-only expected, strip+sort expected)
    ("http://h.test/p", "http://h.test/p", "http://h.test/p"),
    ("http://h.test/p?a=1", "http://h.test/p?a=1", "http://h.test/p?a=1"),
    ("http://h.test/p?utm_source=x&a=1",
     "http://h.test/p?a=1", "http://h.test/p?a=1"),
    ("http://h.test/p?UTM_Campaign=x", "http://h.test/p", "http://h.test/p"),
    ("http://h.test/p?fbclid=abc&gclid=1",
     "http://h.test/p", "http://h.test/p"),
    ("http://h.test/p?b=2&a=1",
     "http://h.test/p?b=2&a=1", "http://h.test/p?a=1&b=2"),
    # empty parts drop; name-only parts keep (no '=')
    ("http://h.test/p?&&flag&utm_x",
     "http://h.test/p?flag", "http://h.test/p?flag"),
    # '=' inside the value stays; only the FIRST '=' delimits the name
    ("http://h.test/p?q=a=b&utm_term=x",
     "http://h.test/p?q=a=b", "http://h.test/p?q=a=b"),
    # tracking name as a VALUE is untouched
    ("http://h.test/p?next=fbclid", "http://h.test/p?next=fbclid",
     "http://h.test/p?next=fbclid"),
    # '?' with empty query: nothing survives -> '?' dropped
    ("http://h.test/p?", "http://h.test/p", "http://h.test/p"),
    # second '?' belongs to the query byte-stream, not a new split point
    ("http://h.test/p?a=1?b=2&utm_a=z",
     "http://h.test/p?a=1?b=2", "http://h.test/p?a=1?b=2"),
]


@pytest.mark.parametrize("url,plain,srt", CASES)
def test_python_spec(url, plain, srt):
    assert clean_params(url) == plain
    assert clean_params(url, sort_params=True) == srt


def test_none_passthrough():
    assert clean_params(None) is None


def test_custom_strip_set():
    assert clean_params("http://h.test/?sid=1&a=2", strip=("sid",)) \
        == "http://h.test/?a=2"
    # default set untouched by the override
    assert clean_params("http://h.test/?fbclid=1&a=2", strip=("sid",)) \
        == "http://h.test/?fbclid=1&a=2"


def test_default_set_is_sorted_ascii():
    assert list(TRACKING_PARAMS) == sorted(TRACKING_PARAMS)
    assert all(s == s.lower() for s in TRACKING_PARAMS)


def test_spark_column_parity(spark):
    """JVM expression == Python twin, input-for-input, both sort modes."""
    urls = [c[0] for c in CASES] + [
        None,
        "http://h.test/p?x=%2F&utm_source=a&y=1&gclid=2&z",
        "ftp://h.test/f?b=2&a=1&mc_cid=9",
        "http://h.test/p?aa=1&a=1&A=1",   # bytewise sort: 'A' < 'a' < 'aa'
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    for sort in (False, True):
        got = df.select(
            clean_params_col(F.col("url"), sort_params=sort).alias("c")
        ).collect()
        want = [clean_params(u, sort_params=sort) for u in urls]
        assert [r["c"] for r in got] == want
        # and the Arrow-batch twin agrees too
        import pandas as pd
        ser = clean_params_series(pd.Series(urls, dtype=object),
                                  sort_params=sort)
        assert list(ser) == want


def test_plan_is_jvm_only(spark):
    """No Python stage: the expression must stay inside codegen."""
    df = spark.range(4).select(
        F.concat(F.lit("http://h.test/?utm_a=1&k="),
                 F.col("id").cast("string")).alias("url"))
    plan = df.select(clean_params_col(F.col("url")).alias("c")) \
             ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Engine integration: cfg.strip_tracking_params collapses analytics URL
# variants to ONE frontier row / ONE fetch, engine == oracle exactly.
# ---------------------------------------------------------------------------

ROOT_HTML = (
    '<html><body>'
    '<a href="/a?utm_source=mail&x=1">v1</a>'
    '<a href="/a?x=1&utm_campaign=c&fbclid=z9">v2</a>'
    '<a href="/a?x=1">plain</a>'
    '<a href="/b?gclid=1">only-tracking</a>'
    '</body></html>'
)


def _tracking_pages_pd():
    import datetime as dt
    import pandas as pd
    from remilia_spark.extract import extract_text

    rows = []
    for u, h in (("http://h0.test/", ROOT_HTML),
                 ("http://h0.test/a?x=1",
                  "<html><body><p>target</p></body></html>"),
                 ("http://h0.test/b",
                  "<html><body><p>b page</p></body></html>")):
        html = h.encode("utf-8")
        rows.append({"url": u, "warc_ts": dt.datetime(2024, 8, 7),
                     "html": html, "text": extract_text(html),
                     "lang": "en"})
    return pd.DataFrame(rows)


def test_engine_strip_tracking_matches_oracle(spark, tmp_path):
    import pandas as pd
    from remilia_spark import oracle
    from remilia_spark.config import CrawlConfig
    from remilia_spark.engine import Engine

    pages_pd = _tracking_pages_pd()
    seeds_pd = pd.DataFrame({"url": ["http://h0.test/?utm_medium=seed"],
                             "seed_order": [0]})
    cfg = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=12,
                      strip_tracking_params=True)
    want = oracle.crawl(pages_pd, seeds_pd, None, cfg)

    run = Engine(spark, cfg).run(spark.createDataFrame(pages_pd),
                                 spark.createDataFrame(seeds_pd),
                                 None, tmp_path / "st")
    got_events = [(r["superstep"], r["depth"], r["host_rank"],
                   r["discovery_order"], r["url"])
                  for r in run.fetch_events().collect()]
    assert got_events == [tuple(e) for e in want.fetch_events]
    got_seen = {r["url"] for r in run.seen().collect()}
    assert got_seen == set(want.seen)

    # the three /a variants collapsed to ONE clean URL, fetched once
    assert "http://h0.test/a?x=1" in got_seen
    assert not any("utm" in u or "fbclid" in u for u in got_seen)
    a_fetches = [e for e in got_events if e[4] == "http://h0.test/a?x=1"]
    assert len(a_fetches) == 1
    # the tracking-only link reduced to its bare path and was fetched
    assert "http://h0.test/b" in {e[4] for e in got_events}
    # the seed itself was cleaned before hashing/seen-marking
    assert "http://h0.test/" in got_seen

    # control: flag off -> variants stay distinct (and some miss the corpus)
    cfg_off = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=12)
    want_off = oracle.crawl(pages_pd, seeds_pd, None, cfg_off)
    assert any("utm" in u for u in want_off.seen)
