"""URLs the reference's accept regex admits but java.net.URI rejects.

The reference filters extracted strings ONLY with
``^(https?|ftp)://[^\\s/$.?#].[^\\s]*$`` (utils.go:13-20), so hrefs with
RFC-3986-illegal-but-non-whitespace characters (``|``, ``<``, ``>``, ``"``)
flow into the pipeline.  Spark's ``parse_url`` (java.net.URI) throws
INVALID_URL on them under ANSI mode — the engine must therefore derive
host/path from the same Python urlsplit that canonicalized the URL, and a
single such href must neither crash a superstep nor diverge from the oracle.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from remilia_spark import oracle
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.extract import extract_text
from remilia_spark.urlnorm import normalize_parts, normalize_url

ROOT_HTML = (
    '<html><body><p>root</p>'
    '<a href="/a|b">pipe</a>'
    '<a href="/c<d>">angle</a>'
    '<a href=\'/q"z\'>quote</a>'
    '<a href="http://h1.test/x|y">crosshost</a>'
    '</body></html>'
)
PIPE_HTML = "<html><body><p>pipe page</p></body></html>"


def _pages_pd() -> pd.DataFrame:
    rows = []
    for u, h in (("http://h0.test/", ROOT_HTML),
                 ("http://h0.test/a|b", PIPE_HTML)):
        html = h.encode("utf-8")
        rows.append({"url": u,
                     "warc_ts": dt.datetime(2024, 8, 7),
                     "html": html,
                     "text": extract_text(html),
                     "lang": "en"})
    return pd.DataFrame(rows)


def test_normalize_parts_keeps_regex_legal_illegal_chars():
    p = normalize_parts("/a|b", "http://h0.test/")
    assert p == ("http://h0.test/a|b", "h0.test", "/a|b")
    assert normalize_url('/q"z', "http://h0.test/") == 'http://h0.test/q"z'
    # host comes from urlsplit, matching the oracle — never java.net.URI
    assert normalize_parts("http://h1.test/x|y")[1] == "h1.test"


@pytest.mark.parametrize("with_robots", [True, False],
                         ids=["robots", "no-robots"])
def test_weird_href_crawl_matches_oracle(spark, tmp_path, with_robots):
    pages_pd = _pages_pd()
    seeds_pd = pd.DataFrame({"url": ["http://h0.test/"], "seed_order": [0]})
    robots_pd = pd.DataFrame({
        "host": ["h0.test", "h1.test"],
        # the disallow prefix must be matched against the weird path too
        "disallow": [["/c"], []],
        "crawl_delay": [0, 0],
    }) if with_robots else None

    cfg = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=12)
    want = oracle.crawl(pages_pd, seeds_pd, robots_pd, cfg)

    pages = spark.createDataFrame(pages_pd)
    seeds = spark.createDataFrame(seeds_pd)
    robots = spark.createDataFrame(
        robots_pd, "host string, disallow array<string>, crawl_delay int"
    ) if with_robots else None
    run = Engine(spark, cfg).run(pages, seeds, robots,
                                 tmp_path / f"st_{with_robots}")

    got_events = [(r["superstep"], r["depth"], r["host_rank"],
                   r["discovery_order"], r["url"])
                  for r in run.fetch_events().collect()]
    assert got_events == [tuple(e) for e in want.fetch_events]
    assert {r["url"] for r in run.seen().collect()} == set(want.seen)
    got_states = {r["url"]: r["state"] for r in run.frontier().collect()}
    assert got_states == want.states
    # the weird-path page was actually fetched, not just tolerated
    assert "http://h0.test/a|b" in {u for *_, u in got_events}
    if with_robots:
        assert got_states["http://h0.test/c<d>"] == "filtered"
