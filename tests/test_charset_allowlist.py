"""Charset transformer (R18) and domain allowlist — engine vs oracle.

Reference contracts: the optional charset transformer decodes the response
body before parse (client.go:228-233, applied client.go:153-155, pinned by
client_test.go transformer cases); the dead ``limit`` type carries
``AllowedDomain`` (limit.go:5-15).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from remilia_spark import oracle
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.extract import extract_text

LATIN1_HTML = ("<html><head><title>Caf\xe9 p\xe2t\xe9</title></head>"
               '<body><h1>\xc9t\xe9</h1><p>na\xefve fa\xe7ade</p>'
               '<a href="/suite">s</a>'
               '<a href="http://offsite.test/x">o</a></body></html>')
SUITE_HTML = "<html><body><p>page deux</p></body></html>"


def _corpus_pd(charset: str) -> pd.DataFrame:
    rows = []
    for u, h in (("http://fr.test/", LATIN1_HTML),
                 ("http://fr.test/suite", SUITE_HTML)):
        html = h.encode(charset)
        rows.append({"url": u, "warc_ts": dt.datetime(2024, 8, 7),
                     "html": html,
                     "text": extract_text(html, charset), "lang": "fr"})
    return pd.DataFrame(rows)


def _run_both(spark, tmp_path, cfg, charset, tag):
    pages_pd = _corpus_pd(charset)
    seeds_pd = pd.DataFrame({"url": ["http://fr.test/"], "seed_order": [0]})
    want = oracle.crawl(pages_pd, seeds_pd, None, cfg)
    run = Engine(spark, cfg).run(
        spark.createDataFrame(pages_pd), spark.createDataFrame(seeds_pd),
        None, tmp_path / tag)
    return want, run


def test_latin1_charset_text_byte_identical(spark, tmp_path):
    cfg = CrawlConfig(max_depth=1, charset="latin-1", max_supersteps=8)
    want, run = _run_both(spark, tmp_path, cfg, "latin-1", "l1")
    got_text = {r["url"]: r["text"] for r in run.results().collect()}
    assert got_text == want.texts
    assert got_text["http://fr.test/"] == "Caf\xe9 p\xe2t\xe9\n\xc9t\xe9\nna\xefve fa\xe7ade"


def test_wrong_charset_mojibakes_identically(spark, tmp_path):
    """Engine and oracle must agree byte-for-byte even when the configured
    charset is wrong for the bytes (utf-8 reading of latin-1 pages)."""
    cfg = CrawlConfig(max_depth=1, max_supersteps=8)  # default utf-8
    want, run = _run_both(spark, tmp_path, cfg, "latin-1", "mj")
    got_text = {r["url"]: r["text"] for r in run.results().collect()}
    assert got_text == want.texts
    assert "�" in got_text["http://fr.test/"]  # replacement chars


def test_domain_allowlist_filters_offsite_links(spark, tmp_path):
    cfg = CrawlConfig(max_depth=2, charset="latin-1",
                      allowed_domains=("fr.test",), max_supersteps=10)
    want, run = _run_both(spark, tmp_path, cfg, "latin-1", "al")
    got_states = {r["url"]: r["state"] for r in run.frontier().collect()}
    assert got_states == want.states
    assert got_states["http://offsite.test/x"] == "filtered"
    got_events = [(r["superstep"], r["depth"], r["host_rank"],
                   r["discovery_order"], r["url"])
                  for r in run.fetch_events().collect()]
    assert got_events == [tuple(e) for e in want.fetch_events]
    assert all(u.startswith("http://fr.test/") for *_, u in got_events)
