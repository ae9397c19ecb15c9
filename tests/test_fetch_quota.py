"""Crawl-budget quota (CrawlConfig.max_fetch_per_key): cumulative
per-politeness-key grant cap across the whole crawl, checkpointed like
the budgets table.  Engine == oracle exactly; quota-starved rows stay
pending; resume continues the count instead of resetting it."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from remilia_spark import oracle
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.extract import extract_text

N_CHILDREN = 6
ROOT_HTML = ("<html><body>" +
             "".join(f'<a href="/p{i}">x</a>' for i in range(N_CHILDREN)) +
             "</body></html>")


def _pages_pd() -> pd.DataFrame:
    rows = []
    pages = [("http://h0.test/", ROOT_HTML)] + [
        (f"http://h0.test/p{i}", f"<html><body><p>page {i}</p></body></html>")
        for i in range(N_CHILDREN)]
    for u, h in pages:
        html = h.encode()
        rows.append({"url": u, "warc_ts": dt.datetime(2024, 8, 7),
                     "html": html, "text": extract_text(html),
                     "lang": "en"})
    return pd.DataFrame(rows)


_SEEDS = pd.DataFrame({"url": ["http://h0.test/"], "seed_order": [0]})


def _events(run):
    return [(r["superstep"], r["depth"], r["host_rank"],
             r["discovery_order"], r["url"])
            for r in run.fetch_events().collect()]


def test_quota_caps_grants_and_matches_oracle(spark, tmp_path):
    # bucket refills 2/step, so without a quota all 7 pages fetch; the
    # quota of 4 stops the crawl after 4 grants, forever
    cfg = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=6,
                      bucket_capacity=2, fill_quantum=2, initial_tokens=2,
                      max_fetch_per_key=4)
    pages_pd = _pages_pd()
    want = oracle.crawl(pages_pd, _SEEDS, None, cfg)
    run = Engine(spark, cfg).run(spark.createDataFrame(pages_pd),
                                 spark.createDataFrame(_SEEDS),
                                 None, tmp_path / "q")
    got = _events(run)
    assert got == [tuple(e) for e in want.fetch_events]
    assert len(got) == 4  # quota, not the budget, is the binding cap
    states = {r["url"]: r["state"] for r in run.frontier().collect()}
    assert states == want.states
    # starved rows remain pending (re-crawlable), never failed/filtered
    assert sorted(states.values()) == ["fetched"] * 4 + ["pending"] * 3

    # control: same config without the quota fetches everything
    cfg_off = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=8,
                          bucket_capacity=2, fill_quantum=2,
                          initial_tokens=2)
    want_off = oracle.crawl(pages_pd, _SEEDS, None, cfg_off)
    assert len(want_off.fetch_events) == 1 + N_CHILDREN


def test_quota_survives_resume(spark, tmp_path):
    """The cumulative count is checkpoint state: a resumed run must NOT
    get a fresh quota."""
    pages_pd = _pages_pd()
    cfg = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=1,
                      bucket_capacity=2, fill_quantum=2, initial_tokens=2,
                      max_fetch_per_key=3)
    st = tmp_path / "r"
    run1 = Engine(spark, cfg).run(spark.createDataFrame(pages_pd),
                                  spark.createDataFrame(_SEEDS), None, st)
    n1 = len(_events(run1))
    cfg2 = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=6,
                       bucket_capacity=2, fill_quantum=2, initial_tokens=2,
                       max_fetch_per_key=3)
    run2 = Engine(spark, cfg2).run(spark.createDataFrame(pages_pd),
                                   spark.createDataFrame(_SEEDS), None, st,
                                   resume=True)
    # total grants across both runs == the quota, and the full-run oracle
    # agrees event-for-event with the resumed crawl
    want = oracle.crawl(pages_pd, _SEEDS, None, cfg2)
    assert _events(run2) == [tuple(e) for e in want.fetch_events]
    assert len(_events(run2)) == 3
    assert n1 >= 1  # first session really did consume some quota


def test_quota_with_domain_key(spark, tmp_path):
    """Quota composes with domain politeness: one cap for the whole
    registrable domain across its subdomains."""
    rows = []
    kids = ["http://a.site.test/p1", "http://b.site.test/p2",
            "http://c.site.test/p3"]
    html = ("<html><body>" +
            "".join(f'<a href="{u}">x</a>' for u in kids) +
            "</body></html>").encode()
    rows.append({"url": "http://site.test/",
                 "warc_ts": dt.datetime(2024, 8, 7), "html": html,
                 "text": extract_text(html), "lang": "en"})
    for i, u in enumerate(kids):
        h = f"<html><body><p>k {i}</p></body></html>".encode()
        rows.append({"url": u, "warc_ts": dt.datetime(2024, 8, 7),
                     "html": h, "text": extract_text(h), "lang": "en"})
    pages_pd = pd.DataFrame(rows)
    seeds = pd.DataFrame({"url": ["http://site.test/"], "seed_order": [0]})
    cfg = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=5,
                      politeness_key="domain", max_fetch_per_key=2)
    want = oracle.crawl(pages_pd, seeds, None, cfg)
    run = Engine(spark, cfg).run(spark.createDataFrame(pages_pd),
                                 spark.createDataFrame(seeds), None,
                                 tmp_path / "d")
    got = _events(run)
    assert got == [tuple(e) for e in want.fetch_events]
    assert len(got) == 2  # root + ONE child, despite three hosts
