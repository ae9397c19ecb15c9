"""Domain-level politeness (CrawlConfig.politeness_key='domain'): one
token bucket per registered domain, so a subdomain spray cannot multiply
its fetch rate by minting hosts.  Engine must equal the oracle exactly,
and domain mode must actually defer what host mode would grant."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from remilia_spark import oracle
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.extract import extract_text

CHILDREN = ["http://a.site.test/p1", "http://b.site.test/p2",
            "http://c.site.test/p3", "http://a.site.test/p4"]
ROOT_HTML = ("<html><body>" +
             "".join(f'<a href="{u}">x</a>' for u in CHILDREN) +
             "</body></html>")


def _pages_pd() -> pd.DataFrame:
    rows = []
    pages = [("http://site.test/", ROOT_HTML)] + [
        (u, f"<html><body><p>page {i}</p></body></html>")
        for i, u in enumerate(CHILDREN)]
    for u, h in pages:
        html = h.encode()
        rows.append({"url": u, "warc_ts": dt.datetime(2024, 8, 7),
                     "html": html, "text": extract_text(html),
                     "lang": "en"})
    return pd.DataFrame(rows)


_SEEDS = pd.DataFrame({"url": ["http://site.test/"], "seed_order": [0]})
_CFG = dict(max_depth=1, max_attempt=2, max_supersteps=20,
            bucket_capacity=2, fill_quantum=1, initial_tokens=2)


def _events(run):
    return [(r["superstep"], r["depth"], r["host_rank"],
             r["discovery_order"], r["url"])
            for r in run.fetch_events().collect()]


def test_domain_mode_matches_oracle_and_defers(spark, tmp_path):
    pages_pd = _pages_pd()
    cfg_dom = CrawlConfig(politeness_key="domain", **_CFG)
    want = oracle.crawl(pages_pd, _SEEDS, None, cfg_dom)
    run = Engine(spark, cfg_dom).run(spark.createDataFrame(pages_pd),
                                     spark.createDataFrame(_SEEDS),
                                     None, tmp_path / "dom")
    got = _events(run)
    assert got == [tuple(e) for e in want.fetch_events]
    assert {r["url"] for r in run.seen().collect()} == set(want.seen)
    assert {r["url"]: r["state"] for r in run.frontier().collect()} \
        == want.states

    # ONE bucket for the whole domain: never more than bucket_capacity
    # fetches per superstep, despite three distinct hosts
    per_step: dict[int, int] = {}
    for s, *_ in got:
        per_step[s] = per_step.get(s, 0) + 1
    assert max(per_step.values()) <= 2
    # host_rank ranks within the DOMAIN's wave: some wave must rank two
    # different hosts 1 and 2 under the same key
    ranked = [(s, r, u) for s, _, r, _, u in got]
    step_hosts = {}
    for s, r, u in ranked:
        step_hosts.setdefault(s, []).append((r, u.split("/")[2]))
    assert any(len({h for _, h in v}) > 1 and len(v) > 1
               for v in step_hosts.values())

    # control: host mode grants every child at once (each host has its
    # own fresh bucket), finishing in fewer supersteps
    cfg_host = CrawlConfig(**_CFG)
    want_host = oracle.crawl(pages_pd, _SEEDS, None, cfg_host)
    dom_steps = max(s for s, *_ in want.fetch_events)
    host_steps = max(s for s, *_ in want_host.fetch_events)
    assert host_steps < dom_steps
    assert set(want_host.seen) == set(want.seen)  # same URLs either way


def test_domain_crawl_delay_reads_domain_robots_row(spark, tmp_path):
    """Pinned rule: in domain mode crawl_delay comes from the robots row
    whose host EQUALS the registrable domain."""
    pages_pd = _pages_pd()
    robots_pd = pd.DataFrame({
        "host": ["site.test", "a.site.test"],
        "disallow": [[], []],
        "crawl_delay": [3, 0],   # domain row throttles; subdomain row unused
    })
    cfg = CrawlConfig(politeness_key="domain", **_CFG)
    want = oracle.crawl(pages_pd, _SEEDS, robots_pd, cfg)
    run = Engine(spark, cfg).run(
        spark.createDataFrame(pages_pd), spark.createDataFrame(_SEEDS),
        spark.createDataFrame(
            robots_pd, "host string, disallow array<string>, crawl_delay int"),
        tmp_path / "delay")
    assert _events(run) == [tuple(e) for e in want.fetch_events]
    # the 3-step delay stretches the crawl beyond the no-delay version
    no_delay = oracle.crawl(pages_pd, _SEEDS, None, cfg)
    assert max(s for s, *_ in want.fetch_events) \
        > max(s for s, *_ in no_delay.fetch_events)


def test_invalid_politeness_key_rejected(spark, tmp_path):
    pages_pd = _pages_pd()
    cfg = CrawlConfig(politeness_key="ip", **_CFG)
    with pytest.raises(ValueError):
        oracle.crawl(pages_pd, _SEEDS, None, cfg)
    with pytest.raises(Exception):
        Engine(spark, cfg).run(spark.createDataFrame(pages_pd),
                               spark.createDataFrame(_SEEDS),
                               None, tmp_path / "bad")
