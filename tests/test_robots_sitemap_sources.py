"""robots.txt and sitemap connectors: pure parsers + the Spark table they
feed (robots table drives the engine's insertion-time filter; sitemap URLs
feed the streaming ingest)."""

from __future__ import annotations

import gzip

from remilia_spark.robots import blocked_col
from remilia_spark.sources import (
    parse_robots_txt,
    parse_sitemap,
    robots_table,
    sitemap_urls,
)

_ROBOTS = b"""
# host0 policy
User-agent: googlebot
Disallow: /only-google/

User-agent: *
Disallow: /private/
Disallow: /tmp
Crawl-delay: 2.7
Allow: /private/ok

User-agent: otherbot
Disallow: /
"""

_SITEMAP = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://host0.test/a</loc><lastmod>2024-08-01</lastmod>
       <changefreq>Daily</changefreq></url>
  <url><loc> http://host0.test/b </loc></url>
  <url><lastmod>2024-08-02</lastmod></url>
</urlset>"""

_SITEMAP_INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://host0.test/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>http://host0.test/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_parse_robots_txt_pure():
    dis, allow, delay = parse_robots_txt(_ROBOTS)
    assert dis == ["/private/", "/tmp"]
    assert allow == ["/private/ok"]
    assert delay == 2
    # group targeting: a named agent sees its own group
    assert parse_robots_txt(_ROBOTS, agent="otherbot") == (["/"], [], 0)
    # empty / no-star robots allow everything
    assert parse_robots_txt(b"") == ([], [], 0)
    assert parse_robots_txt(b"User-agent: x\nDisallow: /") == ([], [], 0)
    # consecutive user-agent lines share one group
    both = b"User-agent: a\nUser-agent: *\nDisallow: /shared"
    assert parse_robots_txt(both) == (["/shared"], [], 0)


def test_parse_sitemap_pure():
    assert list(parse_sitemap(_SITEMAP)) == [
        ("http://host0.test/a", "2024-08-01", "daily", False),
        ("http://host0.test/b", None, None, False),
    ]
    assert list(parse_sitemap(_SITEMAP_INDEX)) == [
        ("http://host0.test/sitemap-1.xml", None, None, True),
        ("http://host0.test/sitemap-2.xml.gz", None, None, True),
    ]
    # gzip bodies sniffed by magic; malformed XML yields nothing
    assert list(parse_sitemap(gzip.compress(_SITEMAP))) \
        == list(parse_sitemap(_SITEMAP))
    assert list(parse_sitemap(b"<urlset><url><loc>x")) == []


def test_robots_table_feeds_engine_filter(spark):
    import pyspark.sql.functions as F

    fetched = spark.createDataFrame(
        [("host0.test", bytearray(_ROBOTS)), ("host1.test", bytearray(b""))],
        "host string, body binary")
    robots = robots_table(fetched)
    rows = {r.host: r for r in robots.collect()}
    assert rows["host0.test"].disallow == ["/private/", "/tmp"]
    assert rows["host0.test"].crawl_delay == 2
    assert rows["host1.test"].disallow == []
    # the parsed table drives the same blocked_col the engine uses
    paths = spark.createDataFrame(
        [("host0.test", "/private/x"), ("host0.test", "/public"),
         ("host1.test", "/private/x")], "host string, path string")
    got = {(r.host, r.path): r.blocked for r in paths.join(robots, "host")
           .select("host", "path",
                   blocked_col(F.col("path"), F.col("disallow"))
                   .alias("blocked")).collect()}
    assert got == {("host0.test", "/private/x"): True,
                   ("host0.test", "/public"): False,
                   ("host1.test", "/private/x"): False}


def test_sitemap_urls_spark(spark):
    fetched = spark.createDataFrame(
        [("http://host0.test/sitemap.xml", bytearray(_SITEMAP)),
         ("http://host0.test/sitemap_index.xml", bytearray(_SITEMAP_INDEX)),
         ("http://host0.test/broken.xml", bytearray(b"not xml"))],
        "sitemap_url string, body binary")
    got = sitemap_urls(fetched).collect()
    urls = {(r.url, r.is_index) for r in got}
    assert urls == {("http://host0.test/a", False),
                    ("http://host0.test/b", False),
                    ("http://host0.test/sitemap-1.xml", True),
                    ("http://host0.test/sitemap-2.xml.gz", True)}


ROBOTS_WITH_SITEMAPS = b"""# example
User-agent: *
Disallow: /private/
Sitemap: http://host0.test/sitemap.xml
User-agent: other
Disallow: /
Sitemap: http://host0.test/sitemap-extra.xml.gz
Sitemap: http://host0.test/sitemap.xml
sitemap: http://host0.test/CaseKept.xml
"""


def test_parse_sitemap_directives_pure():
    """Sitemap: lines are GLOBAL (collected from any group position),
    order-preserving, first-occurrence deduped, value case preserved."""
    from remilia_spark.sources import robotstxt

    got = robotstxt.parse_sitemap_directives(ROBOTS_WITH_SITEMAPS)
    assert got == ["http://host0.test/sitemap.xml",
                   "http://host0.test/sitemap-extra.xml.gz",
                   "http://host0.test/CaseKept.xml"]
    assert robotstxt.parse_sitemap_directives(b"User-agent: *\n") == []


def test_robots_to_sitemap_to_seeds_composition(spark):
    """The standard discovery chain end-to-end: robots.txt Sitemap:
    directives -> (fetch) -> sitemap parse -> seed URL rows."""
    import pyspark.sql.functions as F

    from remilia_spark.sources import robotstxt

    sm_body = (b'<?xml version="1.0"?>'
               b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
               b'<url><loc>http://host0.test/a</loc></url>'
               b'<url><loc>http://host0.test/b</loc></url></urlset>')
    robots_rows = spark.createDataFrame(
        [("host0.test", bytearray(ROBOTS_WITH_SITEMAPS)),
         ("host1.test", bytearray(b"User-agent: *\nDisallow:\n"))],
        "host string, body binary")
    directives = robotstxt.sitemap_directives(robots_rows)
    got = {(r["host"], r["sitemap_url"], r["sm_order"])
           for r in directives.collect()}
    assert got == {("host0.test", "http://host0.test/sitemap.xml", 0),
                   ("host0.test", "http://host0.test/sitemap-extra.xml.gz", 1),
                   ("host0.test", "http://host0.test/CaseKept.xml", 2)}
    # "fetch" the first directive's body (corpus-join stand-in), parse it
    fetched = directives.where("sm_order = 0").select("sitemap_url") \
        .withColumn("body", F.lit(bytearray(sm_body)))
    urls = {r["url"] for r in sitemap_urls(fetched).collect()}
    assert urls == {"http://host0.test/a", "http://host0.test/b"}


def test_sitemap_schedule(spark):
    """changefreq/lastmod -> the recrawl plan shape (pinned mapping,
    earliest coherent declaration wins, index rows excluded, undated
    URLs due now) — feeds recrawl.due_urls unchanged."""
    from remilia_spark.recrawl import due_urls
    from remilia_spark.sources.sitemap import sitemap_schedule

    now = 1_722_988_800  # 2024-08-07 00:00:00 UTC
    rows = [
        # lastmod 2024-08-01 00:00:00 = 1722470400
        ("s", "http://h.test/daily", "2024-08-01", "daily", False),
        ("s", "http://h.test/wk", "2024-08-01T00:00:00", "weekly", False),
        ("s", "http://h.test/undated", None, "hourly", False),
        ("s", "http://h.test/unknown", "2024-08-01", "sometimes", False),
        ("s", "http://h.test/nofreq", "2024-08-01", None, False),
        ("s", "http://h.test/idx.xml", None, None, True),
        # duplicate: daily (early) + yearly (late) -> daily row wins whole
        ("s2", "http://h.test/daily", "2024-08-01", "yearly", False),
    ]
    df = spark.createDataFrame(
        rows, "sitemap_url string, url string, lastmod string, "
              "changefreq string, is_index boolean")
    got = {r["url"]: (r["next_interval_s"], r["next_fetch_epoch"])
           for r in sitemap_schedule(df, now).collect()}
    lm = 1_722_470_400
    assert got == {
        "http://h.test/daily": (86400, lm + 86400),
        "http://h.test/wk": (604800, lm + 604800),
        "http://h.test/undated": (3600, now),
        "http://h.test/unknown": (8 * 86400, lm + 8 * 86400),
        "http://h.test/nofreq": (8 * 86400, lm + 8 * 86400),
    }
    # plugs straight into the standing-crawl due-list
    due = {r["url"] for r in due_urls(sitemap_schedule(df, now),
                                      now).collect()}
    # daily: due Aug 2 < now (Aug 7); weekly: due Aug 8 > now — not yet
    assert due == {"http://h.test/daily", "http://h.test/undated"}


def test_allow_longest_match(spark):
    """REP longest-match (RFC 9309 §2.2.2) through the full chain:
    robots body -> robots_table (allow column) -> with_robots_state /
    blocked_col -> oracle parity."""
    import pyspark.sql.functions as F

    from remilia_spark.robots import blocked_col, with_robots_state

    body = (b"User-agent: *\n"
            b"Disallow: /private/\n"
            b"Allow: /private/ok\n"
            b"Disallow: /private/ok/nested\n"
            b"Allow: /x\n"
            b"Disallow: /x\n")  # equal length: Allow wins
    fetched = spark.createDataFrame([("h.test", bytearray(body))],
                                    "host string, body binary")
    robots = robots_table(fetched)
    row = robots.collect()[0]
    assert row.allow == ["/private/ok", "/x"]

    cases = {
        "/private/a": True,          # disallow only
        "/private/ok": False,        # allow longer than disallow
        "/private/okay": False,      # prefix semantics, like REP
        "/private/ok/nested/f": True,  # deeper disallow wins again
        "/x": False,                 # tie -> allow
        "/public": False,            # no rule
    }
    cand = spark.createDataFrame([("h.test", p) for p in cases],
                                 "host string, path string")
    got = {r["path"]: r["robots_blocked"]
           for r in with_robots_state(
               cand.withColumn("url", F.lit("u")), robots).collect()}
    assert got == cases

    # two-arg legacy form is untouched (pinned engine fixtures)
    legacy = {r["path"]: r["b"] for r in cand.join(robots, "host").select(
        "path", blocked_col(F.col("path"), F.col("disallow")).alias("b"))
        .collect()}
    assert legacy["/private/ok"] is True  # no allow in the legacy rule


def test_allow_robots_drive_the_engine(spark, tmp_path):
    """End-to-end: an allow-carrying robots table changes insertion states
    in the crawl, engine == oracle."""
    import datetime as dt

    import pandas as pd

    from remilia_spark import oracle
    from remilia_spark.config import CrawlConfig
    from remilia_spark.engine import Engine
    from remilia_spark.extract import extract_text

    html = (b'<html><body><a href="/private/ok">ok</a>'
            b'<a href="/private/no">no</a></body></html>')
    rows = []
    for u, h in (("http://h.test/", html),
                 ("http://h.test/private/ok", b"<p>fine</p>")):
        rows.append({"url": u, "warc_ts": dt.datetime(2024, 8, 7),
                     "html": h, "text": extract_text(h), "lang": "en"})
    pages_pd = pd.DataFrame(rows)
    seeds_pd = pd.DataFrame({"url": ["http://h.test/"], "seed_order": [0]})
    robots_pd = pd.DataFrame({"host": ["h.test"],
                              "disallow": [["/private/"]],
                              "crawl_delay": [0],
                              "allow": [["/private/ok"]]})
    cfg = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=10)
    want = oracle.crawl(pages_pd, seeds_pd, robots_pd, cfg)
    run = Engine(spark, cfg).run(
        spark.createDataFrame(pages_pd), spark.createDataFrame(seeds_pd),
        spark.createDataFrame(
            robots_pd, "host string, disallow array<string>, "
                       "crawl_delay int, allow array<string>"),
        tmp_path / "st")
    got_states = {r["url"]: r["state"] for r in run.frontier().collect()}
    assert got_states == want.states
    assert got_states["http://h.test/private/ok"] == "fetched"
    assert got_states["http://h.test/private/no"] == "filtered"
    got_events = [(r["superstep"], r["depth"], r["host_rank"],
                   r["discovery_order"], r["url"])
                  for r in run.fetch_events().collect()]
    assert got_events == [tuple(e) for e in want.fetch_events]
