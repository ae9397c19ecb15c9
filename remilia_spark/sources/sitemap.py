"""Sitemap parser — sitemap.xml / sitemap-index bodies → seed URL rows.

Sitemaps are the main out-of-band discovery channel (the streaming ingest's
``source='sitemap'`` rows).  This connector parses fetched sitemap bodies
— ``(sitemap_url, body:binary)`` — into ``(url, lastmod)`` rows ready for
``streaming.start_url_ingest`` drops or direct seed union.

* ``<urlset>`` documents yield their ``<url><loc>`` entries (+ optional
  ``<lastmod>``);
* ``<sitemapindex>`` documents yield their child sitemap locations with
  ``is_index=true`` — the caller fetches those and feeds them back (the
  index fan-out is a crawl-loop concern, not a parser concern);
* gzip bodies (``sitemap.xml.gz``) are sniffed by magic bytes;
* stdlib ``ElementTree`` with namespace-agnostic tag matching (real-world
  sitemaps mix default-ns / prefixed / missing namespaces freely).

mapInPandas over Arrow batches; one sitemap body is bounded at 50k URLs by
spec, so per-task memory is bounded by batch_size × 50k small strings —
set ``spark.sql.execution.arrow.maxRecordsPerBatch`` low when feeding
many-MB sitemap blobs, same guidance as the multimodal column.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterable, Iterator
from xml.etree import ElementTree

import pandas as pd

SITEMAP_SCHEMA = ("sitemap_url string, url string, lastmod string, "
                  "changefreq string, is_index boolean")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(body: bytes) \
        -> Iterator[tuple[str, str | None, str | None, bool]]:
    """Yield ``(url, lastmod, changefreq, is_index)`` from one sitemap body.

    Malformed XML yields nothing (a crawler skips broken sitemaps, it
    doesn't fail the wave).
    """
    if body[:2] == b"\x1f\x8b":
        try:
            body = gzip.decompress(body)
        except OSError:
            return
    try:
        root = ElementTree.fromstring(body)
    except ElementTree.ParseError:
        return
    is_index = _local(root.tag) == "sitemapindex"
    for entry in root:
        if _local(entry.tag) not in ("url", "sitemap"):
            continue
        loc, lastmod, changefreq = None, None, None
        for child in entry:
            t = _local(child.tag)
            if t == "loc":
                loc = (child.text or "").strip()
            elif t == "lastmod":
                lastmod = (child.text or "").strip() or None
            elif t == "changefreq":
                changefreq = (child.text or "").strip().lower() or None
        if loc:
            yield loc, lastmod, changefreq, is_index


def sitemap_urls(fetched, url_col: str = "sitemap_url",
                 body_col: str = "body"):
    """``(sitemap_url, body:binary)`` rows → SITEMAP_SCHEMA DataFrame."""

    def _parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for su, body in zip(pdf[url_col], pdf[body_col]):
                if body is None:
                    continue
                for loc, lastmod, cf, is_index in parse_sitemap(bytes(body)):
                    rows.append((su, loc, lastmod, cf, is_index))
            yield pd.DataFrame(
                rows, columns=["sitemap_url", "url", "lastmod",
                               "changefreq", "is_index"])

    return fetched.select(url_col, body_col) \
        .mapInPandas(_parse, schema=SITEMAP_SCHEMA)


# Pinned changefreq -> revisit-interval seconds (sitemaps.org values).
# "always" floors at an hour (politeness; nothing refetches continuously),
# "never" caps at a year — both ends still re-checked eventually, matching
# how recrawl_schedule clamps history-driven intervals.
CHANGEFREQ_SECONDS = {
    "always": 3600, "hourly": 3600, "daily": 86400, "weekly": 604800,
    "monthly": 2592000, "yearly": 31536000, "never": 31536000,
}


def sitemap_schedule(sitemap_rows, now_epoch: int,
                     default_interval_s: int = 8 * 86400):
    """Sitemap metadata → the recrawl plan shape: ``(url, next_interval_s,
    next_fetch_epoch)``.

    The cold-start complement of ``recrawl.recrawl_schedule``: before any
    fetch history exists, the site's own declared ``changefreq``/
    ``lastmod`` seed the revisit intervals; once history accumulates, the
    measured change rate takes over (same output shape, same
    ``due_urls`` consumer).

    Pinned rules (pure column math, zero Python):
    * interval = CHANGEFREQ_SECONDS[changefreq]; missing/unknown →
      ``default_interval_s``;
    * next_fetch_epoch = lastmod + interval when lastmod parses (ISO
      date or datetime, via try_to_timestamp), else ``now_epoch`` (an
      undated URL is due immediately);
    * index rows (``is_index``) are sitemap fan-out, not pages — excluded;
    * duplicate URLs across sitemaps keep the EARLIEST next_fetch_epoch
      (fetch at the most eager declaration).
    """
    from pyspark.sql import functions as F

    freq_map = F.create_map(*[F.lit(x) for kv in CHANGEFREQ_SECONDS.items()
                              for x in kv])
    interval = F.coalesce(freq_map[F.col("changefreq")],
                          F.lit(int(default_interval_s))).cast("long")
    lastmod_ts = F.coalesce(
        F.try_to_timestamp(F.col("lastmod")),
        F.try_to_timestamp(F.col("lastmod"), F.lit("yyyy-MM-dd")))
    nxt = F.when(
        lastmod_ts.isNotNull(),
        F.unix_timestamp(lastmod_ts) + interval,
    ).otherwise(F.lit(int(now_epoch))).cast("long")
    return (sitemap_rows.where(~F.col("is_index"))
            .select("url", interval.alias("next_interval_s"),
                    nxt.alias("next_fetch_epoch"))
            .groupBy("url")
            # one coherent winner row: min (epoch, interval) as a pair —
            # not per-column minima, which could mix two declarations
            .agg(F.min(F.struct("next_fetch_epoch", "next_interval_s"))
                 .alias("m"))
            .select("url",
                    F.col("m.next_interval_s").cast("long")
                    .alias("next_interval_s"),
                    F.col("m.next_fetch_epoch").cast("long")
                    .alias("next_fetch_epoch")))
