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

SITEMAP_SCHEMA = "sitemap_url string, url string, lastmod string, is_index boolean"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(body: bytes) -> Iterator[tuple[str, str | None, bool]]:
    """Yield ``(url, lastmod, is_index)`` from one sitemap body.

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
        loc, lastmod = None, None
        for child in entry:
            t = _local(child.tag)
            if t == "loc":
                loc = (child.text or "").strip()
            elif t == "lastmod":
                lastmod = (child.text or "").strip() or None
        if loc:
            yield loc, lastmod, is_index


def sitemap_urls(fetched, url_col: str = "sitemap_url",
                 body_col: str = "body"):
    """``(sitemap_url, body:binary)`` rows → SITEMAP_SCHEMA DataFrame."""

    def _parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for su, body in zip(pdf[url_col], pdf[body_col]):
                if body is None:
                    continue
                for loc, lastmod, is_index in parse_sitemap(bytes(body)):
                    rows.append((su, loc, lastmod, is_index))
            yield pd.DataFrame(
                rows, columns=["sitemap_url", "url", "lastmod", "is_index"])

    return fetched.select(url_col, body_col) \
        .mapInPandas(_parse, schema=SITEMAP_SCHEMA)
