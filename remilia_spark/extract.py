"""Pinned HTML link/text extractor — the engine's "parse" stage.

The reference parses each response body into a goquery DOM
(``client.go:152-158``) and runs a user callback; its example extractors pull
``Find("a").Each → Attr("href")`` and ``Find("p").First().Text()`` / h1 text
(``cmd/dev/main.go:50-62``, ``README.md:17-21``).  We pin one deterministic
extractor (the sandbox has no lxml/bs4, so stdlib ``html.parser``):

Pinned spec (frozen — golden fixtures and the pages.text column depend on it):

* **links**: the raw ``href`` attribute of every ``<a>`` start tag that has
  one, in document order, duplicates preserved (canonicalization and dedup
  happen downstream, never here).
* **text**: for each ``<title>``, ``<h1>`` and ``<p>`` element in document
  order, the whitespace-collapsed (``" ".join(raw.split())``) concatenation
  of all character data inside it; empty segments dropped; segments joined
  with ``"\\n"``.  This is the per-url byte-identical invariant.
* bytes are decoded with the given charset (default UTF-8, errors=replace) —
  the reference's optional charset transformer (``client.go:228-233``).

Spark-side the extractor runs as ``mapInPandas`` over Arrow batches of the
``html:binary`` column — one Python process call per batch, never per row.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from html.parser import HTMLParser

import pandas as pd

_TEXT_TAGS = ("title", "h1", "p")

# mapInPandas output schema for the parse stage (string form for Spark).
EXTRACT_SCHEMA = "url string, links array<string>, text string"


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self._depth = dict.fromkeys(_TEXT_TAGS, 0)
        self._buf: dict[str, list[str]] = {t: [] for t in _TEXT_TAGS}
        self.segments: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)
                    break
        if tag in self._depth:
            if self._depth[tag] == 0:
                self._buf[tag] = []
            self._depth[tag] += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in self._depth and self._depth[tag] > 0:
            self._depth[tag] -= 1
            if self._depth[tag] == 0:
                seg = " ".join("".join(self._buf[tag]).split())
                if seg:
                    self.segments.append(seg)

    def handle_data(self, data: str) -> None:
        for tag, d in self._depth.items():
            if d > 0:
                self._buf[tag].append(data)

    def flush_open(self) -> None:
        """EOF with unclosed elements: flush their buffers (title,h1,p order)."""
        for tag in _TEXT_TAGS:
            if self._depth[tag] > 0:
                self._depth[tag] = 0
                seg = " ".join("".join(self._buf[tag]).split())
                if seg:
                    self.segments.append(seg)


def extract(html: bytes | str, charset: str = "utf-8") -> tuple[list[str], str]:
    """Return (links, text) for one document per the pinned spec."""
    if html is None:
        return [], ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode(charset, errors="replace")
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # malformed HTML: keep whatever was extracted before the error
    p.flush_open()
    return p.links, "\n".join(p.segments)


def extract_text(html: bytes | str, charset: str = "utf-8") -> str:
    return extract(html, charset)[1]


# ---------------------------------------------------------------------------
# anchor-text extraction (separate pass; the frozen link/text spec above is
# untouched — goldens and the pages.text invariant do not depend on this)
# ---------------------------------------------------------------------------

# mapInPandas output schema for the anchor pass: one row per href-bearing
# <a> element, document order.
ANCHOR_SCHEMA = "url string, href string, anchor string"


class _AnchorExtractor(HTMLParser):
    """(href, inner text) per ``<a href=…>`` element.

    Spec (pinned like the extractor above):

    * any ``<a>`` start tag closes a currently-open anchor first (HTML5
      tree construction — ``<a>`` cannot nest);
    * only href-bearing anchors are emitted; an ``<a>`` without href still
      closes the open one but emits nothing itself;
    * anchor text is the whitespace-collapsed character data between the
      start tag and its close; kept even when empty (image-only anchors
      still carry their href);
    * EOF closes an open anchor (same philosophy as ``flush_open``).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []

    def _close(self) -> None:
        if self._href is not None:
            self.anchors.append(
                (self._href, " ".join("".join(self._buf).split())))
        self._href = None
        self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        self._close()
        for k, v in attrs:
            if k == "href" and v is not None:
                self._href = v
                break

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._close()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._buf.append(data)


def extract_anchors(html: bytes | str,
                    charset: str = "utf-8") -> list[tuple[str, str]]:
    """[(href, anchor_text), …] in document order per the pinned spec."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode(charset, errors="replace")
    p = _AnchorExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # malformed HTML: keep whatever was extracted before the error
    p._close()
    return p.anchors


def anchors_map_in_pandas(charset: str = "utf-8"):
    """Factory for the anchor pass: ``pages.select("url", "html")
    .mapInPandas(anchors_map_in_pandas(), ANCHOR_SCHEMA)`` — rows arrive
    pre-exploded (url, href, anchor), so the downstream aggregation
    (`datapipe.graph.top_anchor_texts`) starts from a plain shuffle on the
    target key with no array handling."""
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, hrefs, texts = [], [], []
            for u, h in zip(pdf["url"], pdf["html"]):
                for href, anchor in extract_anchors(h, charset):
                    urls.append(u)
                    hrefs.append(href)
                    texts.append(anchor)
            yield pd.DataFrame({"url": urls, "href": hrefs,
                                "anchor": texts})
    return fn


def extract_batch(pdf: pd.DataFrame, charset: str = "utf-8") -> pd.DataFrame:
    """Arrow-batch body: pdf[url, html] -> pdf[url, links, text]."""
    links, texts = [], []
    for h in pdf["html"]:
        ls, tx = extract(h, charset)
        links.append(ls)
        texts.append(tx)
    return pd.DataFrame({"url": pdf["url"], "links": links, "text": texts})


def extract_map_in_pandas(charset: str = "utf-8"):
    """Factory for the ``mapInPandas`` function of the parse stage.

    Usage: ``fetched.select("url", "html").mapInPandas(
    extract_map_in_pandas(), EXTRACT_SCHEMA)``.
    """
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_batch(pdf, charset)
    return fn
