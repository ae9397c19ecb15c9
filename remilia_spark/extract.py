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

import re
from collections.abc import Iterable, Iterator
from html.parser import HTMLParser

import pandas as pd

_TEXT_TAGS = ("title", "h1", "p")

# ---------------------------------------------------------------------------
# Fast path: a regex tag tokenizer that mirrors html.parser EXACTLY for a
# restricted input class, falling back to HTMLParser the moment anything
# falls outside it.  The restricted class (everything else -> fallback):
#
# * no '&' (charrefs), no '<!' (comments/doctype/CDATA), no '<?' (PIs), no
#   <script>/<style> (CDATA content modes) — one cheap whole-doc regex;
# * every '<' begins a tag matched by _TAG_RE whose attribute region fully
#   matches _ATTRS_RE (names, optionally ="double-quoted" values; quoted
#   values may contain any char except '"' — covers hrefs with |, <, >);
# * end tags carry no attributes.
#
# Within that class the start/end/data event stream (lowercased names,
# '/>' = start+end, first-href-wins) is identical to html.parser's, so the
# pinned extractor spec — and the byte-identical ``text`` invariant the
# goldens and the flagship oracle depend on — is preserved bit-for-bit.
# Pinned by a differential test (tests/test_fast_extract.py): corpus pages
# (100% fast-path) and adversarial fuzz strings agree with HTMLParser on
# every document the fast path accepts.  Measured ~2x the HTMLParser wall
# on corpus HTML — the parse stage is the crawl's largest Python cost.
# ---------------------------------------------------------------------------

_GATE_RE = re.compile(r'&|<[!?]|<\s*/?\s*(?:script|style)', re.IGNORECASE)
# attrs region: '>' inside quotes does not end the tag (html.parser's
# tolerant scanner reads balanced quotes the same way)
_TAG_RE = re.compile(
    r'<(/?)([a-zA-Z][a-zA-Z0-9.\-_:]*)'
    r'((?:"[^"]*"|\'[^\']*\'|[^>"\'])*)'
    r'>'
)
# strict full-match for a start tag's attribute region; group(1) = the
# trailing '/' of a self-closing tag
_ATTRS_RE = re.compile(
    r'(?:\s+[a-zA-Z][a-zA-Z0-9_:.\-]*(?:="[^"]*")?)*\s*(/?)\Z')
_ATTR_ITER = re.compile(
    r'\s+([a-zA-Z][a-zA-Z0-9_:.\-]*)(?:="([^"]*)")?')


def _href_of(attrs: str) -> str | None:
    """First href value of a validated attrs region (html.parser's
    first-match-wins attribute loop)."""
    for am in _ATTR_ITER.finditer(attrs):
        if am.group(1).lower() == "href" and am.group(2) is not None:
            return am.group(2)
    return None


def _extract_fast(html: str) -> tuple[list[str], str] | None:
    """(links, text) per the pinned spec, or None -> caller falls back."""
    if _GATE_RE.search(html):
        return None
    links: list[str] = []
    d_title = d_h1 = d_p = 0
    b_title: list[str] = []
    b_h1: list[str] = []
    b_p: list[str] = []
    segments: list[str] = []

    def _close(depth: int, buf: list[str]) -> int:
        if depth:
            depth -= 1
            if depth == 0:
                seg = " ".join("".join(buf).split())
                if seg:
                    segments.append(seg)
        return depth

    pos = 0
    for m in _TAG_RE.finditer(html):
        data = html[pos:m.start()]
        if '<' in data:
            return None
        if data:
            if d_title:
                b_title.append(data)
            if d_h1:
                b_h1.append(data)
            if d_p:
                b_p.append(data)
        close, name, attrs = m.group(1), m.group(2), m.group(3)
        pos = m.end()
        if close:
            if attrs and not attrs.isspace():
                return None
            tag = name.lower()
            if tag == "title":
                d_title = _close(d_title, b_title)
            elif tag == "h1":
                d_h1 = _close(d_h1, b_h1)
            elif tag == "p":
                d_p = _close(d_p, b_p)
            continue
        am = _ATTRS_RE.fullmatch(attrs)
        if am is None:
            return None
        selfclose = am.group(1) == '/'
        tag = name.lower()
        if tag == "a":
            href = _href_of(attrs)
            if href is not None:
                links.append(href)
        elif tag == "title":
            if d_title == 0:
                b_title = []
            d_title += 1
            if selfclose:
                d_title = _close(d_title, b_title)
        elif tag == "h1":
            if d_h1 == 0:
                b_h1 = []
            d_h1 += 1
            if selfclose:
                d_h1 = _close(d_h1, b_h1)
        elif tag == "p":
            if d_p == 0:
                b_p = []
            d_p += 1
            if selfclose:
                d_p = _close(d_p, b_p)
    tail = html[pos:]
    if '<' in tail:
        return None
    if tail:
        if d_title:
            b_title.append(tail)
        if d_h1:
            b_h1.append(tail)
        if d_p:
            b_p.append(tail)
    for dpt, buf in ((d_title, b_title), (d_h1, b_h1), (d_p, b_p)):
        if dpt > 0:  # flush_open, title/h1/p order
            seg = " ".join("".join(buf).split())
            if seg:
                segments.append(seg)
    return links, "\n".join(segments)


def _extract_anchors_fast(html: str) -> list[tuple[str, str]] | None:
    """[(href, anchor)] per the pinned anchor spec, or None -> fallback."""
    if _GATE_RE.search(html):
        return None
    anchors: list[tuple[str, str]] = []
    href: str | None = None
    buf: list[str] = []
    pos = 0
    for m in _TAG_RE.finditer(html):
        data = html[pos:m.start()]
        if '<' in data:
            return None
        if data and href is not None:
            buf.append(data)
        close, name, attrs = m.group(1), m.group(2), m.group(3)
        pos = m.end()
        if close:
            if attrs and not attrs.isspace():
                return None
            if name.lower() == "a" and href is not None:
                anchors.append((href, " ".join("".join(buf).split())))
                href, buf = None, []
            continue
        am = _ATTRS_RE.fullmatch(attrs)
        if am is None:
            return None
        if name.lower() == "a":
            if href is not None:  # <a> closes an open anchor first
                anchors.append((href, " ".join("".join(buf).split())))
            href, buf = _href_of(attrs), []
            if am.group(1) == '/' and href is not None:  # <a ... /> start+end
                anchors.append((href, ""))
                href, buf = None, []
    tail = html[pos:]
    if '<' in tail:
        return None
    if href is not None:  # EOF closes an open anchor
        if tail:
            buf.append(tail)
        anchors.append((href, " ".join("".join(buf).split())))
    return anchors

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
    fast = _extract_fast(html)
    if fast is not None:
        return fast
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
    fast = _extract_anchors_fast(html)
    if fast is not None:
        return fast
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
