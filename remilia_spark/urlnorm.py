"""RFC 3986 URL canonicalization + the reference's URL accept filter.

The reference validates extracted strings with the regex
``^(https?|ftp)://[^\\s/$.?#].[^\\s]*$`` compiled once (``utils.go:13-20``,
behavior pinned by ``utils_test.go:33-56``) and joins relative hrefs by naive
string concatenation (``cmd/dev/main.go:51-56``).  Our engine upgrades the
join to a proper RFC 3986 resolve + normalize pass (a north-rule addition;
the reference's naive concat is strictly weaker):

Pinned normalization spec (frozen; golden fixtures depend on it):

1. strip surrounding whitespace from the href;
2. resolve against the base URL with ``urllib.parse.urljoin`` (dot-segment
   removal included);
3. drop the fragment;
4. lowercase scheme and host;
5. strip default ports (http:80, https:443, ftp:21);
6. empty path -> ``/``;
7. uppercase the hex digits of percent-escapes (``%2f`` -> ``%2F``);
8. keep query exactly as written (order-preserving);
9. accept only if the result matches the reference regex (step 9 is the
   reference's ``urlMatcher`` verbatim — Java and Python regex agree on
   this pattern, so the same filter runs as ``F.rlike`` JVM-side when the
   URL is already canonical).

All functions are pure Python/pandas so they unit-test without Spark and run
vectorized (Arrow-batched) inside pandas UDFs — never per-row Python UDFs.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd

# Reference accept filter, verbatim (utils.go:13-20).
URL_PATTERN = r"^(https?|ftp)://[^\s/$.?#].[^\s]*$"
_URL_RE = re.compile(URL_PATTERN)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}
_PCT_RE = re.compile(r"%[0-9a-fA-F]{2}")
# Schemes worth even attempting to resolve; everything else (javascript:,
# mailto:, data:, tel:) is rejected before urljoin to keep the hot loop cheap.
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*):")


def matches_url(url: str) -> bool:
    """The reference's urlMatcher (utils.go:13-20) as a predicate."""
    return bool(_URL_RE.match(url))


def _upper_pct(s: str) -> str:
    return _PCT_RE.sub(lambda m: m.group(0).upper(), s) if "%" in s else s


def normalize_parts(href: str, base: str | None = None) \
        -> tuple[str, str, str] | None:
    """Resolve ``href`` against ``base``; return (url, host, path) or None.

    Deterministic and total: equal (href, base) inputs always produce equal
    outputs, which is what makes the URL-seen set and crawl ordering
    reproducible across partitions, resumes, and parallelism levels.

    Host and path come out of the *same* urlsplit that canonicalized the
    URL — never from Spark ``parse_url``, whose java.net.URI parser rejects
    RFC-3986-illegal-but-non-whitespace characters (``|``, ``<``, ``"``)
    that the reference's accept regex (utils.go:13-20) lets through; under
    Spark 4 ANSI mode that would abort the whole superstep job on one bad
    href.
    """
    if href is None:
        return None
    href = href.strip()
    if not href:
        return None
    m = _SCHEME_RE.match(href)
    if m and m.group(1).lower() not in ("http", "https", "ftp"):
        return None
    try:
        absolute = urljoin(base, href) if base else href
        parts = urlsplit(absolute)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https", "ftp"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.lower()
    port = None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _upper_pct(parts.path) or "/"
    query = _upper_pct(parts.query)
    out = urlunsplit((scheme, netloc, path, query, ""))
    return (out, host, path) if _URL_RE.match(out) else None


def normalize_url(href: str, base: str | None = None) -> str | None:
    """Canonical URL only (see ``normalize_parts``); None if rejected."""
    p = normalize_parts(href, base)
    return p[0] if p is not None else None


def host_of(url: str) -> str:
    """Lowercased hostname (no port/userinfo) of an already-canonical URL."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def path_of(url: str) -> str:
    """Path component (for robots prefix matching)."""
    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"


# ---------------------------------------------------------------------------
# pandas (Arrow-batch) wrappers — the bodies of the canonicalization UDFs.
# ---------------------------------------------------------------------------

def normalize_series(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    """Vectorized canonicalization over an Arrow batch (pandas UDF body)."""
    return pd.Series(
        [normalize_url(h, b) for h, b in zip(hrefs, bases)],
        index=hrefs.index, dtype=object,
    )


def normalize_parts_frame(hrefs: pd.Series, bases: pd.Series) -> pd.DataFrame:
    """Vectorized (url, host, path) canonicalization (struct-UDF body).

    Rejected hrefs yield an all-null row; callers filter on url IS NOT NULL.
    """
    urls, hosts, paths = [], [], []
    for h, b in zip(hrefs, bases):
        p = normalize_parts(h, b)
        if p is None:
            urls.append(None); hosts.append(None); paths.append(None)
        else:
            urls.append(p[0]); hosts.append(p[1]); paths.append(p[2])
    return pd.DataFrame({"url": urls, "host": hosts, "path": paths},
                        index=hrefs.index)


def host_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: host_of(u) if u is not None else None)
