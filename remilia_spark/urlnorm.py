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
# Registered domain (eTLD+1) keys — domain-level politeness / trap scope
# ---------------------------------------------------------------------------
# Production crawlers scope politeness and trap defenses at the REGISTERED
# domain, not the host: a spider trap (or a single tenant) that sprays
# `a1.example.com, a2.example.com, ...` defeats any per-host cap, while a
# per-domain key collapses the spray back to one budget line.  The real
# decision data is the Mozilla Public Suffix List; this module pins a
# deterministic SUBSET of its most common multi-label suffixes as the spec
# (so Spark, Python and the DuckDB oracle agree bit-for-bit), and a
# deployment swaps in the full PSL by replacing MULTI_LABEL_SUFFIXES (it
# stays a broadcast-sized literal: the full list is ~10k entries).
#
# Rule (pinned): empty host -> ""; IPv4 / bracketed IPv6 / single-label
# hosts are their own "domain"; else if the last TWO labels form a listed
# multi-label suffix and a third label exists, the registered domain is
# the last THREE labels, otherwise the last TWO.

MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.in", "net.in", "org.in", "co.za", "co.kr", "or.kr",
)

_IPV4ISH_RE = r"^[0-9.]+$"
_IPV6_BRACKET_RE = r"^\[[0-9a-fA-F:]+\]$"


def registered_domain(host: str | None) -> str:
    """Pure-Python twin of ``registered_domain_col`` (unit-testable,
    oracle-exact)."""
    if not host:
        return ""
    if re.fullmatch(_IPV4ISH_RE, host) or re.fullmatch(_IPV6_BRACKET_RE,
                                                       host):
        return host
    labels = host.split(".")
    if len(labels) < 2:
        return host
    last2 = ".".join(labels[-2:])
    if last2 in MULTI_LABEL_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return last2


def registered_domain_col(host):
    """Registered domain (eTLD+1) as a pure JVM column expression — the
    frontier computes it at 10^10-row scale with zero Python and zero
    shuffle.  Substitute this for ``host`` in `traps.trap_signals` /
    `traps.subdomain_spray` (``host_col=``) or as the politeness key to
    scope budgets per domain.  Same pinned spec as
    :func:`registered_domain`."""
    from pyspark.sql import functions as F

    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    literal = (host.rlike(_IPV4ISH_RE) | host.rlike(_IPV6_BRACKET_RE)
               | (n < 2))
    return (F.when(host.isNull() | (host == ""), F.lit(""))
             .when(literal, host)
             .when(last2.isin(*MULTI_LABEL_SUFFIXES) & (n >= 3), last3)
             .otherwise(last2))


# ---------------------------------------------------------------------------
# SURT keys — sort-friendly URI reordering transform
# ---------------------------------------------------------------------------
# The web-archive community's storage key (Heritrix/OpenWayback, and the
# Common Crawl URL index): reverse the host labels so that sorting groups
# URLs by site/domain —
#
#     https://www.example.ac.uk/path?q=1  ->  uk,ac,example,www)/path?q=1
#
# Range-partitioning the frontier/pages tables on this key gives per-host
# (and per-registrable-domain) locality: a host's URLs land in one
# partition run, so per-host politeness, robots joins, and recrawl scans
# touch contiguous storage instead of shuffling.  Pinned spec over
# **engine-canonical** URLs (lowercased host, no userinfo, no fragment,
# default ports stripped — see normalize_parts):
#
# 1. scheme dropped; 2. host labels reversed and comma-joined;
# 3. a non-default port survives as ``:port`` after the reversed host;
# 4. ``)`` separator; 5. path verbatim ('' -> '/'); 6. ``?query`` kept
# order-preserving when present.  No www-stripping (a policy seam, not a
# default — stripping merges distinct hosts irreversibly).

_SURT_HOSTPORT_RE = r"^[a-z]+://([^/?#]+)"
_SURT_PATH_RE = r"^[a-z]+://[^/?#]+([^?#]*)"
_SURT_QUERY_RE = r"\?([^#]*)"


def surt_key(url: str) -> str:
    """Pure-Python twin of ``surt_key_col`` (unit-testable, oracle-exact)."""
    m = re.match(_SURT_HOSTPORT_RE, url or "")
    if not m:
        return ""
    hostport = m.group(1)
    port = ""
    mp = re.search(r":([0-9]+)$", hostport)
    host = hostport[: mp.start()] if mp else hostport
    if mp:
        port = ":" + mp.group(1)
    rev = ",".join(reversed(host.split(".")))
    mpath = re.match(_SURT_PATH_RE, url)
    path = (mpath.group(1) if mpath else "") or "/"
    mq = re.search(_SURT_QUERY_RE, url)
    query = "?" + mq.group(1) if mq else ""
    return rev + port + ")" + path + query


def surt_key_col(url):
    """SURT key as a pure JVM column expression (whole-stage codegen; the
    frontier can compute it at 10^10-row scale with zero Python).  Same
    pinned spec as ``surt_key``; plain character-class regexes so Java
    and RE2 (the DuckDB oracle) agree exactly."""
    from pyspark.sql import functions as F

    hostport = F.regexp_extract(url, _SURT_HOSTPORT_RE, 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.when(port != "",
                  F.regexp_extract(hostport, r"^(.*):[0-9]+$", 1)) \
            .otherwise(hostport)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(url, _SURT_PATH_RE, 1)
    query = F.regexp_extract(url, _SURT_QUERY_RE, 1)
    # outer coalesce: a NULL url degrades to "" like the Python twin
    return F.coalesce(
        F.when(hostport == "", F.lit("")).otherwise(F.concat(
            rev,
            F.when(port != "", F.concat(F.lit(":"), port))
            .otherwise(F.lit("")),
            F.lit(")"),
            F.when(path == "", F.lit("/")).otherwise(path),
            F.when(query != "", F.concat(F.lit("?"), query))
            .otherwise(F.lit("")))),
        F.lit(""))


# ---------------------------------------------------------------------------
# Query-parameter canonicalization (tracking-param strip + param sort).
#
# The RFC 3986 pass above deliberately keeps the query byte-for-byte (spec
# step 8) because two URLs differing only in parameter order CAN be
# different resources.  In practice a crawl frontier drowns in links that
# differ only in analytics baggage (utm_*, fbclid, gclid, ...) — every such
# variant costs a fetch, a seen-set slot, and a politeness token for a page
# the crawler already has.  ``clean_params`` is the pinned, opt-in second
# pass: drop tracking parameters, optionally sort the survivors, so the
# seen set collapses the variants.  The spec is deliberately expressible as
# pure column math (split / filter / sort / join) so it runs JVM-side at
# 10^10-row scale AND replays exactly in the DuckDB oracle.
#
# Pinned spec (frozen; dedup-key semantics depend on it):
#   1. query = everything after the FIRST '?' (canonical URLs carry no
#      fragment); no '?' -> unchanged;
#   2. parts = query split on '&'; empty parts drop;
#   3. a part's name = substring before the first '=' (whole part if no
#      '='); drop the part when lower(name) is in the strip set or starts
#      with 'utm_';
#   4. optionally sort surviving parts bytewise (param-order
#      canonicalization — stronger dedup, opt-in separately because it
#      changes the URL the politeness layer fetches);
#   5. no survivors -> the '?' goes too.
# ---------------------------------------------------------------------------

# Pinned strip set: the cross-site analytics/click-id parameters that never
# change the resource.  Sorted; ASCII; extend via the ``strip=`` argument.
TRACKING_PARAMS = (
    "_ga", "_gl", "dclid", "fbclid", "gbraid", "gclid", "igshid",
    "mc_cid", "mc_eid", "msclkid", "ref_src", "spm", "twclid",
    "wbraid", "yclid",
)


def _is_tracking(name: str, strip: tuple[str, ...]) -> bool:
    n = name.lower()
    return n.startswith("utm_") or n in strip


def clean_params(url: str | None, strip: tuple[str, ...] = TRACKING_PARAMS,
                 sort_params: bool = False) -> str | None:
    """Pure-Python twin of ``clean_params_col`` (same pinned spec)."""
    if url is None:
        return None
    q = url.find("?")
    if q < 0:
        return url
    base, query = url[:q], url[q + 1:]
    parts = [p for p in query.split("&")
             if p != "" and not _is_tracking(p.split("=", 1)[0], strip)]
    if sort_params:
        parts.sort()
    return base + "?" + "&".join(parts) if parts else base


def clean_params_col(url, strip: tuple[str, ...] = TRACKING_PARAMS,
                     sort_params: bool = False):
    """``clean_params`` as a pure JVM column expression (whole-stage
    codegen — the frontier applies it to every discovered URL with zero
    Python).  Split/filter/sort/join built-ins only, so the DuckDB oracle
    replays the identical spec with list_filter/list_sort."""
    from pyspark.sql import functions as F

    base = F.substring_index(url, "?", 1)
    query = F.regexp_extract(url, r"\?(.*)$", 1)
    name = lambda p: F.lower(F.substring_index(p, "=", 1))  # noqa: E731
    strip_arr = F.array(*[F.lit(s) for s in strip])
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") &
                  (F.substring(name(p), 1, 4) != "utm_") &
                  ~F.array_contains(strip_arr, name(p)))
    if sort_params:
        keep = F.array_sort(keep)
    cleaned = F.when(F.size(keep) > 0,
                     F.concat(base, F.lit("?"), F.array_join(keep, "&"))) \
               .otherwise(base)
    return F.when(url.isNull(), F.lit(None).cast("string")) \
            .when(~url.contains("?"), url).otherwise(cleaned)


def clean_params_series(urls: pd.Series, strip: tuple[str, ...] =
                        TRACKING_PARAMS, sort_params: bool = False) \
        -> pd.Series:
    """Vectorized twin for use inside the canonicalization pandas UDF."""
    return urls.map(lambda u: clean_params(u, strip, sort_params))


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


def base_independent_key(href: str | None) -> str | None:
    """``href`` itself when ``normalize_parts(href, base)`` provably cannot
    depend on ``base`` — an absolute http/https/ftp reference with a
    non-empty authority (RFC 3986 §5.2.2: a reference with scheme and
    authority is used as-is; Python's urljoin matches, fuzz-pinned in
    tests/test_canon_memo.py) — else None.  Lets per-batch memoization
    collapse cross-page repeats of absolute links."""
    if not href:
        return None
    hl = href[:8].lower()
    if hl.startswith("http://"):
        return href if href[7:8] not in ("", "/") else None
    if hl.startswith("https://"):
        return href if href[8:9] not in ("", "/") else None
    if hl.startswith("ftp://"):
        return href if href[6:7] not in ("", "/") else None
    return None
