"""robots.txt parser — raw fetched robots.txt bodies → the engine's robots
table (``robots.ROBOTS_SCHEMA``: host, disallow array, crawl_delay).

At crawl scale, robots.txt files are themselves fetched pages (one per
host); this connector turns a DataFrame of ``(host, body:binary)`` rows
into the per-host politeness table the engine joins at insertion time
(``robots.with_robots_state``).  mapInPandas (Arrow-batched), one Python
call per batch, never per row.

Parsing follows the original REP (Koster) semantics the way large crawlers
apply it in bulk:

* groups are introduced by one or more ``User-agent:`` lines; rules bind
  to the group until the next ``User-agent:`` line that starts a new group;
* only the ``*`` group is honored (a production crawler would pick its own
  token first, ``*`` as fallback — the seam is the ``agent`` argument);
* ``Disallow:`` with an empty value allows everything (no prefix recorded);
* ``Crawl-delay:`` is captured per group (seconds, int; fractional floors);
* unknown directives and comments (``#``) are ignored, per the REP.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from ..robots import ROBOTS_SCHEMA_ALLOW


def parse_robots_txt(body: bytes | str, agent: str = "*") \
        -> tuple[list[str], list[str], int]:
    """Pure function: robots.txt body → (disallow, allow, crawl_delay).

    ``Allow:`` rules feed the REP longest-match verdict
    (``robots.blocked_col`` with the allow column; RFC 9309 §2.2.2).
    Unit-testable without Spark and the exact body the Spark task runs.
    """
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    disallow: list[str] = []
    allow: list[str] = []
    delay = 0
    in_group = False       # inside the group that matches `agent`
    saw_rule = True        # last line was a rule (vs a user-agent line)
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if saw_rule:  # a new group starts
                in_group = val == agent
            else:         # consecutive user-agent lines extend the group
                in_group = in_group or val == agent
            saw_rule = False
            continue
        saw_rule = True
        if not in_group:
            continue
        if key == "disallow" and val:
            disallow.append(val)
        elif key == "allow" and val:
            allow.append(val)
        elif key == "crawl-delay":
            try:
                delay = int(float(val))
            except ValueError:
                pass
    return disallow, allow, delay


def parse_sitemap_directives(body: bytes | str) -> list[str]:
    """``Sitemap:`` directive URLs from a robots.txt body.

    Per the REP these are GLOBAL lines (independent of any user-agent
    group, and the value is a full URL, case-preserved) — the standard
    sitemap-discovery path: fetch robots.txt → collect ``Sitemap:`` URLs →
    fetch + ``sources.sitemap.sitemap_urls`` → seed rows.  Order-preserving
    and duplicate-free (first occurrence wins) so downstream seed order is
    deterministic."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    out: list[str] = []
    seen: set[str] = set()
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            val = val.strip()
            if val and val not in seen:
                seen.add(val)
                out.append(val)
    return out


def sitemap_directives(fetched, host_col: str = "host",
                       body_col: str = "body"):
    """(host, body) robots.txt rows → ``(host, sitemap_url, sm_order)``
    rows, ready to fetch and feed ``sources.sitemap.sitemap_urls``.
    mapInPandas like ``robots_table`` — one Python call per Arrow batch.
    """
    def _parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, urls, orders = [], [], []
            for h, b in zip(pdf[host_col], pdf[body_col]):
                for i, u in enumerate(parse_sitemap_directives(
                        b if b is not None else b"")):
                    hosts.append(h)
                    urls.append(u)
                    orders.append(i)
            yield pd.DataFrame({"host": hosts, "sitemap_url": urls,
                                "sm_order": orders})

    return fetched.select(host_col, body_col).mapInPandas(
        _parse, "host string, sitemap_url string, sm_order int")


def robots_table(fetched, host_col: str = "host", body_col: str = "body",
                 agent: str = "*"):
    """``(host, body:binary)`` rows → robots DataFrame
    (ROBOTS_SCHEMA_ALLOW — carries the ``allow`` column, which switches
    ``robots.blocked_col`` to REP longest-match; hand-built tables
    without it keep the legacy prefix rule)."""

    def _parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                dis, allow, delay = parse_robots_txt(
                    bytes(body) if body is not None else b"", agent)
                rows.append((host, dis, delay, allow))
            yield pd.DataFrame(rows, columns=["host", "disallow",
                                              "crawl_delay", "allow"])

    return fetched.select(host_col, body_col) \
        .mapInPandas(_parse, schema=ROBOTS_SCHEMA_ALLOW)
