"""robots.txt path-prefix filtering (north-rule addition; the reference has
none — its dead ``limit`` type, ``limit.go:5-15``, only hints at it).

Applied at **insertion time**: a discovered URL whose path starts with any
of its host's disallow prefixes enters the frontier as ``state='filtered'``
(terminal) and still enters the seen set, so it is deduped and never
reconsidered.  The check is pure column math — a join on host plus a
higher-order ``F.exists`` over the disallow array (JVM-side, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = "host string, disallow array<string>, crawl_delay int"
# extended schema (REP Allow support): robots tables MAY carry a fourth
# ``allow array<string>`` column; readers without it behave as before
ROBOTS_SCHEMA_ALLOW = ROBOTS_SCHEMA + ", allow array<string>"


def _rule_match(path: Column, rule: Column) -> Column:
    """Does ``path`` match one REP rule?  RFC 9309 §2.2.3 wildcards:
    ``*`` matches any character sequence and a trailing ``$`` anchors the
    end of the path; rules containing neither keep the plain prefix
    (``startswith``) fast path.  The wildcard arm translates the rule to
    an anchored Java regex entirely in column math (escape regex
    metacharacters, drop the trailing anchor, ``*`` → ``.*``) and matches
    with a non-constant-pattern RLIKE — still JVM-side, zero Python."""
    wild = rule.contains("*") | rule.endswith("$")
    ends = rule.endswith("$")
    # strip ONE trailing $ (the anchor); any interior $ is literal (§2.2.3
    # gives '$' meaning only at the end) and gets escaped below
    body = F.regexp_replace(rule, r"\$$", "")
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    pat = F.concat(F.lit("^"), F.regexp_replace(esc, r"\*", ".*"),
                   F.when(ends, F.lit("$")).otherwise(F.lit("")))
    return F.when(wild, F.rlike(path, pat)).otherwise(path.startswith(rule))


def blocked_col(path: Column, disallow: Column,
                allow: Column | None = None) -> Column:
    """robots verdict for ``path`` as pure column math.

    Without ``allow`` (the default, and any robots table lacking the
    column): True if path matches any disallow rule — prefix semantics
    for plain rules (the original pinned behavior, unchanged), RFC 9309
    §2.2.3 ``*``/``$`` wildcard semantics for rules that carry them.

    With ``allow``: the REP longest-match rule (google.com/robots spec,
    RFC 9309 §2.2.2) — the most specific (longest rule text, the RFC's
    octet-count measure) matching rule wins; on equal lengths Allow wins.
    Both arms are higher-order JVM expressions (filter + transform +
    array_max), zero Python.
    """
    def longest(rules: Column) -> Column:
        hits = F.filter(rules, lambda r: _rule_match(path, r))
        return F.coalesce(
            F.array_max(F.transform(hits, F.length)), F.lit(-1))

    if allow is None:
        return F.coalesce(
            F.exists(disallow, lambda d: _rule_match(path, d)), F.lit(False)
        )
    return longest(disallow) > longest(F.coalesce(
        allow, F.array().cast("array<string>")))


def with_robots_state(candidates: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Attach ``robots_blocked:boolean`` to candidate rows.

    ``candidates`` must carry (host, path) — both produced by the SAME
    Python urlsplit that canonicalized the URL (``urlnorm.normalize_parts``).
    Spark ``parse_url`` is deliberately not used: java.net.URI rejects
    RFC-3986-illegal-but-regex-accepted characters (``|``, ``<``, ``"``)
    and would either abort the job (ANSI) or silently diverge from the
    oracle's hostname/path (try_parse_url).
    """
    if robots is None:
        return candidates.withColumn("robots_blocked", F.lit(False))
    has_allow = "allow" in robots.columns
    cols = ["host", "disallow"] + (["allow"] if has_allow else [])
    return (
        candidates
        # no forced broadcast: robots is per-host and can be ~10^8 rows at
        # full scale — AQE picks broadcast automatically when it is small
        .join(robots.select(*cols), "host", "left")
        .withColumn("robots_blocked",
                    blocked_col(F.col("path"), F.col("disallow"),
                                F.col("allow") if has_allow else None))
        .drop(*[c for c in cols if c != "host"])
    )
