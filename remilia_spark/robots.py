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


def blocked_col(path: Column, disallow: Column) -> Column:
    """True if path starts with any disallow prefix (null array -> false)."""
    return F.coalesce(
        F.exists(disallow, lambda d: path.startswith(d)), F.lit(False)
    )


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
    return (
        candidates
        # no forced broadcast: robots is per-host and can be ~10^8 rows at
        # full scale — AQE picks broadcast automatically when it is small
        .join(robots.select("host", "disallow"), "host", "left")
        .withColumn("robots_blocked",
                    blocked_col(F.col("path"), F.col("disallow")))
        .drop("disallow")
    )
