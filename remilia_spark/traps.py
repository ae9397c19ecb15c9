"""Spider-trap detection and per-host frontier budgets.

A crawl trap (calendar pages, faceted search, session-id rewrites —
the classic failure mode of the reference's unbounded ``chew`` requeue,
pipeline.go:220-222, which has no per-host limit at all) shows up at
frontier scale as ONE host contributing an unbounded stream of novel URLs
whose paths collapse to a handful of templates.  Three independent,
optional defenses:

* :func:`trap_signals` — per-host analytics over any URL set (the live
  frontier, a discovery log, a WARC index): URL mass, path-template
  diversity (digit runs collapsed to ``N``), path depth and query-string
  shape.  ``is_trap`` flags hosts whose URL mass is large while template
  diversity stays tiny — the calendar/pagination signature.  One
  ``groupBy(host)``; every aggregate is map-side combinable except the
  exact distinct-template count (pass ``approx=True`` at 10^10 URLs to
  swap in HLL ``approx_count_distinct`` and make the whole plan partial-
  aggregatable; the exact form stays the default because it is the one
  the DuckDB oracle can replay).

* :func:`subdomain_spray` — per-REGISTERED-DOMAIN analytics (eTLD+1 via
  `urlnorm.registered_domain_col`): flags domains minting hosts faster
  than pages (wildcard-DNS link farms), the spray mode that slips under
  every per-host budget.

* :func:`cap_new_per_host` — the engine's insertion-time guard
  (``CrawlConfig.trap_max_pending``): a host may hold at most ``cap``
  pending rows in the frontier; discovered candidates beyond its
  remaining capacity are dropped *before* they are ranked, inserted, or
  marked seen.  Dropped URLs are therefore re-discoverable once the
  host's queue drains — the budget bounds queue mass, it does not
  blacklist pages (Heritrix's per-queue budget semantics).  The keep
  decision is a per-host ``row_number`` in discovery order, so it is
  deterministic and partitioning-independent; the same two-phase salted
  pruning as ``ranking.grant_wave`` keeps any single task from sorting a
  whole mega-host burst.

Scale notes (10^10-URL frontier):
* ``trap_signals`` shuffles one row per URL *key* (host + fixed-width
  derived columns), never page bodies; with ``approx=True`` the shuffle
  carries partial HLL sketches — one row per (partition, host).
* ``cap_new_per_host`` joins a one-row-per-host pending-count table
  (same cardinality as the politeness budget table, broadcast under the
  same ``broadcast_politeness`` rule) and prunes saturated hosts with a
  plain filter before any window runs: a trap host that already hit its
  cap costs zero sort work no matter how many candidates it emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# candidate discovery order inside one superstep: parent's global order,
# then link position, then the 64-bit url hash — a total order, so the
# per-host keep decision is unique (mirrors frontier rank_keys)
_DISCOVERY_ORDER = ("parent_order", "link_index", "url_hash")

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"


def trap_signals(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    min_urls: int = 50,
    max_template_ratio: float = 0.2,
    approx: bool = False,
) -> DataFrame:
    """Per-host trap signals over a URL table.

    Returns one row per host: ``(host, n_urls, n_templates,
    template_ratio, sum_depth, n_query, is_trap)``.

    * ``n_templates`` counts distinct *path templates* — the path with
      every digit run collapsed to ``N`` (``/cal/2024/05/31`` and
      ``/cal/2025/01/02`` are the same template).  A trap host mints
      thousands of URLs from single-digit template counts, so
      ``template_ratio = n_templates / n_urls`` collapsing toward 0 while
      ``n_urls`` explodes is the trap signature.
    * ``sum_depth`` is the total path-segment count (BIGINT, exact —
      callers divide by ``n_urls`` for the mean; kept as a sum so the
      aggregate stays integer-exact and oracle-checkable).
    * ``n_query`` counts URLs carrying a query string (faceted-search /
      session-id traps live in the query part).
    * ``is_trap`` = ``n_urls >= min_urls AND template_ratio <=
      max_template_ratio``.

    Pure JVM column math + one groupBy; no UDFs, nothing but the host
    key and small derived columns ever shuffles.
    """
    u = F.col(url_col)
    host = F.col(host_col) if host_col else F.regexp_extract(u, _HOST_RE, 1)
    path0 = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    template = F.regexp_replace(path, "[0-9]+", "N")
    depth = F.size(F.filter(F.split(path, "/"), lambda p: p != ""))
    has_query = F.instr(u, "?") > 0

    rows = urls.select(
        host.alias("host"),
        template.alias("_template"),
        depth.cast("long").alias("_depth"),
        has_query.cast("long").alias("_q"),
    )
    n_templates = (
        F.approx_count_distinct("_template") if approx
        else F.countDistinct("_template"))
    agg = rows.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        n_templates.cast("long").alias("n_templates"),
        F.sum("_depth").cast("long").alias("sum_depth"),
        F.sum("_q").cast("long").alias("n_query"),
    )
    ratio = F.round(
        F.col("n_templates").cast("double") / F.col("n_urls"), 6)
    return agg.select(
        "host", "n_urls", "n_templates",
        ratio.alias("template_ratio"),
        "sum_depth", "n_query",
        ((F.col("n_urls") >= min_urls)
         & (ratio <= max_template_ratio)).alias("is_trap"),
    )


def subdomain_spray(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    min_hosts: int = 20,
    min_urls_per_host: float = 0.0,
) -> DataFrame:
    """Per-registered-domain subdomain-spray signals — the trap mode
    :func:`trap_signals` and every per-HOST cap are blind to: one domain
    minting ``a1.example.com, a2.example.com, ...`` so each host stays
    under budget while the domain floods the frontier (wildcard-DNS link
    farms).  Scoping by eTLD+1 (`urlnorm.registered_domain_col`) collapses
    the spray back onto one key.

    Returns one row per registered domain: ``(domain, n_hosts, n_urls,
    is_spray)`` with ``is_spray = n_hosts >= min_hosts AND n_urls >=
    min_urls_per_host * n_hosts`` (the second term, default off, screens
    out legitimately-wide domains whose hosts each carry real mass).

    Feed flagged domains back as a blocklist, or switch the politeness /
    ``cap_new_per_host`` key to the domain column for those rows.  Pure
    JVM column math + one groupBy; only (domain, host) pairs shuffle —
    at 10^10 URLs the exact distinct-host count stays cheap because host
    cardinality per domain is bounded by DNS reality, but the aggregate
    is swappable for ``approx_count_distinct`` exactly as in
    :func:`trap_signals`.
    """
    from .urlnorm import registered_domain_col

    u = F.col(url_col)
    host = F.col(host_col) if host_col else F.regexp_extract(u, _HOST_RE, 1)
    rows = urls.select(host.alias("_host"),
                       registered_domain_col(host).alias("domain"))
    agg = rows.groupBy("domain").agg(
        F.countDistinct("_host").cast("long").alias("n_hosts"),
        F.count(F.lit(1)).cast("long").alias("n_urls"),
    )
    return agg.select(
        "domain", "n_hosts", "n_urls",
        ((F.col("n_hosts") >= min_hosts)
         & (F.col("n_urls")
            >= F.lit(min_urls_per_host) * F.col("n_hosts")))
        .alias("is_spray"),
    )


def cap_new_per_host(
    fresh: DataFrame,
    pending_counts: DataFrame,
    cap: int,
    n_salts: int = 16,
    broadcast: bool = True,
    approx_rows: int | None = None,
    small_max: int = 10_000,
) -> DataFrame:
    """Keep at most ``cap - already_pending`` new candidates per host.

    ``fresh`` carries the engine's candidate columns including ``host``
    and the :data:`_DISCOVERY_ORDER` keys; ``pending_counts`` is one row
    per host ``(host, _n_pending)`` — the frontier's current pending
    queue depth (hosts with zero pending may be absent).

    Keep rule: a candidate survives iff its per-host discovery-order
    rank is within the host's remaining capacity.  The rank is a total
    order, so the output is independent of partitioning and plan choice.

    Skew safety: hosts whose capacity is already 0 (the steady state of
    a trap host) are dropped by a plain filter — no window ever sees
    their burst.  Hosts with capacity left go through the same two-phase
    salted prune as ``ranking.grant_wave``: local rank within
    ``(host, salt)`` cuts each host to ``<= n_salts * capacity`` rows
    (a local rank is a lower bound on the host rank, so no true keeper
    is ever cut), then the real per-host rank runs on the pruned set.
    ``approx_rows`` (a driver-known upper bound on ``fresh``'s size, free
    from the engine's candidate count) skips the salt stage when no host
    can possibly exceed ``small_max`` rows — same identical-answer
    shortcut as ``ranking.grant_wave``.
    """
    pc = pending_counts.select("host", "_n_pending")
    if broadcast:
        pc = F.broadcast(pc)
    capacity = F.greatest(
        F.lit(0).cast("long"),
        F.lit(int(cap)).cast("long")
        - F.coalesce(F.col("_n_pending"), F.lit(0)).cast("long"))
    df = (
        fresh.join(pc, "host", "left")
        .withColumn("_cap_left", capacity)
        .drop("_n_pending")
        # saturated hosts: filter, not sort — the mega-host fast path
        .where(F.col("_cap_left") > 0)
    )
    order = [F.col(c) for c in _DISCOVERY_ORDER]
    small = approx_rows is not None and approx_rows <= small_max
    if not small:
        w_local = Window.partitionBy("host", "_salt").orderBy(*order)
        df = (
            df.withColumn("_salt", F.pmod(F.xxhash64("url"),
                                          F.lit(int(n_salts))))
              .withColumn("_lr", F.row_number().over(w_local))
              .where(F.col("_lr") <= F.col("_cap_left"))
              .drop("_lr", "_salt")
        )
    w_host = Window.partitionBy("host").orderBy(*order)
    return (
        df.withColumn("_hr", F.row_number().over(w_host))
          .where(F.col("_hr") <= F.col("_cap_left"))
          .drop("_hr", "_cap_left")
    )
