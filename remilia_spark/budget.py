"""Per-host politeness budgets — the token bucket as a table.

The reference throttles with one *global* token bucket: ``Take(count)``
refills ``fillQuantum`` per elapsed ``fillInterval``, caps at ``capacity``
and returns the wait (``ratelimit.go:69-105``; defaults capacity 100,
10 tokens/s, initial 100 — ``ratelimit.go:27-33``).  Its dead-code ``limit``
type (``limit.go:5-15``) shows per-host politeness was intended; the north
rule requires it.  We re-express the bucket as a **per-host budget table**
``(host, tokens, refill_superstep)`` — deterministic by construction, no
sleeping:

    gained(s)    = floor((s - refill_superstep) / crawl_delay)   if crawl_delay d > 0
                 = fill_quantum * (s - refill_superstep)          otherwise
    available(s) = min(capacity, tokens + gained(s))
    missing row  = min(capacity, initial_tokens)

After a wave, **only hosts that received grants get a new row**
``(available - granted, s)``; ungranted hosts keep their old row so partial
refill intervals keep accumulating (updating refill_superstep every step
would strand crawl-delay hosts at zero forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import CrawlConfig

BUDGETS_SCHEMA = "host string, tokens long, refill_superstep int"
# crawl-budget quota state (cfg.max_fetch_per_key): cumulative grants per
# politeness key; the `host` column holds the key, like the budgets table
QUOTA_SCHEMA = "host string, granted_total long"


def _avail_col(cfg: CrawlConfig, superstep: int):
    """The token-bucket availability expression over joined
    (tokens, refill_superstep, crawl_delay) columns."""
    elapsed = F.lit(superstep) - F.col("refill_superstep")
    gained = F.when(
        F.coalesce(F.col("crawl_delay"), F.lit(0)) > 0,
        F.floor(elapsed / F.col("crawl_delay")),
    ).otherwise(elapsed * F.lit(cfg.fill_quantum))
    return F.when(
        F.col("tokens").isNull(),
        F.lit(min(cfg.bucket_capacity, cfg.initial_tokens)),
    ).otherwise(
        F.least(F.lit(cfg.bucket_capacity), F.col("tokens") + gained)
    )


def _join_budget_state(df: DataFrame, budgets: DataFrame,
                       robots: DataFrame | None, cfg: CrawlConfig,
                       hint_broadcast: bool = False,
                       key: str = "host") -> DataFrame:
    """``key`` is the politeness-key column of ``df`` (the budgets table
    always stores its key in the ``host`` column, whatever it holds).
    In domain mode the crawl_delay lookup matches robots rows whose host
    EQUALS the key — i.e. the registrable domain's own robots entry
    (pinned rule, see CrawlConfig.politeness_key)."""
    def h(t: DataFrame) -> DataFrame:
        return F.broadcast(t) if hint_broadcast else t
    df = df.join(h(budgets.withColumnRenamed("host", key)), key, "left")
    if robots is not None and cfg.use_crawl_delay:
        df = df.join(h(robots.select(F.col("host").alias(key),
                                     "crawl_delay")), key, "left")
    else:
        df = df.withColumn("crawl_delay", F.lit(None).cast("int"))
    return df


def available_tokens(hosts: DataFrame, budgets: DataFrame,
                     robots: DataFrame | None, cfg: CrawlConfig,
                     superstep: int) -> DataFrame:
    """(host) -> (host, avail:long). ``hosts`` must be distinct host rows."""
    df = _join_budget_state(hosts, budgets, robots, cfg)
    return df.select("host", _avail_col(cfg, superstep).cast("long")
                     .alias("avail"))


def attach_avail(pending: DataFrame, budgets: DataFrame,
                 robots: DataFrame | None, cfg: CrawlConfig,
                 superstep: int, key: str = "host") -> DataFrame:
    """Append ``avail`` to pending rows directly — no distinct-hosts
    shuffle, no join back.  ``avail`` is a pure function of the host's
    budget/robots row and the superstep, so it can be computed per pending
    row; the per-host state tables are orders of magnitude smaller than the
    frontier (one row per *host*, not per URL), so when
    ``cfg.broadcast_politeness`` they join as broadcasts and the eligible
    set is never shuffled for politeness at all.  (At ≥10^8 hosts set
    ``broadcast_politeness=False`` and Spark falls back to a shuffle join.)
    """
    df = _join_budget_state(pending, budgets, robots, cfg,
                            hint_broadcast=cfg.broadcast_politeness,
                            key=key)
    return df.select(*pending.columns,
                     F.coalesce(_avail_col(cfg, superstep).cast("long"),
                                F.lit(0)).alias("avail"))


def updated_budgets(budgets: DataFrame, grants: DataFrame,
                    superstep: int) -> DataFrame:
    """Fold this superstep's grants into the budget table.

    ``grants``: (host, avail, granted) with granted > 0 only, where
    ``host`` holds the politeness KEY (callers rename in domain mode).
    Granted keys get ``(avail - granted, superstep)``; everyone else
    keeps their row.
    """
    new_rows = grants.select(
        "host",
        (F.col("avail") - F.col("granted")).cast("long").alias("tokens"),
        F.lit(superstep).cast("int").alias("refill_superstep"),
    )
    kept = budgets.join(grants.select("host"), "host", "left_anti")
    return kept.unionByName(new_rows)


def quota_clamp(pending: DataFrame, quota: DataFrame, cap: int,
                key: str = "host", hint_broadcast: bool = False):
    """Clamp ``avail`` to the key's remaining crawl budget
    (``cfg.max_fetch_per_key``): avail' = max(0, min(avail, cap - used)).
    Same broadcast economics as the budget join — quota is one row per
    KEY, orders of magnitude smaller than the frontier.

    The pre-clamp token-bucket availability is preserved as
    ``bucket_avail``: the budget fold must decrement the bucket from its
    UNCLAMPED value (available - granted, the oracle's rule).  Folding the
    clamped value would drain the stored bucket below what was actually
    spent whenever the quota binds, so a documented raised-quota resume
    would restart the key artificially depleted."""
    q = quota.withColumnRenamed("host", key)
    if hint_broadcast:
        q = F.broadcast(q)
    return (pending.join(q, key, "left")
            .withColumn("bucket_avail", F.col("avail"))
            .withColumn(
                "avail",
                F.greatest(
                    F.lit(0),
                    F.least(F.col("avail"),
                            F.lit(int(cap)) - F.coalesce(
                                F.col("granted_total"), F.lit(0))))
                .cast("long"))
            .drop("granted_total"))


def updated_quota(quota: DataFrame, grants: DataFrame) -> DataFrame:
    """Fold this superstep's grants into the cumulative quota table.
    ``grants``: (host=key, granted) — full-outer merge, keys never drop."""
    add = grants.select("host", F.col("granted").cast("long"))
    return (quota.join(add, "host", "full")
            .select("host",
                    (F.coalesce(F.col("granted_total"), F.lit(0))
                     + F.coalesce(F.col("granted"), F.lit(0)))
                    .cast("long").alias("granted_total")))
