"""Recrawl scheduling: change-rate estimation -> next-fetch intervals.

A production crawler does not fetch every URL once — it *revisits*, and
the revisit cadence drives freshness at fixed fetch budget (Cho &
Garcia-Molina 2003, "Effective Page Refresh Policies for Web Crawlers").
ShroXd/remilia crawls to a depth bound and stops (`pipeline.go` has no
revisit notion); this module adds the scheduling layer on top of the
frontier's fetch history so a standing crawl can feed `next_fetch_epoch`
back into the wave priority (`ranking.grant_wave` orders on (depth,
host_rank, discovery_order); a recrawl deployment substitutes
(next_fetch_epoch, host_rank, ...) for depth).

Input is a **fetch history** table — one row per (url, fetch) with a
content fingerprint:

    url: string, fetch_idx: long, fetch_epoch: long, content_hash: string

(`fetch_epoch` is integer epoch-seconds: the engine's commit timestamps
truncate the same way on Spark and the oracle, and interval math stays
exact.)  Everything here is per-url window math — the only shuffle is the
hash partition on ``url``, per-url groups are bounded by the revisit
count, and there is no global window or driver collection, so the plan
is the same at 10^10 URLs as at 10^3.

Scheduling rule (all integer arithmetic, oracle-exact):

    n_changes       = adjacent fetches whose fingerprint differs
    change_rate     = n_changes / (n_fetches - 1)
    next_interval_s = clamp(base_interval_s div (1 + n_changes),
                            min_interval_s, max_interval_s)
    next_fetch_epoch = last fetch_epoch + next_interval_s

i.e. pages observed changing at every visit are revisited ~(1+n)x more
often, bounded by politeness (min) and staleness (max) caps — the
batch-mode counterpart of the reference's fixed per-request cadence
(`ratelimit.go:27-33` paces *requests*; this paces *revisits*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def history_from_results(results: DataFrame, cycle: int,
                         fetch_epoch: int) -> DataFrame:
    """One fetch-history row per url fetched in a crawl cycle.

    ``results`` is the engine's results table (`CrawlRun.results()`:
    superstep, url, depth, host_rank, discovery_order, text); the content
    fingerprint is md5 of the extracted text — the same per-url
    byte-identical invariant the goldens pin, so "changed" means the
    *content* changed, not markup noise.  A standing crawl appends each
    cycle's rows to the history table (an append-only Iceberg table at
    deployment; the tests union DataFrames) and feeds
    ``recrawl_schedule`` + ``due_urls`` to pick the next cycle's seeds.
    """
    return results.select(
        "url",
        F.lit(int(cycle)).cast("long").alias("fetch_idx"),
        F.lit(int(fetch_epoch)).cast("long").alias("fetch_epoch"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("content_hash"))


def due_urls(schedule: DataFrame, now_epoch: int) -> DataFrame:
    """Urls whose next fetch is due — the next cycle's seed list."""
    return schedule.where(F.col("next_fetch_epoch") <= int(now_epoch)) \
                   .select("url")


def revisit_compact(results: DataFrame, history: DataFrame) -> DataFrame:
    """Unchanged refetches store no text — Common Crawl's *revisit record*
    (``WARC-Type: revisit``, identical-payload-digest profile) re-expressed
    for the results table.

    In a standing crawl most refetches find the page unchanged; at 100-TB
    scale storing the full extracted text again per cycle is the dominant
    storage cost.  This marks each result ``revisit = true`` when its
    content hash equals the url's LAST recorded history hash and nulls the
    ``text`` column for those rows; ``content_hash`` stays, so the payload
    remains content-addressable from the cycle that first stored it.

    Shuffle shape: one groupBy(url) over the history (``max(struct(...))``
    — map-side combinable, no window) + one hash join on url.  Nothing
    here is driver-side or per-row Python.
    """
    last = (
        history
        .groupBy("url")
        .agg(F.max(F.struct("fetch_idx", "fetch_epoch", "content_hash"))
             .alias("pick"))
        .select("url", F.col("pick.content_hash").alias("_prev_hash"))
    )
    cur = results.withColumn(
        "content_hash", F.md5(F.coalesce(F.col("text"), F.lit(""))))
    unchanged = (F.col("_prev_hash").isNotNull()
                 & (F.col("_prev_hash") == F.col("content_hash")))
    return (
        cur.join(last, "url", "left")
        .withColumn("revisit", F.coalesce(unchanged, F.lit(False)))
        .withColumn("text", F.when(F.col("revisit"),
                                   F.lit(None).cast("string"))
                    .otherwise(F.col("text")))
        .drop("_prev_hash")
    )


def change_stats(history: DataFrame) -> DataFrame:
    """(url, n_fetches, n_changes, change_rate, last_epoch) per url.

    ``change_rate`` is rounded to 6 dp per repo convention; a single-fetch
    url has rate 0.0 (nothing observed yet — the schedule falls back to
    ``base_interval_s``).
    """
    w = Window.partitionBy("url").orderBy("fetch_idx")
    changed = (
        F.lag("content_hash").over(w).isNotNull()
        & (F.col("content_hash") != F.lag("content_hash").over(w))
    ).cast("long")
    return (
        history
        .withColumn("_chg", changed)
        .groupBy("url")
        .agg(F.count("*").alias("n_fetches"),
             F.sum("_chg").alias("n_changes"),
             F.max("fetch_epoch").alias("last_epoch"))
        .withColumn(
            "change_rate",
            F.when(F.col("n_fetches") > 1,
                   F.round(F.col("n_changes").cast("double")
                           / (F.col("n_fetches") - 1).cast("double"), 6))
            .otherwise(F.lit(0.0)))
        .select("url", "n_fetches", "n_changes", "change_rate", "last_epoch")
    )


def recrawl_schedule(history: DataFrame, base_interval_s: int = 8 * 86400,
                     min_interval_s: int = 43200,
                     max_interval_s: int = 16 * 86400) -> DataFrame:
    """Per-url next-fetch plan from the fetch history.

    Output: (url, n_fetches, n_changes, change_rate, next_interval_s,
    next_fetch_epoch) — `next_fetch_epoch` keys the recrawl wave pop.
    """
    if not (0 < min_interval_s <= max_interval_s):
        raise ValueError("need 0 < min_interval_s <= max_interval_s")
    interval = F.expr(f"{int(base_interval_s)} div (1 + n_changes)")
    return (
        change_stats(history)
        .withColumn(
            "next_interval_s",
            F.greatest(F.lit(int(min_interval_s)),
                       F.least(F.lit(int(max_interval_s)), interval))
            .cast("long"))
        .select(
            "url", "n_fetches", "n_changes", "change_rate",
            "next_interval_s",
            (F.col("last_epoch") + F.col("next_interval_s"))
            .cast("long").alias("next_fetch_epoch"))
    )
