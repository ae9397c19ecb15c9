"""Checkpoint maintenance operations that run BETWEEN crawl sessions.

``expire_seen`` is the standing-crawl complement to ``recrawl.py``: where
the recrawl scheduler re-seeds *known* URLs on a change-rate cadence,
seen-TTL expiry makes stale URLs organically re-*discoverable* — the next
time any page links to an expired URL, it re-enters the frontier like a
fresh discovery (new pending row at a higher rev; the fold supersedes the
old terminal row once the refetch commits) instead of being dropped by
the seen anti-join forever.

This is also where the cuckoo seen-filter earns its keep (cuckoo.py,
``cfg.seen_filter = "cuckoo"``): expired keys are *deleted in place* from
the filter shards — one cogroup pass over the expired keys only.  A bloom
cannot forget, so the bloom path rebuilds the filter from the kept half
of the exact seen set (a full pass over 10^10 keys at scale; correct
either way, just costlier — the measured reason to deploy the cuckoo for
standing crawls).

Safety rails:

* URLs whose frontier row is still ``pending`` are never expired — a
  re-discovery while the original row is queued would double-fetch the
  URL inside one run, breaking the exactly-once contract.  Terminal rows
  (fetched / failed / filtered) are fair game.
* The operation is one atomic manifest commit (the same protocol as a
  superstep): a crash mid-expiry leaves the previous superstep's state
  intact and visible, never a half-expired seen set.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .config import CrawlConfig


def expire_seen(spark: SparkSession, storage, cfg: CrawlConfig, *,
                older_than: int) -> dict:
    """Drop seen entries first seen BEFORE superstep ``older_than`` and
    republish state as superstep ``last_committed() + 1``.

    Returns ``{"superstep", "kept", "expired"}``.  The commit reuses the
    frontier/budgets directories unchanged (manifest aliases, no rewrite)
    and writes a fresh folded seen base — the delta chain restarts, so
    expiry doubles as a seen compaction.
    """
    s = storage.last_committed()
    if s is None:
        raise ValueError("nothing committed — nothing to expire")
    seen = storage.read_seen(s)
    if seen is None:
        raise ValueError("no seen table at superstep %d" % s)

    frontier = storage.read_frontier(s)
    pending = frontier.where(F.col("state") == "pending") \
        .select("url_hash", "url")
    old = F.col("first_seen_superstep") < F.lit(older_than)
    # expire only terminal rows: anti-join the (bounded) pending set
    expired = seen.where(old).join(pending, ["url_hash", "url"],
                                   "left_anti")
    kept = seen.join(expired.select("url_hash", "url"),
                     ["url_hash", "url"], "left_anti")
    # one materialization each, then cheap commit scans (engine pattern)
    expired = expired.localCheckpoint(eager=True)
    kept = kept.localCheckpoint(eager=True)
    n_expired, n_kept = expired.count(), kept.count()

    tables = {"seen": kept}
    reuse = {"frontier": s, "budgets": s}
    man_s = storage.manifest(s)["tables"]
    if "bloom" in man_s:
        filt = storage.read_snapshot("bloom", s)
        if cfg.seen_filter == "cuckoo":
            from .cuckoo import delete_keys
            tables["bloom"] = delete_keys(
                filt, expired.select("url_hash"),
                num_buckets=cfg.bloom_num_buckets)
        else:
            # blooms can't forget: rebuild from the kept exact set
            from .seenfilter import empty_seen_filter, update_seen_filter
            tables["bloom"] = update_seen_filter(
                cfg, empty_seen_filter(spark, cfg),
                kept.select("url_hash"))
    stats = {"superstep": s + 1, "kept": n_kept, "expired": n_expired,
             "maintenance": "expire_seen", "older_than": older_than}
    storage.commit(s + 1, tables, extra={"stats": stats},
                   reuse=reuse, delta_seen=False)
    for df in (expired, kept):
        df.unpersist()
    return stats


def merge_seeds(spark: SparkSession, storage, cfg: CrawlConfig,
                new_seeds, robots=None) -> dict:
    """Inject out-of-band URLs into an EXISTING checkpoint as new pending
    frontier rows, so a resumed run fetches them without replaying the
    crawl.  ``new_seeds`` is a ``(url, seed_order)`` frame — the streaming
    landing table (``streaming.read_landing``), a sitemap parse, or a
    recrawl due-list all produce it.

    Semantics mirror insertion anywhere else in the engine: canonicalize +
    hash, dedup against the current seen set (first discovery wins — URLs
    already seen are dropped; run ``expire_seen`` first to make stale ones
    eligible again), robots/allowlist state at insertion, discovery order
    appended after the checkpoint's current maximum so crawl ordering
    stays deterministic.  Commits as one frontier+seen delta at
    ``last_committed() + 1`` (no base rewrite).
    """
    from .frontier import frontier_head, seed_frontier

    s = storage.last_committed()
    if s is None:
        raise ValueError("nothing committed — seed a fresh run instead")
    head = frontier_head(storage, s)
    base_order = head["max_order"] + 1

    fresh, _ = seed_frontier(spark, new_seeds, robots, cfg)
    seen = storage.read_seen(s)
    if seen is not None:
        fresh = fresh.join(seen.select("url_hash", "url"),
                           ["url_hash", "url"], "left_anti")
    fresh = fresh.withColumn(
        "discovery_order",
        (F.col("discovery_order") + F.lit(base_order)).cast("long"))
    delta = fresh.withColumn("rev", F.lit(s + 1).cast("int")) \
        .localCheckpoint(eager=True)
    n_merged = delta.count()

    seen_delta = delta.select(
        "url_hash", "url",
        F.lit(s + 1).cast("int").alias("first_seen_superstep"))
    tables = {"frontier": delta, "seen": seen_delta}
    man_s = storage.manifest(s)["tables"]
    if "bloom" in man_s:
        from .seenfilter import update_seen_filter
        tables["bloom"] = update_seen_filter(
            cfg, storage.read_snapshot("bloom", s),
            delta.select("url_hash"))
    stats = {"superstep": s + 1, "merged": n_merged,
             "maintenance": "merge_seeds"}
    storage.commit(s + 1, tables, extra={"stats": stats},
                   reuse={"budgets": s}, delta_frontier=True)
    delta.unpersist()
    return stats
