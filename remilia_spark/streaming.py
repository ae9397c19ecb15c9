"""Structured Streaming ingest — out-of-band URL discovery into the frontier.

The batch-iterative superstep loop (engine.py) is the crawl itself — the
north rule mandates resumable, deterministic waves, so the *crawl* is not a
stream.  But a production frontier also ingests URLs discovered outside the
crawl loop: sitemap pings, partner feeds, log taps.  Those arrive
continuously, and this module is the Spark-idiomatic connector for them:

    readStream (json drops) → canonicalize (Arrow UDF, same one the engine
    uses) → foreachBatch: batch-dedup + anti-join the committed seen set →
    idempotent append to a landing directory the next superstep merges as
    extra seeds.

Design points:

* **The same canonicalizer as the engine** (`frontier._canonicalize`) runs
  inside the stream, so a URL discovered out-of-band and the same URL
  discovered by the crawl always collapse to one frontier row.
* **Exactly-once via foreachBatch + per-batch directory.**  Each micro-batch
  writes ``batch_id=<n>/`` with ``mode=overwrite``; a replayed batch (crash
  between write and checkpoint commit) overwrites its own output instead of
  duplicating it.  This is the standard idempotent-sink pattern and maps
  1:1 onto an Iceberg ``overwritePartitions`` on a real cluster.
* **Seen-set join is against the manifest-committed snapshot** — the stream
  never sees uncommitted crawl state, so a crash of either side leaves the
  pair consistent (at worst a URL lands twice across *different* batches
  and the engine's own insert-time dedup drops it — the landing zone is a
  staging area, not the seen set).
* ``trigger(availableNow=True)`` drains a backlog and stops — how the tests
  and any batch-scheduled production merge run it; a live deployment drops
  the trigger and runs micro-batches continuously.

Input schema (one json object per line, one file per drop):

    {"url": "...", "source": "sitemap|feed|log", "ts": "2024-08-07T..."}
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INGEST_SCHEMA = "url string, source string, ts timestamp"

# landing-zone schema: what the engine merges as extra seed rows
LANDING_SCHEMA = ("url string, url_hash long, host string, "
                  "source string, ingest_ts timestamp")


def _canonical_candidates(raw: DataFrame) -> DataFrame:
    """Canonicalize + hash a (possibly streaming) DataFrame of raw URLs —
    identical column math to the engine's seed path (frontier.py)."""
    from .frontier import _canonicalize

    return (
        raw
        .withColumn("np", _canonicalize("url", F.lit(None).cast("string")))
        .where(F.col("np.url").isNotNull())
        .select(
            F.col("np.url").alias("url"),
            F.xxhash64("np.url").alias("url_hash"),
            F.col("np.host").alias("host"),
            "source",
            F.col("ts").alias("ingest_ts"),
        )
    )


def start_url_ingest(
    spark: SparkSession,
    source_dir: str | Path,
    landing_dir: str | Path,
    checkpoint_dir: str | Path,
    seen: DataFrame | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the ingest stream; returns the StreamingQuery.

    ``seen`` is the committed seen snapshot (``CrawlRun.seen()``); rows whose
    ``(url_hash, url)`` already appear there are dropped before landing.
    """
    landing_dir = str(landing_dir)
    reader = (spark.readStream.schema(INGEST_SCHEMA)
              .option("multiLine", "false"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(str(source_dir))
    cand = _canonical_candidates(raw)
    seen_keys = (seen.select("url_hash", "url").localCheckpoint(eager=True)
                 if seen is not None else None)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        out = batch.dropDuplicates(["url_hash", "url"])
        if seen_keys is not None:
            out = out.join(seen_keys, ["url_hash", "url"], "left_anti")
        # idempotent: a replayed batch overwrites its own directory
        out.write.mode("overwrite").parquet(
            f"{landing_dir}/batch_id={batch_id}")

    writer = (cand.writeStream
              .foreachBatch(_sink)
              .option("checkpointLocation", str(checkpoint_dir)))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_landing(spark: SparkSession, landing_dir: str | Path) -> DataFrame:
    """Landed candidates across all batches, deduped to first ingest —
    ready to union into the next run's seeds."""
    df = spark.read.schema(LANDING_SCHEMA).option(
        "basePath", str(landing_dir)).parquet(f"{landing_dir}/batch_id=*")
    w_first = F.struct("ingest_ts", "source").alias("pick")
    return (df.groupBy("url_hash", "url", "host")
            .agg(F.min(w_first).alias("pick"))
            .select("url", "url_hash", "host",
                    F.col("pick.source").alias("source"),
                    F.col("pick.ingest_ts").alias("ingest_ts")))


# ---------------------------------------------------------------------------
# custom stateful streaming operator: per-host admission rate guard
# ---------------------------------------------------------------------------

# output of the rate guard: every candidate, tagged admit/defer
GUARD_SCHEMA = ("url string, host string, source string, "
                "ingest_ts timestamp, admitted boolean")


def start_host_rate_guard(
    spark: SparkSession,
    source_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    capacity: int = 5,
    refill: int = 5,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Stateful streaming politeness guard — ``applyInPandasWithState``.

    The batch engine rate-limits *fetches* (budget.py); a continuous
    ingest needs the same protection on *admissions*, or a sitemap ping
    storm floods one host's frontier partition.  This operator keeps a
    per-host token bucket as **streaming state across micro-batches**
    (Spark's state store, restored from the checkpoint on restart):

        tokens(batch start) = min(capacity, tokens + refill)
        admit candidates in (ingest_ts, url) order while tokens remain;
        the rest emit admitted=false (downstream re-queues or drops).

    Per-group work is one pandas sort of that host's batch rows; state is
    a single long per host.  This is the ``applyInPandasWithState``
    pattern from the Structured Streaming guide — arbitrary stateful
    processing with an explicit state schema, *not* reproducible by a
    windowed agg because admission depends on the running token count.

    Deterministic given a fixed batch split: rows sort (ingest_ts, url)
    within host and hosts are independent — the tests pin admissions
    across two forced micro-batches (maxFilesPerTrigger=1).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    reader = (spark.readStream.schema(INGEST_SCHEMA)
              .option("multiLine", "false"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(str(source_dir))
    cand = _canonical_candidates(raw).select(
        "url", "host", "source", F.col("ingest_ts"))

    cap, re_fill = int(capacity), int(refill)

    def guard(key, pdf_iter, state: GroupState):
        (host,) = key
        tokens = state.get[0] if state.exists else cap
        tokens = min(cap, tokens + re_fill) if state.exists else tokens
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ingest_ts", "url"],
                                  kind="mergesort").reset_index(drop=True)
            n_admit = min(tokens, len(pdf))
            tokens -= n_admit
            pdf["admitted"] = [True] * n_admit \
                + [False] * (len(pdf) - n_admit)
            yield pdf[["url", "host", "source", "ingest_ts", "admitted"]]
        state.update((tokens,))

    guarded = cand.groupBy("host").applyInPandasWithState(
        guard,
        outputStructType=GUARD_SCHEMA,
        stateStructType="tokens long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (guarded.writeStream
              .format("parquet")
              .option("path", str(out_dir))
              .option("checkpointLocation", str(checkpoint_dir))
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# windowed-metrics output schema: one row per (window, host) once the
# watermark closes the window
WINDOW_METRICS_SCHEMA = ("window_start timestamp, window_end timestamp, "
                         "host string, n_urls long, n_sources long, "
                         "first_ts timestamp, last_ts timestamp")


def start_ingest_window_metrics(
    spark: SparkSession,
    source_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "5 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Event-time windowed per-host ingest throughput — the watermark +
    windowed-agg pattern from the Structured Streaming guide.

    The batch engine's metrics table records per-superstep counts; a
    continuous ingest needs the same visibility per *event-time window*
    (which feeds trigger when? is one host's sitemap ping storming?).
    This is the canonical built-in-operator answer — no custom state:

        withWatermark(ingest_ts, W) .groupBy(window(ingest_ts, T, S), host)
        .agg(count, approx-free distinct-source count, min/max ts)

    * **Watermark semantics** (pinned by the tests against real Spark
      behavior): a window emits exactly once, in the first batch whose
      watermark (max event time seen minus ``watermark``) passes its
      end; an event arriving after its window's state was evicted drops
      entirely — never re-emitted, never re-opened.  The guarantee is
      one-directional: a late-but-pre-eviction event still merges.
      This bounds state — the rule a 1000-executor deployment relies on
      to keep the state store finite at 10^10 events/day.  Output mode
      is ``append`` — emitted windows are immutable, so the parquet
      sink (Iceberg append on a real cluster) never rewrites.
    * **Distinct sources via a set, not approx**: ``collect_set(source)``
      has tiny cardinality (source is an enum) — deterministic, unlike
      HLL-based approx_count_distinct, so the tests pin exact rows.
    * Aggregation is map-side combinable; the only shuffle keys are
      (window, host) — the state store holds one row per open window per
      host, nothing proportional to event volume.
    """
    reader = (spark.readStream.schema(INGEST_SCHEMA)
              .option("multiLine", "false"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(str(source_dir))
    cand = _canonical_candidates(raw)
    agg = (
        cand.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window, slide or window), "host")
        .agg(F.count("*").alias("n_urls"),
             F.size(F.collect_set("source")).cast("long")
             .alias("n_sources"),
             F.min("ingest_ts").alias("first_ts"),
             F.max("ingest_ts").alias("last_ts"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "host", "n_urls", "n_sources", "first_ts", "last_ts")
    )
    writer = (agg.writeStream
              .format("parquet")
              .option("path", str(out_dir))
              .option("checkpointLocation", str(checkpoint_dir))
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
