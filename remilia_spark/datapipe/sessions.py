"""Gap-based sessionization — crawl-telemetry sessions per key.

A standing crawl's operational questions ("how long do we hammer one
host per visit?", "how do fetch bursts cluster per domain?") and a
training-data pipeline's log analyses ("user sessions over events")
are the same operator: split each key's event stream into sessions
wherever the gap between consecutive events exceeds a threshold.

Pinned spec (oracle-exact, integer end-to-end):

    order events within key by (event time in MICROSECONDS, id);
    new session when first event or ts - prev_ts > gap;
    session index = running count of boundaries (cumulative sum);
    per session emit (start, end, n_events, first id).

Event times compare as ``unix_micros`` BIGINTs (DuckDB: ``epoch_us``) —
never float seconds, so engines agree exactly.

Scale (10^10 events): ONE shuffle, on the session key; lag + running
sum + the aggregation all share the same per-key window partitioning,
so Catalyst plans a single Window + partial-agg chain.  A pathological
mega-key (one host emitting a billion events) serializes its window
into one task — for that shape, pre-split by coarse time bucket, run
this per (key, bucket), and merge sessions that touch bucket edges
(one extra join over boundary sessions only); the merge is not needed
below ~10^7 events per key per task, which covers any real host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_sessions(df: DataFrame, key: str, ts_col: str, id_col: str,
                 gap_seconds: int = 1800) -> DataFrame:
    """Sessions per ``key``; returns (key, session_start, session_end,
    n_events, first_id) — one row per session.

    ``id_col`` breaks ties for events sharing a timestamp, making the
    ordering (and therefore the session split) total and deterministic.
    """
    if gap_seconds < 1:
        raise ValueError("gap_seconds must be >= 1")
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(key).orderBy("ts_us", id_col)
    # TIMESTAMP_NTZ inputs (parquet default) get a timezone-FREE epoch:
    # wall-clock microseconds since the NTZ epoch via timestampdiff.  The
    # earlier cast-to-timestamp went through the session timezone, whose
    # offset is NOT constant across a DST transition — two events
    # straddling the boundary got gaps shifted ±1h, which could change
    # the session split and diverge from DuckDB's epoch_us oracle.
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        ts_us = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)")
    else:
        ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = (df.select(F.col(key), F.col(id_col),
                    F.col(ts_col).alias("ts"),
                    ts_us.alias("ts_us"))
          .withColumn("prev_us", F.lag("ts_us").over(w))
          .withColumn(
              "is_new",
              (F.col("prev_us").isNull()
               | ((F.col("ts_us") - F.col("prev_us")) > gap_us))
              .cast("long"))
          .withColumn("session_idx", F.sum("is_new").over(w)))
    return (ev.groupBy(key, "session_idx")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").cast("long").alias("n_events"),
                 # id of the temporally-first event (not min id): min over
                 # the same (ts_us, id) order the session split uses
                 F.min(F.struct("ts_us", F.col(id_col).alias("i")))["i"]
                 .alias("first_id"))
            .drop("session_idx"))
