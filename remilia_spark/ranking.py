"""Deterministic, scale-safe ranking primitives.

Two jobs the frontier needs that naive Windows would bottleneck at 10^10-URL
scale:

* ``global_rank`` — a total discovery-order rank over all rows of a
  DataFrame **without** funnelling everything through one partition.  Range-
  partition on the sort key, ``row_number`` within each partition, then add
  per-partition offsets (the per-partition counts — at most ``P`` rows —
  are the only thing that touches the driver).  The result equals the global
  sort position, so it is deterministic even though range-boundary sampling
  is not.
* ``grant_wave`` — per-host budget pop: keep each host's top ``avail`` rows
  by ``(depth, discovery_order)`` and attach their within-host rank.  Plain
  path is one window per host; **mega-hosts** (pending count >
  ``skew_threshold``) take a salted two-phase top-k: local rank within
  ``(host, salt)`` prunes to ``<= salts * avail`` survivors, then the real
  rank is computed on the pruned set.  Phase 1 can never drop a true top-k
  row (local rank <= global rank), so the final ranks equal the unsalted
  answer — this is the explicit "host-salted repartitioning with mega-host
  skew splitting" the north rule asks for, and it is metric-logged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .config import CrawlConfig

# Per-host priority inside a wave (SURVEY §2 R10): depth first, then global
# discovery order — both totally ordered, so ranks are unique.
HOST_ORDER = ("depth", "discovery_order")


def global_rank(df: DataFrame, keys: list[str], out_col: str,
                start: int = 0, num_partitions: int = 32,
                cleanup: list | None = None) -> DataFrame:
    """Attach ``out_col`` = start + global sort position over ``keys``.

    ``keys`` must be a unique composite (ours end with url_hash) so the
    ordering — and therefore the rank — is total and deterministic.

    The range-partitioned frame MUST be persisted: range boundaries come
    from reservoir sampling over nondeterministically-ordered shuffle
    output, so a recomputation can land rows in different partitions than
    the ones the offsets were counted from — producing duplicate/skipped
    ranks.  Pinning one materialization makes the offsets and the window
    agree; the rank *values* equal the global sort position either way, so
    they are reproducible across runs and parallelism levels.  Callers
    pass ``cleanup`` and unpersist after their superstep commits.
    """
    part = df.repartitionByRange(num_partitions, *keys) \
             .withColumn("_pid", F.spark_partition_id()).persist()
    if cleanup is not None:
        cleanup.append(part)
    # offsets: cumulative count of earlier partitions (tiny — P rows)
    counts = part.groupBy("_pid").count().orderBy("_pid").collect()
    offsets, acc = {}, start
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    if offsets:
        offmap = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv])
        base = offmap[F.col("_pid")]
    else:  # empty input: no partitions counted; rank column is never read
        base = F.lit(start)
    w = Window.partitionBy("_pid").orderBy(*keys)
    return (
        part.withColumn("_rn", F.row_number().over(w))
        .withColumn(out_col, (base + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn")
    )


def grant_wave(pending: DataFrame, cfg: CrawlConfig,
               approx_rows: int | None = None,
               key: str = "host") -> DataFrame:
    """Budget pop: pending rows that fit their key's budget, + host_rank.

    ``pending`` must carry (key column, depth, discovery_order, avail —
    see ``budget.attach_avail``).  ``key`` is the politeness-key column
    ("host" by default; a derived registered-domain column in domain
    mode — the salted two-phase structure is identical, only the window
    key changes).  Returns pending columns + ``host_rank`` (1-based,
    rank within the key's wave), filtered to ``host_rank <= avail``.

    The pop is the salted two-phase top-k: local rank within
    ``(host, salt)`` prunes each host to ``<= n_salts * avail`` survivors,
    then the real per-host rank runs on the pruned set.  Phase 1 can never
    drop a true top-k row (a row's local rank is a lower bound on its host
    rank), so the result equals the plain one-window answer row-for-row —
    while no partition ever holds more than ~1/n_salts of a mega-host in
    phase 1 or more than ``n_salts * avail`` rows of one host in phase 2.
    Earlier rounds salted only driver-detected mega-hosts; that cost a
    whole extra Spark job (count + collect, re-executing the frontier fold)
    per busy superstep — a pure driver-latency tax at any cluster size,
    and the unsalted path it usually took is exactly the one that dies on
    a 10^10-frontier mega-host.  Salting needs no count at all: one plan,
    bounded partitions, zero driver actions.

    ``approx_rows``: a driver-known upper bound on pending's size, when the
    caller has one for free (the engine's next_eligible histograms).  At or
    below ``cfg.rank_small_wave`` the salt phase is skipped: no host can
    exceed that bound, so the single window is the identical answer minus
    one shuffle stage — at fixture scale that stage is pure latency, and at
    10^10-URL scale a superstep this small is latency-bound anyway.
    """
    df = pending
    order = [F.col(c) for c in HOST_ORDER]
    small = approx_rows is not None and approx_rows <= cfg.rank_small_wave
    if not small:
        w_local = Window.partitionBy(key, "_salt").orderBy(*order)
        df = (
            df.withColumn("_salt", F.pmod(F.xxhash64("url"),
                                          F.lit(cfg.skew_salts)))
              .withColumn("_lr", F.row_number().over(w_local))
              .where(F.col("_lr") <= F.col("avail"))  # prune before real rank
              .drop("_lr", "_salt")
        )
    w_host = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("host_rank", F.row_number().over(w_host))
          .where(F.col("host_rank") <= F.col("avail"))
    )
