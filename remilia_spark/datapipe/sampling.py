"""Corpus-mixing operators: deterministic stratified sampling and
token-budget shard packing.

A training-data pipeline ends by (a) downsampling each source/language to a
target mixture and (b) packing the survivors into shards of roughly equal
token mass for the trainer.  Both must be *deterministic functions of the
data* — rerunning the pipeline (or running it at a different cluster size)
must emit the same corpus — so neither uses ``df.sample`` (seeded per
partition split, changes with partitioning) nor ``monotonically_increasing_id``
(changes with partitioning).

Scale notes (100 TB):
* ``stratified_sample`` is a pure map stage: one md5 per row compared
  against a broadcast per-stratum threshold — no shuffle, no state.  The
  hash-threshold rule is the standard "deterministic bernoulli" trick
  (hash(key) < p * 2^32), so the same key always makes the same decision:
  reruns, backfills, and incremental runs stay consistent.
* ``pack_token_shards`` is a distributed prefix sum, NOT a global window:
  a single-partition ``Window.orderBy`` would sort the corpus on one task.
  Keys bucket by range (``key // step``), each bucket cumulates locally,
  and the B per-bucket offsets (B = ``n_buckets``, driver-bounded) are
  collected and broadcast back — the classic two-pass scan.  Only
  ``(key, n_tokens)`` pairs ever shuffle, never document text.  Size
  ``n_buckets`` so a bucket (~n/B rows) fits a task's sort budget
  (>= n / 10^7 at corpus scale).

Reference parity: the reference pipeline has no corpus-mixing stage (its
scope ends at fetch/parse; ``pipeline.go:142-158`` drains to sinks) — these
extend the engine for the LLM-training use the survey's §6 calls out.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count

# keep-decision space: first 8 hex chars of md5 ~ uniform over [0, 2^32)
_HASH_SPACE = 1 << 32


def _threshold_hex(fraction: float) -> str:
    """Keep threshold as an 8-char lowercase hex string.

    Fixed-length lowercase hex compares lexicographically exactly like the
    integer it encodes, and both Spark's ``md5`` and DuckDB's ``md5``
    produce lowercase hex over the same UTF-8 bytes — so the oracle SQL
    can replay the decision byte-for-byte.  ``fraction >= 1`` maps past
    the hex alphabet ('g' > 'f') so every row keeps.
    """
    if fraction >= 1.0:
        return "g"
    if fraction <= 0.0:
        return "00000000"
    return format(int(fraction * _HASH_SPACE), "08x")


def _decision_hash(key_col: str, seed: int):
    """First 8 md5 hex chars of ``key:seed`` — the row's keep coordinate."""
    return F.substring(
        F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                          F.lit(str(seed)))), 1, 8)


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      stratum_col: str = "lang", key_col: str = "doc_id",
                      seed: int = 42,
                      default_fraction: float = 0.0) -> DataFrame:
    """Deterministic per-stratum bernoulli sample.

    Keeps a row iff ``md5(key:seed)[:8] < hex(fraction * 2^32)`` for its
    stratum's fraction (strata absent from ``fractions`` use
    ``default_fraction``).  The decision depends only on (key, seed,
    fraction) — never on partitioning, row order, or cluster size — so the
    sampled corpus is reproducible and *monotone in the fraction*: raising
    en from 0.3 to 0.5 keeps every row the 0.3 run kept (hash thresholds
    nest), which makes mixture re-tuning an incremental, not a full,
    rebuild.

    One broadcast join against a |fractions|-row table + one projection;
    zero shuffles at any scale.
    """
    spark = df.sparkSession
    rows = [(s, _threshold_hex(f)) for s, f in sorted(fractions.items())]
    thr = spark.createDataFrame(rows, f"{stratum_col} string, _thr string")
    dflt = F.lit(_threshold_hex(default_fraction))
    return (
        df.join(F.broadcast(thr), stratum_col, "left")
        .where(_decision_hash(key_col, seed) < F.coalesce("_thr", dflt))
        .drop("_thr")
    )


def pack_token_shards(df: DataFrame, target_tokens: int,
                      key_col: str = "doc_id", text_col: str = "text",
                      tokens: DataFrame | None = None,
                      n_buckets: int = 256) -> DataFrame:
    """Greedy sequential shard packing: ``(key, n_tokens, shard)``.

    Documents in ``key_col`` order accumulate into shards of
    ``target_tokens`` whitespace tokens: a document's shard is
    ``floor(start_offset / target)`` where ``start_offset`` is the exact
    corpus-wide token prefix sum before it — identical to what a global
    ``SUM() OVER (ORDER BY key)`` window computes, without its
    single-partition sort:

      1. bucket each key by range: ``b = key // step`` with
         ``step = ceil((max_key + 1) / n_buckets)`` (one max() job);
      2. per-bucket token sums -> collect ``n_buckets`` rows (driver-
         bounded by construction) -> exclusive-prefix offsets in Python;
      3. within-bucket running sum (window partitioned BY bucket) plus the
         bucket's broadcast offset.

    Requires a numeric, unique ``key_col`` (dense ids are ideal; sparse
    ids only skew bucket sizes, never correctness).  Pass ``tokens`` as a
    precomputed ``(key, n_tokens)`` frame to reuse an earlier count.
    Integer arithmetic throughout (``div``) so the shard id is exact at
    any corpus mass — float division drifts past 2^53 tokens.
    """
    if tokens is None:
        src = df if key_col == "doc_id" \
            else df.withColumnRenamed(key_col, "doc_id")
        tokens = token_count(src, text_col)
        if key_col != "doc_id":
            tokens = tokens.withColumnRenamed("doc_id", key_col)
    # NULL text tokenizes to NULL — for packing that is 0 tokens (the doc
    # occupies no budget), never a NULL shard id
    tokens = tokens.withColumn(
        "n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long"))
    max_key = tokens.agg(F.max(key_col).alias("m")).collect()[0]["m"]
    if max_key is None:  # empty corpus
        return tokens.withColumn("shard", F.lit(0).cast("long"))
    step = max(1, math.ceil((int(max_key) + 1) / n_buckets))
    t = tokens.withColumn(
        "_b", (F.col(key_col).cast("long") / step).cast("long"))
    sums = {r["_b"]: r["s"]
            for r in t.groupBy("_b").agg(F.sum("n_tokens").alias("s"))
                      .collect()}  # <= n_buckets rows by construction
    offsets, acc = {}, 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += int(sums[b] or 0)
    off = F.create_map(
        *[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])])
    w = (Window.partitionBy("_b").orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")
             + off[F.col("_b")]).cast("long")
    return (
        t.withColumn("_start", start)
        .withColumn("shard", F.expr(f"_start div {int(target_tokens)}"))
        .select(key_col, "n_tokens", "shard")
    )
