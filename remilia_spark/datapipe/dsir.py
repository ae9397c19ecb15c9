"""DSIR-style data selection: hashed n-gram importance weighting.

DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling") selects pretraining documents whose hashed-n-gram
distribution looks like a small in-domain *target* corpus: fit bag-of-
n-gram models over hash buckets for the target and the raw pool, weight
every raw document by its target/raw likelihood ratio, and keep a sample
biased toward high ratios.  This module re-expresses the pipeline
Spark-first:

* **train** — one exploded-bigram stream per corpus, hashed into
  ``n_buckets`` with the repo's 60-bit md5 ``word_hash`` (DuckDB-
  replayable), then ONE map-side-combinable groupBy each; the two count
  tables join into a single distributed bucket model (never collected).
* **score** — every document's bigrams hash to buckets and left-join the
  model (Catalyst broadcasts it below the threshold: the model is at most
  ``n_buckets`` rows, tiny by construction); per-doc score is an integer
  SUM div count — exact on any partitioning, no ordered fold needed.
* **select** — exact top-fraction cut via the engine's range-partitioned
  ``ranking.global_rank`` (no one-task global sort), ties broken by
  doc_id, so the kept set is deterministic.

Scoring kernel (pinned; the DuckDB oracle replays it bit-for-bit):

    bucket(g)   = word_hash(w1 || ' ' || w2) % n_buckets
    ratio_fp(b) = ((c_target(b) + 1) * SCALE) div (c_raw(b) + 1)
    dsir_fp(d)  = SUM ratio_fp over d's bigram occurrences div n_bigrams

i.e. the mean add-one-smoothed bucket count ratio in fixed point
(SCALE = 10^6).  Real DSIR sums *log* ratios and adds Gumbel noise before
the cut; ``exp``/``ln`` are not correctly rounded across engines and are
banned repo-wide (see textstats), so the pinned substitute uses the mean
raw ratio — monotone in each bucket's ratio, integer-exact end-to-end.
A log-weight variant drops into the same seam by replacing ``ratio_fp``
(one column expression) and accepting float nondeterminism in the last
ulp.  Normalizing constants (corpus gram masses) are per-corpus scalars
shared by every document, so dropping them does not reorder documents
relative to the count-ratio statistic.

Scale (100 TB): documents never shuffle — only (doc_id, bucket) pairs and
the O(n_buckets) model move; both groupBys are map-side combinable.
Bucket counts stay < 2^63/SCALE ≈ 9·10^12 per bucket, far above any real
per-bucket gram mass at default bucket counts.

Reference parity: ShroXd/remilia has no selection stage (layers stop at
fetch/parse, ``pipeline.go``); this extends the training-data surface the
graft adds.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remilia_spark.datapipe.lm import _doc_bigrams, _doc_tokens
from remilia_spark.datapipe.textstats import word_hash

SCALE = 10**6


@dataclass(frozen=True)
class HashedGramModel:
    """Distributed bucket model: (bucket, c_target, c_raw), one row per
    OCCUPIED bucket (missing bucket == both counts 0)."""

    buckets: DataFrame
    n_buckets: int


def _doc_buckets(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    """(doc_id, bucket) — one row per bigram occurrence (not distinct:
    DSIR weights repeated grams repeatedly, like the bag-of-ngrams model)."""
    bg = _doc_bigrams(_doc_tokens(df, text_col))
    return bg.select(
        "doc_id",
        (word_hash(F.concat_ws(" ", "w1", "w2")) % n_buckets)
        .alias("bucket"))


def train_dsir(raw: DataFrame, target: DataFrame, text_col: str = "text",
               n_buckets: int = 4096) -> HashedGramModel:
    """Fit the hashed-bigram bucket model from the raw pool + target slice."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (_doc_buckets(df, text_col, n_buckets)
                .groupBy("bucket").agg(F.count("*").alias(out)))

    b = (counts(target, "c_target")
         .join(counts(raw, "c_raw"), "bucket", "full")
         .select("bucket",
                 F.coalesce("c_target", F.lit(0)).alias("c_target"),
                 F.coalesce("c_raw", F.lit(0)).alias("c_raw")))
    return HashedGramModel(buckets=b, n_buckets=n_buckets)


def dsir_scores(df: DataFrame, model: HashedGramModel,
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, dsir_fp) for every input document.

    dsir_fp = mean fixed-point bucket ratio (see module docstring);
    documents with < 2 tokens score 0.  Integer sum + floor div, so the
    value is identical on any partitioning and engine.
    """
    scored = (
        _doc_buckets(df, text_col, model.n_buckets)
        .join(model.buckets, "bucket", "left")
        .select("doc_id",
                F.expr(f"(coalesce(c_target, 0) + 1) * {SCALE} "
                       f"div (coalesce(c_raw, 0) + 1)").alias("ratio_fp"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             F.sum("ratio_fp").alias("rsum"))
        .select("doc_id", F.col("n_bigrams").cast("long"),
                F.expr("rsum div n_bigrams").cast("long").alias("dsir_fp"))
    )
    return (df.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0).cast("long"))
                    .alias("n_bigrams"),
                    F.coalesce("dsir_fp", F.lit(0).cast("long"))
                    .alias("dsir_fp")))


def dsir_select(scored: DataFrame, fraction: float,
                num_partitions: int = 32,
                cleanup: list | None = None) -> DataFrame:
    """Deterministic top-``fraction`` cut by (dsir_fp, doc_id).

    Adds ``dsir_rank`` (ascending global rank) and ``keep`` (the top
    ``floor(n * fraction)`` rows by score, doc_id as tie-break).  Exact
    corpus-wide rank via the engine's range-partitioned ``global_rank`` —
    never a single-task window.  DSIR proper resamples with Gumbel noise;
    the pinned cut is the noise-free limit, deterministic for the oracle.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    from remilia_spark.ranking import global_rank

    # pin one materialization of the scoring DAG: the count below AND the
    # global_rank both consume `scored`; without the persist the full
    # bigram-hash/join/agg chain (the heaviest stage at 10^10 docs)
    # executes twice.  Same cleanup convention as global_rank.
    scored = scored.persist()
    if cleanup is not None:
        cleanup.append(scored)
    n = scored.count()
    k = int(n * fraction)
    ranked = global_rank(scored, keys=["dsir_fp", "doc_id"],
                         out_col="dsir_rank",
                         num_partitions=num_partitions, cleanup=cleanup)
    return ranked.withColumn("keep", F.col("dsir_rank") >= n - k)
