"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  score with higher-order array functions (``zip_with`` + ``aggregate`` —
  JVM-side, no Python), window top-k per query.  The baseline and the
  oracle-checkable path.
* ``lsh_topk`` — scale path: random-hyperplane signatures computed by a
  vectorized numpy pandas UDF (one matmul per Arrow batch), bucket join on
  the signature prefix, exact re-rank inside buckets.  Recall < 1 by
  design; the driver records a rows-only check for it.

At 100 TB the corpus side stays partitioned and is scanned once per query
batch; only the query block (k × dim floats) is broadcast.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact cosine top-k, self excluded.

    Rank ties broken by neighbor_id; scores are compared at double
    precision and rounded out of the result so the DuckDB oracle matches
    bit-for-bit on the (id, id, rank) triples.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"))
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot("qv", "cv")
             / (F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("cv", "cv")))
             ).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"))
    )


def _signature_udf(dim: int, planes: int, seed: int = 42):
    # one deterministic hyperplane matrix per (dim, planes, seed); a single
    # matmul per Arrow batch — vectorized, never per-row
    rng = np.random.RandomState(seed)
    P = rng.standard_normal((dim, planes))
    weights = (1 << np.arange(planes)).astype(np.int64)

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.vstack(pdf["embedding"].map(
                lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
            sig = ((M @ P) > 0).astype(np.int64) @ weights
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "sig": sig})
    return fn


def lsh_signatures(df: DataFrame, dim: int, planes: int = 12,
                   seed: int = 42) -> DataFrame:
    """(vec_id, sig) — random-hyperplane LSH bucket id per vector."""
    return df.select("vec_id", "embedding").mapInPandas(
        _signature_udf(dim, planes, seed), "vec_id long, sig long")


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             planes: int = 8, seed: int = 42) -> DataFrame:
    """Approximate top-k: exact re-rank within shared LSH buckets."""
    sig_c = lsh_signatures(corpus, dim, planes, seed)
    sig_q = lsh_signatures(queries, dim, planes, seed)
    c = corpus.join(sig_c, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), "sig",
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"))
    q = queries.join(sig_q, "vec_id").select(
        F.col("vec_id").alias("query_id"), "sig",
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"))
    scored = (
        c.join(F.broadcast(q), "sig")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot("qv", "cv")
             / (F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("cv", "cv")))
             ).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"),
                F.round("cos", 6).alias("cos"))
    )


def embedding_near_duplicates(corpus: DataFrame, dim: int,
                              threshold: float = 0.95,
                              planes: int = 8, seed: int = 42) -> DataFrame:
    """(vec_a, vec_b, cos) — near-dup pairs via LSH buckets + exact cosine."""
    sig = lsh_signatures(corpus, dim, planes, seed)
    e = corpus.join(sig, "vec_id").select(
        "vec_id", "sig",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    a = e.select(F.col("vec_id").alias("vec_a"), "sig",
                 F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), "sig",
                 F.col("v").alias("vb"))
    return (
        a.join(b, "sig")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.round(_dot("va", "vb")
                    / (F.sqrt(_dot("va", "va")) * F.sqrt(_dot("vb", "vb"))),
                    6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
