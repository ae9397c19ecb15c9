"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  score with higher-order array functions (``zip_with`` + ``aggregate`` —
  JVM-side, no Python), window top-k per query.  The baseline and the
  oracle-checkable path.
* ``lsh_topk`` — scale path: **multi-table** random-hyperplane LSH.
  Signatures come from a vectorized numpy pandas UDF (one matmul per Arrow
  batch covering all tables); candidates are the union over L independent
  hash tables of same-bucket pairs, then an exact cosine re-rank.  One
  table alone has recall that collapses as buckets get selective; L tables
  with b planes each give collision probability 1-(1-p^b)^L (p = 1-θ/π) —
  the standard banded construction.  ``planes=None`` auto-scales b to
  log2(n / target_bucket_rows), so buckets stay ~constant-sized as the
  corpus grows instead of going quadratic (the round-1 flaw: fixed 4-8
  planes ⇒ 16-256 buckets at ANY corpus size).
  Recall is measured against ``cosine_topk`` by a pytest gate
  (tests/test_ann_recall.py).

At 100 TB the corpus side stays partitioned and is scanned once per query
batch; only the query block (k × dim floats) is broadcast.
"""

from __future__ import annotations

import math
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
    # norms are per-vector, so they are computed in the pre-join
    # projections — the historical post-join expression re-derived
    # sqrt(dot(v,v)) once per (query, corpus) pair, i.e. n_queries times
    # per corpus vector.  Same expressions, same double-precision op
    # order (sqrt of the self-dot, then the product), so scores are
    # bit-identical; only WHERE they are evaluated moves.
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")) \
        .withColumn("qn", F.sqrt(_dot("qv", "qv")))
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv")) \
        .withColumn("cn", F.sqrt(_dot("cv", "cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"))
    )


def auto_planes(n_rows: int, target_bucket_rows: int = 128) -> int:
    """Hyperplanes per table so mean bucket size ≈ target as n grows.

    b = log2(n / target): buckets scale WITH the corpus — the within-bucket
    self-join stays ~O(n · target) instead of O(n²/2^b_fixed).
    """
    if n_rows <= target_bucket_rows:
        return 2
    return max(2, math.ceil(math.log2(n_rows / target_bucket_rows)))


def _signature_udf(dim: int, planes: int, tables: int, seed: int = 42):
    # one deterministic hyperplane tensor per (dim, planes, tables, seed);
    # a single matmul per Arrow batch covers ALL tables — vectorized,
    # never per-row
    rng = np.random.RandomState(seed)
    P = rng.standard_normal((dim, tables * planes))
    weights = (1 << np.arange(planes)).astype(np.int64)

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.vstack(pdf["embedding"].map(
                lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
            bits = ((M @ P) > 0).astype(np.int64)  # n × (tables·planes)
            out = {"vec_id": pdf["vec_id"]}
            for t in range(tables):
                out[f"sig{t}"] = bits[:, t * planes:(t + 1) * planes] @ weights
            yield pd.DataFrame(out)
    return fn


def lsh_signatures(df: DataFrame, dim: int, planes: int = 12,
                   tables: int = 1, seed: int = 42) -> DataFrame:
    """(vec_id, table, sig) — bucket id per vector per hash table."""
    schema = "vec_id long, " + ", ".join(f"sig{t} long"
                                         for t in range(tables))
    wide = df.select("vec_id", "embedding").mapInPandas(
        _signature_udf(dim, planes, tables, seed), schema)
    pairs = F.array(*[
        F.struct(F.lit(t).alias("table"), F.col(f"sig{t}").alias("sig"))
        for t in range(tables)])
    return wide.select(
        "vec_id", F.explode(pairs).alias("ts")
    ).select("vec_id", F.col("ts.table").alias("table"),
             F.col("ts.sig").alias("sig"))


def _lsh_candidates(corpus: DataFrame, queries: DataFrame, dim: int,
                    planes: int | None, tables: int, seed: int,
                    n_corpus: int | None = None) -> tuple[DataFrame, int]:
    """(query_id, neighbor_id) distinct same-bucket-in-any-table pairs."""
    if planes is None:
        n = n_corpus if n_corpus is not None else corpus.count()
        planes = auto_planes(n)
    sig_c = lsh_signatures(corpus, dim, planes, tables, seed)
    sig_q = lsh_signatures(queries, dim, planes, tables, seed)
    cand = (
        sig_c.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(sig_q.withColumnRenamed("vec_id", "query_id")),
              ["table", "sig"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id").distinct()
    )
    return cand, planes


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             planes: int | None = None, tables: int = 8,
             seed: int = 42, n_corpus: int | None = None) -> DataFrame:
    """Approximate top-k: exact cosine re-rank over multi-table candidates.

    ``planes=None`` auto-scales bucket selectivity to the corpus size
    (``auto_planes``); ``tables`` trades shuffle volume for recall.  Pass
    ``n_corpus`` when known to skip the sizing count job.
    """
    cand, _ = _lsh_candidates(corpus, queries, dim, planes, tables, seed,
                              n_corpus)
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"))
    scored = (
        cand.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
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


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-style ANN: Voronoi-partition the corpus around a fixed,
    deterministic centroid set — the ``n_centroids`` smallest ``vec_id``
    vectors, no k-means iterations, so the index build is a single pass
    and the DuckDB oracle is exact — then a query searches only its
    ``n_probe`` nearest cells and re-ranks exactly within them.

    Scale path: assignment scans the corpus once against C broadcast
    centroids (C ≪ n; one argmax per vector); each query then touches
    ~n_probe/C of the corpus instead of all of it.  On a real deployment
    the cell id becomes the table's partition/bucket column so probes
    prune at the storage layer (Iceberg partition pruning) — the inverted
    "file" IS the partition.  Ties (vector equidistant from two
    centroids) break to the smaller centroid id, so cell assignment is
    total and reproducible.
    """
    cent = F.broadcast(corpus.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("ce")))

    def cells(df: DataFrame, id_col: str, top: int) -> DataFrame:
        scored = df.select(
            F.col("vec_id").alias(id_col),
            F.transform("embedding", lambda x: x.cast("double")).alias("v")
        ).crossJoin(cent).select(
            id_col, "cent_id",
            (_dot("v", "ce") / (F.sqrt(_dot("v", "v"))
                                * F.sqrt(_dot("ce", "ce")))).alias("cos"))
        w = Window.partitionBy(id_col).orderBy(F.desc("cos"),
                                               F.asc("cent_id"))
        return scored.withColumn("_r", F.row_number().over(w)) \
            .where(F.col("_r") <= top).select(id_col, "cent_id")

    cand = (
        cells(queries, "query_id", n_probe)
        .join(cells(corpus, "neighbor_id", 1), "cent_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id").distinct()
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"))
    scored = (
        cand.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
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


def kmeans_assign(corpus: DataFrame, dim: int, k: int = 8,
                  iters: int = 2) -> DataFrame:
    """(vec_id, cluster) — deterministic Lloyd k-means over L2-normalized
    embeddings: the clustering step of SemDeDup (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication").

    Determinism contract (oracle/resume-stable): init centroids are the
    ``k`` smallest ``vec_id`` vectors; argmin ties break to the smaller
    cluster id; a cluster that loses all members keeps its previous
    centroid.  No RNG anywhere, so the assignment is a pure function of
    the table.

    Scale (100 TB): each iteration is one broadcast-centroid pass over the
    corpus (k ≪ n, so the crossJoin is the k-fanout map every k-means
    does) followed by a k-group per-dimension avg — partial-aggregatable
    JVM expressions.  Returned assignment is the one computed against the
    iteration-``iters`` centroids.
    """
    nrm = corpus.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("raw"),
    ).select(
        "vec_id",
        F.transform("raw",
                    lambda x: x / F.sqrt(_dot("raw", "raw"))).alias("v"),
    )
    cent = nrm.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("c"))
    assign = None
    for _ in range(max(1, iters)):
        d2 = F.aggregate(
            F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        # argmin on ROUNDED distance: the centroid avg is a fp partial-sum
        # whose last-ulp value depends on aggregation order (Spark
        # partitioning, or Spark vs the DuckDB oracle).  Rounding to 9dp
        # absorbs that ~1e-14 jitter; genuine near-ties become exact ties
        # and fall through to the total cluster-id tiebreak identically
        # everywhere.
        w = Window.partitionBy("vec_id").orderBy(F.round("d2", 9).asc(),
                                                 F.col("cluster").asc())
        assign = (
            nrm.crossJoin(F.broadcast(cent))
            .select("vec_id", "cluster", "v", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cluster", "v")
        )
        newc = assign.groupBy("cluster").agg(
            F.array(*[F.avg(F.col("v")[i]) for i in range(dim)]).alias("cn"))
        cent = cent.join(newc, "cluster", "left").select(
            "cluster", F.coalesce("cn", "c").alias("c"))
    return assign.select("vec_id", "cluster")


def semantic_near_duplicates(corpus: DataFrame, dim: int, k: int = 8,
                             iters: int = 2,
                             threshold: float = 0.95) -> DataFrame:
    """(vec_a, vec_b, cluster, cos) — SemDeDup: k-means partition, then
    exact cosine verify strictly within each cluster.

    Candidate volume drops from n² to Σ_c n_c² ≈ n²/k (balanced case) —
    the quadratic pair search never crosses a cluster boundary, which is
    exactly the approximation SemDeDup makes (cross-cluster near-dups are
    sacrificed for scalability; recall vs the exact pass is measured in
    tests, mirroring the ANN recall gate).  Threshold applies to the RAW
    cosine; only the output column is rounded (6dp).
    """
    a = kmeans_assign(corpus, dim, k, iters)
    e = corpus.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    pairs = (
        a.select(F.col("vec_id").alias("vec_a"), "cluster")
        .join(a.select(F.col("vec_id").alias("vec_b"), "cluster"), "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
    )
    raw = _dot("va", "vb") / (F.sqrt(_dot("va", "va"))
                              * F.sqrt(_dot("vb", "vb")))
    return (
        pairs
        .join(e.select(F.col("vec_id").alias("vec_a"),
                       F.col("v").alias("va")), "vec_a")
        .join(e.select(F.col("vec_id").alias("vec_b"),
                       F.col("v").alias("vb")), "vec_b")
        .where(raw >= threshold)
        .select("vec_a", "vec_b", F.col("cluster").cast("int"),
                F.round(raw, 6).alias("cos"))
    )


def embedding_near_duplicates(corpus: DataFrame, dim: int,
                              threshold: float = 0.95,
                              planes: int | None = None, tables: int = 8,
                              seed: int = 42,
                              n_corpus: int | None = None) -> DataFrame:
    """(vec_a, vec_b, cos) — near-dup pairs via multi-table LSH + exact
    cosine verify.  Near-dup pairs have tiny angles, so per-table collision
    probability (1-θ/π)^planes stays high even at scaled-up plane counts —
    the multi-table union then pushes recall toward 1."""
    if planes is None:
        n = n_corpus if n_corpus is not None else corpus.count()
        planes = auto_planes(n)
    sig = lsh_signatures(corpus, dim, planes, tables, seed)
    pairs = (
        sig.select(F.col("vec_id").alias("vec_a"), "table", "sig")
        .join(sig.select(F.col("vec_id").alias("vec_b"), "table", "sig"),
              ["table", "sig"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b").distinct()
    )
    e = corpus.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    raw = _dot("va", "vb") / (F.sqrt(_dot("va", "va"))
                              * F.sqrt(_dot("vb", "vb")))
    return (
        pairs
        .join(e.select(F.col("vec_id").alias("vec_a"),
                       F.col("v").alias("va")), "vec_a")
        .join(e.select(F.col("vec_id").alias("vec_b"),
                       F.col("v").alias("vb")), "vec_b")
        .where(raw >= threshold)
        .select("vec_a", "vec_b", F.round(raw, 6).alias("cos"))
    )
