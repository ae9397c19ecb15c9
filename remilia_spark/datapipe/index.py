"""Inverted-index construction over the crawled corpus.

The downstream consumer of a web crawl is as often a search index as an
LLM corpus; this module builds the two index artifacts Spark-first:

* ``term_stats`` — per-term document frequency + total term frequency:
  two map-side-combinable aggregations, scalar output, safe at any scale.
* ``posting_blocks`` — the posting lists themselves, **block-partitioned
  by doc-id range** (Lucene-segment style): a term's postings for block
  ``b`` cover doc_ids ``[b*block_docs, (b+1)*block_docs)``.  A naive
  ``collect_list`` per term puts a stopword's entire corpus-wide posting
  list (10^10 entries) into ONE aggregation buffer; blocking bounds every
  buffer at ``block_docs`` regardless of term skew, and queries still
  stream a term's blocks in doc_id order (block asc, postings sorted
  within).

Postings serialize as ``"doc:tf,doc:tf,…"`` (doc_id ascending) — a stable
string both engines produce identically, and the wire format a posting
decoder consumes; at deployment scale swap the string for the same
struct array written to parquet (the string form exists for value-hash
oracles and human eyes).

Reference parity: ShroXd/remilia has no index stage (crawl output goes to
user callbacks, `pipeline.go`); this is downstream-consumer surface the
graft adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remilia_spark.datapipe.textstats import tokens_col


def _term_doc_tf(df: DataFrame, text_col: str) -> DataFrame:
    """(term, doc_id, tf) — one row per distinct term per document."""
    # explode_outer + null filter: a plain explode of the (expensive)
    # token expression triggers InferFiltersFromGenerate, whose pushed-down
    # size() predicate re-evaluates the tokenization per row (see
    # dedup._explode_once); split elements are never null, so this is
    # row-for-row identical
    return (
        df.select("doc_id",
                  F.explode_outer(tokens_col(F.lower(F.col(text_col))))
                  .alias("term"))
        .where(F.col("term").isNotNull())
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def term_stats(df: DataFrame, text_col: str = "text",
               min_df: int = 1) -> DataFrame:
    """(term, df, total_tf) — document frequency and corpus term count."""
    return (
        _term_doc_tf(df, text_col)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"),
             F.sum("tf").cast("long").alias("total_tf"))
        .where(F.col("df") >= min_df)
    )


def posting_blocks(df: DataFrame, text_col: str = "text",
                   block_docs: int = 1 << 20) -> DataFrame:
    """(term, block, block_df, postings) — doc-id-range-sharded postings.

    ``postings`` = "doc:tf,…" ascending by doc_id within the block.  The
    groupBy key is (term, block), so the largest aggregation buffer is
    ``block_docs`` entries even for a term present in every document.
    """
    if block_docs < 1:
        raise ValueError("block_docs must be >= 1")
    tdf = _term_doc_tf(df, text_col).withColumn(
        "block", F.expr(f"doc_id div {int(block_docs)}").cast("long"))
    return (
        tdf.groupBy("term", "block")
        .agg(F.count("*").cast("long").alias("block_df"),
             F.array_sort(F.collect_list(F.struct("doc_id", "tf")))
             .alias("_ps"))
        .select(
            "term", "block", "block_df",
            F.array_join(
                F.transform(
                    "_ps",
                    lambda x: F.concat(x["doc_id"].cast("string"),
                                       F.lit(":"),
                                       x["tf"].cast("string"))), ",")
            .alias("postings"))
    )


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              text_col: str = "text", k1: float = 1.2,
              b: float = 0.75) -> DataFrame:
    """Top-k documents for ``query_terms`` under rational-idf BM25.

    Classic BM25 with one pinned substitution: ``idf_r(t) =
    (N - df + 0.5) / (df + 0.5)`` instead of its logarithm.  Per query
    term the transform is monotone (identical per-term ranking); across
    terms it weighs rare terms more steeply than log-idf — pinned and
    documented because ``ln`` is not correctly-rounded identically across
    engines and exact rational arithmetic is what makes the DuckDB oracle
    (and cross-cluster determinism) bit-exact.  Drop-in log-idf needs one
    line and costs only oracle exactness.

    score(d) = Σ_t idf_r(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avg))

    The per-document sum is computed as one conditional-aggregate column
    PER QUERY TERM added in pinned term order — never a groupBy over
    float rows — so the double is identical on any partitioning.  Plan:
    the term-document tf table is filtered to the query terms FIRST (a
    broadcast isin over 10^10 rows), df/N/avg_len are three scalar
    aggregates, and the top-k is a single orderBy-limit (Spark's
    TakeOrdered, no full sort).

    Output: (doc_id, score, n_terms_hit), score rounded 6dp,
    ties broken by doc_id.
    """
    if not query_terms or len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be non-empty and distinct")
    toks = df.select(
        "doc_id", tokens_col(F.lower(F.col(text_col))).alias("t"))
    lens = toks.select("doc_id", F.size("t").cast("long").alias("dl"))
    n_docs, sum_len = lens.agg(
        F.count("*"), F.sum("dl")).first()
    if n_docs == 0:
        raise ValueError("empty corpus")
    avg_len = sum_len / n_docs  # exact: integer sum / integer count
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .where(F.col("term").isin([t.lower() for t in query_terms]))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    dfreq = {r["term"]: r["n"] for r in
             tf.groupBy("term").agg(F.count("*").alias("n")).collect()}
    scored = tf.join(lens, "doc_id")
    parts = []
    for t in query_terms:  # pinned order: the sum is t1 + t2 + ... exactly
        t = t.lower()
        dfr = dfreq.get(t, 0)
        idf = (n_docs - dfr + 0.5) / (dfr + 0.5)
        contrib = (F.lit(idf)
                   * (F.col("tf") * (k1 + 1))
                   / (F.col("tf")
                      + k1 * (1 - b + b * (F.col("dl") / F.lit(avg_len)))))
        parts.append(F.sum(F.when(F.col("term") == t, contrib)
                           .otherwise(F.lit(0.0))))
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    out = (scored.groupBy("doc_id")
           .agg(F.round(score, 6).alias("score"),
                F.count("*").cast("long").alias("n_terms_hit")))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
