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
    return (
        df.select("doc_id",
                  F.explode(tokens_col(F.lower(F.col(text_col))))
                  .alias("term"))
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
