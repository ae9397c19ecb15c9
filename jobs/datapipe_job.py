"""spark-submit entry point for the training-data pipeline.

The datapipe twin of ``jobs/crawl_job.py``: one CLI that composes the
cleaning/curation operators over a documents table (the output of a
crawl, a WARC ingest, or any parquet with ``doc_id, text, lang``) in the
canonical order a pre-training corpus build runs them:

    exact dedup -> near-dup clusters (opt) -> boilerplate-line removal
    (opt) -> PII redaction (opt) -> Gopher quality filter -> test-set
    decontamination (opt) -> stratified language mixing (opt) -> token-
    budget shard packing (opt)

Text-rewriting stages run BEFORE the quality filter so the keep/drop
decision sees the text that will actually ship.  Every stage is the same
operator its standalone ``__spark_entry__`` query pins against DuckDB —
this job adds composition and I/O, no new semantics.

Cluster usage:

    python jobs/package.py
    spark-submit --py-files dist/remilia_spark.zip jobs/datapipe_job.py \\
        --docs s3://bucket/documents/ --out s3://bucket/clean/ \\
        --redact-pii --lang-fractions en=1.0,de=0.5 --shard-tokens 2048

Local sandbox smoke:

    python jobs/datapipe_job.py --docs /root/testdata/sf0.001/documents.parquet \\
        --out /tmp/clean --master 'local[4]' --redact-pii --shard-tokens 500
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

try:  # local runs: put the repo root on sys.path; clusters use --py-files
    import remilia_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv):
    p = argparse.ArgumentParser(description="remilia-spark datapipe job")
    p.add_argument("--docs", required=True,
                   help="input parquet (doc_id, text, lang)")
    p.add_argument("--out", required=True, help="output parquet dir")
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--skip-exact-dedup", action="store_true")
    p.add_argument("--near-dedup", action="store_true",
                   help="MinHash-LSH near-dup clustering; keeps the min "
                        "doc_id of each cluster")
    p.add_argument("--boilerplate-min-df", type=int, default=0,
                   help="drop normalized lines recurring in >= N docs "
                        "(0 = stage off)")
    p.add_argument("--redact-pii", action="store_true",
                   help="replace e-mails/IPv4s/phones with fixed tokens")
    p.add_argument("--no-quality-filter", action="store_true",
                   help="skip the Gopher keep/drop filter")
    p.add_argument("--benchmark", default=None,
                   help="benchmark parquet (text) to decontaminate against")
    p.add_argument("--contam-ngram", type=int, default=13)
    p.add_argument("--lang-fractions", default=None,
                   help="per-lang keep fractions, e.g. en=1.0,de=0.5 "
                        "(absent langs use --default-fraction)")
    p.add_argument("--default-fraction", type=float, default=0.0)
    p.add_argument("--sample-seed", type=int, default=42)
    p.add_argument("--shard-tokens", type=int, default=0,
                   help="pack surviving docs into shards of ~N tokens "
                        "(0 = stage off)")
    return p.parse_args(argv)


def run_pipeline(spark, docs, args, stats: list) -> "DataFrame":  # noqa: F821
    """Compose the stages over ``docs``; append one stats dict per stage."""
    from pyspark.sql import functions as F

    from remilia_spark.datapipe import dedup, graph, pii, sampling, textstats

    def stage(name, df_in, df_out):
        n_in, n_out = df_in.count(), df_out.count()
        stats.append({"stage": name, "rows_in": n_in, "rows_out": n_out})
        return df_out

    docs = docs.select("doc_id", "text", "lang")

    if not args.skip_exact_dedup:
        canon = dedup.exact_duplicates(docs).where("is_canonical") \
                                            .select("doc_id")
        docs = stage("exact_dedup", docs, docs.join(canon, "doc_id"))

    if args.near_dedup:
        pairs = dedup.minhash_near_duplicates(docs)
        comp = graph.connected_components(pairs, a="doc_a", b="doc_b")
        # every clustered doc except its component representative drops;
        # docs in no pair never enter `comp` and survive via the anti-join
        losers = comp.where(F.col("node") != F.col("component")) \
                     .select(F.col("node").alias("doc_id"))
        docs = stage("near_dedup", docs,
                     docs.join(losers, "doc_id", "left_anti"))

    if args.boilerplate_min_df > 0:
        cleaned = dedup.remove_boilerplate_lines(
            docs, min_doc_freq=args.boilerplate_min_df) \
            .select("doc_id", F.col("clean_text").alias("text"))
        docs = stage("boilerplate", docs,
                     docs.drop("text").join(cleaned, "doc_id"))

    if args.redact_pii:
        red = pii.redact_pii(docs).select(
            "doc_id", F.col("clean_text").alias("text"))
        docs = stage("redact_pii", docs,
                     docs.drop("text").join(red, "doc_id"))

    if not args.no_quality_filter:
        keep = textstats.gopher_quality_filter(docs).where("keep") \
                                                    .select("doc_id")
        docs = stage("quality_filter", docs, docs.join(keep, "doc_id"))

    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        clean = dedup.benchmark_contamination(
            docs, bench, n=args.contam_ngram) \
            .where(~F.col("contaminated")).select("doc_id")
        docs = stage("decontaminate", docs, docs.join(clean, "doc_id"))

    if args.lang_fractions:
        fr = {k: float(v) for k, v in
              (kv.split("=") for kv in args.lang_fractions.split(","))}
        docs = stage("stratified_sample", docs, sampling.stratified_sample(
            docs, fr, seed=args.sample_seed,
            default_fraction=args.default_fraction))

    if args.shard_tokens > 0:
        packed = sampling.pack_token_shards(
            docs, target_tokens=args.shard_tokens)
        docs = stage("shard_packing", docs,
                     docs.join(packed.select("doc_id", "n_tokens", "shard"),
                               "doc_id"))
    return docs


def main(argv=None) -> int:
    args = parse_args(argv)
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("remilia-spark-datapipe")
    if args.master:
        b = b.master(args.master)
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    b = b.config("spark.sql.adaptive.enabled", "true") \
         .config("spark.sql.session.timeZone", "UTC")
    spark = b.getOrCreate()

    stats: list = []
    out = run_pipeline(spark, spark.read.parquet(args.docs), args, stats)
    out.write.mode("overwrite").parquet(args.out)
    n_final = spark.read.parquet(args.out).count()
    for s in stats:
        print(json.dumps(s))
    print(json.dumps({"done": True, "rows_written": n_final,
                      "out": args.out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
