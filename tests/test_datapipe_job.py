"""End-to-end datapipe job (jobs/datapipe_job.py): the composed cleaning
pipeline over a crafted corpus where every stage provably bites, with
stage row-counts checked against independently-computed expectations."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from jobs.datapipe_job import parse_args, run_pipeline
from remilia_spark.datapipe import pii

# One UNIQUE paragraph (no repeated sentences — Gopher's dup-5-gram and
# top-n-gram repetition rules would drop a `sentence * 3` fixture) that is
# long enough, stopword-rich, and punctuation-light, so clean docs pass
# every GOPHER_FILTER_RULES threshold.
PROSE = ("the quick brown fox jumps over the lazy dog while a careful "
         "reader follows along and notes that this paragraph was written "
         "to be long enough for the gopher filter with plenty of common "
         "stopwords spread through it and without any repeated sentences "
         "because the repetition rules would otherwise reject it so we "
         "keep adding fresh words about rivers and mountains and the "
         "weather in distant towns where people tell stories about their "
         "gardens and the seasons that pass over them each year . ")


def _docs(spark):
    rows = [
        # 0/1: exact duplicates (1 drops)
        (0, PROSE + "alpha variant one", "en"),
        (1, PROSE + "alpha variant one", "en"),
        # 2: unique clean doc
        (2, PROSE + "beta variant two", "en"),
        # 3: PII carrier
        (3, PROSE + "write to jo@example.test or call +1-555-010-7788",
         "en"),
        # 4: quality-filter bait — too short, no stopwords
        (4, "zz yy xx", "en"),
        # 5: German doc — sampled out by lang fraction 0.0
        (5, PROSE + "gamma variante drei", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pipeline_stages_and_output(spark):
    args = parse_args([
        "--docs", "unused", "--out", "unused",
        "--redact-pii",
        "--lang-fractions", "en=1.0",  # de falls to default-fraction 0.0
        "--shard-tokens", "120",
    ])
    stats: list = []
    out = run_pipeline(spark, _docs(spark), args, stats).cache()
    rows = {r["doc_id"]: r for r in out.collect()}

    by_stage = {s["stage"]: s for s in stats}
    assert by_stage["exact_dedup"]["rows_in"] == 6
    assert by_stage["exact_dedup"]["rows_out"] == 5      # doc 1 dropped
    assert by_stage["redact_pii"]["rows_out"] == 5       # rewrite, no drop
    assert by_stage["quality_filter"]["rows_out"] == 4   # doc 4 dropped
    assert by_stage["stratified_sample"]["rows_out"] == 3  # doc 5 dropped
    assert by_stage["shard_packing"]["rows_out"] == 3

    assert set(rows) == {0, 2, 3}
    # PII is gone from the surviving text, tokens in its place
    assert pii.EMAIL_TOKEN in rows[3]["text"]
    assert pii.PHONE_TOKEN in rows[3]["text"]
    assert "jo@example.test" not in rows[3]["text"]
    assert not re.search(pii.EMAIL_RE, rows[3]["text"])
    # shard packing annotated every survivor with exact token counts
    for r in rows.values():
        assert r["n_tokens"] == len(r["text"].split())
        assert r["shard"] >= 0
    # docs pack in doc_id order at ~120 tokens/shard: doc 0 fills shard 0
    assert rows[0]["shard"] == 0
    assert rows[2]["shard"] >= rows[0]["shard"]


def test_near_dedup_stage_keeps_cluster_representative(spark):
    base = PROSE + "delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + (" tail" if i == 11 else ""), "en")
            for i in (10, 11)]          # near-identical pair, not exact
    # doc 12 shares NO shingles with the pair (PROSE would put its
    # jaccard vs 10/11 near 0.8 and wrongly join the cluster)
    rows.append((12, "a completely different closing paragraph about "
                 "oceans mountains rivers forests deserts plains and "
                 "glaciers carving valleys over millennia", "en"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    args = parse_args([
        "--docs", "u", "--out", "u",
        "--near-dedup", "--no-quality-filter",
    ])
    stats: list = []
    out = run_pipeline(spark, docs, args, stats)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == {10, 12}             # 11 lost to its cluster's min

    by_stage = {s["stage"]: s for s in stats}
    assert by_stage["near_dedup"]["rows_in"] == 3
    assert by_stage["near_dedup"]["rows_out"] == 2


def test_decontaminate_stage(spark, tmp_path):
    bench_text = ("which of the following best describes the boiling "
                  "point of water at sea level in celsius degrees")
    docs = spark.createDataFrame(
        [(0, PROSE + "innocent training text", "en"),
         (1, PROSE + bench_text, "en")],
        "doc_id long, text string, lang string")
    bench_dir = str(tmp_path / "bench.parquet")
    spark.createDataFrame([(bench_text,)], "text string") \
         .write.parquet(bench_dir)
    args = parse_args([
        "--docs", "u", "--out", "u",
        "--benchmark", bench_dir, "--no-quality-filter",
    ])
    stats: list = []
    out = run_pipeline(spark, docs, args, stats)
    assert {r["doc_id"] for r in out.collect()} == {0}
