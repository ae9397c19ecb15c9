"""Corpus mixing: deterministic stratified sampling + token-shard packing.

Pins the two properties the module exists for: decisions are pure functions
of the data (partitioning/cluster-size invariant), and the distributed
prefix sum equals the single-window global cumsum exactly.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from remilia_spark.datapipe import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    langs = ["en", "en", "en", "de", "es", "fr", "zh"]
    for i in range(350):
        words = ["w%d" % ((i * 7 + j) % 23) for j in range(1 + i % 17)]
        rows.append((i, " ".join(words), langs[i % len(langs)], "src", 0))
    rows.append((350, "", "en", "src", 0))  # empty doc: 0 tokens
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")


def _py_keep(doc_id: int, seed: int, frac: float) -> bool:
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8]
    return int(h, 16) < int(frac * (1 << 32))


def test_stratified_sample_matches_reference_decision(docs):
    fr = {"en": 0.5, "de": 0.25, "zh": 1.0}
    kept = sampling.stratified_sample(docs, fr, seed=7)
    got = {(r["doc_id"], r["lang"]) for r in kept.select("doc_id",
                                                         "lang").collect()}
    want = set()
    for r in docs.select("doc_id", "lang").collect():
        f = fr.get(r["lang"], 0.0)
        if f >= 1.0 or (f > 0 and _py_keep(r["doc_id"], 7, f)):
            want.add((r["doc_id"], r["lang"]))
    assert got == want
    # zh is fraction 1.0: every zh row survives
    n_zh = docs.where(F.col("lang") == "zh").count()
    assert sum(1 for _, l in got if l == "zh") == n_zh
    # es/fr absent from the dict: default fraction 0 drops them all
    assert not any(l in ("es", "fr") for _, l in got)


def test_stratified_sample_monotone_in_fraction(docs):
    """Raising a stratum's fraction only ADDS rows (hash thresholds nest) —
    mixture re-tuning is incremental, never a reshuffle of the sample."""
    lo = {r["doc_id"] for r in sampling.stratified_sample(
        docs, {"en": 0.3}, seed=42).select("doc_id").collect()}
    hi = {r["doc_id"] for r in sampling.stratified_sample(
        docs, {"en": 0.6}, seed=42).select("doc_id").collect()}
    assert lo <= hi
    assert len(hi) > len(lo)


def test_stratified_sample_partitioning_invariant(docs):
    a = sampling.stratified_sample(docs, {"en": 0.4, "de": 0.8}, seed=3)
    b = sampling.stratified_sample(
        docs.repartition(13, "text"), {"en": 0.4, "de": 0.8}, seed=3)
    assert sorted(r["doc_id"] for r in a.collect()) == \
        sorted(r["doc_id"] for r in b.collect())


def test_pack_token_shards_equals_global_window(docs):
    got = sampling.pack_token_shards(docs, target_tokens=50, n_buckets=7)
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    from remilia_spark.datapipe.textstats import token_count

    want = (token_count(docs)
            .withColumn("_start",
                        (F.sum("n_tokens").over(w)
                         - F.col("n_tokens")).cast("long"))
            .withColumn("shard", F.expr("_start div 50"))
            .select("doc_id", "n_tokens", "shard"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_pack_token_shards_bucket_count_invariant(docs):
    outs = [sorted(map(tuple,
                       sampling.pack_token_shards(
                           docs, 64, n_buckets=b).collect()))
            for b in (1, 4, 256)]
    assert outs[0] == outs[1] == outs[2]


def test_pack_token_shards_sequential_and_bounded(docs):
    target = 40
    rows = sorted(map(tuple, sampling.pack_token_shards(
        docs, target).collect()))
    # shard ids are non-decreasing in doc order and start at 0
    shards = [s for _, _, s in rows]
    assert shards[0] == 0
    assert all(a <= b for a, b in zip(shards, shards[1:]))
    # each shard's token mass stays under target + its largest document
    # (greedy packing never splits a document)
    from collections import defaultdict
    mass, biggest = defaultdict(int), defaultdict(int)
    for _, n, s in rows:
        mass[s] += n
        biggest[s] = max(biggest[s], n)
    for s in mass:
        assert mass[s] <= target + biggest[s]


def test_pack_token_shards_empty_input(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long")
    assert sampling.pack_token_shards(empty, 100).count() == 0


def test_pack_token_shards_null_text(spark):
    """NULL text occupies zero budget and never yields a NULL shard."""
    bad = spark.createDataFrame(
        [(0, None, None, "s", 0), (7, "a b c", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    rows = sorted(map(tuple,
                      sampling.pack_token_shards(bad, 100).collect()))
    assert rows == [(0, 0, 0), (7, 3, 0)]
