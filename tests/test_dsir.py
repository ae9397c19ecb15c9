"""DSIR hashed-bigram importance weighting (datapipe.dsir).

Pins the fixed-point scoring kernel against an independent pure-Python
reimplementation (same md5 60-bit hash), and the selection cut's
determinism/monotonicity properties.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from remilia_spark.datapipe.dsir import (
    SCALE, dsir_scores, dsir_select, train_dsir,
)

RAW = [
    (0, "the cat sat on the mat"),
    (1, "def main ( args ) : return 0"),
    (2, "the dog sat on the log"),
    (3, "import os import sys import re"),
    (4, "one"),                      # < 2 tokens: scores 0
    (5, ""),                         # empty: scores 0
    (6, "the cat sat on the mat"),   # exact dup of 0: identical score
]
TARGET = [
    (100, "def f ( x ) : return x"),
    (101, "import json import os"),
]


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_scores(raw, target, n_buckets):
    """Independent reimplementation of the pinned kernel."""
    def bigrams(text):
        t = text.lower().split()
        return [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket_counts(docs):
        c = {}
        for _, text in docs:
            for g in bigrams(text):
                b = _hash60(g) % n_buckets
                c[b] = c.get(b, 0) + 1
        return c

    ct, cr = bucket_counts(target), bucket_counts(raw)
    out = {}
    for doc_id, text in raw:
        bs = [_hash60(g) % n_buckets for g in bigrams(text)]
        if not bs:
            out[doc_id] = (0, 0)
            continue
        s = sum((ct.get(b, 0) + 1) * SCALE // (cr.get(b, 0) + 1)
                for b in bs)
        out[doc_id] = (len(bs), s // len(bs))
    return out


@pytest.mark.parametrize("n_buckets", [64, 4096])
def test_scores_match_python_twin(spark, n_buckets):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    model = train_dsir(raw, tgt, n_buckets=n_buckets)
    got = {r.doc_id: (r.n_bigrams, r.dsir_fp)
           for r in dsir_scores(raw, model).collect()}
    assert got == _py_scores(RAW, TARGET, n_buckets)


def test_target_like_docs_score_higher(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    model = train_dsir(raw, tgt, n_buckets=4096)
    got = {r.doc_id: r.dsir_fp for r in dsir_scores(raw, model).collect()}
    # code-like docs (1, 3) share bigrams with the code target; prose
    # docs (0, 2) share none
    assert min(got[1], got[3]) > max(got[0], got[2])
    # exact-duplicate docs score identically; short docs score 0
    assert got[6] == got[0]
    assert got[4] == got[5] == 0


def test_scores_partitioning_invariant(spark):
    raw1 = spark.createDataFrame(RAW, "doc_id long, text string") \
        .repartition(1)
    raw8 = spark.createDataFrame(RAW, "doc_id long, text string") \
        .repartition(8)
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    m1 = train_dsir(raw1, tgt, n_buckets=256)
    m8 = train_dsir(raw8, tgt, n_buckets=256)
    s1 = sorted(dsir_scores(raw1, m1).collect())
    s8 = sorted(dsir_scores(raw8, m8).collect())
    assert s1 == s8


def test_select_top_fraction(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    cleanup = []
    scored = dsir_scores(raw, train_dsir(raw, tgt, n_buckets=4096))
    sel = dsir_select(scored, fraction=0.3, cleanup=cleanup)
    rows = {r.doc_id: (r.dsir_fp, r.dsir_rank, r.keep)
            for r in sel.collect()}
    for df in cleanup:
        df.unpersist()
    kept = {d for d, (_, _, k) in rows.items() if k}
    # floor(7 * 0.3) = 2 kept, and they are the two top scores
    assert len(kept) == 2
    top2 = sorted(rows, key=lambda d: (rows[d][0], d))[-2:]
    assert kept == set(top2)
    # ranks are a permutation of 0..n-1 (exact, no duplicates)
    assert sorted(r for _, r, _ in rows.values()) == list(range(len(RAW)))


def test_validation(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    with pytest.raises(ValueError):
        train_dsir(raw, tgt, n_buckets=0)
    scored = dsir_scores(raw, train_dsir(raw, tgt))
    with pytest.raises(ValueError):
        dsir_select(scored, fraction=1.5)
