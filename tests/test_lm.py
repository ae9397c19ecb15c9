"""CCNet-style bigram-LM scoring/bucketing (datapipe.lm).

Hand-computed model counts and per-doc scores on a crafted corpus, the
empty/one-token edge, and the exact percentile bucket split.
"""

from __future__ import annotations

import pytest

from remilia_spark.datapipe import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def model_and_docs(spark):
    # reference slice (lang=en): "a b a b", "a c", "", "solo", "a b"
    #   uni: a->4, b->3, c->1, solo->1      V = 4
    #   bi:  (a,b)->3, (b,a)->1, (a,c)->1   (doc 2 is fr: not trained on)
    rows = [
        (0, "A b a B", "en"),
        (1, "a c", "en"),
        (2, "b a", "fr"),        # non-reference: scored, not trained on
        (3, "", "en"),           # empty doc
        (4, "solo", "en"),       # one token -> no bigrams
        (5, "a b", "en"),
    ]
    docs = _docs(spark, rows)
    model = lm.train_bigram_lm(docs.where("lang = 'en'"))
    return model, docs


def test_model_counts(model_and_docs):
    model, _ = model_and_docs
    assert model.vocab_size == 4  # a, b, c, solo
    uni = {r["w"]: r["c1"] for r in model.uni.collect()}
    assert uni == {"a": 4, "b": 3, "c": 1, "solo": 1}
    bi = {(r["w1"], r["w2"]): r["c2"] for r in model.bi.collect()}
    assert bi == {("a", "b"): 3, ("b", "a"): 1, ("a", "c"): 1}


def test_scores_by_hand(model_and_docs):
    model, docs = model_and_docs
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score"])
           for r in lm.lm_likelihood(docs, model).collect()}
    V = 4
    p_ab = (3 + 1) / (4 + V)   # 0.5
    p_ba = (1 + 1) / (3 + V)   # 2/7
    p_ac = (1 + 1) / (4 + V)   # 0.25
    assert got[0] == (3, round((p_ab + p_ba + p_ab) / 3, 6))
    assert got[1] == (1, round(p_ac, 6))
    assert got[2] == (1, round(p_ba, 6))   # fr doc scored against en model
    assert got[3] == (0, 0.0)
    assert got[4] == (0, 0.0)
    assert got[5] == (1, round(p_ab, 6))


def test_oov_smoothing(spark, model_and_docs):
    model, _ = model_and_docs
    out = lm.lm_likelihood(
        _docs(spark, [(9, "zz qq", "en")]), model).collect()[0]
    # both gram and context unseen: p = (0+1)/(0+V)
    assert out["lm_score"] == round(1 / 4, 6)


def test_buckets_exact_thirds(spark, model_and_docs):
    model, docs = model_and_docs
    scored = lm.lm_likelihood(docs, model)
    out = {r["doc_id"]: (r["lm_rank"], r["bucket"])
           for r in lm.lm_quality_buckets(scored).collect()}
    # ascending (lm_score, doc_id):
    #   3,4 (0.0) | 1 (.25) | 2 (2/7) | 0 (3/7) | 5 (.5)
    assert [out[i][0] for i in (3, 4, 1, 2, 0, 5)] == [0, 1, 2, 3, 4, 5]
    # 6 docs, 3 buckets: idx = rank*3 div 6 -> 0,0,1,1,2,2
    assert [out[i][1] for i in (3, 4, 1, 2, 0, 5)] == \
        ["tail", "tail", "middle", "middle", "head", "head"]


def test_bucket_partitioning_invariance(spark, model_and_docs):
    model, docs = model_and_docs
    scored = lm.lm_likelihood(docs, model)
    a = sorted((r["doc_id"], r["lm_rank"], r["bucket"]) for r in
               lm.lm_quality_buckets(scored, num_partitions=2).collect())
    b = sorted((r["doc_id"], r["lm_rank"], r["bucket"]) for r in
               lm.lm_quality_buckets(scored.repartition(7),
                                     num_partitions=5).collect())
    assert a == b


def test_empty_corpus(spark, model_and_docs):
    model, docs = model_and_docs
    empty = lm.lm_likelihood(docs.where("doc_id < 0"), model)
    assert lm.lm_quality_buckets(empty).count() == 0
