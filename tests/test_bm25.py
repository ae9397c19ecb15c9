"""Rational-idf BM25 (index.bm25_topk): exact parity with an independent
pure-Python computation of the pinned formula, ranking sanity, k/limit and
argument validation."""

from __future__ import annotations

import pytest

from remilia_spark.datapipe import index

K1, B = 1.2, 0.75


def _py_bm25(rows, query_terms, k1=K1, b=B):
    """Independent reimplementation (pure Python, same arithmetic)."""
    toks = {d: (t.split() if t.strip() else []) for d, t in rows}
    toks = {d: [w.lower() for w in ws] for d, ws in toks.items()}
    n = len(toks)
    avg = sum(len(ws) for ws in toks.values()) / n
    out = {}
    for d, ws in toks.items():
        score, hits = 0.0, 0
        for t in query_terms:
            tf = sum(1 for w in ws if w == t.lower())
            if tf == 0:
                score = score + 0.0
                continue
            df = sum(1 for ws2 in toks.values() if t.lower() in ws2)
            idf = (n - df + 0.5) / (df + 0.5)
            score = score + idf * (tf * (k1 + 1)) \
                / (tf + k1 * (1 - b + b * (len(ws) / avg)))
            hits += 1
        if hits:
            out[d] = (round(score, 6), hits)
    return out


ROWS = [
    (0, "spark shuffle join join join"),
    (1, "spark spark filter"),
    (2, "window sort merge"),
    (3, "join"),
    (4, "the quick brown fox"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_matches_independent_python(docs):
    q = ["join", "spark"]
    got = {r["doc_id"]: (r["score"], r["n_terms_hit"])
           for r in index.bm25_topk(docs, q, k=10).collect()}
    assert got == _py_bm25(ROWS, q)


def test_ranking_sanity(docs):
    got = [r["doc_id"] for r in
           index.bm25_topk(docs, ["join", "spark"], k=10).collect()]
    # doc 0 hits both terms (3x join) -> top; docs 4,5 hit nothing -> absent
    assert got[0] == 0
    assert set(got) == {0, 1, 3}


def test_k_limits_and_ties(docs):
    got = index.bm25_topk(docs, ["join", "spark"], k=2).collect()
    assert len(got) == 2
    full = index.bm25_topk(docs, ["join", "spark"], k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in full[:2]]


def test_case_insensitive_query(docs):
    a = index.bm25_topk(docs, ["JOIN"], k=10).collect()
    b = index.bm25_topk(docs, ["join"], k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bad_args(docs, spark):
    with pytest.raises(ValueError):
        index.bm25_topk(docs, [])
    with pytest.raises(ValueError):
        index.bm25_topk(docs, ["a", "a"])
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError):
        index.bm25_topk(empty, ["a"])
