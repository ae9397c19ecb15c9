"""datapipe operators: dedup, similarity, text stats, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from remilia_spark.datapipe import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
        (2, "the quick brown fox jumps over the lazy dog", "en", "web", 44),  # exact dup of 1
        (3, "the quick brown fox jumps over a lazy dog", "en", "web", 42),    # near dup
        (4, "completely different text with no overlap at all here", "en", "web", 54),
        (5, "", "en", "web", 0),
        (6, "uno dos tres cuatro cinco seis siete", "es", "web", 37),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_exact_duplicates(docs):
    out = {r["doc_id"]: (r["group_size"], r["is_canonical"])
           for r in dedup.exact_duplicates(docs).collect()}
    assert out[1] == (2, True)
    assert out[2] == (2, False)
    assert out[3][0] == 1 and out[3][1]


def test_minhash_near_duplicates(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.minhash_near_duplicates(
                 docs, num_perm=16, bands=8, threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0
    assert all(4 not in p for p in pairs)


def test_simhash_similarity(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[1] == sh[2]  # identical text, identical fingerprint
    ham_close = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_close < ham_far
    assert sh[5] == 0  # empty text


def test_token_count_and_quality(docs):
    tc = {r["doc_id"]: r["n_tokens"]
          for r in textstats.token_count(docs).collect()}
    assert tc[1] == 9 and tc[5] == 0
    q = {r["doc_id"]: r for r in textstats.quality_score(docs).collect()}
    assert q[5]["quality"] == pytest.approx(0.3)  # only the punct term
    assert 0 < q[1]["quality"] <= 1.0
    assert q[1]["stopword_ratio"] == pytest.approx(round(2 / 9, 6))  # 'the' x2


def test_lang_id(docs):
    out = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(docs).collect()}
    assert out[1] == "en"
    assert out[6] == "unknown"


def test_fingerprint_deterministic(docs):
    a = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(docs).collect()}
    b = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(docs).collect()}
    assert a == b and a[1] == a[2] and a[1] != a[3]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.standard_normal((20, 8)).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.standard_normal(8).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]], i % 3) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk(vectors):
    out = similarity.cosine_topk(vectors, vectors.where(F.col("vec_id") < 3), k=3)
    rows = out.collect()
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in rows}
    assert got[(0, 1)] == 1  # the planted near-duplicate is rank 1
    assert got[(1, 1)] == 0
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())


def test_lsh_topk_recall(vectors):
    exact = similarity.cosine_topk(vectors, vectors.where(F.col("vec_id") < 3), k=3)
    approx = similarity.lsh_topk(vectors, vectors.where(F.col("vec_id") < 3),
                                 dim=8, k=3, planes=4)
    # the planted duplicate collides in any reasonable bucketing
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in approx.collect()}
    assert got.get((0, 1)) == 1
    assert exact.count() == 9


def test_embedding_near_duplicates(vectors):
    out = similarity.embedding_near_duplicates(vectors, dim=8, threshold=0.99,
                                               planes=4)
    pairs = {(r["vec_a"], r["vec_b"]) for r in out.collect()}
    assert (0, 1) in pairs


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes(range(256)) * 4, 64, 48, None),
        (2, "image", b"", 0, 0, None),
        (3, "video", bytes(range(100)), 320, 240, 3500),
        (4, "audio", None, None, None, 2000),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_multimodal_features(media):
    out = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert len(out[1]["feature"]) == 8
    assert out[1]["n_bytes"] == 1024
    assert out[2]["feature"] == [0.0] * 8
    assert out[4]["n_bytes"] == 0
    # determinism
    again = {r["media_id"]: r["feature"]
             for r in multimodal.extract_features(media).collect()}
    assert again[1] == out[1]["feature"]


def test_multimodal_thumbnail_and_frames(media):
    th = {r["media_id"]: r for r in multimodal.thumbnail(media, max_side=8).collect()}
    assert len(th[1]["thumb"]) == 64 and th[1]["thumb_w"] == 8
    fr = multimodal.frame_sample(media, every_ms=1000).collect()
    assert {r["frame_ms"] for r in fr} == {0, 1000, 2000, 3000}
    assert all(len(r["frame_feature"]) == 8 for r in fr)


def test_real_decode_is_explicit_stub(media):
    with pytest.raises(Exception, match="NotImplementedError|Pillow|decode"):
        multimodal.extract_features(media, decode_stub=False).collect()
