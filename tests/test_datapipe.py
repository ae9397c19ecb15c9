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


# --- block-level exact-substring dedup -------------------------------------

def test_remove_duplicate_blocks_drops_repeated_passages(spark):
    # doc 2 repeats doc 1's first 8 tokens verbatim, then adds fresh text
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, shared + " iota kappa"), (2, shared + " unique tail here"),
            (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in dedup.remove_duplicate_blocks(docs, block_tokens=8)
           .collect()}
    # doc 1 is first in global (doc_id, block_idx) order: keeps everything
    assert out[1]["n_blocks"] == out[1]["n_kept"] == 2
    assert out[1]["text_kept"] == shared + " iota kappa"
    # doc 2 loses the shared 8-token block, keeps its fresh remainder
    assert out[2]["n_blocks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_kept"] == "unique tail here"
    # empty doc passes through, not dropped
    assert out[3]["n_blocks"] == 0 and out[3]["text_kept"] == ""


def test_sliding_block_dedup_catches_unaligned_passage(spark):
    """A passage duplicated at a NON-block offset: the disjoint-block impl
    misses it (different block grids), the sliding-window impl drops the
    later copy's covering blocks."""
    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, passage + " iota kappa"),
        # 3 fresh tokens shift the copied passage to offset 3 — it now
        # straddles two 8-token blocks in doc 2
        (2, "pad1 pad2 pad3 " + passage + " tail1 tail2 tail3 tail4 tail5"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # baseline: the disjoint impl misses the unaligned duplicate entirely
    base = {r["doc_id"]: r for r in dedup.remove_duplicate_blocks(
        docs, block_tokens=8).collect()}
    assert base[2]["n_kept"] == base[2]["n_blocks"] == 2  # the gap, pinned
    # sliding windows catch it: doc 2's copied run covers both its blocks
    out = {r["doc_id"]: r for r in dedup.remove_duplicate_blocks_sliding(
        docs, block_tokens=8).collect()}
    assert out[1]["n_blocks"] == out[1]["n_kept"] == 2  # first copy intact
    assert out[1]["text_kept"] == passage + " iota kappa"
    assert out[2]["n_blocks"] == 2 and out[2]["n_kept"] == 0
    assert out[2]["text_kept"] == ""
    assert out[3]["n_blocks"] == 0 and out[3]["text_kept"] == ""


def test_sliding_block_dedup_unique_corpus_is_identity(spark):
    rows = [(i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h u{i}i")
            for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for r in dedup.remove_duplicate_blocks_sliding(
            docs, block_tokens=4).collect():
        assert r["n_kept"] == r["n_blocks"] > 0


def test_remove_duplicate_blocks_unique_corpus_is_identity(spark):
    rows = [(i, f"doc{i}a doc{i}b doc{i}c doc{i}d doc{i}e doc{i}f "
                f"doc{i}g doc{i}h doc{i}i") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for r in dedup.remove_duplicate_blocks(docs, block_tokens=4).collect():
        assert r["n_kept"] == r["n_blocks"] > 0


# --- Gopher repetition signals ----------------------------------------------

def test_gopher_repetition_values(spark):
    rows = [
        (1, "all these words appear exactly once in this document"),
        (2, "spam spam spam spam spam spam spam spam spam spam"),
        (3, "line one\nline one\nline two"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.gopher_repetition(docs).collect()}
    assert out[1]["dup_line_frac"] == 0.0
    assert out[1]["dup5_char_frac"] == 0.0
    # "spam spam ..." x10: every 5-gram repeats -> dup5 capped at 1
    assert out[2]["dup5_char_frac"] == 1.0
    assert out[2]["top2_char_frac"] > 0.5
    assert out[3]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert all(out[4][c] == 0.0 for c in
               ("dup_line_frac", "top2_char_frac", "top3_char_frac",
                "dup5_char_frac"))


# --- SemDeDup: determinism + measured recall vs the exact pass --------------

@pytest.fixture(scope="module")
def semdedup_emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df.persist().count()
    return df


def test_kmeans_assign_deterministic_and_total(spark, semdedup_emb):
    a1 = similarity.kmeans_assign(semdedup_emb, dim=64, k=8, iters=2)
    a2 = similarity.kmeans_assign(semdedup_emb, dim=64, k=8, iters=2)
    m1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    m2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert m1 == m2                      # pure function of the table
    assert len(m1) == semdedup_emb.count()  # every vector assigned once


def test_semantic_dedup_recall_vs_exact(spark, semdedup_emb):
    """SemDeDup sacrifices cross-cluster pairs for the n^2/k candidate cut;
    measure what's left on the near-orthogonal synthetic fixture (worst
    case for cluster pruning — most >= 0.3 pairs sit right at the
    boundary): precision must be exact (every emitted pair is a true
    >= thr pair) and recall vs the full quadratic scan degrades
    monotonically with k — measured 0.627 @ k=2, 0.296 @ k=8 — gated with
    head-room at >= 0.55 / >= 0.25."""
    thr = 0.3
    e = semdedup_emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda a, v: a + v)
    nrm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                                       F.lit(0.0), lambda a, v: a + v))
    exact = (
        e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
        .crossJoin(e.select(F.col("vec_id").alias("vec_b"),
                            F.col("v").alias("vb")))
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(dot / (nrm("va") * nrm("vb")) >= thr)
    )
    want = {(r["vec_a"], r["vec_b"]) for r in exact.collect()}
    assert want, "threshold too high — exact scan found nothing"
    recall = {}
    for k in (2, 8):
        got_df = similarity.semantic_near_duplicates(
            semdedup_emb, dim=64, k=k, iters=2, threshold=thr)
        got = {(r["vec_a"], r["vec_b"]) for r in got_df.collect()}
        assert got <= want              # precision 1.0: no false pairs
        recall[k] = len(want & got) / len(want)
    assert recall[2] >= 0.55, f"SemDeDup recall@k=2 = {recall[2]:.3f}"
    assert recall[8] >= 0.25, f"SemDeDup recall@k=8 = {recall[8]:.3f}"
    assert recall[2] > recall[8]        # the n^2/k cut costs recall


# --- test-set decontamination ------------------------------------------------

def test_benchmark_contamination(spark):
    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris is the answer")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "filler words then what is the capital of france paris"
             " is the answer copied verbatim"),       # contains a bench 8-gram
         (2, "a perfectly clean document with entirely original"
             " phrasing and nothing shared"),
         (3, "too short")],                            # < n tokens: 0 grams
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in dedup.benchmark_contamination(train, bench, n=8)
           .collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]
    assert len(out) == 3  # every train doc reported, hit or not


# --- Gopher keep/drop filter -------------------------------------------------

def test_gopher_quality_filter(spark):
    good = ("the quick brown fox jumps over the lazy dog and then it "
            "runs far away to find a place where it can rest for a while "
            "under the old oak tree near the quiet river bank at dusk")
    rows = [
        (1, good),                                         # passes every rule
        (2, "way too short"),                              # too_short (+sparse)
        (3, "spam " * 30 + "the of and to a in is it that was for on are"),
        (4, ""),                                           # everything length-ish
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in textstats.gopher_quality_filter(docs).collect()}
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert not out[2]["keep"] and "too_short" in out[2]["reasons"]
    # doc 3: 43 tokens of which 30 are 'spam' -> repetition rules fire,
    # and reasons respect the fixed rule order (top2 before top3 ...)
    r3 = out[3]["reasons"].split(",")
    assert "top2_repetitive" in r3 and "dup5_repetitive" in r3
    assert r3 == [n for n, *_ in textstats.GOPHER_FILTER_RULES if n in r3]
    assert not out[4]["keep"]
    # overrides rewire a single threshold by rule name: the two length
    # rules stop firing on doc 2 (its trivial 2-gram repetition remains)
    relaxed = {r["doc_id"]: r["reasons"]
               for r in textstats.gopher_quality_filter(
                   docs, overrides={"too_short": 1,
                                    "stopword_sparse": 0.0}).collect()}
    assert "too_short" not in relaxed[2]
    assert "stopword_sparse" not in relaxed[2]
    assert "top2_repetitive" in relaxed[2]


def test_remove_boilerplate_lines(spark):
    rows = [
        (1, "MENU | HOME\nalpha prose one\nCopyright 2024"),
        (2, "MENU | HOME\nbeta prose two\nCopyright 2024"),
        # normalized dup of the nav line (case-insensitive match)
        (3, "menu | home\ngamma prose three\nfooter only here"),
        (4, "\n\nonly blanks around\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in dedup.remove_boilerplate_lines(df).collect()}
    # nav (df=3) and copyright (df=2) drop everywhere; prose survives
    assert out[1]["clean_text"] == "alpha prose one"
    assert out[2]["clean_text"] == "beta prose two"
    assert out[3]["clean_text"] == "gamma prose three\nfooter only here"
    # blank lines always drop; the one unique line stays
    assert out[4]["clean_text"] == "only blanks around"
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (4, 1)
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)
    # partitioning invariance: the corpus-global line-frequency verdict
    # cannot depend on physical layout
    re7 = {r["doc_id"]: r["clean_text"] for r in
           dedup.remove_boilerplate_lines(df.repartition(7)).collect()}
    assert re7 == {k: v["clean_text"] for k, v in out.items()}
