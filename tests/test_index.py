"""Inverted index (datapipe.index): hand-computed stats and postings,
block sharding bounds, partitioning invariance."""

from __future__ import annotations

import pytest

from remilia_spark.datapipe import index


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat"),
        (1, "the the dog"),
        (2, "cat CAT cat"),
        (3, ""),
        (10, "the end"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_stats_by_hand(docs):
    got = {r["term"]: (r["df"], r["total_tf"])
           for r in index.term_stats(docs).collect()}
    assert got == {"the": (3, 4), "cat": (2, 4), "sat": (1, 1),
                   "dog": (1, 1), "end": (1, 1)}


def test_min_df(docs):
    got = {r["term"] for r in index.term_stats(docs, min_df=2).collect()}
    assert got == {"the", "cat"}


def test_posting_blocks_by_hand(docs):
    got = {(r["term"], r["block"]): (r["block_df"], r["postings"])
           for r in index.posting_blocks(docs, block_docs=4).collect()}
    # doc_ids 0-3 -> block 0; doc_id 10 -> block 2
    assert got[("the", 0)] == (2, "0:1,1:2")
    assert got[("the", 2)] == (1, "10:1")
    assert got[("cat", 0)] == (2, "0:1,2:3")
    assert got[("sat", 0)] == (1, "0:1")
    assert ("the", 1) not in got  # empty blocks produce no rows


def test_single_block_when_large(docs):
    got = index.posting_blocks(docs, block_docs=1 << 20).collect()
    assert {r["block"] for r in got} == {0}
    the = [r for r in got if r["term"] == "the"][0]
    assert the["postings"] == "0:1,1:2,10:1"


def test_partitioning_invariance(docs):
    a = sorted(map(tuple, index.posting_blocks(docs, block_docs=4).collect()))
    b = sorted(map(tuple, index.posting_blocks(
        docs.repartition(7), block_docs=4).collect()))
    assert a == b


def test_bad_block_size(docs):
    with pytest.raises(ValueError):
        index.posting_blocks(docs, block_docs=0)
