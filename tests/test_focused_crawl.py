"""Focused (steered) crawling through the existing layer-fn seam: a layer
decides per page whether to expand its links, so a training-data crawl
can follow only pages matching a content predicate — no engine changes,
just the reference's AddLayer callback shape (remilia.go:170-176) doing
what goquery callbacks do in the reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.extract import extract
from remilia_spark.xxh64 import xxhash64_spark


def _corpus_frames(spark, corpus_dir):
    return (spark.read.parquet(str(corpus_dir / "pages.parquet")),
            spark.read.parquet(str(corpus_dir / "seeds.parquet")),
            spark.read.parquet(str(corpus_dir / "robots.parquet")))


CFG = dict(max_depth=2, max_supersteps=30, max_attempt=2)


def test_passthrough_layer_is_identity(spark, tiny_corpus, tmp_path):
    """A layer that just calls the pinned extractor must not perturb the
    crawl in any way (ordering, seen set, texts)."""
    _, corpus_dir = tiny_corpus
    pages, seeds, robots = _corpus_frames(spark, corpus_dir)

    def passthrough(html, url):
        return extract(html)

    runs = {}
    for name, lf in {"default": None, "wrapped": [passthrough] * 2}.items():
        run = Engine(spark, CrawlConfig(**CFG)).run(
            pages, seeds, robots, tmp_path / name, layer_fns=lf)
        runs[name] = {
            "events": [(r["superstep"], r["url"])
                       for r in run.fetch_events().collect()],
            "seen": {r["url"] for r in run.seen().collect()},
        }
    assert runs["default"] == runs["wrapped"]


def test_focused_layer_expands_only_matching_pages(spark, tiny_corpus,
                                                   tmp_path):
    """Depth-1 layer expands links only when the predicate holds; every
    depth-2 frontier row's parent must be a predicate-passing depth-1
    page, and non-passing pages' texts still land in results (steering
    filters EXPANSION, not collection).  Steered at depth 1 because the
    tiny corpus has a single seed — depth 1 is the first wave wide
    enough for the predicate to split."""
    _, corpus_dir = tiny_corpus
    pages, seeds, robots = _corpus_frames(spark, corpus_dir)

    def keep(url: str) -> bool:
        return xxhash64_spark(url) % 2 == 0  # splits any URL set ~evenly

    def focused(html, url):
        hrefs, text = extract(html)
        return (hrefs if keep(url) else []), text

    run = Engine(spark, CrawlConfig(**CFG)).run(
        pages, seeds, robots, tmp_path / "st", layer_fns=[None, focused])
    st = run.storage
    frontier = st.read_frontier(st.last_committed())
    d1 = [(r["url"], r["url_hash"])
          for r in frontier.where(F.col("depth") == 1).collect()]
    passing = {h for u, h in d1 if keep(u)}
    assert passing and len(passing) < len(d1)  # predicate actually splits
    d2 = frontier.where(F.col("depth") == 2).collect()
    assert d2  # steering let SOME expansion through
    parents = {r["parent_hash"] for r in d2}
    assert parents <= passing
    # hash parity: parent_hash values are xxhash64 of the parent urls
    assert passing == {xxhash64_spark(u) for u, _ in d1 if keep(u)}
    # collection unaffected: every FETCHED depth-1 page (including the
    # non-passing ones the layer refused to expand) has its text in
    # results — steering filters expansion, never collection
    fetched_d1 = {r["url"] for r in
                  run.fetch_events().where(F.col("depth") == 1).collect()}
    res_d1 = {r["url"] for r in run.results().where(F.col("depth") == 1)
              .where(F.col("text").isNotNull()).collect()}
    assert fetched_d1 and res_d1 == fetched_d1
    assert any(not keep(u) for u in fetched_d1)  # non-passing were fetched


def test_blocking_layer_stops_at_seeds(spark, tiny_corpus, tmp_path):
    _, corpus_dir = tiny_corpus
    pages, seeds, robots = _corpus_frames(spark, corpus_dir)

    def block(html, url):
        return [], extract(html)[1]

    run = Engine(spark, CrawlConfig(**CFG)).run(
        pages, seeds, robots, tmp_path / "st", layer_fns=[block, block])
    depths = {r["depth"] for r in run.fetch_events().collect()}
    assert depths == {0}
