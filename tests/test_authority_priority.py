"""Opt-in link-authority priority: with a (host, rank_fp) table the wave
pop prefers high-authority hosts within a depth; coverage and the seen set
are unchanged — only the order moves."""

from __future__ import annotations

from pyspark.sql import functions as F

from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine


def _load(spark, corpus_dir):
    return (spark.read.parquet(str(corpus_dir / "pages.parquet")),
            spark.read.parquet(str(corpus_dir / "seeds.parquet")),
            spark.read.parquet(str(corpus_dir / "robots.parquet")))


def test_authority_reorders_pop_only(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    cfg = CrawlConfig(max_depth=2, wave_size=5, max_supersteps=80)

    base = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "s0")
    base_events = [(r.superstep, r.url) for r in base.fetch_events().collect()]
    base_seen = {r.url for r in base.seen().collect()}

    # authority table: rank hosts by REVERSE of their natural pop order so
    # the reorder is observable; built from the corpus's own host set
    hosts = sorted({r.host for r in
                    pages.select(F.expr("parse_url(url, 'HOST')")
                                 .alias("host")).distinct().collect()})
    auth = spark.createDataFrame(
        [(h, (len(hosts) - i) * 10**9) for i, h in enumerate(reversed(hosts))],
        "host string, rank_fp long")

    run = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "s1",
                                 authority=auth)
    events = [(r.superstep, r.url) for r in run.fetch_events().collect()]
    seen = {r.url for r in run.seen().collect()}

    # same coverage: every URL seen/fetched in both runs
    assert seen == base_seen
    assert sorted(u for _, u in events) == sorted(u for _, u in base_events)
    # but the pop order changed (authority reversed the host preference)
    assert events != base_events

    # determinism: the authority run itself is reproducible
    run2 = Engine(spark, cfg).run(pages, seeds, robots, tmp_path / "s2",
                                  authority=auth)
    events2 = [(r.superstep, r.url) for r in run2.fetch_events().collect()]
    assert events2 == events
