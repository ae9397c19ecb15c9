"""The storage backend is a constructor change — tested, not asserted.

SURVEY §4.3 promises a two-impl ``FrontierStorage`` seam (Parquet snapshots
here, Iceberg on a real cluster).  This runs the full engine against the
second impl (``InMemorySnapshotStorage``) and checks it reproduces the
oracle exactly, including kill/resume against the same storage object.
Also pins the per-run log sink (reference logger.go:99-116 tees to
``logs/<id>_<ts>.log``).
"""

from __future__ import annotations

import json

from remilia_spark import oracle
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.storage import InMemorySnapshotStorage

CFG = CrawlConfig(max_depth=1, max_supersteps=20)


def _load(spark, corpus_dir):
    return (spark.read.parquet(str(corpus_dir / "pages.parquet")),
            spark.read.parquet(str(corpus_dir / "seeds.parquet")),
            spark.read.parquet(str(corpus_dir / "robots.parquet")))


def _events(run):
    return [(r["superstep"], r["depth"], r["host_rank"],
             r["discovery_order"], r["url"])
            for r in run.fetch_events().collect()]


def test_inmemory_storage_matches_oracle(spark, tiny_corpus):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    want = oracle.crawl(c.pages, c.seeds, c.robots, CFG)
    run = Engine(spark, CFG).run(pages, seeds, robots,
                                 storage=InMemorySnapshotStorage(spark))
    assert _events(run) == [tuple(e) for e in want.fetch_events]
    assert {r["url"] for r in run.seen().collect()} == set(want.seen)
    got_states = {r["url"]: r["state"] for r in run.frontier().collect()}
    assert got_states == want.states


def test_inmemory_storage_resume(spark, tiny_corpus):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    eng = Engine(spark, CFG)
    ref = eng.run(pages, seeds, robots,
                  storage=InMemorySnapshotStorage(spark))
    stg = InMemorySnapshotStorage(spark)
    eng.run(pages, seeds, robots, storage=stg, max_supersteps=1)
    resumed = eng.run(pages, seeds, robots, storage=stg, resume=True)
    assert _events(resumed) == _events(ref)
    urls = [u for *_, u in _events(resumed)]
    assert len(urls) == len(set(urls))  # no duplicate fetches


def test_run_log_sink(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    run = Engine(spark, CFG).run(pages, seeds, robots, tmp_path / "st")
    logs = sorted((tmp_path / "st" / "logs").glob("run_*.log"))
    assert len(logs) == 1
    lines = [json.loads(ln) for ln in logs[0].read_text().splitlines()]
    assert len(lines) == len(run.stats)
    assert lines[0]["superstep"] == 0 and "wave" in lines[0]
