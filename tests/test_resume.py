"""Kill/resume: identical final state, zero duplicate fetches
(SURVEY §5.2 item 4; north rule 'resumable from checkpoint')."""

from __future__ import annotations

import shutil
from pathlib import Path

from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine

CFG = CrawlConfig(max_depth=2, max_supersteps=30)


def _load(spark, corpus_dir):
    return (spark.read.parquet(str(corpus_dir / "pages.parquet")),
            spark.read.parquet(str(corpus_dir / "seeds.parquet")),
            spark.read.parquet(str(corpus_dir / "robots.parquet")))


def _events(run):
    return [(r["superstep"], r["url"]) for r in run.fetch_events().collect()]


def test_resume_after_kill(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    eng = Engine(spark, CFG)

    # uninterrupted reference run
    full = eng.run(pages, seeds, robots, tmp_path / "full")
    want_events = _events(full)
    want_seen = {r["url"] for r in full.seen().collect()}

    # interrupted run: stop after 2 supersteps, then simulate a crash that
    # left an uncommitted superstep directory behind (data, no manifest)
    part_dir = tmp_path / "part"
    eng.run(pages, seeds, robots, part_dir, max_supersteps=2)
    junk = Path(part_dir) / "frontier" / "s=000099"
    junk.mkdir(parents=True)
    (junk / "part-zzz.parquet").write_bytes(b"not a real parquet file")

    resumed = eng.run(pages, seeds, robots, part_dir, resume=True)
    shutil.rmtree(junk, ignore_errors=True)

    assert _events(resumed) == want_events
    assert {r["url"] for r in resumed.seen().collect()} == want_seen
    # no duplicate fetches across the kill/resume boundary
    urls = [u for _, u in _events(resumed)]
    assert len(urls) == len(set(urls))


def test_fresh_run_wipes_stale_state(spark, tiny_corpus, tmp_path):
    """resume=False into a dirty state_dir must not leave stale manifests:
    a longer earlier run's higher-numbered commits would otherwise survive
    and a later resume=True would continue from mixed old/new state."""
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    eng = Engine(spark, CFG)
    full = eng.run(pages, seeds, robots, tmp_path / "ref")
    want_events = _events(full)

    st = tmp_path / "st"
    long_run = eng.run(pages, seeds, robots, st)          # completes
    assert long_run.last_superstep > 2
    eng.run(pages, seeds, robots, st, max_supersteps=2)   # fresh, shorter
    stg = Engine(spark, CFG).run(pages, seeds, robots, st,
                                 resume=True)             # continue run 2
    assert _events(stg) == want_events
    urls = [u for _, u in _events(stg)]
    assert len(urls) == len(set(urls))


def test_resume_is_noop_after_completion(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    eng = Engine(spark, CFG)
    first = eng.run(pages, seeds, robots, tmp_path / "st")
    again = eng.run(pages, seeds, robots, tmp_path / "st", resume=True)
    assert _events(again) == _events(first)
    assert again.last_superstep >= first.last_superstep
