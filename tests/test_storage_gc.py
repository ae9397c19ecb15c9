"""Stale state-dir GC (Iceberg expire_snapshots analogue): long runs must
not leak one superseded frontier/seen/budgets/bloom dir per superstep, and
GC must never break determinism or kill/resume (resume only ever starts
from the last committed manifest, which GC always keeps)."""

from __future__ import annotations

from pathlib import Path

from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.storage import ParquetSnapshotStorage

# aggressive compaction so a short run exercises many GC rounds
CFG = CrawlConfig(max_depth=3, max_supersteps=30,
                  frontier_compact_every=2, seen_compact_every=2)


def _load(spark, corpus_dir):
    return (spark.read.parquet(str(corpus_dir / "pages.parquet")),
            spark.read.parquet(str(corpus_dir / "seeds.parquet")),
            spark.read.parquet(str(corpus_dir / "robots.parquet")))


def _events(run):
    return [(r["superstep"], r["url"]) for r in run.fetch_events().collect()]


def _state_dirs(state: Path, table: str) -> list[str]:
    d = state / table
    return sorted(p.name for p in d.iterdir() if p.is_dir()) if d.exists() \
        else []


def test_gc_bounds_dirs_and_preserves_results(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    eng = Engine(spark, CFG)

    nogc = ParquetSnapshotStorage(spark, tmp_path / "nogc",
                                  gc_keep_commits=0)
    ref = eng.run(pages, seeds, robots, storage=nogc,
                  state_dir=tmp_path / "nogc")
    want = _events(ref)
    want_seen = {r["url"] for r in ref.seen().collect()}

    gc_state = tmp_path / "gc"
    # tight window so a short run shows the bound (default is 8)
    gc_storage = ParquetSnapshotStorage(spark, gc_state, gc_keep_commits=2)
    run = eng.run(pages, seeds, robots, storage=gc_storage,
                  state_dir=gc_state)
    assert _events(run) == want
    assert {r["url"] for r in run.seen().collect()} == want_seen

    # without GC every superstep leaves a dir; with it the window bounds us
    for table in ("frontier", "seen", "budgets", "bloom"):
        kept = _state_dirs(Path(gc_state), table)
        leaked = _state_dirs(Path(tmp_path / "nogc"), table)
        assert len(kept) <= 6, (table, kept)
        assert len(kept) < len(leaked), (table, kept, leaked)
    # append-only outputs are never GC'd: one dir per busy superstep
    busy = sum(1 for s in run.stats if not s.get("idle"))
    assert len(_state_dirs(Path(gc_state), "results")) == busy
    assert run.results().count() == ref.results().count()


def test_resume_after_gc(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    eng = Engine(spark, CFG)
    full = eng.run(pages, seeds, robots, tmp_path / "full")
    part = tmp_path / "part"
    eng.run(pages, seeds, robots, part, max_supersteps=5)
    resumed = eng.run(pages, seeds, robots, part, resume=True)
    assert _events(resumed) == _events(full)
    urls = [u for _, u in _events(resumed)]
    assert len(urls) == len(set(urls))
