"""Resume from a pre-r3 checkpoint: the seen table then lived as one
``delta_s=<k>`` dir per commit with no ``base``/``deltas``/``total_rows``
manifest keys.  ``Engine.run(resume=True)`` must fold it into the current
format once (``storage.migrate_legacy_seen``) and continue identically —
not raise KeyError or silently read a 0-row seen set."""

from __future__ import annotations

import json
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


def _downgrade_to_legacy(state: Path) -> None:
    """Rewrite a fresh checkpoint into the pre-r3 on-disk shape."""
    base = state / "seen" / "s=000000"
    legacy0 = state / "seen" / "delta_s=000000"
    assert base.exists()
    base.rename(legacy0)
    for mp in sorted(state.glob("_COMMIT_*.json")):
        man = json.loads(mp.read_text())
        ent = man["tables"].get("seen")
        if ent is None:
            continue
        for key in ("base", "deltas", "total_rows"):
            ent.pop(key, None)
        if ent["path"].endswith("s=000000"):
            ent["path"] = str(legacy0)
        mp.write_text(json.dumps(man, indent=1))


def test_resume_from_legacy_seen_checkpoint(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, seeds, robots = _load(spark, corpus_dir)
    eng = Engine(spark, CFG)

    full = eng.run(pages, seeds, robots, tmp_path / "full")
    want_events = _events(full)
    want_seen = {r["url"] for r in full.seen().collect()}

    part = tmp_path / "part"
    eng.run(pages, seeds, robots, part, max_supersteps=2)
    _downgrade_to_legacy(Path(part))

    resumed = eng.run(pages, seeds, robots, part, resume=True)
    assert _events(resumed) == want_events
    assert {r["url"] for r in resumed.seen().collect()} == want_seen
    urls = [u for _, u in _events(resumed)]
    assert len(urls) == len(set(urls))
    # the migration republished the manifest in the current format
    man = resumed.storage.manifest(2)["tables"]["seen"]
    assert man["base"] == 2 and "total_rows" in man
