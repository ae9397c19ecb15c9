"""Stateful streaming rate guard (streaming.start_host_rate_guard):
per-host token-bucket state carried across micro-batches via
applyInPandasWithState; admissions pinned over two forced batches."""

from __future__ import annotations

import json
import time

from remilia_spark.streaming import GUARD_SCHEMA, start_host_rate_guard


def _drop(dirp, name, rows):
    (dirp / name).write_text("\n".join(json.dumps(r) for r in rows))


def _u(host, p, sec):
    return {"url": f"http://{host}/{p}", "source": "feed",
            "ts": f"2024-08-07T00:00:{sec:02d}Z"}


def _read_out(spark, out):
    return spark.read.schema(GUARD_SCHEMA).parquet(str(out))


def test_state_carries_across_batches(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    # two files + maxFilesPerTrigger=1 => two micro-batches in order
    # (file mtimes force the order)
    _drop(src, "b1.json", [_u("a.test", "p1", 1), _u("a.test", "p2", 2),
                           _u("a.test", "p3", 3), _u("b.test", "q1", 1)])
    time.sleep(1.1)
    _drop(src, "b2.json", [_u("a.test", "p4", 4), _u("a.test", "p5", 5)])

    q = start_host_rate_guard(
        spark, src, tmp_path / "out", tmp_path / "ckpt",
        capacity=2, refill=1, max_files_per_trigger=1)
    q.awaitTermination(180)

    got = {r["url"]: r["admitted"] for r in
           _read_out(spark, tmp_path / "out").collect()}
    # batch 1, host a.test: fresh bucket capacity=2 -> p1,p2 admitted,
    # p3 deferred; host b.test independent bucket -> q1 admitted
    assert got["http://a.test/p1"] is True
    assert got["http://a.test/p2"] is True
    assert got["http://a.test/p3"] is False
    assert got["http://b.test/q1"] is True
    # batch 2, host a.test: state was 0 tokens, +1 refill -> only p4
    assert got["http://a.test/p4"] is True
    assert got["http://a.test/p5"] is False
    assert len(got) == 6


def test_restart_restores_state_from_checkpoint(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    _drop(src, "b1.json", [_u("c.test", "p1", 1), _u("c.test", "p2", 2),
                           _u("c.test", "p3", 3)])
    q = start_host_rate_guard(
        spark, src, tmp_path / "out", tmp_path / "ckpt", capacity=2,
        refill=0)
    q.awaitTermination(180)

    # second query run (restart): same checkpoint, new drop; with
    # refill=0 the bucket stays empty — state survived the restart
    _drop(src, "b2.json", [_u("c.test", "p4", 4)])
    q2 = start_host_rate_guard(
        spark, src, tmp_path / "out", tmp_path / "ckpt", capacity=2,
        refill=0)
    q2.awaitTermination(180)

    got = {r["url"]: r["admitted"] for r in
           _read_out(spark, tmp_path / "out").collect()}
    assert got == {"http://c.test/p1": True, "http://c.test/p2": True,
                   "http://c.test/p3": False, "http://c.test/p4": False}
