"""Event-time windowed ingest metrics (streaming.start_ingest_window_metrics):
watermark + windowed agg in append mode — windows emit exactly once when
the watermark passes their end, late events drop, open windows stay
unemitted.  Three forced micro-batches (one file each, mtime-ordered)."""

from __future__ import annotations

import json
import time

from remilia_spark.streaming import (
    WINDOW_METRICS_SCHEMA, start_ingest_window_metrics,
)


def _drop(dirp, name, rows):
    (dirp / name).write_text("\n".join(json.dumps(r) for r in rows))


def _u(host, p, ts, source="feed"):
    return {"url": f"http://{host}/{p}", "source": source,
            "ts": f"2024-08-07T{ts}Z"}


def test_windows_emit_on_watermark_and_late_events_drop(spark, tmp_path):
    """Pinned watermark semantics (verified against Spark 4.1 behavior):
    a window emits exactly once, in the first batch whose watermark
    passes its end; an event arriving AFTER its window's state was
    evicted is dropped entirely (never re-emitted, never re-opened).
    Spark's guarantee is one-directional — a late-but-pre-eviction event
    still merges — so the drop case here lands the late event two
    batches after the window closed."""
    src = tmp_path / "drops"
    src.mkdir()
    # batch 1: events inside window [00:00, 00:10) for two hosts
    _drop(src, "b1.json", [
        _u("a.test", "p1", "00:00:10", "sitemap"),
        _u("a.test", "p2", "00:01:00", "feed"),
        _u("a.test", "p3", "00:02:00", "feed"),
        _u("b.test", "q1", "00:00:30", "sitemap"),
    ])
    time.sleep(1.1)
    # batch 2 runs with the watermark from batch 1 (00:02 - 5 min);
    # its 00:20 event pushes the NEXT watermark to 00:15
    _drop(src, "b2.json", [_u("a.test", "p4", "00:20:00")])
    time.sleep(1.1)
    # batch 3 (watermark 00:15): window [00:00, 00:10) is evicted and
    # emitted; the 00:40 event pushes the next watermark to 00:35
    _drop(src, "b3.json", [_u("a.test", "p5", "00:40:00")])
    time.sleep(1.1)
    # batch 4 (watermark 00:35): the 00:05 event's window state is GONE
    # -> the row must drop, not re-open the window; [00:20, 00:30)
    # evicts and emits; the 01:00 event keeps one window open
    _drop(src, "b4.json", [
        _u("a.test", "late", "00:05:00"),
        _u("a.test", "p6", "01:00:00"),
    ])

    q = start_ingest_window_metrics(
        spark, src, tmp_path / "out", tmp_path / "ckpt",
        window="10 minutes", watermark="5 minutes",
        max_files_per_trigger=1)
    q.awaitTermination(180)

    rows = spark.read.schema(WINDOW_METRICS_SCHEMA) \
        .parquet(str(tmp_path / "out")).collect()
    got = {(str(r["window_start"]), r["host"]):
           (r["n_urls"], r["n_sources"],
            str(r["first_ts"]), str(r["last_ts"]))
           for r in rows}

    # exactly the closed windows emitted, once each; the late event
    # surfaced nowhere (no 4-count window, no duplicate [00:00) row);
    # p6's window is still open when the stream drains
    assert got == {
        ("2024-08-07 00:00:00", "a.test"):
            (3, 2, "2024-08-07 00:00:10", "2024-08-07 00:02:00"),
        ("2024-08-07 00:00:00", "b.test"):
            (1, 1, "2024-08-07 00:00:30", "2024-08-07 00:00:30"),
        ("2024-08-07 00:20:00", "a.test"):
            (1, 1, "2024-08-07 00:20:00", "2024-08-07 00:20:00"),
        ("2024-08-07 00:40:00", "a.test"):
            (1, 1, "2024-08-07 00:40:00", "2024-08-07 00:40:00"),
    }
    assert len(rows) == len(got)  # append mode: no window emitted twice


def test_sliding_windows_overlap(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    _drop(src, "b1.json", [_u("a.test", "p1", "00:07:00")])
    time.sleep(1.1)
    # advance the watermark far enough to close every window that
    # contains 00:07 (last one ends 00:15; watermark needs > 00:15)
    _drop(src, "b2.json", [_u("a.test", "p2", "00:30:00")])

    q = start_ingest_window_metrics(
        spark, src, tmp_path / "out", tmp_path / "ckpt",
        window="10 minutes", slide="5 minutes", watermark="1 minutes",
        max_files_per_trigger=1)
    q.awaitTermination(180)

    rows = spark.read.schema(WINDOW_METRICS_SCHEMA) \
        .parquet(str(tmp_path / "out")).collect()
    starts = sorted(str(r["window_start"]) for r in rows
                    if r["n_urls"] == 1 and "00:0" in str(r["window_start"]))
    # a 10-min window sliding by 5 covers 00:07 twice: [00:00) and [00:05)
    assert starts == ["2024-08-07 00:00:00", "2024-08-07 00:05:00"]
