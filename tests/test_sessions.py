"""Gap-based sessionization (datapipe.sessions.gap_sessions)."""

from __future__ import annotations

import datetime as dt

import pytest

from remilia_spark.datapipe.sessions import gap_sessions


def _t(m, s=0, us=0):
    return dt.datetime(2024, 8, 7, 0, m, s, us)


ROWS = [
    # host a: two sessions split by a 40-min gap; second event shares a
    # timestamp with the first (id breaks the tie)
    ("a", 1, _t(0)), ("a", 2, _t(0)), ("a", 3, _t(10)),
    ("a", 4, _t(50)), ("a", 5, _t(55)),
    # host b: single event
    ("b", 6, _t(5)),
    # host c: gap of exactly the threshold is NOT a boundary (> only)
    ("c", 7, _t(0)), ("c", 8, _t(30)),
    # host d: one microsecond over the threshold IS a boundary
    ("d", 9, _t(0)), ("d", 10, _t(30, 0, 1)),
]


def test_sessions(spark):
    df = spark.createDataFrame(ROWS, "host string, id long, ts timestamp")
    got = {(r["host"], r["first_id"]):
           (str(r["session_start"]), str(r["session_end"]), r["n_events"])
           for r in gap_sessions(df, "host", "ts", "id",
                                 gap_seconds=1800).collect()}
    assert got == {
        ("a", 1): ("2024-08-07 00:00:00", "2024-08-07 00:10:00", 3),
        ("a", 4): ("2024-08-07 00:50:00", "2024-08-07 00:55:00", 2),
        ("b", 6): ("2024-08-07 00:05:00", "2024-08-07 00:05:00", 1),
        ("c", 7): ("2024-08-07 00:00:00", "2024-08-07 00:30:00", 2),
        ("d", 9): ("2024-08-07 00:00:00", "2024-08-07 00:00:00", 1),
        ("d", 10): ("2024-08-07 00:30:00.000001",
                    "2024-08-07 00:30:00.000001", 1),
    }


def test_partitioning_invariant(spark):
    df1 = spark.createDataFrame(ROWS, "host string, id long, ts timestamp") \
        .repartition(1)
    df8 = spark.createDataFrame(ROWS, "host string, id long, ts timestamp") \
        .repartition(8)
    k = lambda r: (r["host"], r["first_id"])  # noqa: E731
    s1 = sorted(gap_sessions(df1, "host", "ts", "id").collect(), key=k)
    s8 = sorted(gap_sessions(df8, "host", "ts", "id").collect(), key=k)
    assert s1 == s8


def test_validation(spark):
    df = spark.createDataFrame(ROWS, "host string, id long, ts timestamp")
    with pytest.raises(ValueError):
        gap_sessions(df, "host", "ts", "id", gap_seconds=0)
