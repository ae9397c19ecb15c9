"""FrontierStorage contract — identical assertions over every impl.

SURVEY §4.3's claim is "swapping the backend is a constructor change";
this file makes that a tested property rather than a comment: the same
commit/read/fold/reuse/lineage assertions run against
ParquetSnapshotStorage, InMemorySnapshotStorage, and IcebergStorage.
The sandbox has no iceberg-spark-runtime jar, so the Iceberg param skips
with the constructor's RuntimeError message; on a cluster with the jar +
a configured catalog it runs unchanged.
"""

from __future__ import annotations

import pytest

from remilia_spark.storage import (
    FRONTIER_REV_SCHEMA,
    METRICS_SCHEMA,
    SEEN_SCHEMA,
    IcebergStorage,
    InMemorySnapshotStorage,
    LocalTable,
    ParquetSnapshotStorage,
)

IMPLS = ("parquet", "inmemory", "iceberg")


@pytest.fixture(params=IMPLS)
def storage(request, spark, tmp_path):
    kind = request.param
    if kind == "parquet":
        yield ParquetSnapshotStorage(spark, tmp_path / "st")
    elif kind == "inmemory":
        yield InMemorySnapshotStorage(spark)
    else:
        try:
            st = IcebergStorage(spark, "local.remilia_contract")
        except RuntimeError as ex:
            pytest.skip(f"no Iceberg runtime: {ex}")
        st.clear()
        yield st
        st.clear()


def _frontier_rows(spark, rows):
    return spark.createDataFrame(rows, FRONTIER_REV_SCHEMA)


def _frow(url, state="pending", attempt=0, rev=0, order=0):
    return (url, hash(url) % 10_000, "h.test", 0, order, None, 0,
            attempt, 0, state, rev)


def test_snapshot_roundtrip_and_last_committed(storage, spark):
    budgets = spark.createDataFrame(
        [("h.test", 5, 0)], "host string, tokens long, refill_superstep int")
    assert storage.last_committed() is None
    storage.commit(0, {"budgets": budgets,
                       "frontier": _frontier_rows(
                           spark, [_frow("http://h.test/")])},
                   delta_frontier=False, delta_seen=False)
    assert storage.last_committed() == 0
    assert storage.has_manifest(0) and not storage.has_manifest(1)
    got = storage.read_snapshot("budgets", 0).collect()
    assert [(r["host"], r["tokens"]) for r in got] == [("h.test", 5)]
    man = storage.manifest(0)
    assert man["superstep"] == 0
    assert man["tables"]["budgets"]["rows"] == 1  # per-table lineage


def test_frontier_delta_chain_folds(storage, spark):
    base = _frontier_rows(spark, [
        _frow("http://h.test/a", "pending", rev=0, order=0),
        _frow("http://h.test/b", "pending", rev=0, order=1)])
    storage.commit(0, {"frontier": base}, delta_frontier=False,
                   delta_seen=False)
    # superstep 1: /a fetched (supersedes), /c discovered (new)
    delta = _frontier_rows(spark, [
        _frow("http://h.test/a", "fetched", rev=1, order=0),
        _frow("http://h.test/c", "pending", rev=1, order=2)])
    storage.commit(1, {"frontier": delta}, delta_frontier=True,
                   delta_seen=False)
    ent = storage.manifest(1)["tables"]["frontier"]
    assert ent["base"] == 0 and ent["deltas"] == [1]
    assert ent["delta_rows"] == 2
    got = {r["url"]: r["state"]
           for r in storage.read_frontier(1).collect()}
    assert got == {"http://h.test/a": "fetched",
                   "http://h.test/b": "pending",
                   "http://h.test/c": "pending"}


def test_seen_chain_accumulates_total_rows(storage, spark):
    s0 = spark.createDataFrame([(1, "http://h.test/", 0)], SEEN_SCHEMA)
    storage.commit(0, {"seen": s0,
                       "frontier": _frontier_rows(
                           spark, [_frow("http://h.test/")])},
                   delta_frontier=False, delta_seen=False)
    s1 = spark.createDataFrame([(2, "http://h.test/p", 1)], SEEN_SCHEMA)
    storage.commit(1, {"seen": s1,
                       "frontier": _frontier_rows(
                           spark, [_frow("http://h.test/p", rev=1)])},
                   delta_frontier=True, delta_seen=True)
    ent = storage.manifest(1)["tables"]["seen"]
    assert ent["total_rows"] == 2 and ent["deltas"] == [1]
    assert {r["url_hash"] for r in storage.read_seen(1).collect()} == {1, 2}


def test_reuse_aliases_earlier_step(storage, spark):
    budgets = spark.createDataFrame(
        [("h.test", 3, 0)], "host string, tokens long, refill_superstep int")
    storage.commit(0, {"budgets": budgets,
                       "frontier": _frontier_rows(
                           spark, [_frow("http://h.test/")])},
                   delta_frontier=False, delta_seen=False)
    # idle superstep: manifest 1 points at step 0's data, writes nothing
    storage.commit(1, {}, reuse={"budgets": 0, "frontier": 0})
    got = storage.read_snapshot("budgets", 1).collect()
    assert [(r["host"], r["tokens"]) for r in got] == [("h.test", 3)]
    assert storage.manifest(1)["tables"]["budgets"] == \
        storage.manifest(0)["tables"]["budgets"]


def test_local_table_metrics_and_summary(storage, spark):
    nones = (None,) * 7
    rows = [
        (0, -1, 10, 5, 2, 1, 0, 7, 0, 0),         # totals row
        (0, -1003) + (4,) + nones,                 # wave hist: ne=3 -> 4
        (0, -2005) + (2,) + nones,                 # retry hist: ne=5 -> 2
    ]
    storage.commit(0, {"metrics": LocalTable(rows, METRICS_SCHEMA),
                       "frontier": _frontier_rows(
                           spark, [_frow("http://h.test/")])},
                   delta_frontier=False, delta_seen=False)
    summ = storage.metrics_summary(0)
    assert summ["totals"]["rows_in"] == 10
    assert summ["wave_hist"] == {3: 4}
    assert summ["retry_hist"] == {5: 2}
