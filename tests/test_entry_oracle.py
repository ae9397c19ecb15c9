"""Local mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin on the same parquet at sf0.001, compare
row count + columns + exact values (the driver hashes values, so floats
must match exactly)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_duckdb(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = _normalize(q(spark, SF).toPandas())
    want = _normalize(duck.sql(sql).df())
    assert list(got.columns) == list(want.columns), \
        (list(got.columns), list(want.columns))
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_rows_only_queries_run(spark):
    """Entries without an oracle must still produce stable, nonempty output."""
    qs = entrymod.queries()
    for name in set(qs) - set(ORACLE_KEYS):
        df = qs[name](spark, SF)
        assert df.count() > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["superstep", "url", "depth", "host_rank",
                          "discovery_order"]
