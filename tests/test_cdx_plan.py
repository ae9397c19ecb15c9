"""Plan audit for the CDX connector: SCALE.md claims the index scan is
pure JVM (whole-stage codegen, zero Python workers) and that seed
derivation never funnels through a single partition."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from remilia_spark.sources import cdx


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def captures(spark, tmp_path_factory):
    recs = [(f"http://host{i % 7}.test/p/{i}", cdx.fixture_ts(1_700_000_000 + i),
             200, "text/html", f"sha1:{i}", 100 + i, i * 200,
             f"seg-{i % 3}.warc.gz") for i in range(200)]
    p = tmp_path_factory.mktemp("cdxplan") / "idx.cdx"
    p.write_bytes(cdx.cdx_bytes(recs))
    return cdx.read_cdx(spark, str(p))


def test_read_cdx_has_no_python_stage(captures):
    """The 10^9-row index parse must stay JVM-side: no Python UDF
    evaluation nodes anywhere in the plan."""
    plan = _plan(captures)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, plan
    # scan -> filter -> project, nothing else (from_json is JVM-side but
    # not codegen-capable, so no WholeStageCodegen span to assert on;
    # repeated from_json per projected field collapses at runtime via
    # subexpression elimination)
    assert "Scan text" in plan, plan


def test_cdx_to_seeds_never_single_partition(captures):
    """Seed ordering uses the range-partitioned rank — a global Window
    would show an 'Exchange SinglePartition' funnel."""
    plan = _plan(cdx.cdx_to_seeds(captures))
    assert "Exchange SinglePartition" not in plan, plan


def test_warc_fetch_plan_is_one_aggregate(captures):
    """groupBy(warc_filename) + collect_list: one hash aggregate pair,
    no Python, no global sort."""
    plan = _plan(cdx.warc_fetch_plan(captures))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Sort [" not in plan or "SinglePartition" not in plan, plan
