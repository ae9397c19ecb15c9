"""Plan audits: pin SCALE.md's execution claims to the actual Catalyst
plans, so a refactor that silently introduces a shuffle (or breaks column
pruning / filter pushdown / TakeOrdered top-k) fails a test instead of a
100-TB run."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark, tmp_path_factory):
    import pandas as pd

    out = tmp_path_factory.mktemp("plan_docs") / "documents.parquet"
    pd.DataFrame({
        "doc_id": range(100),
        "text": [f"the quick doc {i} join merge window" for i in range(100)],
        "lang": ["en", "de", "fr", "zh"] * 25,
        "source": ["web"] * 100,
        "n_chars": [30] * 100,
    }).to_parquet(out, index=False)
    return spark.read.parquet(str(out))


_SHUFFLES = ("Exchange hashpartitioning", "Exchange rangepartitioning",
             "Exchange SinglePartition")


def _assert_no_shuffle(plan: str) -> None:
    for marker in _SHUFFLES:
        assert marker not in plan, plan


def test_zero_shuffle_ops_have_no_exchange(docs):
    """SCALE.md claims these are pure map stages — no shuffle Exchange
    allowed (stratified_sample's |fractions|-row BroadcastExchange is the
    documented exception: broadcast, not shuffle)."""
    from remilia_spark.datapipe import sampling, textstats

    for df in (
        sampling.stratified_sample(docs, {"en": 0.5, "de": 0.25}),
        textstats.gopher_quality_filter(docs),
        textstats.quality_score(docs),
        textstats.token_count(docs),
        textstats.subtoken_count(docs),
        textstats.gopher_repetition(docs),
    ):
        _assert_no_shuffle(_plan(df))


def test_surt_is_pure_column_math(docs):
    import pyspark.sql.functions as F

    from remilia_spark.urlnorm import surt_key_col

    df = docs.select(surt_key_col(F.concat(
        F.lit("http://h"), F.col("doc_id").cast("string"),
        F.lit(".test/p"))).alias("k"))
    p = _plan(df)
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_bm25_topk_uses_take_ordered(docs):
    from remilia_spark.datapipe import index

    p = _plan(index.bm25_topk(docs, ["join", "merge"], k=5))
    assert "TakeOrderedAndProject" in p, p


def test_scan_prunes_columns(docs):
    """token_count projects (doc_id, text): the parquet scan must not
    read lang/source/n_chars."""
    from remilia_spark.datapipe import textstats

    p = _plan(textstats.token_count(docs))
    scan = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert scan, p
    line = scan[0]
    assert "doc_id" in line and "text" in line
    for col in ("lang", "source", "n_chars"):
        assert col not in line, line


def test_filter_pushdown_reaches_scan(docs):
    p = _plan(docs.where("lang = 'en'").select("doc_id"))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed, p
    assert "EqualTo(lang,en)" in pushed[0], pushed[0]


def test_clean_params_is_pure_column_math(docs):
    """SCALE.md: the query-param canonicalization runs inside the same
    codegen projection as the accept filter — no shuffle, no Python."""
    from pyspark.sql import functions as F

    from remilia_spark.urlnorm import clean_params_col

    df = docs.select(
        F.concat(F.lit("http://h.test/?utm_a=1&k="),
                 F.col("doc_id").cast("string")).alias("url"))
    plan = _plan(df.select(clean_params_col(F.col("url")).alias("c")))
    _assert_no_shuffle(plan)
    assert "EvalPython" not in plan


def test_sessions_single_shuffle(docs):
    """SCALE.md: lag + running sum + the session agg share ONE shuffle on
    the session key (window partitioning reused by the partial agg)."""
    from pyspark.sql import functions as F

    from remilia_spark.datapipe.sessions import gap_sessions

    ev = docs.select(F.col("lang").alias("host"),
                     F.col("doc_id").alias("id"),
                     F.to_timestamp(F.lit("2024-08-07 00:00:00")).alias("ts"))
    # "simple" mode prints one "Exchange hashpartitioning(...)" node line
    # per shuffle ("formatted" splits node name and arguments)
    plan = _plan(gap_sessions(ev, "host", "ts", "id"), "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan


def test_dsir_scoring_stays_jvm(docs):
    """DSIR scoring: hash/join/agg built-ins only — no Python stage
    anywhere in the scoring plan."""
    from remilia_spark.datapipe import dsir

    model = dsir.train_dsir(docs, docs.where("doc_id % 7 = 0"),
                            n_buckets=64)
    plan = _plan(dsir.dsir_scores(docs, model))
    assert "EvalPython" not in plan
