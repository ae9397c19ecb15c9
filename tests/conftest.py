from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("remilia-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Seeded tiny corpus written to parquet once per test session."""
    from remilia_spark.corpus import generate_corpus

    out = tmp_path_factory.mktemp("corpus_tiny")
    c = generate_corpus(n_pages=60, n_hosts=5, seed=42)
    c.write(out)
    return c, out


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    from remilia_spark.corpus import generate_corpus

    out = tmp_path_factory.mktemp("corpus_small")
    c = generate_corpus(n_pages=400, n_hosts=8, seed=42, n_seeds=4)
    c.write(out)
    return c, out
