"""Frontier-state re-expressions of the reference's backoff/ratelimit
contracts (SURVEY §5.1 -> §5.2 item 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from remilia_spark.backoff import backoff_steps, backoff_steps_col, jitter_u
from remilia_spark.budget import available_tokens, updated_budgets
from remilia_spark.config import CrawlConfig

KW = dict(min_delay=1.0, max_delay=50.0, multiplier=2.0)


def test_attempt_1_is_exactly_min_delay():
    # backoff_test.go:53-59: Next() at attempt 1 returns exactly minDelay
    for url in ("http://a.test/", "http://b.test/x", "http://c.test/?q=1"):
        assert backoff_steps(url, 1, **KW) == 1


def test_cap_at_max_delay():
    for a in (8, 10, 50):
        s = backoff_steps("http://a.test/", a, **KW)
        assert 1 <= s <= 50


def test_deterministic_and_jittered():
    a = backoff_steps("http://a.test/", 3, **KW)
    assert a == backoff_steps("http://a.test/", 3, **KW)
    # different urls / attempts spread (full jitter, backoff.go:135-151)
    vals = {backoff_steps(f"http://h{i}.test/", 3, **KW) for i in range(40)}
    assert len(vals) > 1
    assert all(1 <= v <= 9 for v in vals)  # cap = min(50, 1*3^2) = 9


def test_jitter_uniform_range():
    us = [jitter_u(f"http://h{i}.test/", a) for i in range(50) for a in (1, 2)]
    assert all(0.0 <= u < 1.0 for u in us)
    assert abs(sum(us) / len(us) - 0.5) < 0.1


def test_column_formula_matches_python(spark):
    """The JVM (sha2+conv) jitter must equal the oracle's to the last bit."""
    rows = [(f"http://host{i}.test/page/{i}", a)
            for i in range(25) for a in range(1, 10)]
    df = spark.createDataFrame(rows, "url string, attempt int")
    got = df.select(
        "url", "attempt",
        backoff_steps_col(F.col("url"), F.col("attempt"), **KW).alias("steps"),
    ).collect()
    for r in got:
        assert r["steps"] == backoff_steps(r["url"], r["attempt"], **KW), \
            (r["url"], r["attempt"])


def _avail(spark, cfg, budgets_rows, s, robots_rows=None):
    hosts = spark.createDataFrame(
        [(h,) for h in {r[0] for r in budgets_rows} | {"h.new"}], "host string")
    budgets = spark.createDataFrame(budgets_rows, "host string, tokens long, refill_superstep int") \
        if budgets_rows else spark.createDataFrame([], "host string, tokens long, refill_superstep int")
    robots = spark.createDataFrame(
        robots_rows, "host string, disallow array<string>, crawl_delay int"
    ) if robots_rows else None
    out = available_tokens(hosts, budgets, robots, cfg, s)
    return {r["host"]: r["avail"] for r in out.collect()}


def test_budget_refill_and_cap(spark):
    # ratelimit_test.go:79-119 re-expressed: grant then refill over steps
    cfg = CrawlConfig(bucket_capacity=10, fill_quantum=2, initial_tokens=10)
    # unknown host -> initial (capped)
    a = _avail(spark, cfg, [("h.a", 3, 5)], s=6)
    assert a["h.new"] == 10          # min(capacity, initial)
    assert a["h.a"] == 5             # 3 + 2*(6-5)
    a = _avail(spark, cfg, [("h.a", 3, 5)], s=20)
    assert a["h.a"] == 10            # capped at capacity


def test_budget_crawl_delay(spark):
    cfg = CrawlConfig(bucket_capacity=5, fill_quantum=3, initial_tokens=5,
                      use_crawl_delay=True)
    robots = [("h.a", [], 3)]  # 1 token per 3 supersteps
    a = _avail(spark, cfg, [("h.a", 0, 6)], s=8, robots_rows=robots)
    assert a["h.a"] == 0             # floor(2/3) = 0
    a = _avail(spark, cfg, [("h.a", 0, 6)], s=9, robots_rows=robots)
    assert a["h.a"] == 1             # floor(3/3) = 1


def test_budget_update_only_granted_hosts(spark):
    cfg = CrawlConfig(bucket_capacity=10, fill_quantum=2, initial_tokens=10)
    budgets = spark.createDataFrame(
        [("h.a", 4, 1), ("h.b", 7, 1)],
        "host string, tokens long, refill_superstep int")
    grants = spark.createDataFrame(
        [("h.a", 6, 2)], "host string, avail long, granted long")
    out = {r["host"]: (r["tokens"], r["refill_superstep"])
           for r in updated_budgets(budgets, grants, 3).collect()}
    assert out["h.a"] == (4, 3)      # avail 6 - granted 2
    assert out["h.b"] == (7, 1)      # untouched: keeps accumulating
