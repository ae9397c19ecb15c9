"""Standing-crawl integration: engine cycles -> fetch history -> schedule.

Two full Engine runs over the tiny corpus; one page's content changes
between cycles.  The history built from the engines' results tables must
give the changed page a shorter revisit interval, and due_urls must pick
exactly the due subset as the next cycle's seeds."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from remilia_spark import recrawl
from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine

EPOCH = 1_704_067_200
DAY = 86_400


@pytest.fixture(scope="module")
def cycle_history(spark, tiny_corpus, tmp_path_factory):
    _, cdir = tiny_corpus
    pages = spark.read.parquet(str(cdir / "pages.parquet"))
    seeds = spark.read.parquet(str(cdir / "seeds.parquet"))
    robots = spark.read.parquet(str(cdir / "robots.parquet"))
    cfg = CrawlConfig(max_depth=2, max_attempt=1, max_supersteps=8)

    state0 = tmp_path_factory.mktemp("recrawl_state_c0")
    run0 = Engine(spark, cfg).run(pages, seeds, robots, str(state0))
    res0 = run0.results().localCheckpoint(eager=True)
    changed_url = res0.orderBy("url").first()["url"]  # a FETCHED url

    # cycle 1: identical corpus except changed_url gains a content-bearing
    # paragraph APPENDED to its html — outlinks untouched, so the crawl
    # tree (and fetch set) is identical; only the extracted text differs
    pages_v1 = pages.withColumn(
        "html",
        F.when(F.col("url") == changed_url,
               F.concat(F.col("html"),
                        F.to_binary(F.lit("<p>fresh content</p>"),
                                    F.lit("utf-8"))))
        .otherwise(F.col("html")))
    state1 = tmp_path_factory.mktemp("recrawl_state_c1")
    run1 = Engine(spark, cfg).run(pages_v1, seeds, robots, str(state1))

    hist = recrawl.history_from_results(
        res0, cycle=0, fetch_epoch=EPOCH).unionByName(
        recrawl.history_from_results(
            run1.results(), cycle=1, fetch_epoch=EPOCH + DAY))
    return hist.localCheckpoint(eager=True), changed_url


def test_changed_page_rescheduled_sooner(cycle_history):
    hist, changed_url = cycle_history
    sched = {r["url"]: r.asDict() for r in recrawl.recrawl_schedule(
        hist, base_interval_s=8 * DAY, min_interval_s=DAY,
        max_interval_s=16 * DAY).collect()}
    assert sched[changed_url]["n_changes"] == 1
    assert sched[changed_url]["next_interval_s"] == 4 * DAY
    static = [s for u, s in sched.items() if u != changed_url]
    assert static, "crawl must cover more than one url"
    assert all(s["n_changes"] == 0 for s in static)
    assert all(s["next_interval_s"] == 8 * DAY for s in static)
    # every url fetched in both cycles
    assert all(s["n_fetches"] == 2 for s in sched.values())


def test_due_urls_pick_next_seeds(cycle_history):
    hist, changed_url = cycle_history
    sched = recrawl.recrawl_schedule(
        hist, base_interval_s=8 * DAY, min_interval_s=DAY,
        max_interval_s=16 * DAY)
    # last fetch was EPOCH+1d; the changed page is due at +1d+4d, the
    # static pages at +1d+8d
    due_mid = {r["url"] for r in
               recrawl.due_urls(sched, EPOCH + 6 * DAY).collect()}
    assert due_mid == {changed_url}
    due_all = recrawl.due_urls(sched, EPOCH + 10 * DAY).count()
    assert due_all == sched.count()
    assert recrawl.due_urls(sched, EPOCH + 2 * DAY).count() == 0
