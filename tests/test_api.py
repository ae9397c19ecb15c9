"""Reference-shaped API: New/URLProvider/AddLayer/Do re-expressed
(remilia.go:166-185) with user layer callbacks + hook chains."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remilia_spark.api import Remilia
from remilia_spark.config import CrawlConfig
from remilia_spark.extract import extract


def _load(spark, corpus_dir):
    return (spark.read.parquet(str(corpus_dir / "pages.parquet")),
            spark.read.parquet(str(corpus_dir / "robots.parquet")))


def test_two_layer_do(spark, tiny_corpus, tmp_path):
    """cmd/dev/main.go:40-69 shape: seed -> extract links -> extract text."""
    c, corpus_dir = tiny_corpus
    pages, robots = _load(spark, corpus_dir)
    rem = Remilia(spark, CrawlConfig(max_attempt=1))

    def layer1(html: bytes, url: str):
        links, _ = extract(html)
        return links, ""          # first layer: only route links onward

    def layer2(html: bytes, url: str):
        _, text = extract(html)
        first_p = text.split("\n")[2] if text.count("\n") >= 2 else ""
        return [], first_p        # last layer: value only (put is inert)

    seed = c.seeds["url"].iloc[0]
    run = rem.do(rem.url_provider(seed),
                 rem.add_layer(layer1), rem.add_layer(layer2),
                 pages=pages, robots=robots, state_dir=tmp_path / "s")
    res = {r["url"]: (r["depth"], r["text"]) for r in run.results().collect()}
    assert res[seed][0] == 0 and res[seed][1] == ""
    depth1 = {u: t for u, (d, t) in res.items() if d == 1}
    assert depth1  # layer 2 ran on discovered pages
    golden = {r["url"]: r["text"] for _, r in c.pages.iterrows()}
    for u, t in depth1.items():
        want = golden[u].split("\n")[2] if golden[u].count("\n") >= 2 else ""
        assert t == want
    # last layer's hrefs are discarded: nothing at depth 2
    assert not any(d == 2 for d, _ in res.values())


def test_default_layer_and_hooks(spark, tiny_corpus, tmp_path):
    c, corpus_dir = tiny_corpus
    pages, robots = _load(spark, corpus_dir)
    rem = Remilia(spark, CrawlConfig(max_attempt=1))

    seen_hooks = []

    def pre_hook(df):
        seen_hooks.append("pre")
        return df  # column transform seam (WithHeaders analogue)

    def post_hook(df):
        seen_hooks.append("post")
        return df.withColumn("text", F.upper("text"))

    run = rem.do(rem.url_provider(c.seeds["url"].iloc[0]),
                 rem.add_layer(), rem.add_layer(),
                 pages=pages, robots=robots, state_dir=tmp_path / "s",
                 pre_fetch_hooks=[pre_hook], post_parse_hooks=[post_hook])
    texts = [r["text"] for r in run.results().collect() if r["text"]]
    assert texts and all(t == t.upper() for t in texts)
    assert "pre" in seen_hooks and "post" in seen_hooks


def test_header_and_ua_hooks(spark, tiny_corpus, tmp_path):
    """WithHeaders / WithUserAgentGenerator sugar (client.go:262-292)."""
    from remilia_spark.api import with_headers, with_user_agent

    c, corpus_dir = tiny_corpus
    pages, robots = _load(spark, corpus_dir)
    rem = Remilia(spark, CrawlConfig(max_attempt=1))
    captured = {}

    def capture(df):
        captured["cols"] = df.columns
        return df

    run = rem.do(rem.url_provider(c.seeds["url"].iloc[0]),
                 rem.add_layer(), rem.add_layer(),
                 pages=pages, robots=robots, state_dir=tmp_path / "s",
                 pre_fetch_hooks=[
                     with_headers({"Accept-Language": "en", "X-Test": "1"}),
                     with_user_agent(lambda: "remilia-spark/0.1"),
                     capture,
                 ])
    assert run.results().count() > 0
    assert "hdr_accept_language" in captured["cols"]
    assert "hdr_x_test" in captured["cols"]
    assert "hdr_user_agent" in captured["cols"]


def test_headers_consumed_downstream(spark, tiny_corpus, tmp_path):
    """R15 loop closure: the UA header set by a pre-fetch (request) hook
    rides through fetch + the distributed parse and is READ by a
    post-parse (response) hook — reference response hooks see the
    originating request's headers (client.go:235-253)."""
    from remilia_spark.api import with_user_agent

    c, corpus_dir = tiny_corpus
    pages, robots = _load(spark, corpus_dir)
    rem = Remilia(spark, CrawlConfig(max_attempt=1))

    def tag_by_ua(df):
        return df.withColumn(
            "text",
            F.when(F.col("hdr_user_agent") == "bot/2", F.lit("UA2-SEEN"))
             .otherwise(F.concat(F.lit("other:"), "text")))

    run = rem.do(rem.url_provider(c.seeds["url"].iloc[0]),
                 rem.add_layer(), rem.add_layer(),
                 pages=pages, robots=robots, state_dir=tmp_path / "s",
                 pre_fetch_hooks=[with_user_agent(lambda: "bot/2")],
                 post_parse_hooks=[tag_by_ua])
    texts = [r["text"] for r in run.results().collect()]
    assert texts and all(t == "UA2-SEEN" for t in texts)

    run2 = rem.do(rem.url_provider(c.seeds["url"].iloc[0]),
                  rem.add_layer(), rem.add_layer(),
                  pages=pages, robots=robots, state_dir=tmp_path / "s2",
                  pre_fetch_hooks=[with_user_agent(lambda: "bot/1")],
                  post_parse_hooks=[tag_by_ua])
    texts2 = [r["text"] for r in run2.results().collect()]
    assert texts2 and all(t.startswith("other:") for t in texts2)


def test_provider_validation(spark):
    rem = Remilia(spark)
    with pytest.raises(ValueError):
        rem.url_provider()
    with pytest.raises(ValueError):
        rem.do(rem.url_provider("http://a.test/"), pages=None, state_dir="/tmp/x")
