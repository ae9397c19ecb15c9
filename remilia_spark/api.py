"""Reference-shaped user API.

The reference's public surface (``remilia.go``) is::

    rem := remilia.New(opts...)
    err := rem.Do(
        rem.URLProvider("http://host/seed"),             // remilia.go:166-168
        rem.AddLayer(func(doc, put) { ... }),            // remilia.go:170-176
        rem.AddLayer(func(doc, put) { ... }),
    )

This module gives a user of the reference the same shape on Spark::

    rem = Remilia(spark, CrawlConfig())
    run = rem.do(
        rem.url_provider("http://host/seed"),
        rem.add_layer(my_extract),     # def my_extract(html: bytes, url: str)
        rem.add_layer(my_extract2),    #     -> (list[str] hrefs, str value)
        state_dir="/tmp/state",
    )

Layer functions replace the reference's goquery callback: they receive the
raw ``html`` bytes + url of a fetched page and return ``(hrefs, value)``
— hrefs are validated/canonicalized and become the next layer's requests
(``createWrappedPut`` semantics, ``remilia.go:95-114``); ``value`` lands in
the results table (the reference consumes values by side effect; we
persist them).  Layer k runs for pages at depth k; the **last layer's
hrefs are discarded** exactly like the reference's emission-disabled final
stage (``pipeline.go:45-46``).  Omitting the layer function uses the
pinned default extractor.

Pre-fetch / post-parse hooks mirror the reference's request/response hook
chains (``client.go:235-253``): each is a ``DataFrame -> DataFrame``
column transform applied to the wave before the corpus join / to parsed
rows after extraction.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .config import CrawlConfig
from .engine import CrawlRun, Engine

LayerFn = Callable[[bytes, str], tuple[list[str], str]]


@dataclass(frozen=True)
class _Provider:
    urls: tuple[str, ...]


@dataclass(frozen=True)
class _Layer:
    fn: LayerFn | None = None


def with_headers(headers: dict[str, str]):
    """``WithHeaders`` (client.go:262-272) — static header columns on the
    wave.  Irrelevant to the corpus join, kept for API fidelity: downstream
    hooks/layers can read ``hdr_<name>`` columns."""
    from pyspark.sql import functions as F

    def hook(df: DataFrame) -> DataFrame:
        for k, v in headers.items():
            df = df.withColumn(f"hdr_{k.lower().replace('-', '_')}", F.lit(v))
        return df
    return hook


def with_user_agent(generator: Callable[[], str]):
    """``WithUserAgentGenerator`` (client.go:284-292) — UA column from a
    generator; called once per superstep plan (deterministic runs should
    pass a pure function)."""
    from pyspark.sql import functions as F

    def hook(df: DataFrame) -> DataFrame:
        return df.withColumn("hdr_user_agent", F.lit(generator()))
    return hook


class Remilia:
    """``New(opts...)`` equivalent — holds session + config, spawns nothing."""

    def __init__(self, spark: SparkSession, cfg: CrawlConfig | None = None):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()

    # -- stage constructors (defs, like the reference's providerDef/layerDef)
    def url_provider(self, *urls: str) -> _Provider:
        if not urls:
            raise ValueError("url_provider needs at least one URL")
        return _Provider(tuple(urls))

    def add_layer(self, fn: LayerFn | None = None) -> _Layer:
        return _Layer(fn)

    # -- pipeline runner -----------------------------------------------------
    def do(self, provider: _Provider, *layers: _Layer,
           pages: DataFrame, state_dir, robots: DataFrame | None = None,
           resume: bool = False,
           pre_fetch_hooks=None, post_parse_hooks=None) -> CrawlRun:
        """``rem.Do(provider, layer1, ...)`` — depth = len(layers) - 1."""
        if not layers:
            raise ValueError("Do needs at least one layer")
        seeds = self.spark.createDataFrame(
            [(u, i) for i, u in enumerate(provider.urls)],
            "url string, seed_order int")
        cfg = CrawlConfig(**{**self.cfg.__dict__,
                             "max_depth": len(layers) - 1})
        eng = Engine(self.spark, cfg)
        return eng.run(
            pages, seeds, robots, state_dir, resume=resume,
            layer_fns=[l.fn for l in layers],
            pre_fetch_hooks=pre_fetch_hooks,
            post_parse_hooks=post_parse_hooks,
        )
