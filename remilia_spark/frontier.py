"""The crawl superstep — remilia's fetch-parse loop as one DataFrame job.

One superstep reproduces one wave of the reference pipeline
(``pipeline.go:51-61`` + ``remilia.go:148-164``), Pregel-style:

    wave    = pending ∧ eligible  → robots already applied at insertion
              → per-host budget window rank (token bucket, R10)
              → optional global priority cap (depth, host_rank, discovery_order)
    fetched = pages ⋈ wave  (the corpus join plays client.execute,
              client.go:103-184; broadcast the wave side when small)
    parsed  = mapInPandas(pinned extractor) over html:binary   (R19)
    next    = posexplode(links) → RFC3986 canonicalize + xxhash64 →
              in-batch dedup → anti-join seen → robots state →
              global discovery_order rank → new pending rows
    misses  = wave rows absent from parsed ⇒ retry with hash-seeded
              jittered backoff (R11/R12) or terminal 'failed' at max_attempt
    commit  = frontier' / seen Δ / budgets' / results Δ / metrics Δ,
              atomically (storage manifest protocol)

Per-row work is vectorized (canonicalization + extraction are pandas/Arrow
UDFs; hashing/regex/window/join math is JVM-side) and the driver issues a
*bounded* number of actions per superstep (~7): one frontier aggregate, one
wave count, five table writes.  All remaining statistics are read back from
the committed metrics/manifest rows instead of extra ``.count()`` jobs —
at 10^10-URL scale, driver round-trips are the scheduler bottleneck.
"""

from __future__ import annotations

import time
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from . import urlnorm
from .backoff import backoff_steps_col
from .seenfilter import (saturation_watch, split_seen_filter,
                         update_seen_filter)
from .budget import attach_avail, updated_budgets
from .config import CrawlConfig
from .extract import extract
from .ranking import global_rank, grant_wave
from .robots import with_robots_state
from .storage import LocalTable, METRICS_SCHEMA, ParquetSnapshotStorage
from .traps import cap_new_per_host

FRONTIER_COLS = [
    "url", "url_hash", "host", "depth", "discovery_order", "parent_hash",
    "link_index", "attempt", "next_eligible", "state",
]

# parse-stage mapInPandas schema: wave bookkeeping passes through the UDF
_PARSE_SCHEMA = (
    "url string, url_hash long, depth int, discovery_order long, "
    "host_rank int, links array<string>, text string"
)

_NORM_FIELD = ("links_norm array<struct"
               "<url:string,host:string,path:string>>")


def _parse_batches_factory(layer_fns=None, charset: str = "utf-8",
                           hdr_cols: tuple[str, ...] = (),
                           norm_below_depth: int | None = None):
    """Build the parse-stage mapInPandas fn.

    ``layer_fns[depth]`` is a user extractor ``(html_bytes, url) ->
    (hrefs, value)`` — the reference's ``LayerFunc`` callback
    (``remilia.go:170-176``); None slots fall back to the pinned default.
    ``charset`` is the reference's optional charset transformer
    (``client.go:228-233``) applied before parse.  ``hdr_cols`` are the
    request-header columns added by pre-fetch hooks (``hdr_*``, string) —
    passed through so post-parse hooks can read the request headers of
    the response they transform (the reference's response hooks see the
    originating request, client.go:235-253).

    ``norm_below_depth`` (set iff no post-parse hooks are registered):
    additionally emit ``links_norm`` — each href canonicalized in THIS
    Python pass (``urlnorm.normalize_parts``, index-aligned with
    ``links``; rejected hrefs hold an all-null struct) for rows with
    depth < the bound, ``[]`` above it (their links are discarded
    anyway).  The discovery pipeline then needs no second Python stage
    per superstep — the candidate job is explode + JVM hash/dedup over
    the checkpointed parse output.  Gated on hooks because a hook that
    rewrites ``links`` would silently desync the precomputed column; the
    hook path keeps the historical post-parse canonicalize UDF.
    """

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        norm_parts = urlnorm.normalize_parts
        abs_of = urlnorm.base_independent_key

        def norm_struct(href, u, memo):
            # memo key: the href alone when RFC 3986 resolution cannot
            # read the base (absolute http/https/ftp with a netloc —
            # base-independence fuzz-pinned in tests/test_canon_memo.py),
            # else (href, base).  Collapses the per-batch duplicate mass:
            # same-page duplicate links and every cross-page repeat of an
            # absolute href canonicalize once per Arrow batch.
            k = abs_of(href) or (href, u)
            got = memo.get(k)
            if got is None:
                p = norm_parts(href, u)
                got = ({"url": None, "host": None, "path": None}
                       if p is None else
                       {"url": p[0], "host": p[1], "path": p[2]})
                memo[k] = got
            return got

        for pdf in batches:
            links, texts = [], []
            norms: list = [] if norm_below_depth is not None else None
            memo: dict = {}
            for h, u, d in zip(pdf["html"], pdf["url"], pdf["depth"]):
                fn = None
                if layer_fns is not None and 0 <= d < len(layer_fns):
                    fn = layer_fns[d]
                ls, tx = fn(bytes(h) if h is not None else b"", u) \
                    if fn is not None else extract(h, charset)
                ls = list(ls)
                links.append(ls)
                texts.append(tx)
                if norms is not None:
                    if d < norm_below_depth:
                        norms.append([norm_struct(href, u, memo)
                                      for href in ls])
                    else:
                        norms.append([])
            out = pdf[["url", "url_hash", "depth", "discovery_order",
                       "host_rank", *hdr_cols]].copy()
            out["links"] = links
            out["text"] = texts
            if norms is not None:
                out["links_norm"] = norms
            yield out

    return parse


_NORM_SCHEMA = StructType([StructField(c, StringType())
                           for c in ("url", "host", "path")])


@F.pandas_udf(_NORM_SCHEMA)
def _canonicalize_udf(href: pd.Series, base: pd.Series) -> pd.DataFrame:
    """Canonical (url, host, path) in ONE Arrow pass — host/path must come
    from the same urlsplit as the URL (never Spark ``parse_url``: ANSI-mode
    java.net.URI throws INVALID_URL on chars like ``|``/``<``/``"`` that the
    reference's accept regex admits, and even try_parse_url would diverge
    from the Python oracle's hostname on such rows)."""
    return urlnorm.normalize_parts_frame(href, base)


# The function is pure and deterministic; the nondeterministic FLAG only
# stops the optimizer duplicating it (guide-§4.4 pathology, measured): the
# candidate pipeline filters on ``np.url IS NOT NULL`` — a filter over a
# UDF-computed column — and the pushed-down filter re-evaluated the whole
# canonicalization per link (TWO ArrowEvalPython nodes in the executed
# plan, pinned before/after in plans/r06/crawl_cand_canonicalize_*.txt).
_canonicalize = _canonicalize_udf.asNondeterministic()


def _clean_np(df, cfg: CrawlConfig):
    """Opt-in tracking-param strip on the canonical URL (pure JVM column
    math, zero Python; ``urlnorm.clean_params_col`` pinned spec).  Host and
    path are query-independent, so only the struct's ``url`` changes; the
    downstream xxhash64 / groupBy(np) then collapse the analytics variants
    to one frontier row."""
    if not cfg.strip_tracking_params:
        return df
    return df.withColumn("np", F.struct(
        urlnorm.clean_params_col(F.col("np.url")).alias("url"),
        F.col("np.host").alias("host"),
        F.col("np.path").alias("path")))


def _pk_col(cfg: CrawlConfig):
    """The politeness-key column expression over the frontier's ``host``
    (CrawlConfig.politeness_key): the host itself, or its registered
    domain (pure JVM column math — deriving it per row is free, so the
    key is never stored in frontier state)."""
    if cfg.politeness_key == "host":
        return F.col("host")
    if cfg.politeness_key == "domain":
        from .urlnorm import registered_domain_col
        return registered_domain_col(F.col("host"))
    raise ValueError(f"politeness_key must be 'host' or 'domain', "
                     f"got {cfg.politeness_key!r}")


def _insert_state(cfg: CrawlConfig):
    """State a fresh row enters the frontier with: 'filtered' when robots
    blocks it or (if an allowlist is configured — the reference's
    ``AllowedDomain``, limit.go:5-15) its host is off-list."""
    blocked = F.col("robots_blocked")
    if cfg.allowed_domains:
        blocked = blocked | ~F.col("host").isin(*cfg.allowed_domains)
    return F.when(blocked, F.lit("filtered")).otherwise(F.lit("pending"))


def seed_frontier(spark: SparkSession, seeds: DataFrame,
                  robots: DataFrame | None,
                  cfg: CrawlConfig) -> tuple[DataFrame, DataFrame]:
    """Canonical seed rows -> (frontier at superstep 0, seen delta 0).

    Seeds mirror ``URLProvider`` (``remilia.go:166-168``) generalized to N
    rows; duplicates collapse to the smallest ``seed_order``; robots and the
    domain allowlist apply at insertion like any other row.
    """
    c = (
        seeds
        .withColumn("np", _canonicalize("url", F.lit(None).cast("string")))
        .transform(lambda df: _clean_np(df, cfg))
        .where(F.col("np.url").isNotNull())
        .groupBy("np").agg(F.min("seed_order").alias("seed_order"))
        .select(
            F.col("np.url").alias("url"),
            F.xxhash64("np.url").alias("url_hash"),
            F.coalesce(F.col("np.host"), F.lit("")).alias("host"),
            F.coalesce(F.col("np.path"), F.lit("/")).alias("path"),
            "seed_order",
        )
    )
    c = with_robots_state(c, robots)
    w = Window.orderBy("seed_order")  # seed lists are small by nature
    frontier = c.withColumn(
        "discovery_order", (F.row_number().over(w) - 1).cast("long")
    ).select(
        "url", "url_hash", "host",
        F.lit(0).alias("depth"),
        "discovery_order",
        F.lit(None).cast("long").alias("parent_hash"),
        F.lit(0).alias("link_index"),
        F.lit(0).alias("attempt"),
        F.lit(0).alias("next_eligible"),
        _insert_state(cfg).alias("state"),
    ).localCheckpoint(eager=True)
    # one materialization: without the checkpoint the canonicalize-UDF +
    # robots + window lineage re-executed in EACH of the seed commit's
    # concurrent table writes (frontier, seen, bloom fold) — three Python
    # stages + shuffles of pure per-run setup latency
    seen = frontier.select(
        "url_hash", "url", F.lit(0).cast("int").alias("first_seen_superstep"))
    return frontier, seen


def frontier_head(storage: ParquetSnapshotStorage, s: int) -> dict:
    """One small job over the committed frontier: pending count, the
    histogram of pending ``next_eligible`` values (lets the driver skip
    idle supersteps without any Spark work), and the max discovery order."""
    frontier = storage.read_frontier(s)
    key = F.when(F.col("state") == "pending", F.col("next_eligible")) \
        .otherwise(F.lit(-1))
    rows = frontier.groupBy(key.alias("k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("discovery_order").alias("mo"),
    ).collect()
    hist = {int(r["k"]): int(r["n"]) for r in rows if r["k"] >= 0}
    max_order = max((int(r["mo"] or 0) for r in rows), default=0)
    return {"pending": sum(hist.values()), "hist": hist,
            "max_order": max_order}




def _coalesce_for_write(df: DataFrame, est_rows: int, cap: int) -> DataFrame:
    """Bound a commit write's file count from a driver-known row estimate
    (~250k rows/file).  Fixture-scale supersteps otherwise emit 30-100
    near-empty files per table, and their task dispatch + footer lineage
    reads dominate t_commit.  coalesce is narrow (no shuffle); at real
    scale the estimate grows and this caps out at the configured
    parallelism, so big writes keep their partitioning."""
    return df.coalesce(max(1, min(cap, est_rows // 250_000 + 1)))


def _checkpoint_parallel(*dfs: DataFrame) -> list[DataFrame]:
    """Eagerly localCheckpoint independent DataFrames concurrently.

    Spark schedules jobs submitted from separate driver threads
    concurrently (the same mechanism the commit's table writes use), so k
    independent materializations pay ~max instead of ~sum of their stage
    walls — these are latency-bound at fixture scale, so the win is the
    same at every core count."""
    from concurrent.futures import ThreadPoolExecutor

    if len(dfs) == 1:
        return [dfs[0].localCheckpoint(eager=True)]
    with ThreadPoolExecutor(len(dfs)) as ex:
        futs = [ex.submit(lambda d=d: d.localCheckpoint(eager=True))
                for d in dfs]
        return [f.result() for f in futs]


def _grant_wave_for(eligible: DataFrame, budgets: DataFrame,
                    robots: DataFrame | None, cfg: CrawlConfig,
                    target_s: int,
                    authority: DataFrame | None = None,
                    approx_rows: int | None = None,
                    quota: DataFrame | None = None) -> DataFrame:
    """Budget-grant + priority-pop ``eligible`` into the wave for superstep
    ``target_s``, materialized as an eager local checkpoint.

    Eager local checkpoint, not persist: every downstream action (the
    parse materialization, 5-6 commit writes, metric aggregates) replans
    its whole logical tree and re-executes any broadcast exchanges in it.
    With persist() those plans still carry the full frontier-fold + window
    lineage, so each superstep paid ~10 actions x (Catalyst + AQE + py4j +
    broadcast-build) of *driver-only* time — measured 35% of the run with
    zero tasks running at local[8], the scaling-gate killer (flat wall
    2->8 cores).  Checkpointing truncates the plan to an in-memory
    LogicalRDD: one distributed job computes the data, every consumer
    plans in ~ms.  (State durability is unaffected — the commit still
    round-trips everything through the storage manifest protocol.)
    """
    if cfg.politeness_key == "host":
        key, elig = "host", eligible
    else:
        # domain politeness: budgets/rank key on the derived registered
        # domain; the column is recomputed (not stored) and dropped after
        # the pop, so frontier state and the wave schema are unchanged
        key, elig = "_pk", eligible.withColumn("_pk", _pk_col(cfg))
    att = attach_avail(elig, budgets, robots, cfg, target_s, key=key)
    if cfg.max_fetch_per_key is not None and quota is not None:
        from .budget import quota_clamp
        att = quota_clamp(att, quota, cfg.max_fetch_per_key, key=key,
                          hint_broadcast=cfg.broadcast_politeness)
    granted = grant_wave(att, cfg, approx_rows=approx_rows, key=key)
    if key == "_pk":
        granted = granted.drop("_pk")
    if cfg.wave_size is not None:
        pop_keys = ["depth", "host_rank", "discovery_order"]
        if authority is not None:
            # opt-in link-authority pop (datapipe.graph.pagerank output):
            # within a depth, higher-authority hosts pop first.  Broadcast —
            # a host-level table is ~10^7 rows at 10^10 URLs; past executor
            # broadcast budgets, drop the hint and it's one extra shuffle
            # of the (already budget-pruned) granted set.  Ordering stays
            # total (discovery_order is unique), so determinism holds.
            granted = granted.join(
                F.broadcast(authority.select(
                    "host", F.col("rank_fp").alias("_auth"))),
                "host", "left"
            ).withColumn("_auth", F.coalesce("_auth", F.lit(0)))
            pop_keys = ["depth", F.col("_auth").desc(), "host_rank",
                        "discovery_order"]
        granted = granted.orderBy(*pop_keys).limit(cfg.wave_size) \
                         .drop("_auth")
    return granted.localCheckpoint(eager=True)


def run_superstep(
    spark: SparkSession,
    storage: ParquetSnapshotStorage,
    pages: DataFrame,
    robots: DataFrame | None,
    cfg: CrawlConfig,
    s: int,
    layer_fns=None,
    pre_fetch_hooks=None,
    post_parse_hooks=None,
    head: dict | None = None,
    authority: DataFrame | None = None,
) -> dict:
    """Run superstep ``s`` on committed state ``s`` and commit ``s + 1``.

    ``head`` (from ``frontier_head``) carries pending/eligible/max_order so
    the engine loop pays one aggregate per *busy* superstep and none for
    idle ones.  Returns the stats dict recorded into the manifest; the
    engine loop terminates when ``stats['pending_after'] == 0``.
    """
    t0 = time.monotonic()
    is_pending = F.col("state") == "pending"
    if head is None:
        head = frontier_head(storage, s)
    n_pending = head["pending"]
    n_eligible = sum(c for k, c in head["hist"].items() if k <= s)
    max_order = head["max_order"]

    if n_eligible == 0:
        # idle step (all pending rows are backing off): advance the clock
        # without rewriting state — the manifest aliases the old dirs.
        stats = {"superstep": s, "pending": n_pending, "eligible": 0,
                 "wave": 0, "fetched": 0, "discovered": 0,
                 "pending_after": n_pending, "idle": True}
        reuse = {"frontier": s, "budgets": s, "seen": s}
        if "quota" in storage.manifest(s)["tables"]:
            reuse["quota"] = s
        if "bloom" in storage.manifest(s)["tables"]:
            reuse["bloom"] = s
        storage.commit(s + 1, {}, extra={"stats": stats}, reuse=reuse)
        return stats

    # ---- budget grant + priority pop (R10) --------------------------------
    t_plan = time.monotonic()
    frontier = storage.read_frontier(s)  # folded current rows (+rev)
    budgets = storage.read_snapshot("budgets", s)
    quota = None
    if cfg.max_fetch_per_key is not None:
        from .budget import QUOTA_SCHEMA
        quota = (storage.read_snapshot("quota", s)
                 if "quota" in storage.manifest(s)["tables"]
                 else spark.createDataFrame([], QUOTA_SCHEMA))
    is_eligible = is_pending & (F.col("next_eligible") <= F.lit(s))
    wave = _grant_wave_for(frontier.where(is_eligible), budgets,
                           robots, cfg, s, authority=authority,
                           approx_rows=n_eligible, quota=quota)
    t_wave = time.monotonic()

    # ---- corpus join = fetch (R3); wave is almost always ≪ pages ----------
    wave_keyed = wave.select(*FRONTIER_COLS, "host_rank", "avail")
    for hook in pre_fetch_hooks or ():  # R13: request-hook chain
        wave_keyed = hook(wave_keyed)
    # request-header columns from the hooks (R15) ride through fetch +
    # parse so post-parse hooks can read them; must be string-typed
    hdr_cols = tuple(c for c in wave_keyed.columns if c.startswith("hdr_"))
    # only the parse stage's columns ride through the fetch join — the
    # other wave consumers (retry/misses/metrics) join the checkpointed
    # wave directly, so the join/broadcast payload stays minimal
    wave_fetch = wave_keyed.select("url", "url_hash", "depth",
                                   "discovery_order", "host_rank",
                                   *hdr_cols)
    if cfg.fetch_buckets:
        # bucketed fetch (see config): pages arrive pre-partitioned +
        # persisted on _fetch_bucket; repartitioning the wave the same way
        # makes the join bucket-local — pages never move, no driver-built
        # broadcast of the wave (at 10^8-row waves there cannot be one)
        b = F.pmod(F.xxhash64("url"), F.lit(cfg.fetch_buckets)).cast("int")
        wave_b = wave_fetch.withColumn("_fetch_bucket", b) \
            .repartition(cfg.fetch_buckets, "_fetch_bucket")
        hits = pages.select("_fetch_bucket", "url", "html") \
            .join(wave_b, ["_fetch_bucket", "url"], "inner") \
            .drop("_fetch_bucket")
    else:
        wave_join = F.broadcast(wave_fetch) \
            if n_eligible <= cfg.broadcast_wave_max else wave_fetch
        hits = pages.select("url", "html").join(wave_join, "url", "inner")

    # ---- parse (R19) + results --------------------------------------------
    # no post-parse hooks (the common case): hrefs canonicalize inside the
    # SAME Python pass that extracted them, so the discovery pipeline pays
    # zero additional Python stages (see _parse_batches_factory)
    use_norm = not post_parse_hooks
    parse_schema = _PARSE_SCHEMA + "".join(f", {c} string" for c in hdr_cols)
    if use_norm:
        parse_schema += ", " + _NORM_FIELD
    parsed = hits.select(
        "url", "url_hash", "depth", "discovery_order", "host_rank", "html",
        *hdr_cols
    ).mapInPandas(_parse_batches_factory(
        layer_fns, cfg.charset, hdr_cols,
        norm_below_depth=cfg.max_depth if use_norm else None), parse_schema)
    for hook in post_parse_hooks or ():  # R14: response-hook chain
        parsed = hook(parsed)
    parsed = parsed.localCheckpoint(eager=True)  # one parse pass, ever
    t_parse = time.monotonic()

    results = parsed.select(
        F.lit(s).cast("int").alias("superstep"),
        "url", "depth", "host_rank", "discovery_order", "text",
    )

    # ---- discover next wave (R7/R8/R16/R20) -------------------------------
    if use_norm:
        # links_norm is index-aligned with links (rejected hrefs are
        # all-null structs), so posexploding it yields the same
        # (link_index, np) stream the canonicalize UDF produced — with
        # no Python stage in this job at all
        link_rows = parsed.where(F.col("depth") < cfg.max_depth).select(
            F.col("url_hash").alias("parent_hash"),
            F.col("depth").alias("parent_depth"),
            F.col("discovery_order").alias("parent_order"),
            F.posexplode("links_norm").alias("link_index", "np"),
        )
    else:
        link_rows = parsed.where(F.col("depth") < cfg.max_depth).select(
            F.col("url").alias("parent_url"),
            F.col("url_hash").alias("parent_hash"),
            F.col("depth").alias("parent_depth"),
            F.col("discovery_order").alias("parent_order"),
            F.posexplode("links").alias("link_index", "href"),
        ).withColumn("np", _canonicalize("href", "parent_url"))
    cand = (
        link_rows
        .transform(lambda df: _clean_np(df, cfg))
        .where(F.col("np.url").isNotNull())
        # in-batch dedup: first discovery wins — min (parent_order,
        # link_index) is total because parent orders are globally unique
        .groupBy("np")
        .agg(F.min(F.struct("parent_order", "link_index", "parent_depth",
                            "parent_hash")).alias("m"))
        .select(
            F.col("np.url").alias("url"),
            F.xxhash64("np.url").alias("url_hash"),
            F.coalesce(F.col("np.host"), F.lit("")).alias("host"),
            F.coalesce(F.col("np.path"), F.lit("/")).alias("path"),
            (F.col("m.parent_depth") + 1).cast("int").alias("depth"),
            F.col("m.parent_order").alias("parent_order"),
            F.col("m.link_index").cast("int").alias("link_index"),
            F.col("m.parent_hash").alias("parent_hash"),
        )
        .localCheckpoint(eager=True)
    )
    # the checkpoint makes this count a ~free cached-block job; it feeds
    # the empty-discovery shortcut below AND the metrics totals (dropping
    # one single-row aggregate + crossJoin from the metrics plan)
    n_cand = cand.count()
    t_cand = time.monotonic()

    rank_cleanup: list = []
    seen = storage.read_seen(s)
    man_s = storage.manifest(s)["tables"]
    use_bloom = cfg.bloom_enabled and "bloom" in man_s
    # prefilter engages only once the seen set is big enough to matter;
    # the running total rides in the manifest (one read, not O(s) scans)
    n_seen = man_s.get("seen", {}).get("total_rows", 0)
    bloom_tbl = storage.read_snapshot("bloom", s) if use_bloom else None
    if n_cand == 0:
        # depth-capped / no-link supersteps: the whole discovery pipeline
        # (bloom split, seen anti-join, robots, rank, checkpoint) would be
        # 4+ latency-bound jobs over zero rows — skip it outright
        fresh = cand
    elif seen is None:
        fresh = cand
    elif use_bloom and n_seen >= cfg.bloom_min_seen:
        # bloom/cuckoo prefilter (§4.2): only 'maybe seen' candidates (true
        # dupes + ~FP-rate of the fresh mass) pay the exact anti-join shuffle
        flagged = split_seen_filter(cfg, cand, bloom_tbl)
        definite = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
        fresh = definite.unionByName(
            maybe.join(seen.select("url_hash", "url"), ["url_hash", "url"],
                       "left_anti"))
    else:
        fresh = cand.join(seen.select("url_hash", "url"),
                          ["url_hash", "url"], "left_anti")
    if n_cand > 0:
        fresh = with_robots_state(fresh, robots)
        if cfg.trap_max_pending is not None:
            # spider-trap guard: cap each host's pending queue.  Blocked
            # rows bypass the cap — they enter as terminal 'filtered'
            # bookkeeping, never as queue mass — and "blocked" must be
            # the SAME predicate _insert_state uses (robots OR
            # off-allowlist), or the two would disagree on which rows
            # consume capacity.  Dropped candidates are NOT marked seen
            # (seen_delta derives from new_rows), so the budget bounds
            # queue depth without blacklisting pages.
            blocked = F.col("robots_blocked")
            if cfg.allowed_domains:
                blocked = blocked | ~F.col("host").isin(
                    *cfg.allowed_domains)
            pend_counts = (frontier.where(is_pending).groupBy("host")
                           .agg(F.count(F.lit(1)).alias("_n_pending")))
            kept = cap_new_per_host(
                fresh.where(~blocked), pend_counts,
                cfg.trap_max_pending, n_salts=cfg.skew_salts,
                broadcast=cfg.broadcast_politeness, approx_rows=n_cand,
                small_max=cfg.rank_small_wave)
            fresh = kept.unionByName(fresh.where(blocked))
        rank_keys = ["parent_order", "link_index", "url_hash"]
        if n_eligible <= cfg.rank_small_wave:  # upper bound on wave size
            w = Window.orderBy(*rank_keys)
            fresh = fresh.withColumn(
                "discovery_order",
                (F.lit(max_order + 1) + F.row_number().over(w) - 1)
                .cast("long"))
        else:
            # pin the bloom/anti-join/trap pipeline ONCE before ranking:
            # global_rank's repartitionByRange samples range boundaries by
            # executing its child plan in full, then the shuffle executes
            # it again — uncheckpointed, the whole candidate-filter
            # pipeline (a Python cogroup + the seen anti-join + the trap
            # windows) ran twice per superstep, a latency tax no core
            # count amortizes (measured 3-11 s/busy-superstep at BOTH
            # local[2] and local[8] on the 800k scaling corpus)
            fresh = fresh.localCheckpoint(eager=True)
            fresh = global_rank(fresh, rank_keys, "discovery_order",
                                start=max_order + 1,
                                num_partitions=cfg.rank_partitions,
                                cleanup=rank_cleanup)
        new_rows = fresh.select(
            "url", "url_hash", "host", "depth", "discovery_order",
            "parent_hash", "link_index",
            F.lit(0).alias("attempt"),
            F.lit(s + 1).alias("next_eligible"),
            _insert_state(cfg).alias("state"),
        )
    else:
        from .storage import FRONTIER_SCHEMA
        new_rows = spark.createDataFrame([], FRONTIER_SCHEMA)

    # ---- state transitions for the wave (R11/R12) -------------------------
    # one checkpointed left-join tags every wave row hit/miss; without it
    # the same wave ⋈ parsed join (broadcast build included) replayed
    # inside the frontier write AND both metrics aggregates of the commit
    wave_tagged = wave_keyed.join(
        parsed.select("url").withColumn("_hit", F.lit(True)),
        "url", "left")
    # new_rows and wave_tagged have independent lineages (candidate filter
    # vs wave ⋈ parsed) — materialize both concurrently: two serial eager
    # checkpoints paid ~2 stage-latency walls per superstep at every core
    # count; overlapped they pay ~max of the two
    new_rows, wave_tagged = _checkpoint_parallel(new_rows, wave_tagged)
    t_ckpt = time.monotonic()

    seen_delta = new_rows.select(
        "url_hash", "url", F.lit(s + 1).cast("int").alias("first_seen_superstep"))
    fetched_rows = (
        wave_tagged.where(F.col("_hit"))
        .select(*[c for c in FRONTIER_COLS if c != "state"],
                F.lit("fetched").alias("state"))
    )
    misses = wave_tagged.where(F.col("_hit").isNull())
    nxt = F.col("attempt") + 1
    retry_rows = misses.select(
        "url", "url_hash", "host", "depth", "discovery_order", "parent_hash",
        "link_index",
        nxt.cast("int").alias("attempt"),
        F.when(nxt >= cfg.max_attempt, F.col("next_eligible"))
         .otherwise(F.lit(s) + backoff_steps_col(
             F.col("url"), nxt,
             min_delay=cfg.min_delay, max_delay=cfg.max_delay,
             multiplier=cfg.multiplier)).cast("int").alias("next_eligible"),
        F.when(nxt >= cfg.max_attempt, F.lit("failed"))
         .otherwise(F.lit("pending")).alias("state"),
    )
    # Delta encoding: the frontier commit carries ONLY this superstep's
    # changed rows (wave transitions + fresh discoveries), tagged rev=s+1.
    # Rewriting the whole frontier per wave would be O(total URLs) I/O per
    # superstep — the scale-killer at a 10^10-URL frontier.  Every
    # ``cfg.frontier_compact_every`` busy steps the folded snapshot is
    # rewritten as a new base so the delta chain (and the fold's broadcast
    # touched-keys set) stays bounded.
    changed = (
        fetched_rows.select(*FRONTIER_COLS)
        .unionByName(retry_rows.select(*FRONTIER_COLS))
        .unionByName(new_rows.select(*FRONTIER_COLS))
        .withColumn("rev", F.lit(s + 1).cast("int"))
    )
    f_ent = man_s["frontier"]
    compact = (len(f_ent["deltas"]) + 1 >= cfg.frontier_compact_every
               or f_ent.get("delta_rows", 0) >= cfg.frontier_compact_rows)
    if compact:
        untouched = frontier.join(wave_keyed.select("url_hash", "url"),
                                  ["url_hash", "url"], "left_anti")
        frontier_tbl = untouched.select(*FRONTIER_COLS, "rev") \
                                .unionByName(changed)
    else:
        frontier_tbl = changed

    # ---- budgets -----------------------------------------------------------
    # grants group by the politeness KEY (== host by default; derived
    # registered domain in domain mode — recomputed column math over the
    # checkpointed wave, free); the budgets table's `host` column holds
    # the key
    # fold from the UNCLAMPED bucket availability: when the quota clamp is
    # active the wave's `avail` is min(bucket, quota-remaining), but the
    # stored bucket must decrement from what the bucket actually had
    # (oracle rule: available(host, s) - granted) — see budget.quota_clamp
    bucket_av = (F.col("bucket_avail") if "bucket_avail" in wave.columns
                 else F.col("avail"))
    grants = (wave.withColumn("_pk", _pk_col(cfg))
              .withColumn("_bav", bucket_av)
              .groupBy("_pk", "_bav").agg(
                  F.count(F.lit(1)).alias("granted"))
              .withColumnRenamed("_pk", "host")
              .withColumnRenamed("_bav", "avail"))
    budgets_next = updated_budgets(budgets, grants, s)
    if quota is not None:
        from .budget import updated_quota
        quota_next = updated_quota(quota, grants)

    # ---- metrics: one bounded aggregate computes every statistic ----------
    # (src, k1, k2) -> n: src 0 = wave rows (k1 partition id, k2
    # next_eligible), src 1 = retry rows (k1 = still-pending flag, k2
    # next_eligible), src 2 = new rows (k1 = robots-filtered flag).  One
    # shuffle over O(partitions + backoff horizon) groups, collected
    # driver-side; the committed metrics table is then built locally so its
    # write is a single-task job with no shuffles.  The old formulation (3
    # whole-table aggregates + 2 crossJoins + 3 groupBys unioned into one
    # write plan) ran 4 shuffle stages inside the concurrent commit window
    # every superstep -- a measured slice of the per-superstep fixed cost.
    # The collect is bounded: partitions x distinct backoff deadlines.
    wall_ms = int((time.monotonic() - t0) * 1000)  # plan-build time; the
    # write job's own duration lands in the manifest timestamp instead
    # the three flag branches don't read spark_partition_id, so collapsing
    # their (checkpointed, in-memory) partitions is free and cuts the
    # aggregate's map-task count ~4x — at wide shuffle settings this job
    # was ~100+ near-empty tasks of pure launch latency per superstep.
    # The wave branch MUST keep its native partitioning: k1 IS its
    # partition id (the per-partition lineage metric).
    flags = (
        retry_rows.select(
            F.lit(1).alias("src"),
            (F.col("state") == "pending").cast("long").alias("k1"),
            F.col("next_eligible").cast("long").alias("k2"))
        .unionByName(new_rows.select(
            F.lit(2).alias("src"),
            (F.col("state") == "filtered").cast("long").alias("k1"),
            F.lit(0).cast("long").alias("k2")))
        .unionByName(wave_tagged.select(
            F.lit(3).alias("src"),
            F.col("_hit").isNotNull().cast("long").alias("k1"),
            F.lit(0).cast("long").alias("k2")))
        .coalesce(max(1, min(8, cfg.shuffle_partitions)))
    )
    grouped_plan = (
        wave.select(F.lit(0).alias("src"),
                    F.spark_partition_id().cast("long").alias("k1"),
                    F.col("next_eligible").cast("long").alias("k2"))
        .unionByName(flags)
        .groupBy("src", "k1", "k2").agg(F.count(F.lit(1)).alias("n"))
    )
    # The collect runs in a driver thread and the row -> metrics decoding
    # happens lazily inside the commit's concurrent write pool (the
    # LocalTable resolves when the metrics file is written), so this
    # aggregate overlaps the 5-6 table-write jobs instead of standing as
    # its own serial ~0.5-1.5 s wall in front of the commit — a fixed
    # per-superstep latency no core count amortized.  The inputs are all
    # checkpointed, so the job is a shallow scan over in-memory blocks;
    # atomicity is unchanged (manifest publishes after metrics is on
    # disk) and the stats read back AFTER commit() returns.
    import threading
    _box: dict = {}

    def _collect_grouped():
        try:
            _box["rows"] = grouped_plan.collect()
        except BaseException as e:  # surfaced at resolve() time
            _box["err"] = e
    _th = threading.Thread(target=_collect_grouped, daemon=True)
    _th.start()
    t_metrics = time.monotonic()
    mx: dict = {}

    def _decode_metrics() -> list:
        _th.join()
        if "err" in _box:
            raise _box["err"]
        part_counts: dict[int, int] = {}
        wave_hist: dict[int, int] = {}
        retry_hist: dict[int, int] = {}
        n_wave = n_retry = n_failed = n_new_rows = n_blocked = n_fetched = 0
        for r in _box["rows"]:
            k1, k2, n = int(r["k1"]), int(r["k2"]), int(r["n"])
            if r["src"] == 0:
                part_counts[k1] = part_counts.get(k1, 0) + n
                wave_hist[k2] = wave_hist.get(k2, 0) + n
                n_wave += n
            elif r["src"] == 3:
                if k1:
                    n_fetched += n
            elif r["src"] == 1:
                if k1:
                    retry_hist[k2] = retry_hist.get(k2, 0) + n
                    n_retry += n
                else:
                    n_failed += n
            else:
                n_new_rows += n
                if k1:
                    n_blocked += n
        mx.update(part_counts=part_counts, wave_hist=wave_hist,
                  retry_hist=retry_hist, n_wave=n_wave, n_retry=n_retry,
                  n_failed=n_failed, n_new_rows=n_new_rows,
                  n_blocked=n_blocked, n_fetched=n_fetched,
                  budget_deferred=n_eligible - n_wave)
        nones = (None,) * 7
        metrics_rows = [(s, pid, n) + nones
                        for pid, n in sorted(part_counts.items())]
        metrics_rows.append((s, -1, n_wave, n_cand, n_cand - n_new_rows,
                             n_blocked, mx["budget_deferred"], wall_ms,
                             n_retry, n_failed))
        # next_eligible histograms ride as metrics rows so the engine
        # derives the NEXT superstep's head driver-side -- no
        # frontier_head Spark job between busy supersteps.  Encoding:
        # partition_id = -1000 - ne for wave rows leaving pending,
        # -2000 - ne for retries re-entering it.
        metrics_rows += [(s, -1000 - ne, n) + nones
                         for ne, n in sorted(wave_hist.items())]
        metrics_rows += [(s, -2000 - ne, n) + nones
                         for ne, n in sorted(retry_hist.items())]
        if bloom_saturated:
            metrics_rows.append((s, -3, int(n_seen)) + nones)
        return metrics_rows
    # seen-filter saturation watchdog (driver math, no Spark job): past the
    # design point the prefilter degrades toward pass-through — every
    # candidate flagged "maybe seen" pays the exact anti-join again.  The
    # per-impl thresholds (bloom: ~1% FP load solved from
    # FP = (1 - e^(-kn/m))^k; cuckoo: 95% of 4-slot fill) live in
    # seenfilter.saturation_watch.  Correctness never depends on the
    # filter, so the response is visibility: a metrics row
    # (partition_id = -3, rows_in = total keys) + a stats flag telling the
    # operator to re-deploy with more buckets (a bloom cannot be rebuilt
    # mid-run without false negatives; see config.bloom_* / cuckoo_*).
    if use_bloom:
        bloom_keys_per_bucket, bloom_saturated = saturation_watch(cfg, n_seen)
    else:
        bloom_keys_per_bucket, bloom_saturated = 0.0, False
    # driver-local rows commit without a Spark job (see LocalTable) — a
    # parallelize + distributed write of ~40 rows measured ~5 s/superstep
    # of pure scheduling under load.  rows_fn defers to _decode_metrics so
    # the collect above overlaps the other write jobs inside commit().
    metrics = LocalTable(None, METRICS_SCHEMA, rows_fn=_decode_metrics)

    # seen compaction: periodically fold base + delta chain + this delta
    # into a fresh base so the anti-join read side stays a bounded file set
    seen_compact = (seen is not None and
                    len(man_s.get("seen", {}).get("deltas", ())) + 1
                    >= cfg.seen_compact_every)
    seen_tbl = seen.unionByName(seen_delta) if seen_compact else seen_delta
    # delta writes have driver-known row bounds — cap their file counts
    # (compacted bases keep full parallelism: their size is unbounded)
    cap = max(1, cfg.shuffle_partitions)
    if not compact:
        frontier_tbl = _coalesce_for_write(frontier_tbl,
                                           n_eligible + n_cand, cap)
    if not seen_compact:
        seen_tbl = _coalesce_for_write(seen_tbl, n_cand, cap)
    tables = {
        "frontier": frontier_tbl,
        "budgets": budgets_next if not cfg.broadcast_politeness
        else budgets_next.coalesce(min(cap, 8)),
        "seen": seen_tbl,
        "results": _coalesce_for_write(results, n_eligible, cap),
        "metrics": metrics,
    }
    reuse_tables: dict[str, int] = {}
    if quota is not None:
        tables["quota"] = quota_next if not cfg.broadcast_politeness \
            else quota_next.coalesce(min(cap, 8))
    elif "quota" in man_s:
        # quota clamp disabled on a resume of a quota-enabled run: carry
        # the cumulative grant counts forward unchanged so re-enabling the
        # quota later still sees every key's spend (dropping the table
        # would silently reset every key to zero used — up to 2x the
        # intended cap)
        reuse_tables["quota"] = s
    if use_bloom:
        # fold the new keys in; never (re)create a filter mid-run — one
        # missing earlier keys would cause false negatives (= lost dedup)
        tables["bloom"] = update_seen_filter(
            cfg, bloom_tbl, new_rows.select("url_hash"))
    # The eager checkpoints above already materialized the shared lineage
    # exactly once (wave -> parsed -> cand -> new_rows), so the 5-6
    # concurrent write jobs below are shallow scans over in-memory blocks —
    # no repeated parse stages (the round-1 anomaly) and no repeated
    # planning/broadcast work (the round-2 driver-floor anomaly).
    t_mat = time.monotonic()
    storage.commit(s + 1, tables, extra={"stats_pending": n_pending},
                   reuse=reuse_tables or None,
                   delta_frontier=not compact,
                   delta_seen=not seen_compact)
    t_commit = time.monotonic()

    # the deferred metrics decode ran inside commit() (the manifest is
    # only published after the metrics table resolves), so mx is filled
    # by now; this superstep's newly-seen count == its new_rows count
    # (seen is keyed by url_hash/url and new_rows are already
    # seen-deduped), so no manifest read-back is needed
    n_wave, n_fetched = mx["n_wave"], mx["n_fetched"]
    n_new = mx["n_new_rows"]
    n_blocked = mx["n_blocked"]
    # Derive the NEXT superstep's head from the histograms collected with
    # the metrics aggregate above — the engine loop pays zero
    # frontier_head (or metrics read-back) jobs between busy supersteps.
    hist_next = dict(head["hist"])
    for ne, n in mx["wave_hist"].items():         # granted rows left pending
        left = hist_next.get(ne, 0) - n
        if left > 0:
            hist_next[ne] = left
        else:
            hist_next.pop(ne, None)
    for ne, n in mx["retry_hist"].items():        # retries re-enter pending
        hist_next[ne] = hist_next.get(ne, 0) + n
    new_pending = n_new - n_blocked
    if new_pending > 0:
        hist_next[s + 1] = hist_next.get(s + 1, 0) + new_pending
    head_next = {"pending": sum(hist_next.values()), "hist": hist_next,
                 "max_order": max_order + n_new}

    stats = {
        "head_next": head_next,
        "superstep": s, "pending": n_pending, "eligible": n_eligible,
        "wave": n_wave, "fetched": n_fetched,
        "failed_or_retry": n_wave - n_fetched,
        "discovered": n_new,
        # phase walls (seconds): grant+pop job / discovery materialization
        # (parse, canonicalize, dedup, rank) / the commit's table writes
        "t_wave": round(t_wave - t_plan, 2),
        "t_mat": round(t_mat - t_wave, 2),
        # t_mat sub-phases: parse ckpt / candidate canonicalize+dedup ckpt
        # / rank + seen anti-join + new_rows ckpt (+ metric plan build)
        "t_parse": round(t_parse - t_wave, 2),
        "t_cand": round(t_cand - t_parse, 2),
        "t_rank": round(t_mat - t_cand, 2),
        # t_rank sub-phases: bloom/anti-join/trap/rank plan + the parallel
        # new_rows/wave_tagged materialization, driver-side metrics
        # collect, bloom-update plan build (residual)
        "t_ckpt": round(t_ckpt - t_cand, 2),
        "t_metrics": round(t_metrics - t_ckpt, 2),
        "t_rank_resid": round(t_mat - t_metrics, 2),
        "t_commit": round(t_commit - t_mat, 2),
        "bloom_keys_per_bucket": round(bloom_keys_per_bucket, 1),
        "bloom_saturated": bloom_saturated,
        "deduped": n_cand - n_new, "robots_blocked": n_blocked,
        "budget_deferred": mx["budget_deferred"], "wall_ms": wall_ms,
        # by construction equals (pending - wave) + retries + new_pending
        "pending_after": head_next["pending"],
    }
    for df in rank_cleanup:
        df.unpersist()
    # checkpoint blocks (wave/parsed/cand/new_rows) are released by the
    # ContextCleaner once the DataFrames go out of scope; they spill
    # MEMORY_AND_DISK meanwhile, so a long run cannot OOM on them
    return stats
