"""Engine — construction + the batch-iterative driver loop.

``Engine(spark, cfg)`` mirrors the reference's ``New(opts...)``
(``remilia.go:42-78``): assemble config + handles, spawn nothing.
``run(...)`` mirrors ``rem.Do(provider, layers...)``
(``remilia.go:178-185``): the provider becomes the seed frontier, each layer
becomes one superstep depth, and the channel pipeline becomes a driver-side
loop of checkpointed DataFrame jobs (supersteps are barriers — the one
deliberate architecture change vs the reference's free-running stages,
required for determinism + resume).

Resume: state is only visible through commit manifests, so
``run(resume=True)`` continues from ``storage.last_committed()`` — an
interrupted superstep left no manifest and is recomputed identically (no
duplicate fetches; tests pin this).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import CrawlConfig
from .frontier import frontier_head, run_superstep, seed_frontier
from .storage import (
    BUDGETS_SCHEMA,
    METRICS_SCHEMA,
    RESULTS_SCHEMA,
    ParquetSnapshotStorage,
)


@dataclass
class CrawlRun:
    storage: ParquetSnapshotStorage
    last_superstep: int
    stats: list[dict] = field(default_factory=list)
    setup_sec: float = 0.0  # seed canonicalize+commit + initial head wall

    def results(self) -> DataFrame | None:
        return self.storage.read_deltas("results", self.last_superstep,
                                        RESULTS_SCHEMA)

    def seen(self) -> DataFrame | None:
        """Seen set via the manifest's base + delta chain (periodically
        compacted; stale delta dirs are left for out-of-band GC, like
        Iceberg's expire_snapshots)."""
        return self.storage.read_seen(self.last_superstep)

    def metrics(self) -> DataFrame | None:
        return self.storage.read_deltas("metrics", self.last_superstep,
                                        METRICS_SCHEMA)

    def frontier(self) -> DataFrame:
        """Folded current frontier (rev column is storage-internal)."""
        return self.storage.read_frontier(self.last_superstep).drop("rev")

    def fetch_events(self) -> DataFrame | None:
        """Fetch log in canonical crawl order (the ordering fixture)."""
        r = self.results()
        if r is None:
            return None
        return r.orderBy("superstep", "depth", "host_rank", "discovery_order")


class _RunLogSink:
    """Per-run log file — the reference tees zap logs to
    ``logs/<id>_<ts>.log`` (logger.go:99-116); we tee one JSON line per
    superstep to ``<state_dir>/logs/run_<ts>.log`` (R5).  No-op when the
    storage backend has no directory."""

    def __init__(self, state_dir, resume: bool):
        self.path = None
        if state_dir is None:
            return
        import time as _t
        logs = Path(state_dir) / "logs"
        logs.mkdir(parents=True, exist_ok=True)
        ts = _t.strftime("%Y%m%d_%H%M%S")
        self.path = logs / f"run_{ts}_{'resume' if resume else 'fresh'}.log"

    def write(self, stats: dict) -> None:
        if self.path is not None:
            import json
            with self.path.open("a") as f:
                f.write(json.dumps(stats) + "\n")


class Engine:
    def __init__(self, spark: SparkSession, cfg: CrawlConfig | None = None):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()

    def run(
        self,
        pages: DataFrame,
        seeds: DataFrame,
        robots: DataFrame | None,
        state_dir: str | Path | None = None,
        resume: bool = False,
        max_supersteps: int | None = None,
        layer_fns=None,
        pre_fetch_hooks=None,
        post_parse_hooks=None,
        storage=None,
        authority=None,
    ) -> CrawlRun:
        """Run the crawl.  State goes to ``ParquetSnapshotStorage(state_dir)``
        unless a ``storage`` instance (any impl of the commit/read protocol,
        e.g. ``InMemorySnapshotStorage``; Iceberg on a cluster) is passed —
        the backend swap is exactly this constructor change.

        ``authority`` (optional): a ``(host, rank_fp)`` table — e.g.
        ``datapipe.graph.pagerank`` over a previous crawl's link graph —
        reorders the priority pop so higher-authority hosts fetch first
        within a depth.  Only meaningful with ``cfg.wave_size`` (without a
        cap, every eligible granted row fetches this superstep anyway)."""
        cfg = self.cfg
        if storage is None:
            if state_dir is None:
                raise ValueError("pass state_dir or a storage instance")
            storage = ParquetSnapshotStorage(self.spark, state_dir)
        pages_pinned = None
        restore_conf = None
        use_buckets = bool(cfg.fetch_buckets)
        if use_buckets and cfg.fetch_bucket_min_pages:
            # size-adaptive fetch path: below the crossover the broadcast
            # join beats the one-time bucket shuffle + per-wave repartition
            # (see config.fetch_bucket_min_pages).  One zero-column count
            # job at startup; identical results on either path.
            use_buckets = pages.count() >= cfg.fetch_bucket_min_pages
        if use_buckets:
            # Iceberg bucket-transform stand-in: shuffle pages ONCE onto
            # pmod(xxhash64(url), B) and pin; every superstep's fetch join
            # is then bucket-local (see config.fetch_buckets).  The subset
            # co-partition needs this conf (runtime SQL conf — saved and
            # restored so the session isn't mutated past the run).
            conf_key = "spark.sql.requireAllClusterKeysForCoPartition"
            restore_conf = self.spark.conf.get(conf_key, None)
            self.spark.conf.set(conf_key, "false")
            from pyspark.sql import functions as F2
            b = F2.pmod(F2.xxhash64("url"),
                        F2.lit(cfg.fetch_buckets)).cast("int")
            pages = pages.withColumn("_fetch_bucket", b) \
                .repartition(cfg.fetch_buckets, "_fetch_bucket").persist()
            pages_pinned = pages
        elif cfg.fetch_buckets:
            import dataclasses
            cfg = dataclasses.replace(cfg, fetch_buckets=None)
        import time as _time
        t_setup = _time.monotonic()
        last = storage.last_committed() if resume else None
        if last is not None and hasattr(storage, "migrate_legacy_seen"):
            # pre-r3 checkpoints recorded seen without base/deltas chain
            # keys — fold them into the current manifest format once
            ent = storage.manifest(last)["tables"].get("seen")
            if ent is not None and "base" not in ent:
                storage.migrate_legacy_seen(last)
        log_sink = _RunLogSink(state_dir, resume)
        if last is None:
            # fresh run into a dirty state_dir: wipe it — otherwise stale
            # higher-numbered manifests from an earlier, longer run would
            # survive and a later resume=True would silently continue from
            # a mix of old and new state
            storage.clear()
            frontier0, seen0 = seed_frontier(self.spark, seeds, robots, cfg)
            budgets0 = self.spark.createDataFrame([], BUDGETS_SCHEMA)
            tables = {"frontier": frontier0.withColumn(
                          "rev", F.lit(0).cast("int")),
                      "budgets": budgets0, "seen": seen0}
            if cfg.max_fetch_per_key is not None:
                from .budget import QUOTA_SCHEMA
                tables["quota"] = self.spark.createDataFrame(
                    [], QUOTA_SCHEMA)
            if cfg.bloom_enabled:
                from .seenfilter import (empty_seen_filter,
                                         update_seen_filter)
                tables["bloom"] = update_seen_filter(
                    cfg, empty_seen_filter(self.spark, cfg),
                    seen0.select("url_hash"))
            storage.commit(0, tables)
            last = 0

        limit = max_supersteps if max_supersteps is not None \
            else cfg.max_supersteps
        run = CrawlRun(storage=storage, last_superstep=last)
        s = last
        try:
            head = frontier_head(storage, s)
            run.setup_sec = round(_time.monotonic() - t_setup, 2)
            while s < limit:
                # done when the committed frontier carries no pending rows
                # (reference analogue: channels drained, pipeline.go:142-158)
                if head["pending"] == 0:
                    break
                eligible = sum(c for k, c in head["hist"].items() if k <= s)
                if eligible == 0:
                    # every pending row is backing off: fast-forward the
                    # clock with pure manifest-alias commits — no Spark jobs
                    next_s = min(k for k in head["hist"] if k > s)
                    next_s = min(next_s, limit)
                    reuse_keys = ["frontier", "budgets", "seen"]
                    for extra_t in ("bloom", "quota"):
                        if extra_t in storage.manifest(s)["tables"]:
                            reuse_keys.append(extra_t)
                    for t in range(s, next_s):
                        stats = {"superstep": t, "pending": head["pending"],
                                 "eligible": 0, "wave": 0, "fetched": 0,
                                 "discovered": 0,
                                 "pending_after": head["pending"],
                                 "idle": True}
                        storage.commit(t + 1, {}, extra={"stats": stats},
                                       reuse={k: s for k in reuse_keys})
                        run.stats.append(stats)
                        log_sink.write(stats)
                    s = next_s
                    run.last_superstep = s
                    continue
                stats = run_superstep(self.spark, storage, pages, robots,
                                      cfg, s,
                                      layer_fns=layer_fns,
                                      pre_fetch_hooks=pre_fetch_hooks,
                                      post_parse_hooks=post_parse_hooks,
                                      head=head, authority=authority)
                run.stats.append(stats)
                log_sink.write(stats)
                s += 1
                run.last_superstep = s
                if stats["pending_after"] == 0:
                    break
                # next head comes back with the superstep's committed
                # metrics — no frontier_head job between busy supersteps
                head = stats["head_next"]
        finally:
            if pages_pinned is not None:
                pages_pinned.unpersist()
                conf_key = "spark.sql.requireAllClusterKeysForCoPartition"
                if restore_conf is not None:
                    self.spark.conf.set(conf_key, restore_conf)
                else:
                    self.spark.conf.unset(conf_key)
        return run
