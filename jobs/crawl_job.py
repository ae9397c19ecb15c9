"""spark-submit entry point for the crawl engine.

Cluster usage (north rule: ships as ``spark-submit --py-files``):

    python jobs/package.py                        # builds dist/remilia_spark.zip
    spark-submit --py-files dist/remilia_spark.zip jobs/crawl_job.py \\
        --pages s3://bucket/pages/ --seeds s3://bucket/seeds.parquet \\
        --robots s3://bucket/robots.parquet --state s3://bucket/state/ \\
        --max-depth 3 --resume

Local sandbox smoke:

    python jobs/crawl_job.py --corpus /tmp/corpus --state /tmp/state \\
        --master 'local[8]'
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

try:  # local runs: put the repo root on sys.path; clusters use --py-files
    import remilia_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv):
    p = argparse.ArgumentParser(description="remilia-spark crawl job")
    p.add_argument("--pages")
    p.add_argument("--seeds")
    p.add_argument("--robots")
    p.add_argument("--corpus", help="dir with pages/seeds/robots parquet "
                                    "(shorthand for the three paths)")
    p.add_argument("--state", required=True)
    p.add_argument("--master", default=None,
                   help="only for local runs; on a cluster let spark-submit "
                        "set the master")
    p.add_argument("--max-depth", type=int, default=2)
    p.add_argument("--max-supersteps", type=int, default=64)
    p.add_argument("--wave-size", type=int, default=None)
    p.add_argument("--authority", default=None,
                   help="parquet of (host, rank_fp) — e.g. "
                        "datapipe.graph.pagerank output from a previous "
                        "crawl's link graph; reorders the capped priority "
                        "pop toward high-authority hosts (needs --wave-size)")
    p.add_argument("--max-attempt", type=int, default=10)
    p.add_argument("--bucket-capacity", type=int, default=100)
    p.add_argument("--fill-quantum", type=int, default=10)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--trap-max-pending", type=int, default=None,
                   help="spider-trap guard: max pending frontier rows per "
                        "host; over-cap discoveries drop at insertion "
                        "(re-discoverable once the queue drains)")
    p.add_argument("--allowed-domains", default=None,
                   help="comma-separated host allowlist (the reference's "
                        "AllowedDomain); off-list discoveries insert as "
                        "terminal 'filtered' rows and never consume the "
                        "trap guard's per-host capacity")
    p.add_argument("--max-fetch-per-key", type=int, default=None,
                   help="crawl-budget quota: max grants per politeness "
                        "key over the whole crawl (checkpointed; resumes "
                        "continue the count)")
    p.add_argument("--politeness-key", default="host",
                   choices=("host", "domain"),
                   help="token-bucket key: per host (default) or per "
                        "registered domain (eTLD+1) — one bucket per "
                        "registrable domain stops subdomain-spray rate "
                        "multiplication")
    p.add_argument("--strip-tracking-params", action="store_true",
                   help="second canonicalization pass: drop cross-site "
                        "tracking params (utm_*, fbclid, gclid, ...) from "
                        "every discovered URL so analytics variants "
                        "collapse to one seen-set entry and one fetch")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seen-filter", default="bloom",
                   choices=("bloom", "cuckoo"),
                   help="seen-prefilter impl (north rule: bloom/cuckoo); "
                        "cuckoo supports --expire-seen-before without a "
                        "filter rebuild")
    p.add_argument("--expire-seen-before", type=int, default=None,
                   help="maintenance before the run: drop seen entries "
                        "first seen before this superstep (seen-TTL) so "
                        "stale URLs become re-discoverable; cuckoo deletes "
                        "in place, bloom rebuilds from the kept set. "
                        "Requires --resume (operates on the checkpoint)")
    p.add_argument("--merge-seeds", default=None,
                   help="parquet of (url, seed_order) — e.g. the streaming "
                        "landing table via read_landing — injected into the "
                        "checkpoint as new pending rows before the run. "
                        "Requires --resume")
    p.add_argument("--history", default=None,
                   help="parquet dir of the standing-crawl fetch history "
                        "(url, fetch_idx, fetch_epoch, content_hash); this "
                        "cycle's results are appended to it")
    p.add_argument("--cycle", type=int, default=0,
                   help="standing-crawl cycle number (fetch_idx for the "
                        "appended history rows)")
    p.add_argument("--fetch-epoch", type=int, default=None,
                   help="epoch seconds stamped on this cycle's history "
                        "rows (default: wall clock)")
    p.add_argument("--results-out", default=None,
                   help="export this cycle's results table to a parquet "
                        "dir; with --history the export is revisit-"
                        "compacted first (unchanged refetches store "
                        "revisit=true + content_hash, no text — the CC "
                        "revisit-record analogue)")
    p.add_argument("--schedule-out", default=None,
                   help="write the recrawl schedule (recrawl_schedule over "
                        "the updated history) to this parquet dir; pair "
                        "with recrawl.due_urls for the next cycle's seeds")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from pyspark.sql import SparkSession

    from remilia_spark.config import CrawlConfig
    from remilia_spark.engine import Engine

    b = SparkSession.builder.appName("remilia-spark-crawl")
    if args.master:
        b = b.master(args.master)
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    b = b.config("spark.sql.adaptive.enabled", "true") \
         .config("spark.sql.session.timeZone", "UTC")
    spark = b.getOrCreate()

    pages_p = args.pages or f"{args.corpus}/pages.parquet"
    seeds_p = args.seeds or f"{args.corpus}/seeds.parquet"
    robots_p = args.robots or (f"{args.corpus}/robots.parquet"
                               if args.corpus else None)
    pages = spark.read.parquet(pages_p)
    seeds = spark.read.parquet(seeds_p)
    robots = spark.read.parquet(robots_p) if robots_p else None

    cfg = CrawlConfig(
        max_depth=args.max_depth,
        max_supersteps=args.max_supersteps,
        wave_size=args.wave_size,
        max_attempt=args.max_attempt,
        bucket_capacity=args.bucket_capacity,
        fill_quantum=args.fill_quantum,
        trap_max_pending=args.trap_max_pending,
        allowed_domains=(tuple(h.strip() for h in
                               args.allowed_domains.split(",") if h.strip())
                         if args.allowed_domains else ()),
        seen_filter=args.seen_filter,
        strip_tracking_params=args.strip_tracking_params,
        politeness_key=args.politeness_key,
        max_fetch_per_key=args.max_fetch_per_key,
    )
    if args.expire_seen_before is not None or args.merge_seeds:
        if not args.resume:
            raise SystemExit("--expire-seen-before/--merge-seeds operate "
                             "on an existing checkpoint: pass --resume")
        from remilia_spark import maintenance
        from remilia_spark.storage import ParquetSnapshotStorage

        st = ParquetSnapshotStorage(spark, args.state)
        if args.expire_seen_before is not None:
            print(json.dumps(maintenance.expire_seen(
                spark, st, cfg, older_than=args.expire_seen_before)))
        if args.merge_seeds:
            print(json.dumps(maintenance.merge_seeds(
                spark, st, cfg, spark.read.parquet(args.merge_seeds),
                robots=robots)))
    authority = (spark.read.parquet(args.authority)
                 if args.authority else None)
    run = Engine(spark, cfg).run(pages, seeds, robots, args.state,
                                 resume=args.resume, authority=authority)
    if args.history or args.schedule_out or args.results_out:
        import time as _time

        from pathlib import Path as _Path

        from remilia_spark import recrawl

        epoch = args.fetch_epoch if args.fetch_epoch is not None \
            else int(_time.time())
        rows = recrawl.history_from_results(run.results(), cycle=args.cycle,
                                            fetch_epoch=epoch)
        if args.results_out:
            # export BEFORE the history append: revisit status compares
            # against PREVIOUS cycles, never this cycle's own hashes
            out = run.results()
            if args.history and _Path(args.history).exists():
                out = recrawl.revisit_compact(
                    out, spark.read.parquet(args.history))
            out.write.mode("overwrite").parquet(args.results_out)
        if args.history:
            # append-only history table (Iceberg append at deployment)
            rows.write.mode("append").parquet(args.history)
            hist = spark.read.parquet(args.history)
        else:
            hist = rows
        if args.schedule_out:
            recrawl.recrawl_schedule(hist).write.mode("overwrite") \
                .parquet(args.schedule_out)
    for s in run.stats:
        print(json.dumps({"superstep": s["superstep"],
                          "wave": s.get("wave", 0),
                          "fetched": s.get("fetched", 0),
                          "discovered": s.get("discovered", 0),
                          "pending_after": s.get("pending_after")}))
    print(json.dumps({
        "done": True,
        "supersteps": run.last_superstep,
        "fetched_total": sum(s.get("fetched", 0) for s in run.stats),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
