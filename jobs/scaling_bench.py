"""N vs 4N scaling evidence (north rule: >=0.8 efficiency N -> 4N executors).

A real multi-executor cluster cannot run in this sandbox, so the same job is
run at two parallelism levels on identical input (separate JVMs via
subprocess, since a SparkContext's core count is fixed at startup) and
efficiency is reported as

    eff = (throughput_4N / throughput_N) / 4

Default levels are ``local[2]`` vs ``local[8]`` (override with
SPARK_GRAFT_SCALE="N,4N"): the box has 32 real vCPUs (1 thread/core, no
SMT), and warm-pool probes show 2->8 processes deliver the full 4x in
quiet windows while 8->32 sags to ~2.9x under KVM-neighbor tenancy — so
8->32 measures the hypervisor's ceiling, not the engine; 2->8 runs on
genuinely proportional hardware.  Writes BENCH/BASELINE.md and prints one
JSON line.
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
# *work* scales with cores, so waves must dwarf per-superstep fixed costs.
# Many seeds + shallow depth ⇒ few, very wide supersteps: the per-superstep
# floor (job scheduling + commit latency at ANY core count) is paid ~4
# times, and each wave carries ~100k+ pages of parse/canonicalize/shuffle
# work that actually parallelizes.  Sized so one low/high pair completes in
# ~10 min in this sandbox (round-3's 4M default was hours/pair and the
# bench never ran — the round's biggest miss).
BENCH_PAGES = os.environ.get("SPARK_GRAFT_BENCH_PAGES", "800000")
BENCH_SEEDS = os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "16000")
BENCH_DEPTH = os.environ.get("SPARK_GRAFT_BENCH_DEPTH", "3")
SCALE = os.environ.get("SPARK_GRAFT_SCALE", "2,8")
N_LOW, N_HIGH = (int(x) for x in SCALE.split(","))


def _burn(n):  # module-level: ProcessPoolExecutor must pickle it
    import hashlib
    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return h


def _timed_burn(workers: int, n: int) -> float:
    """units/s at ``workers`` processes, pool pre-warmed so process spawn
    is EXCLUDED from the timing.  Round 4's probes timed the spawn too,
    which at ~0.2s-per-burn workloads understated the 8-proc rate by
    ~25-35% and painted a fake ~3.4x "hardware ceiling" on a host that, in
    quiet windows, delivers the full 4x (warm-pool measurement 2->8:
    4.0x) — the single biggest distortion in the round-4 scaling story."""
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(workers) as ex:
        list(ex.map(_burn, [1000] * workers))  # spawn + import, untimed
        t0 = time.time()
        list(ex.map(_burn, [600_000] * workers))
        dt = time.time() - t0
    return workers / dt


def cpu_probe() -> dict:
    """Raw parallel CPU capacity at the two levels (hardware honesty
    check), warm-pool timed."""
    return {w: round(_timed_burn(w, 600_000), 1)
            for w in (1, N_LOW, N_HIGH, 32)}


def quick_probe() -> float:
    """Ambient-capacity snapshot (units/s at N_HIGH procs, warm-pool).

    Run immediately before each bench subprocess; a round whose two
    snapshots disagree badly means the host's capacity shifted mid-pair
    (multi-tenant box, 2-4x swings within minutes) and the pair measures
    the tenancy weather, not the engine.
    """
    return _timed_burn(N_HIGH, 600_000)


def hw_ratio_probe() -> float:
    """How much MORE parallel CPU the host actually delivers at N_HIGH
    procs vs N_LOW procs, right now (warm-pool timed — see _timed_burn).
    The north rule assumes the two cluster sizes differ by exactly 4x in
    delivered compute; on this shared box (32 real vCPUs, no SMT, KVM
    neighbors) quiet windows deliver the full 4x and stormy ones sag to
    ~2.5-3x, which caps ANY job's measured efficiency at ratio/4
    regardless of how well the engine scales.  Recorded per pair so the
    engine's efficiency can be read against the hardware's, never in
    place of the raw number."""
    return _timed_burn(N_HIGH, 600_000) / _timed_burn(N_LOW, 600_000)


def _pin_cpus(cpus: int) -> str | None:
    """Fixed disjoint CPU set for a bench subprocess (taskset mask).

    Mirrors a real cluster's allocation: local[N] gets N executor-thread
    cores plus 2 slack cores for driver/GC/shuffle-io threads (both
    levels get the same slack, so delivered task compute differs by the
    intended 4x).  Fixed DISJOINT ranges mean every round of every hunt
    runs on the same physical cores — scheduler migration and
    level-to-level cache interference stop being noise terms.  Disable
    with SPARK_GRAFT_PIN=0 (e.g. when N_HIGH + N_LOW + 4 > nproc).
    """
    if os.environ.get("SPARK_GRAFT_PIN", "1") != "1":
        return None
    if cpus == N_LOW:
        lo, hi = 0, N_LOW + 1
    else:
        lo, hi = N_LOW + 2, N_LOW + 2 + cpus + 1
    if hi >= (os.cpu_count() or 0):
        return None
    return f"{lo}-{hi}"


def run_bench(cpus: int, crawl_only: bool = False) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_GRAFT_BENCH_PAGES=BENCH_PAGES,
               SPARK_GRAFT_BENCH_SEEDS=BENCH_SEEDS,
               SPARK_GRAFT_BENCH_DEPTH=BENCH_DEPTH)
    # scaling evidence measures the at-scale fetch design: force the
    # bucketed path (the size-adaptive default would pick broadcast below
    # config.fetch_bucket_min_pages); override with the env var to compare
    env.setdefault("SPARK_GRAFT_FETCH_MIN_PAGES", "0")
    # shuffle width ∝ cores, like a real cluster: a 4N-executor cluster
    # runs 4x the reduce tasks.  A fixed width starves the high level
    # (8 tasks on 8 cores = zero slack, any straggler stalls the stage)
    # — measured ~8% at local[8] on the 1.6M corpus.  Identical order
    # hash either way (partitioning never affects results).
    env.setdefault("SPARK_GRAFT_SHUFFLE", str(4 * cpus))
    if crawl_only:
        env["SPARK_GRAFT_BENCH_ONLY"] = "crawl"
    cmd = [sys.executable, str(ROOT / "bench.py")]
    mask = _pin_cpus(cpus)
    if mask is not None:
        cmd = ["taskset", "-c", mask, *cmd]
    out = subprocess.run(cmd, env=env,
                         capture_output=True, text=True, cwd=ROOT)
    if out.returncode != 0:
        # surface the child's tail so a failed run is diagnosable from the
        # harness log alone (a captured-but-dropped stderr cost round 4 a
        # golden tenancy window)
        sys.stderr.write("bench.py (cpus=%d) exited %d\nstdout tail:\n%s\n"
                         "stderr tail:\n%s\n" % (
                             cpus, out.returncode,
                             out.stdout[-2000:], out.stderr[-2000:]))
        raise subprocess.CalledProcessError(out.returncode, out.args)
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    # warm the corpus cache so neither run pays generation cost
    t0 = time.time()
    # The host is multi-tenant: throughput fluctuates ~2-4x on a timescale
    # of minutes (the CPU probe itself varies 1.5x between runs), so one
    # low/high pair is meaningless. We run ROUNDS back-to-back interleaved
    # pairs — within a pair the ambient load is maximally correlated —
    # compute the efficiency of each pair, and report the median (all
    # rounds are listed in the JSON for inspection).
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "10"))
    want_admissible = int(os.environ.get("SPARK_GRAFT_SCALE_ADMISSIBLE", "3"))
    # a pair is only admissible if the ambient-capacity snapshots taken
    # right before its two runs agree within this ratio — otherwise the
    # pair measured a tenancy shift, not the engine
    max_drift = float(os.environ.get("SPARK_GRAFT_SCALE_MAX_DRIFT", "0.2"))
    probe = cpu_probe()

    def drift(pl, ph):
        return abs(ph - pl) / max(1e-9, min(pl, ph))

    # warm-up pass: both JVM levels touch the corpus once so no timed run
    # pays a cold page cache (round-2's first pair measured exactly that —
    # a fake 0.94 efficiency from low-cold vs high-warm).
    # SPARK_GRAFT_SCALE_SKIP_WARMUP=1 skips it — for a caller (the
    # quiet-window hunter) that already pre-warmed the corpus and wants
    # the first MEASURED pair to start before the window decays; requires
    # rounds >= 1 since there is no warm-up pair to fall back to.
    skip_warmup = os.environ.get("SPARK_GRAFT_SCALE_SKIP_WARMUP") == "1"
    if skip_warmup and rounds < 1:
        raise SystemExit("SKIP_WARMUP needs SPARK_GRAFT_SCALE_ROUNDS >= 1")
    low = high = None
    if not skip_warmup:
        low = run_bench(N_LOW)      # full query table, once per level
        high = run_bench(N_HIGH)
    pairs = []                      # (lo_parsed, hi_parsed, p_lo, p_hi, hw)
    hashes = set() if skip_warmup else \
        {low["crawl_order_hash"], high["crawl_order_hash"]}
    for _ in range(rounds):
        if sum(1 for p in pairs if drift(p[2], p[3]) <= max_drift) \
                >= want_admissible:
            break  # enough quiet-host pairs collected
        hw = hw_ratio_probe()
        p_lo = quick_probe()
        lo = run_bench(N_LOW, crawl_only=True)
        p_hi = quick_probe()
        hi = run_bench(N_HIGH, crawl_only=True)
        pairs.append((lo, hi, p_lo, p_hi, hw))
        hashes |= {lo["crawl_order_hash"], hi["crawl_order_hash"]}

    if not pairs:
        # SPARK_GRAFT_SCALE_ROUNDS=0: fall back to the warm-up pair (no
        # probes bracket it — mark them equal so it reads as admissible)
        pairs = [(low, high, 1.0, 1.0, None)]
    if low is None:                 # skip-warmup: report table from the
        low, high = pairs[0][0], pairs[0][1]  # first measured pair
    admissible = [p for p in pairs if drift(p[2], p[3]) <= max_drift]
    used = admissible if admissible else pairs
    def pair_eff(p):
        return (p[1]["value"] / p[0]["value"]) / (N_HIGH / N_LOW)
    # the round that REALIZES the median efficiency (lower middle) — every
    # headline number below comes from this one coherent round, so
    # URLs/sec x seconds x URLs-processed are mutually consistent
    used_sorted = sorted(used, key=pair_eff)
    med = used_sorted[(len(used_sorted) - 1) // 2]
    eff = pair_eff(med)
    # secondary, capacity-normalized metric: divide each run's throughput
    # by the ambient capacity its bracketing probe saw, then take the
    # ratio.  This corrects multiplicative tenancy slowdowns the raw
    # number conflates with engine scaling; reported alongside, never
    # in place of, the raw efficiency.
    eff_norm = ((med[1]["value"] / med[3]) / (med[0]["value"] / med[2])) \
        / (N_HIGH / N_LOW)
    # hardware-delivered ceiling for the median round: the raw efficiency
    # cannot exceed hw_ratio/4 no matter how well the engine scales, so
    # the engine's own scaling is eff relative to that ceiling
    hw = med[4]
    scale = N_HIGH / N_LOW
    eff_vs_hw = round(eff / (hw / scale), 3) if hw else None

    def steady_thr(parsed):
        # steady-state throughput: exclude the one-time setup wall (seed
        # canonicalize+commit + bloom init + initial head) that amortizes
        # to zero at production superstep counts (10^4 supersteps vs the
        # fixture's ~5) but is ~12% of a fixture run at the high level
        ph = parsed.get("crawl_phases", {})
        sec = parsed["queries"]["crawl"] - ph.get("t_setup", 0.0)
        return parsed["crawl_urls_processed"] / max(1e-9, sec)

    eff_steady = round((steady_thr(med[1]) / steady_thr(med[0])) / scale, 3)
    eff_steady_vs_hw = round(eff_steady / (hw / scale), 3) if hw else None
    ordering_match = len(hashes) == 1  # every run, both levels, all rounds

    def phase_row(parsed):
        ph = dict(parsed.get("crawl_phases", {}))
        ph["crawl_sec"] = parsed["queries"]["crawl"]
        ph["urls_per_sec"] = parsed["value"]
        return ph

    med_low, med_high = phase_row(med[0]), phase_row(med[1])
    # per-phase scaling of the median round: says WHICH phase fails to
    # scale when the headline number does (t_other ~ driver floor)
    phase_scaling = {
        k: round((med_low[k] / med_high[k]) / (N_HIGH / N_LOW), 3)
        for k in ("t_wave", "t_mat", "t_commit", "t_other")
        if med_high.get(k) and med_low.get(k)
    }
    report = {
        "crawl_ordering_match_across_parallelism": ordering_match,
        "metric": f"scaling_efficiency_{N_LOW}_to_{N_HIGH}",
        "cpu_probe_units_per_sec": probe,
        "value": round(eff, 3),
        "value_capacity_normalized": round(eff_norm, 3),
        "hw_delivered_ratio_median_round": round(hw, 2) if hw else None,
        "hw_ceiling_on_efficiency": round(hw / scale, 3) if hw else None,
        "value_vs_hw_ceiling": eff_vs_hw,
        "value_steady_state": eff_steady,
        "value_steady_state_vs_hw_ceiling": eff_steady_vs_hw,
        "unit": "ratio",
        "admissible_rounds": len(admissible),
        "max_probe_drift": max_drift,
        "rounds": [{"low": lo["value"], "high": hi["value"],
                    "eff": round(pair_eff(p), 3),
                    "probe_low": round(pl, 1), "probe_high": round(ph, 1),
                    "hw_ratio": round(hw_r, 2) if hw_r else None,
                    "admissible": drift(pl, ph) <= max_drift}
                   for p in pairs for lo, hi, pl, ph, hw_r in [p]],
        "median_round": {f"local[{N_LOW}]": med_low,
                         f"local[{N_HIGH}]": med_high},
        "phase_scaling_median_round": phase_scaling,
        "urls_per_sec": {f"local[{N_LOW}]": med[0]["value"],
                         f"local[{N_HIGH}]": med[1]["value"]},
        "full_table_warmup_run": None if skip_warmup else {
            f"local[{N_LOW}]": low["queries"],
            f"local[{N_HIGH}]": high["queries"]},
        "crawl_urls_processed": med[0]["crawl_urls_processed"],
        "sf": low["sf"],
        "wall_sec": round(time.time() - t0, 1),
    }
    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    # persistent replication log: every pair of every hunt, one JSON line.
    # The cross-hunt HEADLINE is the median over ALL admissible rounds at
    # this config — not whatever window the latest hunt happened to catch
    # (round-4 lesson: a single best-window capture misrepresents a noisy
    # host; the median across hunts is the defensible number).
    log_path = bench_dir / "scaling_rounds.jsonl"
    cfg_key = {"scale": SCALE, "pages": BENCH_PAGES, "seeds": BENCH_SEEDS,
               "depth": BENCH_DEPTH,
               "pinned": os.environ.get("SPARK_GRAFT_PIN", "1") == "1",
               "warm_probes": True}
    with open(log_path, "a") as fh:
        for r in report["rounds"]:
            fh.write(json.dumps({**cfg_key, **r, "ts": int(time.time())})
                     + "\n")
    hist = []
    for line in log_path.read_text().splitlines():
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if (row.get("scale") == SCALE and row.get("pages") == BENCH_PAGES
                and row.get("admissible") and row.get("warm_probes")):
            hist.append(float(row["eff"]))
    hist.sort()
    report["all_hunts_admissible_rounds"] = len(hist)
    report["all_hunts_median"] = hist[(len(hist) - 1) // 2] if hist else None
    report["all_hunts_range"] = [hist[0], hist[-1]] if hist else None
    md = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        "North rule: >=0.8 throughput scaling efficiency from N to 4N",
        "executors. No real cluster exists in this sandbox, so the same",
        "crawl job runs on identical input at two local parallelism",
        "levels (separate JVMs); the corpus is pre-generated and cached so",
        "runs time Spark execution only. The host is multi-tenant and",
        "noisy (ambient throughput swings 2-4x over minutes), so the",
        "efficiency is the MEDIAN over back-to-back interleaved low/high",
        "pairs; per-round numbers are in the JSON.",
        "",
        "**Why 2 vs 8 cores and not 8 vs 32:** warm-pool raw-CPU probes",
        "(below) show this host (32 real vCPUs, no SMT) delivers the full",
        "4x from 2->8 processes in quiet windows but only ~2.9x from",
        "8->32 (KVM-neighbor tenancy), so 8->32 would measure the",
        "hypervisor's ceiling, not the engine. The probe is rerun and",
        "embedded in every report.",
        "",
        f"Input: `{SF_DIR}` (+ synthetic corpus, "
        f"{med[0].get('crawl_urls_processed', '?')} URLs processed).",
        "",
        f"CPU probe (hash-burn units/sec by process count): {probe}",
        "",
        "Headline numbers all come from ONE round — the admissible round",
        "realizing the median efficiency — so URLs/sec x crawl-sec x",
        "URLs-processed are mutually consistent.  Phase walls (t_wave =",
        "wave grant, t_mat = parse/canonicalize/dedup/rank, t_commit =",
        "state writes, t_other = driver loop) are summed over that round's",
        "busy supersteps.",
        "",
        "| config | crawl URLs/sec | crawl sec | t_wave | t_mat | "
        "t_commit | t_other | t_setup (1-time, in t_other) |",
        "|---|---|---|---|---|---|---|---|",
        f"| local[{N_LOW}]  | {med_low['urls_per_sec']} | "
        f"{med_low['crawl_sec']} | {med_low.get('t_wave', '?')} | "
        f"{med_low.get('t_mat', '?')} | {med_low.get('t_commit', '?')} | "
        f"{med_low.get('t_other', '?')} | {med_low.get('t_setup', '?')} |",
        f"| local[{N_HIGH}] | {med_high['urls_per_sec']} | "
        f"{med_high['crawl_sec']} | {med_high.get('t_wave', '?')} | "
        f"{med_high.get('t_mat', '?')} | {med_high.get('t_commit', '?')} | "
        f"{med_high.get('t_other', '?')} | {med_high.get('t_setup', '?')} |",
        "",
        f"Per-phase scaling efficiency, median round: {phase_scaling}",
        "",
    ]
    if skip_warmup:
        md += [
            "Full query table: skipped this capture (warm-up pass "
            "disabled — corpus pre-warmed by the quiet-window hunter; "
            "see an earlier full run for the per-query table).",
            "",
        ]
    else:
        md += [
            "Full query table (separate warm-up pass, not part of the "
            "efficiency sample):",
            "",
            "| config | minhash | doc_stats | embed_topk | frontier_ops |",
            "|---|---|---|---|---|",
            f"| local[{N_LOW}]  | {low['queries']['minhash_dedup']} | "
            f"{low['queries']['doc_stats']} | "
            f"{low['queries']['embed_topk']} | "
            f"{low['queries']['frontier_ops']} |",
            f"| local[{N_HIGH}] | {high['queries']['minhash_dedup']} | "
            f"{high['queries']['doc_stats']} | "
            f"{high['queries']['embed_topk']} | "
            f"{high['queries']['frontier_ops']} |",
            "",
        ]
    md += [
        f"**Scaling efficiency ({N_LOW}→{N_HIGH} cores): "
        f"{report['all_hunts_median']}** — the REPLICATION MEDIAN over "
        f"{report['all_hunts_admissible_rounds']} admissible rounds "
        f"across every hunt at this config "
        f"(range {report['all_hunts_range']}; full per-round log in "
        f"`BENCH/scaling_rounds.jsonl`).  A round is admissible when the "
        f"warm-pool ambient-CPU probes bracketing its two runs agree "
        f"within {int(max_drift * 100)}%.  Runs are taskset-pinned to "
        f"fixed disjoint CPU sets (local[{N_LOW}] -> cores 0-{N_LOW + 1}, "
        f"local[{N_HIGH}] -> cores {N_LOW + 2}-{N_LOW + N_HIGH + 3}).",
        "",
        f"This hunt's own median: {report['value']} over {len(used)} "
        f"admissible of {len(pairs)} interleaved rounds — all rounds "
        f"(eff, admissible): "
        f"{[(r['eff'], r['admissible']) for r in report['rounds']]}",
        "",
        f"**Hardware-delivered ceiling (median round): "
        f"{report['hw_delivered_ratio_median_round']}x** going "
        f"{N_LOW}→{N_HIGH} processes on a pure-CPU hash burn measured "
        f"immediately before the pair — i.e. the shared host itself "
        f"delivered at most {report['hw_ceiling_on_efficiency']} "
        f"efficiency to ANY perfectly-scaling job in that window "
        f"(KVM tenancy; per-round ratios: "
        f"{[r['hw_ratio'] for r in report['rounds']]}).",
        "",
        f"**Engine efficiency vs that hardware ceiling: "
        f"{report['value_vs_hw_ceiling']}** — raw efficiency divided by "
        f"the ceiling; **steady-state (one-time setup wall excluded): "
        f"{report['value_steady_state']}** raw, "
        f"**{report['value_steady_state_vs_hw_ceiling']}** vs ceiling. "
        f"Setup (seed canonicalize+commit + bloom init, `t_setup` in the "
        f"phase table) is paid once per run: ~5 supersteps here vs 10^4+ "
        f"in production, where it amortizes to zero. The raw number "
        f"above remains the headline; these locate the gap (host vs "
        f"engine vs fixture-scale fixed costs).",
        "",
        f"**Capacity-normalized efficiency: {report['value_capacity_normalized']}**"
        " — each run's throughput divided by the ambient-CPU probe taken"
        " immediately before it; corrects multiplicative tenancy slowdown"
        " on this shared host (secondary metric, raw number above remains"
        " the headline).",
        "",
        f"**Crawl-ordering match across parallelism ({N_LOW} vs {N_HIGH}): "
        f"{ordering_match}** (md5 over the canonical fetch log)",
        "",
        "```json",
        json.dumps(report, indent=1),
        "```",
    ]
    # the replication narrative lives in BENCH/NOTES.md so a regenerated
    # headline never wipes it — appended verbatim to every report
    notes = bench_dir / "NOTES.md"
    if notes.exists():
        md += ["", notes.read_text().rstrip()]
    (bench_dir / "BASELINE.md").write_text("\n".join(md) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
