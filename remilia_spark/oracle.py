"""Single-threaded pure-Python oracle crawler.

The reference's intra-stage ordering is goroutine-race-defined
(``remilia.go:139-146``); the north rule demands a *deterministic* crawl
ordering, so this oracle **defines** it and the Spark engine must reproduce
it exactly (SURVEY §7 step 6).  Every rule here mirrors, line for line, a
pinned rule in the engine:

* canonicalization/accept  — ``urlnorm`` (shared code);
* url_hash                 — ``xxh64.xxhash64_spark`` == Spark ``F.xxhash64``;
* extraction               — ``extract`` (shared code);
* robots at insertion      — ``robots.with_robots_state``;
* budgets                  — ``budget.available_tokens`` semantics;
* backoff                  — ``backoff.backoff_steps`` (shared code);
* discovery_order          — global rank over (parent_order, link_index,
  url_hash), offset past the existing maximum;
* wave order               — (depth, host_rank, discovery_order); host_rank
  is the within-host rank by (depth, discovery_order);
* in-batch dedup           — min (parent_order, link_index) wins.

Outputs are plain Python structures; golden fixtures freeze them.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd

from .backoff import backoff_steps
from .config import CrawlConfig
from .extract import extract
from .urlnorm import clean_params, host_of, normalize_url, path_of
from .xxh64 import xxhash64_spark


@dataclass
class OracleResult:
    # fetch log in canonical order: (superstep, depth, host_rank,
    # discovery_order, url)
    fetch_events: list[tuple] = field(default_factory=list)
    seen: dict[str, int] = field(default_factory=dict)   # url -> first_seen
    texts: dict[str, str] = field(default_factory=dict)  # url -> extracted
    states: dict[str, str] = field(default_factory=dict)  # url -> final state
    per_step: list[dict] = field(default_factory=list)

    @property
    def seen_hashes(self) -> set[int]:
        return {xxhash64_spark(u) for u in self.seen}


def crawl(pages: pd.DataFrame, seeds: pd.DataFrame,
          robots: pd.DataFrame | None, cfg: CrawlConfig) -> OracleResult:
    corpus = {r["url"]: r["html"] for _, r in pages.iterrows()}
    rob: dict[str, tuple[list[str], int, list[str] | None]] = {}
    if robots is not None:
        has_allow = "allow" in robots.columns
        for _, r in robots.iterrows():
            allow = list(r["allow"]) \
                if has_allow and r["allow"] is not None else None
            rob[r["host"]] = (list(r["disallow"]), int(r["crawl_delay"]),
                              allow)

    def canon(url: str, base: str | None = None) -> str | None:
        """normalize_url + the opt-in tracking-param strip — mirrors the
        engine's _canonicalize UDF followed by _clean_np (frontier.py)."""
        cu = normalize_url(url, base)
        if cu is not None and cfg.strip_tracking_params:
            cu = clean_params(cu)
        return cu

    def rule_match(p: str, r: str) -> bool:
        """Python twin of robots._rule_match: plain rules keep prefix
        semantics; '*'/'$'-carrying rules use RFC 9309 §2.2.3 wildcards."""
        import re as _re
        if "*" not in r and not r.endswith("$"):
            return p.startswith(r)
        ends = r.endswith("$")
        body = r[:-1] if ends else r
        pat = "^" + _re.escape(body).replace(r"\*", ".*") + \
            ("$" if ends else "")
        return _re.match(pat, p) is not None

    def robots_blocked(url: str) -> bool:
        host = host_of(url)
        if cfg.allowed_domains and host not in cfg.allowed_domains:
            return True  # off-allowlist => filtered at insertion
        if host not in rob:
            return False
        p = path_of(url)
        dis, _, allow = rob[host]
        if allow is None:  # legacy prefix rule (robots.blocked_col default)
            return any(rule_match(p, d) for d in dis)
        # REP longest-match: most specific rule wins, tie -> Allow
        dlen = max((len(d) for d in dis if rule_match(p, d)), default=-1)
        alen = max((len(a) for a in allow if rule_match(p, a)), default=-1)
        return dlen > alen

    # frontier rows: url -> dict(depth, order, attempt, next_eligible, state)
    frontier: dict[str, dict] = {}
    res = OracleResult()

    # ---- seeds (seed_frontier mirror) --------------------------------------
    canon_seeds: dict[str, int] = {}
    for _, r in seeds.sort_values("seed_order").iterrows():
        cu = canon(r["url"])
        if cu is None:
            continue
        if cu not in canon_seeds:
            canon_seeds[cu] = int(r["seed_order"])
    order = 0
    for cu, _so in sorted(canon_seeds.items(), key=lambda kv: kv[1]):
        state = "filtered" if robots_blocked(cu) else "pending"
        frontier[cu] = {
            "depth": 0, "order": order, "attempt": 0,
            "next_eligible": 0, "state": state,
        }
        res.seen[cu] = 0
        order += 1
    next_order = order

    budgets: dict[str, tuple[int, int]] = {}  # politeness key -> (tokens, refill_step)
    quota_used: dict[str, int] = {}           # politeness key -> grants so far
    initial = min(cfg.bucket_capacity, cfg.initial_tokens)

    def pk_of(url: str) -> str:
        """Politeness key of a URL — mirrors frontier._pk_col: the host,
        or its registered domain in domain mode (where crawl_delay is
        read from the robots row whose host EQUALS the key)."""
        h = host_of(url)
        if cfg.politeness_key == "domain":
            from .urlnorm import registered_domain
            return registered_domain(h)
        if cfg.politeness_key != "host":
            raise ValueError(f"politeness_key must be 'host' or 'domain', "
                             f"got {cfg.politeness_key!r}")
        return h

    def available(host: str, s: int) -> int:
        if host not in budgets:
            return initial
        tokens, refill = budgets[host]
        d = rob.get(host, ([], 0))[1] if cfg.use_crawl_delay else 0
        if d and d > 0:
            gained = (s - refill) // d
        else:
            gained = cfg.fill_quantum * (s - refill)
        return min(cfg.bucket_capacity, tokens + gained)

    for s in range(cfg.max_supersteps):
        pending = {u: r for u, r in frontier.items() if r["state"] == "pending"}
        if not pending:
            break
        # spider-trap guard mirror (traps.cap_new_per_host): per-host
        # pending counts are snapshotted at superstep START — the engine
        # reads them from the committed frontier at s, before this
        # superstep's state transitions
        host_pending: dict[str, int] = {}
        if cfg.trap_max_pending is not None:
            for u in pending:
                h = host_of(u)
                host_pending[h] = host_pending.get(h, 0) + 1
        eligible = {u: r for u, r in pending.items()
                    if r["next_eligible"] <= s}
        if not eligible:
            res.per_step.append({"superstep": s, "wave": 0})
            continue

        # budget pop: within-politeness-key rank by (depth, order)
        by_host: dict[str, list[str]] = {}
        for u, r in eligible.items():
            by_host.setdefault(pk_of(u), []).append(u)
        granted: list[tuple] = []  # (depth, host_rank, order, url, host)
        for host, urls in by_host.items():
            urls.sort(key=lambda u: (frontier[u]["depth"], frontier[u]["order"]))
            a = available(host, s)
            if cfg.max_fetch_per_key is not None:
                # crawl-budget quota mirror (budget.quota_clamp)
                a = min(a, cfg.max_fetch_per_key
                        - quota_used.get(host, 0))
            for rank, u in enumerate(urls[: max(0, a)], start=1):
                granted.append((frontier[u]["depth"], rank,
                                frontier[u]["order"], u, host))
        granted.sort(key=lambda t: (t[0], t[1], t[2]))
        if cfg.wave_size is not None:
            granted = granted[: cfg.wave_size]

        # budget decrement per host (only granted hosts get new rows)
        per_host_granted: dict[str, int] = {}
        for _, _, _, u, host in granted:
            per_host_granted[host] = per_host_granted.get(host, 0) + 1
        for host, g in per_host_granted.items():
            budgets[host] = (available(host, s) - g, s)
            if cfg.max_fetch_per_key is not None:
                quota_used[host] = quota_used.get(host, 0) + g

        discovered: dict[str, tuple] = {}  # url -> (parent_order, link_index, depth, parent_hash)
        n_fetched = 0
        for depth, host_rank, order_, u, host in granted:
            row = frontier[u]
            if u in corpus:
                links, text = extract(corpus[u], cfg.charset)
                res.fetch_events.append((s, depth, host_rank, row["order"], u))
                res.texts[u] = text
                row["state"] = "fetched"
                n_fetched += 1
                if depth < cfg.max_depth:
                    for li, href in enumerate(links):
                        cu = canon(href, u)
                        if cu is None:
                            continue
                        key = (row["order"], li, depth + 1,
                               xxhash64_spark(u))
                        if cu not in discovered or key < discovered[cu]:
                            discovered[cu] = key
            else:
                a = row["attempt"] + 1
                row["attempt"] = a
                if a >= cfg.max_attempt:
                    row["state"] = "failed"
                else:
                    row["next_eligible"] = s + backoff_steps(
                        u, a, min_delay=cfg.min_delay,
                        max_delay=cfg.max_delay, multiplier=cfg.multiplier)

        # insert fresh discoveries: global rank over (parent_order,
        # link_index, url_hash)
        fresh = {cu: k for cu, k in discovered.items() if cu not in res.seen}
        ranked = sorted(
            fresh.items(),
            key=lambda kv: (kv[1][0], kv[1][1], xxhash64_spark(kv[0])),
        )
        taken: dict[str, int] = {}
        for cu, (porder, li, d, phash) in ranked:
            blocked = robots_blocked(cu)
            if cfg.trap_max_pending is not None and not blocked:
                # keep rule: first (cap - pending) candidates per host in
                # discovery order; dropped URLs are NOT marked seen, so
                # they stay re-discoverable once the queue drains
                h = host_of(cu)
                used = host_pending.get(h, 0) + taken.get(h, 0)
                if used >= cfg.trap_max_pending:
                    continue
                taken[h] = taken.get(h, 0) + 1
            state = "filtered" if blocked else "pending"
            frontier[cu] = {
                "depth": d, "order": next_order, "attempt": 0,
                "next_eligible": s + 1, "state": state,
            }
            res.seen[cu] = s + 1
            next_order += 1
        res.per_step.append({
            "superstep": s, "wave": len(granted), "fetched": n_fetched,
            "discovered": len(fresh),
        })

    for u, r in frontier.items():
        res.states[u] = r["state"]
    return res
