"""Engine configuration.

Politeness and retry defaults mirror the reference's constants:
token bucket capacity 100, refill 10 tokens/interval, initial 100
(``ratelimit.go:27-33``); backoff minDelay 1s, maxDelay 50s, multiplier 2.0,
maxAttempt 10 (``backoff.go:40-46``).  One superstep plays one second of
reference wall-clock (delays/refills quantize to supersteps).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlConfig:
    # pipeline shape: n layers in the reference = max_depth + 1 here; pages
    # at depth == max_depth are fetched + text-extracted but their links are
    # discarded (the reference disables the last layer's put, pipeline.go:45-46)
    max_depth: int = 1
    max_supersteps: int = 64
    wave_size: int | None = None  # optional global per-superstep fetch cap
    # response-body charset for the parse stage (the reference's optional
    # charset transformer, client.go:228-233, applied client.go:153-155);
    # decoding uses errors='replace' like a lenient transform reader
    charset: str = "utf-8"
    # optional domain allowlist (the reference's dead `limit` type carries
    # AllowedDomain, limit.go:5-15): when non-empty, discovered URLs whose
    # host is not in the set enter the frontier as state='filtered'
    allowed_domains: tuple[str, ...] = ()
    # opt-in second canonicalization pass (urlnorm.clean_params): strip
    # cross-site tracking params (utm_*, fbclid, gclid, ...) from every
    # canonical URL so analytics variants collapse to one seen-set entry
    # and one fetch.  Order-preserving (no param sort) so the URL the
    # politeness layer fetches stays what the site linked.  Off by default:
    # it changes the URL space, so the flagship ordering goldens pin the
    # un-stripped engine.
    strip_tracking_params: bool = False

    # politeness (per-host token bucket; ratelimit.go:27-33 defaults)
    bucket_capacity: int = 100
    fill_quantum: int = 10       # tokens gained per superstep
    initial_tokens: int = 100
    use_crawl_delay: bool = True  # robots crawl_delay d => 1 token / d steps

    # politeness-budget key: "host" (default; the reference's unit) or
    # "domain" (registered domain, eTLD+1) — one token bucket per
    # registrable domain, so a wildcard-DNS subdomain spray cannot
    # multiply its fetch rate by minting hosts.  Pinned domain-mode
    # rules: host_rank becomes rank within the domain's wave; robots
    # *blocking* stays per real host; crawl_delay is read from the
    # registrable domain's own robots row (subdomain robots rows do not
    # feed the domain bucket).
    politeness_key: str = "host"
    # crawl-budget quota: max GRANTS per politeness key over the whole
    # crawl (None = unlimited).  Counts grants, not successful fetches,
    # so a perpetually-failing host cannot burn more than its budget on
    # retries either.  Quota-starved pending rows simply stop being
    # granted — they stay pending (re-crawlable if the quota is raised
    # on a resumed run).
    max_fetch_per_key: int | None = None

    # retry (backoff.go:40-46 defaults; full jitter, hash-seeded)
    min_delay: float = 1.0
    max_delay: float = 50.0
    multiplier: float = 2.0
    max_attempt: int = 10

    # scale knobs
    # frontier state is delta-committed (changed rows only); a full folded
    # base snapshot is rewritten — resetting the chain — every K busy
    # supersteps OR once the chain's accumulated row mass (recorded in the
    # manifest) crosses frontier_compact_rows, whichever first.  The mass
    # trigger keeps the fold's "touched keys" anti-join side bounded even
    # when single waves are huge; it matches storage.BROADCAST_FOLD_MAX_ROWS
    # so a chain under it folds with a broadcast and anything bigger falls
    # back to a shuffle anti-join automatically.
    frontier_compact_every: int = 8
    frontier_compact_rows: int = 4_000_000
    # the append-only seen table gets the same periodic fold (base + delta
    # chain in the manifest) so the anti-join never reads one directory per
    # superstep ever run; rewriting costs O(total) every K steps, so the
    # cadence is coarser than the frontier's
    seen_compact_every: int = 16
    shuffle_partitions: int = 32
    rank_partitions: int = 32          # range partitions for global ranking
    # Iceberg-style bucketed fetch: pre-shuffle + persist the pages table
    # ONCE on pmod(xxhash64(url), B) and join each wave bucket-locally —
    # only the wave (O(wave rows)) moves per superstep; pages never
    # re-shuffle and no driver-side broadcast of a 10^5..10^8-row wave is
    # built.  On a real cluster this is the `bucket(B, url_hash)` Iceberg
    # partition transform + storage-partitioned join; locally it is a
    # repartition + persist whose partitioning the planner reuses
    # (requires spark.sql.requireAllClusterKeysForCoPartition=false, set
    # by the engine).  None = per-wave broadcast/shuffle join (fine for
    # small corpora and unit tests; identical results either way).
    fetch_buckets: int | None = None
    # the bucketed fetch only pays for itself once the corpus dwarfs a
    # per-wave broadcast: at fixture scale (20k pages) the one-time
    # B-bucket shuffle+persist of pages plus the per-wave bucket
    # repartition measured 1.7x the broadcast join they replace (r3
    # regression).  The engine therefore ignores fetch_buckets when the
    # pages table has fewer rows than this (one count job at startup);
    # 0 = always bucket.  Results are identical on either path.
    fetch_bucket_min_pages: int = 2_000_000
    # waves at or below this size rank discoveries with a plain global
    # window (one small shuffle, no extra action); larger waves use the
    # range-partitioned scalable rank — both produce identical values
    rank_small_wave: int = 10_000
    # the budget pop always salts hosts into this many sub-partitions for
    # its two-phase top-k (identical output to a single per-host window,
    # but no partition ever sees a whole mega-host — and no driver-side
    # skew probe job)
    skew_salts: int = 16
    # politeness state (budgets/robots) is one row per HOST; broadcast it
    # into the grant joins so the eligible set is never shuffled for
    # politeness.  Disable at ≥10^8 hosts to fall back to shuffle joins.
    broadcast_politeness: bool = True
    broadcast_wave_max: int = 2_000_000  # wave rows under which to hint broadcast
    # bloom prefilter for the seen anti-join (bloom.py); per-bucket bitmap
    # size is fixed — at 10^10 keys configure ~4096 buckets x 2^31 bits
    bloom_enabled: bool = True
    bloom_num_buckets: int = 64
    bloom_bucket_bits: int = 1 << 17   # 16 KiB/bucket => ~700k keys @ ~1% FP
    bloom_num_hashes: int = 6
    # bitmap state is maintained from superstep 0 (it cannot be created
    # mid-run without false negatives), but the prefilter only pays for
    # itself once the seen set dwarfs the candidate batch:
    bloom_min_seen: int = 100_000
    # which prefilter fills the manifest's seen-filter slot (north rule:
    # "bloom/cuckoo URL-seen dedup").  "cuckoo" (cuckoo.py) adds key
    # deletion (seen-TTL expiry without a rebuild) and lower memory at
    # <3% FP; a shard that overflows flips per-shard ``saturated`` and
    # degrades to pass-through — false negatives impossible either way.
    seen_filter: str = "bloom"
    # cuckoo shard geometry: slot-buckets per shard (POWER OF TWO; x4
    # slots x 2B fp).  2^12 x 4 = 16384 keys/shard at 32 KiB; at 10^10
    # keys configure ~4096 Spark buckets x 2^21 slot-buckets (16 MiB/task)
    cuckoo_bucket_slots: int = 1 << 12
    # spider-trap guard (traps.cap_new_per_host): a host may hold at most
    # this many PENDING frontier rows; discovered candidates beyond its
    # remaining capacity are dropped at insertion — before ranking and
    # before the seen-set mark, so they are re-discoverable once the
    # host's queue drains (a queue budget, not a blacklist).  The keep
    # set is a per-host discovery-order top-k — deterministic and
    # partitioning-independent — with the same salted skew safety as the
    # wave pop.  None = off (default: no extra per-superstep work, crawl
    # ordering identical to the unguarded engine).
    trap_max_pending: int | None = None
