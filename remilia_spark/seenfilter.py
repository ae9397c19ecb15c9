"""Seen-prefilter dispatch — one manifest slot, two implementations.

The north rule names "bloom/cuckoo URL-seen dedup"; both exist
(``bloom.py``, ``cuckoo.py``) behind this seam.  The manifest table key
stays ``"bloom"`` for checkpoint compatibility (it is the generic
seen-prefilter slot; the stored schema is self-describing, so resuming a
checkpoint with the wrong ``cfg.seen_filter`` fails loudly on column
names rather than corrupting state).  Correctness never depends on the
filter — candidates it cannot prove fresh still pay the exact anti-join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def empty_seen_filter(spark, cfg) -> DataFrame:
    if cfg.seen_filter == "cuckoo":
        from .cuckoo import empty_cuckoo
        return empty_cuckoo(spark, cfg.bloom_num_buckets)
    from .bloom import empty_bloom
    return empty_bloom(spark, cfg.bloom_num_buckets)


def update_seen_filter(cfg, tbl: DataFrame, new_hashes: DataFrame) \
        -> DataFrame:
    """Fold ``new_hashes`` (url_hash) into the configured filter."""
    if cfg.seen_filter == "cuckoo":
        from .cuckoo import update_cuckoo
        return update_cuckoo(tbl, new_hashes,
                             num_buckets=cfg.bloom_num_buckets,
                             n_slots=cfg.cuckoo_bucket_slots)
    from .bloom import update_bloom
    return update_bloom(tbl, new_hashes,
                        num_buckets=cfg.bloom_num_buckets,
                        n_bits=cfg.bloom_bucket_bits,
                        n_hashes=cfg.bloom_num_hashes)


def split_seen_filter(cfg, cand: DataFrame, tbl: DataFrame) -> DataFrame:
    """Attach ``maybe_seen`` to candidate rows via the configured filter."""
    if cfg.seen_filter == "cuckoo":
        from .cuckoo import split_candidates
        return split_candidates(cand, tbl,
                                num_buckets=cfg.bloom_num_buckets)
    from .bloom import split_candidates
    return split_candidates(cand, tbl, num_buckets=cfg.bloom_num_buckets)


def saturation_watch(cfg, n_seen: int) -> tuple[float, bool]:
    """Driver-math saturation estimate (no Spark job): (keys-per-shard
    load metric, saturated?).

    Bloom: past the ~1% design FP point (n*/m = -ln(1-p^(1/k))/k from
    FP = (1-e^(-kn/m))^k) the filter degrades toward pass-through.
    Cuckoo: load factor vs the ~95% practical fill bound of 4-slot
    partial-key tables (Fan et al. 2014) — past it shards start flipping
    their per-shard ``saturated`` flags (which degrade to pass-through
    per shard automatically; this global estimate is the operator's
    early warning)."""
    keys_per_bucket = n_seen / cfg.bloom_num_buckets
    if cfg.seen_filter == "cuckoo":
        from .cuckoo import SLOTS_PER_BUCKET
        capacity = cfg.cuckoo_bucket_slots * SLOTS_PER_BUCKET
        return keys_per_bucket, keys_per_bucket > 0.95 * capacity
    k = max(1, cfg.bloom_num_hashes)
    fill = -math.log(1.0 - 0.01 ** (1.0 / k)) / k  # keys/bit at 1% FP
    return keys_per_bucket, keys_per_bucket > cfg.bloom_bucket_bits * fill
