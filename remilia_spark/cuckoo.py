"""Partitioned cuckoo filter over the URL-seen set — the other half of the
north rule's "bloom/cuckoo URL-seen dedup" (``bloom.py`` is the first).

Same seam as the bloom: one filter shard per ``pmod(url_hash, B)`` bucket,
stored as snapshot rows, updated per superstep via ``cogroup().
applyInPandas`` so the shard bytes are never replicated per candidate row.
Candidates the filter does NOT contain are *definitely fresh* and skip the
exact seen anti-join; "maybe seen" rows still go through it, so
correctness never depends on the filter (reference dedup semantics live in
the exact join; this only shrinks it — remilia has no seen set at all, its
``chew`` requeues blindly, pipeline.go:220-222).

Why a cuckoo instead of a bloom (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT 2014):

* **deletion** — a bloom cannot forget.  A standing crawl that expires
  seen entries (recrawl TTL) must rebuild a bloom from the exact set;
  a cuckoo deletes the expired keys' fingerprints in place
  (``delete_keys``), keeping the prefilter aligned with the exact seen
  set across expiry cycles.
* lower space at low target FP (fingerprints beat k bit-probes below
  ~3% FP) and 2 cache lines per lookup instead of k scattered probes.

**The false-negative trap, handled:** a bloom can saturate but never
lies fresh; a cuckoo *insert* can FAIL when the table is too full (the
eviction walk exceeds its bound).  A dropped insert would make a seen URL
look definitely-fresh later — it would skip the exact anti-join and be
re-fetched, breaking exactly-once.  This implementation therefore marks a
shard ``saturated`` on the first failed insert; a saturated shard answers
"maybe seen" for EVERY candidate (degrades to pass-through, exactly like
a saturated bloom's all-bits-set endgame) and the watchdog surfaces it in
metrics.  No false negative is possible in any state.

Layout per shard: ``n_slots`` buckets x 4 slots of uint16 fingerprints
(0 = empty), i.e. ``n_slots * 8`` bytes.  fp = 16-bit nonzero digest of
``url_hash``; home bucket i1 = remix(url_hash) mod n_slots; alternate
i2 = i1 XOR (remix(fp) mod n_slots) — the standard partial-key cuckoo
pair, involutive so eviction needs only the fingerprint.  At 10^10 URLs:
4096 Spark buckets x 2^21 slot-buckets x 8 B = 64 GiB total / ~16 MiB per
task at 95% max load — per-shard state stays executor-resident exactly
like the bloom's bitmaps.

Inserts are vectorized in two passes (scatter into i1's free slots, then
i2's); only the residue that found both buckets full walks the sequential
eviction loop — below ~85% load that residue is a few keys per million.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUCKOO_SCHEMA = ("bucket int, tbl binary, n_slots long, n_keys long, "
                 "saturated boolean")

SLOTS_PER_BUCKET = 4
MAX_KICKS = 250

_U64 = np.uint64
_U16 = np.uint16


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (same family as bloom.py's second hash)."""
    z = h.astype(_U64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints of the xxhash64 values."""
    fp = (_mix(hashes.astype(np.int64).astype(_U64)) &
          _U64(0xFFFF)).astype(_U16)
    return np.where(fp == 0, _U16(1), fp)  # 0 means empty slot


def _home(hashes: np.ndarray, n_slots: int) -> np.ndarray:
    return (_mix(hashes.astype(np.int64).astype(_U64) ^
                 _U64(0xD6E8FEB86659FD93)) % _U64(n_slots)).astype(np.int64)


def _alt(idx: np.ndarray, fp: np.ndarray, n_slots: int) -> np.ndarray:
    """Partial-key alternate bucket: i XOR h(fp), involutive by XOR."""
    step = (_mix(fp.astype(_U64)) % _U64(n_slots)).astype(np.int64)
    return np.bitwise_xor(idx, step) % n_slots


def new_table(n_slots: int) -> np.ndarray:
    """(n_slots, 4) uint16 table of empty slots.  ``n_slots`` MUST be a
    power of two: the alternate-bucket map is i XOR h(fp), which is only
    involutive (alt(alt(i)) == i, the property membership-after-eviction
    depends on) when XOR cannot leave the index range."""
    if n_slots & (n_slots - 1):
        raise ValueError(f"n_slots must be a power of two, got {n_slots}")
    return np.zeros((n_slots, SLOTS_PER_BUCKET), dtype=_U16)


def _scatter_free(tbl: np.ndarray, idx: np.ndarray,
                  fp: np.ndarray) -> np.ndarray:
    """Vectorized insert of (idx, fp) into free slots of their buckets.

    Within one call several keys may target the same (bucket, slot); each
    pass elects exactly ONE winner per slot (stable first-occurrence over
    the sorted targets) and retries the losers, so duplicate fingerprints
    each occupy their OWN slot — required for ``delete`` to stay safe
    (collapsing equal fps would let one key's delete erase another's
    membership).  A key whose bucket has no free slot is a final miss.
    Returns the boolean mask of keys that did NOT fit.
    """
    missed = np.zeros(len(idx), dtype=bool)
    pending = np.arange(len(idx))
    # each pass fills >=1 contended slot per bucket; 4 slots + 1 safety
    for _ in range(SLOTS_PER_BUCKET + 1):
        if len(pending) == 0:
            break
        b = idx[pending]
        rows = tbl[b]                                  # (p, 4)
        free = rows == 0
        has_free = free.any(axis=1)
        missed[pending[~has_free]] = True              # bucket full: final
        cand = pending[has_free]
        if len(cand) == 0:
            pending = pending[:0]
            break
        slot = free.argmax(axis=1)[has_free]
        target = idx[cand] * SLOTS_PER_BUCKET + slot
        order = np.argsort(target, kind="stable")
        st = target[order]
        first = np.ones(len(st), dtype=bool)
        first[1:] = st[1:] != st[:-1]
        winners = cand[order[first]]
        tbl[idx[winners], slot[order[first]]] = fp[winners]
        pending = cand[order[~first]]                  # losers retry
    missed[pending] = True  # safety: anything still unplaced
    return missed


def insert(tbl: np.ndarray, hashes: np.ndarray,
           rng_seed: int = 0x5EED) -> int:
    """Insert hashes into the shard table in place.

    Returns the number of keys that could NOT be placed (eviction walk
    exceeded MAX_KICKS).  Any nonzero return means the caller MUST mark
    the shard saturated and stop trusting negative answers: a failed walk
    strands whichever fingerprint was homeless when the kick budget ran
    out — possibly a previously-stored victim's, not the new key's — so
    an unflagged overfull table could answer definitely-fresh for a seen
    key (see module docstring: false negatives are never an option).
    """
    if len(hashes) == 0:
        return 0
    n_slots = tbl.shape[0]
    fp = _fingerprints(hashes)
    i1 = _home(hashes, n_slots)
    # pass 1: home buckets, vectorized
    miss = _scatter_free(tbl, i1, fp)
    if not miss.any():
        return 0
    # pass 2: alternate buckets, vectorized
    i2 = _alt(i1[miss], fp[miss], n_slots)
    miss2 = _scatter_free(tbl, i2, fp[miss])
    if not miss2.any():
        return 0
    # residue: sequential eviction walk (rare below ~85% load)
    rng = np.random.RandomState(rng_seed)
    failed = 0
    for j, start in zip(np.where(miss)[0][miss2], i2[miss2]):
        cur_fp = fp[j]
        cur_idx = int(start)
        placed = False
        for _ in range(MAX_KICKS):
            row = tbl[cur_idx]
            free = np.where(row == 0)[0]
            if len(free):
                row[free[0]] = cur_fp
                placed = True
                break
            victim = rng.randint(SLOTS_PER_BUCKET)
            cur_fp, row[victim] = row[victim], cur_fp
            cur_idx = int(_alt(np.array([cur_idx]),
                               np.array([cur_fp], dtype=_U16), n_slots)[0])
        if not placed:
            failed += 1
    return failed


def contains(tbl: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership ('maybe seen') — two bucket reads per key."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    n_slots = tbl.shape[0]
    fp = _fingerprints(hashes)
    i1 = _home(hashes, n_slots)
    i2 = _alt(i1, fp, n_slots)
    return ((tbl[i1] == fp[:, None]).any(axis=1) |
            (tbl[i2] == fp[:, None]).any(axis=1))


def delete(tbl: np.ndarray, hashes: np.ndarray) -> int:
    """Remove one stored fingerprint per key (the cuckoo's superpower —
    a bloom must rebuild).  ONLY delete keys that were actually inserted:
    deleting a never-inserted key can evict another key's identical
    fingerprint and manufacture a false negative (standard cuckoo-filter
    contract).  Returns the number of keys actually removed."""
    if len(hashes) == 0:
        return 0
    n_slots = tbl.shape[0]
    fp = _fingerprints(hashes)
    i1 = _home(hashes, n_slots)
    i2 = _alt(i1, fp, n_slots)
    removed = 0
    # per-key scalar writes; deletes are maintenance-path (TTL expiry),
    # orders of magnitude rarer than the vectorized insert/contains
    for k in range(len(hashes)):
        for idx in (i1[k], i2[k]):
            row = tbl[idx]
            hit = np.where(row == fp[k])[0]
            if len(hit):
                row[hit[0]] = 0
                removed += 1
                break
    return removed


# ---- Spark-side seam (mirrors bloom.update_bloom / split_candidates) ----

def bucket_col(url_hash, num_buckets: int):
    return F.pmod(url_hash, F.lit(num_buckets)).cast("int")


def empty_cuckoo(spark, num_buckets: int) -> DataFrame:
    return spark.createDataFrame([], CUCKOO_SCHEMA)


def update_cuckoo(cuckoo: DataFrame, new_hashes: DataFrame, *,
                  num_buckets: int, n_slots: int) -> DataFrame:
    """Fold ``new_hashes`` (url_hash) into the cuckoo snapshot.

    One task per Spark bucket sees that shard's table + its new keys.
    A shard whose insert fails (overfull) flips ``saturated`` and stops
    accepting keys — lookups there return all-maybe-seen from then on.
    """
    new_b = new_hashes.select(
        bucket_col(F.col("url_hash"), num_buckets).alias("bucket"),
        "url_hash")

    def merge(new_pdf: pd.DataFrame, old_pdf: pd.DataFrame):
        if len(new_pdf) == 0 and len(old_pdf) == 0:
            return pd.DataFrame(
                columns=["bucket", "tbl", "n_slots", "n_keys", "saturated"])
        bucket = int(new_pdf["bucket"].iloc[0] if len(new_pdf)
                     else old_pdf["bucket"].iloc[0])
        if len(old_pdf):
            slots = int(old_pdf["n_slots"].iloc[0])
            tbl = np.frombuffer(old_pdf["tbl"].iloc[0], dtype=_U16) \
                .reshape(slots, SLOTS_PER_BUCKET).copy()
            keys = int(old_pdf["n_keys"].iloc[0])
            sat = bool(old_pdf["saturated"].iloc[0])
        else:
            tbl = new_table(n_slots)
            keys, sat = 0, False
        if len(new_pdf) and not sat:
            failed = insert(tbl, new_pdf["url_hash"].to_numpy(),
                            rng_seed=bucket * 2654435761 + 1)
            keys += len(new_pdf)
            if failed:
                sat = True  # pass-through from now on; never lie fresh
        elif len(new_pdf):
            keys += len(new_pdf)  # counted for the watchdog, not stored
        return pd.DataFrame({
            "bucket": [bucket], "tbl": [tbl.tobytes()],
            "n_slots": [tbl.shape[0]], "n_keys": [keys],
            "saturated": [sat],
        })

    return (
        new_b.groupBy("bucket")
        .cogroup(cuckoo.groupBy("bucket"))
        .applyInPandas(merge, CUCKOO_SCHEMA)
    )


def split_candidates(cand: DataFrame, cuckoo: DataFrame, *,
                     num_buckets: int) -> DataFrame:
    """Attach ``maybe_seen:boolean`` to candidate rows (needs url_hash).

    Saturated shards flag every candidate (degrade to exact-join
    pass-through); shards with no filter row yet flag none (nothing was
    ever inserted there, so fresh is provable)."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    # never StructType.add on cand.schema: add() MUTATES the DataFrame's
    # cached schema object, so a second split on the same frame would
    # declare a duplicate maybe_seen field
    schema = StructType(list(cand.schema.fields)
                        + [StructField("maybe_seen", BooleanType())])
    cand_b = cand.withColumn(
        "_bucket", bucket_col(F.col("url_hash"), num_buckets))

    def check(cand_pdf: pd.DataFrame, cuckoo_pdf: pd.DataFrame):
        out = cand_pdf.drop(columns=["_bucket"])
        if len(out) == 0 or len(cuckoo_pdf) == 0:
            out["maybe_seen"] = np.zeros(len(out), dtype=bool)
            return out
        if bool(cuckoo_pdf["saturated"].iloc[0]):
            out["maybe_seen"] = np.ones(len(out), dtype=bool)
            return out
        slots = int(cuckoo_pdf["n_slots"].iloc[0])
        tbl = np.frombuffer(cuckoo_pdf["tbl"].iloc[0], dtype=_U16) \
            .reshape(slots, SLOTS_PER_BUCKET)
        out["maybe_seen"] = contains(tbl, out["url_hash"].to_numpy())
        return out

    return (
        cand_b.groupBy("_bucket")
        .cogroup(cuckoo.groupBy("bucket"))
        .applyInPandas(check, schema)
    )


def delete_keys(cuckoo: DataFrame, expired: DataFrame, *,
                num_buckets: int) -> DataFrame:
    """Remove expired url_hash keys from the filter (seen-TTL maintenance).

    The caller must pass ONLY keys present in the exact seen set (they
    were inserted); the engine's expiry path derives them from the seen
    table itself, so the contract holds by construction.  Saturated
    shards stay saturated (their contents are not trustworthy enough to
    resume exact filtering)."""
    exp_b = expired.select(
        bucket_col(F.col("url_hash"), num_buckets).alias("bucket"),
        "url_hash")

    def drop(exp_pdf: pd.DataFrame, cuckoo_pdf: pd.DataFrame):
        if len(cuckoo_pdf) == 0:
            return pd.DataFrame(
                columns=["bucket", "tbl", "n_slots", "n_keys", "saturated"])
        if len(exp_pdf) == 0:
            return cuckoo_pdf
        slots = int(cuckoo_pdf["n_slots"].iloc[0])
        tbl = np.frombuffer(cuckoo_pdf["tbl"].iloc[0], dtype=_U16) \
            .reshape(slots, SLOTS_PER_BUCKET).copy()
        removed = delete(tbl, exp_pdf["url_hash"].to_numpy())
        out = cuckoo_pdf.copy()
        out["tbl"] = [tbl.tobytes()]
        out["n_keys"] = [max(0, int(out["n_keys"].iloc[0]) - removed)]
        return out

    return (
        exp_b.groupBy("bucket")
        .cogroup(cuckoo.groupBy("bucket"))
        .applyInPandas(drop, CUCKOO_SCHEMA)
    )
