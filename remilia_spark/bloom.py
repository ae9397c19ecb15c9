"""Partitioned bloom filter over the URL-seen set (north rule:
"bloom/cuckoo URL-seen dedup").

At 10^10 URLs the exact seen anti-join is the dominant shuffle of every
superstep.  This module keeps one bloom bitmap per ``pmod(url_hash, B)``
bucket and pre-filters discovered candidates:

* candidates whose bits are **not** all set are *definitely fresh* — they
  skip the anti-join entirely;
* the remainder ("maybe seen": true dupes + false positives, ~FP-rate of
  the fresh mass) still goes through the exact left-anti join, so
  **correctness never depends on the bloom** — it only shrinks the join.

Mechanics (all vectorized numpy over Arrow batches — no per-row Python):

* membership hashing is double hashing ``h_i = h1 + i*h2 (mod m)`` derived
  from the already-computed ``xxhash64(url)`` column alone (h2 = a
  splitmix64 remix), so the filter needs nothing but ``url_hash``;
* bitmaps live as rows ``(bucket, bitmap binary, n_bits, n_hashes,
  n_keys)`` in a snapshot table, updated incrementally per superstep via
  ``cogroup().applyInPandas`` (one bitmap per task group — the bitmap is
  never replicated per candidate row);
* sizing is per-bucket-fixed from config; ``n_keys`` is tracked so
  operators can see saturation (metrics expose it) and rebuild with more
  buckets — at 10^10 keys: 4096 buckets x 2^31 bits ≈ 1 GiB total state,
  ~256 KiB per task, far under executor memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = ("bucket int, bitmap binary, n_bits long, n_hashes int, "
                "n_keys long")

_U64 = np.uint64


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — the second hash of the double-hashing family."""
    z = h.astype(_U64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _positions(hashes: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(n, k) bit positions via double hashing on the xxhash64 values."""
    h1 = hashes.astype(np.int64).astype(_U64)
    h2 = _mix(h1) | _U64(1)  # odd => full-period stepping
    i = np.arange(n_hashes, dtype=_U64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % _U64(n_bits)).astype(np.int64)


def set_bits(bitmap: np.ndarray, hashes: np.ndarray, n_hashes: int) -> None:
    """OR the membership bits of ``hashes`` into ``bitmap`` (uint8 array)."""
    if len(hashes) == 0:
        return
    pos = _positions(hashes, len(bitmap) * 8, n_hashes).ravel()
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))


def contains(bitmap: np.ndarray, hashes: np.ndarray,
             n_hashes: int) -> np.ndarray:
    """Vectorized membership test -> bool array ('maybe seen')."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(hashes, len(bitmap) * 8, n_hashes)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def bucket_col(url_hash, num_buckets: int):
    return F.pmod(url_hash, F.lit(num_buckets)).cast("int")


def empty_bloom(spark, num_buckets: int) -> DataFrame:
    return spark.createDataFrame([], BLOOM_SCHEMA)


def update_bloom(bloom: DataFrame, new_hashes: DataFrame, *,
                 num_buckets: int, n_bits: int, n_hashes: int) -> DataFrame:
    """Fold ``new_hashes`` (url_hash) into the bloom snapshot.

    cogroup(applyInPandas): each task sees one bucket's existing bitmap
    (0/1 rows) + that bucket's new hashes; buckets with no new keys keep
    their row via the right side of the cogroup.
    """
    new_b = new_hashes.select(
        bucket_col(F.col("url_hash"), num_buckets).alias("bucket"),
        "url_hash")

    def merge(new_pdf: pd.DataFrame, old_pdf: pd.DataFrame):
        if len(new_pdf) == 0 and len(old_pdf) == 0:
            return pd.DataFrame(
                columns=["bucket", "bitmap", "n_bits", "n_hashes", "n_keys"])
        bucket = int(new_pdf["bucket"].iloc[0] if len(new_pdf)
                     else old_pdf["bucket"].iloc[0])
        if len(old_pdf):
            bm = np.frombuffer(old_pdf["bitmap"].iloc[0], dtype=np.uint8).copy()
            keys = int(old_pdf["n_keys"].iloc[0])
        else:
            bm = np.zeros(n_bits // 8, dtype=np.uint8)
            keys = 0
        if len(new_pdf):
            set_bits(bm, new_pdf["url_hash"].to_numpy(), n_hashes)
            keys += len(new_pdf)
        return pd.DataFrame({
            "bucket": [bucket], "bitmap": [bm.tobytes()],
            "n_bits": [len(bm) * 8], "n_hashes": [n_hashes],
            "n_keys": [keys],
        })

    return (
        new_b.groupBy("bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(merge, BLOOM_SCHEMA)
    )


def split_candidates(cand: DataFrame, bloom: DataFrame, *,
                     num_buckets: int) -> DataFrame:
    """Attach ``maybe_seen:boolean`` to candidate rows (needs url_hash).

    cogroup by bucket: one bitmap per task group — the bitmap bytes are
    never joined onto individual candidate rows.
    """
    # never StructType.add on cand.schema: add() MUTATES the DataFrame's
    # cached schema object, so a second split on the same frame would
    # declare a duplicate maybe_seen field
    from pyspark.sql.types import BooleanType, StructField, StructType
    schema = StructType(list(cand.schema.fields)
                        + [StructField("maybe_seen", BooleanType())])
    cand_b = cand.withColumn(
        "_bucket", bucket_col(F.col("url_hash"), num_buckets))

    def check(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame):
        out = cand_pdf.drop(columns=["_bucket"])
        if len(out) == 0 or len(bloom_pdf) == 0:
            out["maybe_seen"] = np.zeros(len(out), dtype=bool)
            return out
        bm = np.frombuffer(bloom_pdf["bitmap"].iloc[0], dtype=np.uint8)
        out["maybe_seen"] = contains(
            bm, out["url_hash"].to_numpy(),
            int(bloom_pdf["n_hashes"].iloc[0]))
        return out

    return (
        cand_b.groupBy("_bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(check, schema)
    )
