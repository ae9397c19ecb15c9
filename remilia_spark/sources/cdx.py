"""CDX(J) index connector — Common Crawl's *other* ingest path.

A crawl over Common-Crawl-style data rarely starts from raw WARCs: the
CDXJ index (one text line per capture: ``<SURT key> <14-digit ts>
<JSON>``) is how real deployments discover what exists, pick the capture
set, and plan WARC range-reads.  This module turns index files into the
engine's tables:

* ``read_cdx``    — cdx/cdx.gz lines → typed capture rows.  Pure JVM
  (``split`` + ``from_json`` + casts): no Python runs per line, the scan
  stays in whole-stage codegen, and ``.gz`` decompresses natively in the
  text reader (parallelism is per file, same as WARC segments — CC ships
  300 index shards per crawl).
* ``cdx_to_seeds`` — captures → the engine's ``(url, seed_order)`` seed
  frame: filter by status/MIME, dedupe each URL to its LATEST capture,
  order deterministically by SURT key via the same range-partitioned
  rank the frontier uses (no single-partition window at 10^9 index
  rows).
* ``warc_fetch_plan`` — captures → one row per WARC file with its sorted
  ``(offset, length, url)`` ranges: the input a range-fetch stage needs
  to pull exactly the selected records (the HTTP byte-range seam; this
  sandbox has no network, so the fetch itself stays behind the corpus
  join like every other fetch).
* ``cdx_bytes``    — deterministic fixture/egress writer (SURT keys from
  ``urlnorm.surt_key``, the pinned spec the JVM column twin matches).

Malformed lines (wrong field count, non-numeric timestamp, unparsable
JSON, missing url) are dropped, mirroring the skip-don't-crash contract
of the WARC/robots/sitemap readers.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import urlnorm

CDX_SCHEMA = ("surt string, warc_ts timestamp, url string, status int, "
              "mime string, digest string, length long, offset long, "
              "warc_filename string")

# CC CDXJ stores every JSON value as a string
_JSON_FIELDS = ("url string, mime string, status string, digest string, "
                "length string, offset string, filename string")


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read CDXJ index file(s) (``.cdx`` / ``.cdx.gz``, file/dir/glob)
    into capture rows (CDX_SCHEMA)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ", 3)
    j = F.from_json(F.element_at(parts, 3), _JSON_FIELDS)
    return (
        lines
        .where(F.size(parts) == 3)
        .where(F.element_at(parts, 2).rlike(r"^[0-9]{14}$"))
        .select(
            F.element_at(parts, 1).alias("surt"),
            F.to_timestamp(F.element_at(parts, 2), "yyyyMMddHHmmss")
            .alias("warc_ts"),
            j["url"].alias("url"),
            j["status"].cast("int").alias("status"),
            j["mime"].alias("mime"),
            j["digest"].alias("digest"),
            j["length"].cast("long").alias("length"),
            j["offset"].cast("long").alias("offset"),
            j["filename"].alias("warc_filename"),
        )
        .where(F.col("url").isNotNull())
    )


def cdx_to_seeds(cdx: DataFrame, *, statuses: tuple[int, ...] = (200,),
                 mime_prefix: str = "text/html",
                 num_partitions: int = 32) -> DataFrame:
    """Captures → the engine's seed frame ``(url, seed_order)``.

    Keeps the LATEST matching capture per URL (CC indexes carry every
    historical capture), then assigns ``seed_order`` by SURT key — the
    crawl-archive-canonical ordering, so hosts stay clustered and the
    order is identical at any parallelism.  Uses the frontier's
    range-partitioned rank, never a global single-partition window."""
    from ..ranking import global_rank

    picked = (
        cdx
        .where(F.col("status").isin(*statuses))
        .where(F.col("mime").startswith(mime_prefix))
        .groupBy("url")
        .agg(F.max(F.struct("warc_ts", "surt")).alias("pick"))
        .select("url", F.col("pick.surt").alias("surt"))
    )
    cleanup: list = []
    out = global_rank(picked, ["surt", "url"], "seed_order",
                      num_partitions=num_partitions, cleanup=cleanup) \
        .select("url", "seed_order")
    # rank() pins a materialization; hand it to the caller's lifecycle by
    # materializing the small seed frame now and releasing the pin
    out = out.localCheckpoint(eager=True)
    for df in cleanup:
        df.unpersist()
    return out


def warc_fetch_plan(cdx: DataFrame) -> DataFrame:
    """One row per WARC file: its captures' ``(offset, length, url)``
    ranges sorted by offset — the unit of work for a byte-range fetch
    stage (one task per WARC file, sequential-forward reads inside it).
    """
    return (
        cdx
        .where(F.col("warc_filename").isNotNull()
               & F.col("offset").isNotNull())
        .groupBy("warc_filename")
        .agg(
            F.array_sort(F.collect_list(F.struct("offset", "length", "url")))
            .alias("ranges"),
            F.count(F.lit(1)).alias("n_records"),
            F.sum("length").alias("total_bytes"),
        )
    )


def cdx_bytes(records, gz: bool = False) -> bytes:
    """Encode ``(url, ts, status, mime, digest, length, offset, filename)``
    tuples as CDXJ lines (fixtures/egress).  Deterministic: equal input →
    identical bytes (gzip mtime pinned)."""
    out = io.StringIO()
    for url, ts, status, mime, digest, length, offset, filename in records:
        meta = {"url": url, "mime": mime, "status": str(status),
                "digest": digest, "length": str(length),
                "offset": str(offset), "filename": filename}
        out.write("%s %s %s\n" % (
            urlnorm.surt_key(url),
            ts.strftime("%Y%m%d%H%M%S"),
            json.dumps(meta, sort_keys=True, separators=(",", ":"))))
    raw = out.getvalue().encode()
    return gzip.compress(raw, mtime=0) if gz else raw


def fixture_ts(epoch: int) -> dt.datetime:
    """UTC timestamp helper for deterministic fixtures."""
    return dt.datetime.fromtimestamp(epoch, dt.timezone.utc) \
        .replace(tzinfo=None)


def cdx_segments(captures: DataFrame, records_per_segment: int = 10_000,
                 num_partitions: int = 32,
                 cleanup: list | None = None) -> DataFrame:
    """Pack capture rows into published CDXJ shard blobs — the index a
    crawl *produces* so the next consumer can run ``read_cdx`` /
    ``cdx_to_seeds`` against it (CC's publishing layout: SURT-ordered
    shards + a secondary index of each shard's key range).

    Input: rows with (url, warc_ts, status, mime, digest, length, offset,
    filename).  Returns ``(segment_id, n_records, first_surt, last_surt,
    cdx_gz binary)`` — records totally ordered by (SURT, ts, url) within
    and ACROSS segments via the engine's range-partitioned global rank
    (never a one-task sort), so equal input yields byte-identical shards
    on any cluster size, and (first_surt, last_surt) per shard is exactly
    the cluster.idx content a binary-searching reader needs.

    Scale: one rank shuffle of the capture rows; shard build is
    applyInPandas over bounded groups (peak memory = one shard per task).
    """
    import pandas as pd

    from remilia_spark.ranking import global_rank

    with_surt = captures.withColumn(
        "_surt", urlnorm.surt_key_col(F.col("url")))
    ranked = global_rank(with_surt, keys=["_surt", "warc_ts", "url"],
                         out_col="_r", num_partitions=num_partitions,
                         cleanup=cleanup)
    ranked = ranked.withColumn(
        "segment_id", F.expr(f"_r div {int(records_per_segment)}"))

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_r", kind="mergesort")
        blob = cdx_bytes(
            [(r.url, r.warc_ts.to_pydatetime(), r.status, r.mime,
              r.digest, r.length, r.offset, r.filename)
             for r in pdf.itertuples()],
            gz=True)
        return pd.DataFrame({
            "segment_id": [key[0]], "n_records": [len(pdf)],
            "first_surt": [pdf["_surt"].iloc[0]],
            "last_surt": [pdf["_surt"].iloc[-1]],
            "cdx_gz": [blob]})

    return ranked.groupBy("segment_id").applyInPandas(
        build, schema="segment_id long, n_records long, first_surt string, "
                      "last_surt string, cdx_gz binary")
