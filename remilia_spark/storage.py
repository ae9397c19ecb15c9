"""Checkpointed frontier state — atomic per-superstep commits + lineage.

North rule: frontier state persists with per-partition lineage and metrics
so a killed run resumes from the last committed superstep with **no
duplicate fetches**.  On a real cluster this is Iceberg (snapshot per
superstep, ``history()`` for lineage); the sandbox ships no Iceberg jar and
has no network, so the default impl is a Parquet snapshot store with a
manifest-commit protocol:

* superstep ``s`` writes ``<root>/<table>/s=<s>/`` for the snapshot tables
  (``frontier``, ``budgets``) and ``<root>/<table>/delta_s=<s>/`` for the
  append-only ones (``seen``, ``results``, ``metrics``);
* the commit then atomically renames ``_COMMIT_<s>.json.tmp`` →
  ``_COMMIT_<s>.json`` recording, per table, the files written with their
  row counts (the per-partition lineage);
* **state becomes visible only through a manifest** — readers resolve
  ``last_committed()`` as the max manifest present, so an interrupted
  superstep (data files but no manifest) is invisible and recomputed
  idempotently (same committed input ⇒ same wave ⇒ no duplicate fetches).

The layout mirrors what the Iceberg impl would do with table snapshots; the
interface is storage-agnostic so swapping in Iceberg on a cluster is a
constructor change (``spark.table("...")`` + MERGE/snapshot commits).
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from .budget import BUDGETS_SCHEMA  # re-export: state-table schemas live here

__all__ = [
    "BUDGETS_SCHEMA", "FRONTIER_SCHEMA", "SEEN_SCHEMA", "RESULTS_SCHEMA",
    "METRICS_SCHEMA", "ParquetSnapshotStorage", "SNAPSHOT_TABLES",
    "DELTA_TABLES",
]

SNAPSHOT_TABLES = ("frontier", "budgets", "bloom")
DELTA_TABLES = ("seen", "results", "metrics")

FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, depth int, discovery_order long, "
    "parent_hash long, link_index int, attempt int, next_eligible int, "
    "state string"
)
SEEN_SCHEMA = "url_hash long, url string, first_seen_superstep int"
RESULTS_SCHEMA = ("superstep int, url string, depth int, host_rank int, "
                  "discovery_order long, text string")
METRICS_SCHEMA = (
    "superstep int, partition_id int, rows_in long, rows_emitted long, "
    "deduped long, robots_blocked long, budget_deferred long, wall_ms long, "
    "retry_pending long, failed_terminal long"
)


class ParquetSnapshotStorage:
    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- commit protocol ----------------------------------------------------

    def _manifest_path(self, s: int) -> Path:
        return self.root / f"_COMMIT_{s:06d}.json"

    def last_committed(self) -> int | None:
        steps = [
            int(p.name[len("_COMMIT_"):-len(".json")])
            for p in self.root.glob("_COMMIT_*.json")
        ]
        return max(steps) if steps else None

    def _table_dir(self, table: str, s: int) -> Path:
        prefix = "delta_s" if table in DELTA_TABLES else "s"
        return self.root / table / f"{prefix}={s:06d}"

    def commit(self, s: int, tables: dict[str, DataFrame],
               extra: dict | None = None,
               reuse: dict[str, int] | None = None) -> dict:
        """Write ``tables`` for superstep ``s`` and publish the manifest.

        Lineage: for every written parquet file, its row count (read back
        from the parquet footers — cheap, metadata-only).  ``reuse`` maps a
        snapshot table name to an earlier superstep whose data directory is
        carried forward unchanged (manifest points at the old path — no
        rewrite for idle supersteps / unchanged budgets).
        """
        lineage: dict[str, dict] = {}
        for name, prev in (reuse or {}).items():
            lineage[name] = self.manifest(prev)["tables"][name]

        def write_one(item: tuple[str, DataFrame]) -> tuple[str, dict]:
            name, df = item
            path = self._table_dir(name, s)
            df.write.mode("overwrite").parquet(str(path))
            files = sorted(str(f) for f in path.glob("*.parquet"))
            parts = {
                os.path.basename(f): pq.ParquetFile(f).metadata.num_rows
                for f in files
            }
            return name, {"path": str(path), "files": parts,
                          "rows": sum(parts.values())}

        # the table writes are independent Spark jobs over cached inputs —
        # run them concurrently so the commit wall-clock is max(), not sum()
        if len(tables) > 1:
            with ThreadPoolExecutor(max_workers=len(tables)) as ex:
                for name, entry in ex.map(write_one, tables.items()):
                    lineage[name] = entry
        else:
            for item in tables.items():
                name, entry = write_one(item)
                lineage[name] = entry
        manifest = {
            "superstep": s,
            "committed_at": time.time(),
            "tables": lineage,
            **(extra or {}),
        }
        tmp = self._manifest_path(s).with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self._manifest_path(s))  # atomic publish
        return manifest

    def manifest(self, s: int) -> dict:
        return json.loads(self._manifest_path(s).read_text())

    # -- readers (only ever through manifests) ------------------------------

    def read_snapshot(self, table: str, s: int) -> DataFrame:
        """Read a snapshot table as of committed superstep ``s`` (the path
        the manifest points at — possibly a reused earlier directory)."""
        path = self.manifest(s)["tables"][table]["path"]
        return self.spark.read.parquet(path)

    def read_deltas(self, table: str, up_to: int,
                    schema: str | None = None) -> DataFrame | None:
        paths = [
            str(self._table_dir(table, k))
            for k in range(up_to + 1)
            if self._manifest_path(k).exists()
            and self._table_dir(table, k).exists()
        ]
        if not paths:
            return None
        return self.spark.read.schema(schema).parquet(*paths) if schema \
            else self.spark.read.parquet(*paths)
