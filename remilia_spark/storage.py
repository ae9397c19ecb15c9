"""Checkpointed frontier state — atomic per-superstep commits + lineage.

North rule: frontier state persists with per-partition lineage and metrics
so a killed run resumes from the last committed superstep with **no
duplicate fetches**.  On a real cluster this is Iceberg (snapshot per
superstep, ``history()`` for lineage); the sandbox ships no Iceberg jar and
has no network, so the default impl is a Parquet snapshot store with a
manifest-commit protocol:

* superstep ``s`` writes ``<root>/<table>/s=<s>/`` for the snapshot tables
  (``budgets``, ``bloom``) and ``<root>/<table>/delta_s=<s>/`` for the
  append-only ones (``seen``, ``results``, ``metrics``);
* the **frontier** is delta-encoded: a normal superstep commits only the
  rows whose state changed (fetched / retry / newly discovered), tagged
  with ``rev`` = the commit index, to ``frontier/delta_s=<s>/``; every
  ``cfg.frontier_compact_every`` steps a full folded snapshot is written to
  ``frontier/s=<s>/`` and the delta chain resets.  Rewriting the whole
  frontier every wave would be O(total-URLs) I/O per superstep — the
  single biggest scale-killer at a 10^10-URL frontier;
* ``read_frontier`` folds base ∪ deltas: a row version is stale iff its
  key reappears at a higher ``rev``, and the only rows that ever supersede
  an earlier version are wave transitions (state fetched/failed, or a
  retry with attempt > 0), so the fold is an anti-join against that small
  "touched since base" set (bounded by the compaction interval — it is
  broadcast-hinted, never a full shuffle);
* the commit then atomically renames ``_COMMIT_<s>.json.tmp`` →
  ``_COMMIT_<s>.json`` recording, per table, the files written with their
  row counts (the per-partition lineage) — the frontier entry additionally
  records its ``base`` step and ``deltas`` chain;
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
from dataclasses import dataclass
from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .budget import BUDGETS_SCHEMA  # re-export: state-table schemas live here

__all__ = [
    "BUDGETS_SCHEMA", "FRONTIER_SCHEMA", "FRONTIER_REV_SCHEMA", "SEEN_SCHEMA",
    "RESULTS_SCHEMA", "METRICS_SCHEMA", "LocalTable",
    "ParquetSnapshotStorage", "IcebergStorage", "SNAPSHOT_TABLES",
    "DELTA_TABLES",
]

SNAPSHOT_TABLES = ("frontier", "budgets", "bloom")
DELTA_TABLES = ("seen", "results", "metrics")

FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, depth int, discovery_order long, "
    "parent_hash long, link_index int, attempt int, next_eligible int, "
    "state string"
)
# on-disk frontier rows carry the commit index they were written at
FRONTIER_REV_SCHEMA = FRONTIER_SCHEMA + ", rev int"
SEEN_SCHEMA = "url_hash long, url string, first_seen_superstep int"
RESULTS_SCHEMA = ("superstep int, url string, depth int, host_rank int, "
                  "discovery_order long, text string")
METRICS_SCHEMA = (
    "superstep int, partition_id int, rows_in long, rows_emitted long, "
    "deduped long, robots_blocked long, budget_deferred long, wall_ms long, "
    "retry_pending long, failed_terminal long"
)


@dataclass
class LocalTable:
    """Driver-local bounded rows destined for a commit table.

    The storage impl persists these WITHOUT launching a Spark job — the
    parquet impl writes one pyarrow file, the in-memory impl stores the
    rows as-is.  Used for the metrics table: its content is already a
    driver-side collect (bounded: partitions × backoff horizon), and
    round-tripping ~40 rows through ``parallelize`` + a distributed
    write measured a flat ~5 s/superstep of pure job scheduling under
    load — the single largest slice of the commit wall at fixture scale.

    ``rows_fn`` (optional, pass ``rows=None``): a callable resolving to
    the row list, evaluated at write time inside the commit's concurrent
    write pool.  Lets the caller overlap the driver-side aggregate that
    PRODUCES the rows with the other tables' write jobs — the metrics
    collect was a serial ~0.5-1.5 s/superstep wall in front of the commit
    at every core count.  Atomicity is unchanged: the manifest still
    publishes only after every table, metrics included, is on disk.
    """
    rows: list | None
    schema: str  # DDL string, e.g. METRICS_SCHEMA
    rows_fn: object = None  # () -> list, resolved at write time

    def resolve(self) -> list:
        if self.rows is None:
            self.rows = list(self.rows_fn())
        return self.rows

    def field_names(self) -> list[str]:
        return [p.strip().rsplit(" ", 1)[0] for p in self.schema.split(",")]


def _ddl_to_arrow(ddl: str):
    """Arrow schema from the simple flat DDL strings this module uses
    (int/long/string/double/boolean columns only)."""
    import pyarrow as pa
    m = {"int": pa.int32(), "long": pa.int64(), "string": pa.string(),
         "double": pa.float64(), "boolean": pa.bool_()}
    fields = []
    for part in ddl.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        fields.append(pa.field(name, m[typ]))
    return pa.schema(fields)


def _summarize_metrics(rows, as_int) -> dict:
    """Shared metrics decoding: the -1 totals row plus the histogram rows
    (partition_id -1000-ne = wave rows leaving pending, -2000-ne = retry
    rows re-entering it)."""
    out = {"totals": None, "wave_hist": {}, "retry_hist": {}}
    for r in rows:
        pid = int(r["partition_id"])
        if pid == -1:
            out["totals"] = {k: as_int(v) for k, v in r.items()}
        elif -2000 < pid <= -1000:
            out["wave_hist"][-1000 - pid] = as_int(r["rows_in"])
        elif pid <= -2000:
            out["retry_hist"][-2000 - pid] = as_int(r["rows_in"])
    return out


# Above this many accumulated delta rows the fold's "touched keys" side is
# no longer force-broadcast (a 10^8-row broadcast is a driver/executor OOM,
# not an optimization) — the anti-join falls back to a shuffle, where AQE
# may still pick a broadcast from real size stats.  Compaction normally
# keeps chains far below this (cfg.frontier_compact_rows <= this bound);
# the guard matters when a single wave alone exceeds it.
BROADCAST_FOLD_MAX_ROWS = 4_000_000


def fold_frontier(df: DataFrame, base: int, has_deltas: bool,
                  delta_rows: int | None = None) -> DataFrame:
    """Fold frontier rows (base ∪ deltas, FRONTIER_REV_SCHEMA) to the
    current version per key.  A row version is stale iff its key reappears
    at a higher ``rev``; only wave transitions supersede (fetched/failed,
    or a retry with attempt > 0), so the stale-key set is those delta rows
    — bounded by the compaction interval.  The anti-join is broadcast-
    hinted only while the chain's recorded row count (``delta_rows``, from
    the manifest) stays under ``BROADCAST_FOLD_MAX_ROWS``.
    Deterministic: (key, rev) pairs are unique, so there are no ties."""
    if not has_deltas:
        return df
    touched = (
        df.where((F.col("rev") > base)
                 & (F.col("state").isin("fetched", "failed")
                    | (F.col("attempt") > 0)))
        .select("url_hash", "url", F.col("rev").alias("t_rev"))
    )
    small = delta_rows is not None and delta_rows <= BROADCAST_FOLD_MAX_ROWS
    t = F.broadcast(touched) if small else touched
    a, t = df.alias("a"), t.alias("t")
    return a.join(
        t,
        (F.col("a.url_hash") == F.col("t.url_hash"))
        & (F.col("a.url") == F.col("t.url"))
        & (F.col("t.t_rev") > F.col("a.rev")),
        "left_anti",
    )


class ParquetSnapshotStorage:
    def __init__(self, spark: SparkSession, root: str | Path,
                 gc_keep_commits: int = 8):
        """``gc_keep_commits``: after a compaction commit, frontier/seen
        directories not referenced by the last this-many manifests are
        best-effort deleted (the Iceberg ``expire_snapshots`` analogue —
        without it a long run leaks one superseded delta dir per
        superstep).  Resume only ever starts from ``last_committed()``,
        so keeping a window (not just the head) is purely crash-safety
        slack.  0 disables GC.  Append-only logs (results/metrics) are
        never touched — they are the crawl's output."""
        self.spark = spark
        self.root = Path(root)
        self.gc_keep_commits = gc_keep_commits
        self.root.mkdir(parents=True, exist_ok=True)

    # -- commit protocol ----------------------------------------------------

    def _manifest_path(self, s: int) -> Path:
        return self.root / f"_COMMIT_{s:06d}.json"

    def clear(self) -> None:
        """Remove every manifest and table directory (fresh-run reset).

        Manifests go first: if the wipe is interrupted, readers (which only
        ever resolve state through manifests) see an empty store rather
        than a half-deleted one.
        """
        import shutil
        for p in sorted(self.root.glob("_COMMIT_*.json")):
            p.unlink()
        for table in (*SNAPSHOT_TABLES, *DELTA_TABLES):
            shutil.rmtree(self.root / table, ignore_errors=True)

    def last_committed(self) -> int | None:
        steps = [
            int(p.name[len("_COMMIT_"):-len(".json")])
            for p in self.root.glob("_COMMIT_*.json")
        ]
        return max(steps) if steps else None

    def has_manifest(self, s: int) -> bool:
        return self._manifest_path(s).exists()

    def _table_dir(self, table: str, s: int) -> Path:
        prefix = "delta_s" if table in DELTA_TABLES else "s"
        return self.root / table / f"{prefix}={s:06d}"

    def commit(self, s: int, tables: dict[str, DataFrame],
               extra: dict | None = None,
               reuse: dict[str, int] | None = None,
               delta_frontier: bool = False,
               delta_seen: bool = True) -> dict:
        """Write ``tables`` for superstep ``s`` and publish the manifest.

        Lineage: for every written parquet file, its row count (read back
        from the parquet footers — cheap, metadata-only).  ``reuse`` maps a
        snapshot table name to an earlier superstep whose data directory is
        carried forward unchanged (manifest points at the old path — no
        rewrite for idle supersteps / unchanged budgets).

        ``delta_frontier``: the ``frontier`` entry in ``tables`` holds only
        this superstep's changed rows (must carry ``rev``); the manifest
        chains it onto the previous commit's base and records the chain's
        accumulated ``delta_rows`` (drives both compaction cadence and the
        fold's broadcast-vs-shuffle choice).  Otherwise the frontier entry
        is a full folded snapshot and becomes the new base.

        ``delta_seen`` works the same for the ``seen`` table (default True:
        normal supersteps append only the newly-discovered keys); a False
        commit writes a full folded base so the read side never faces an
        unbounded directory chain.  Either way the entry carries
        ``total_rows``, the running seen-set size — O(1) for the engine to
        read back instead of an O(supersteps) manifest scan.
        """
        lineage: dict[str, dict] = {}
        for name, prev in (reuse or {}).items():
            lineage[name] = self.manifest(prev)["tables"][name]

        # a seen delta needs a previous manifest to chain onto; the very
        # first commit is always a base
        seen_is_delta = delta_seen and self.has_manifest(s - 1)

        def write_one(item: tuple[str, DataFrame]) -> tuple[str, dict]:
            name, df = item
            t_w0 = time.monotonic()
            as_delta = (name == "frontier" and delta_frontier) or \
                       (name == "seen" and seen_is_delta)
            as_base = name in ("frontier", "seen") and not as_delta
            if as_delta:
                path = self.root / name / f"delta_s={s:06d}"
            elif as_base:
                path = self.root / name / f"s={s:06d}"
            else:
                path = self._table_dir(name, s)
            if isinstance(df, LocalTable):
                # driver-local rows: one pyarrow file, zero Spark jobs —
                # the read side is identical parquet.  resolve() may block
                # on a deferred producer (the metrics collect), which then
                # overlaps the sibling write jobs in this pool.
                import pyarrow as pa
                import shutil
                rows = df.resolve()
                shutil.rmtree(path, ignore_errors=True)
                path.mkdir(parents=True, exist_ok=True)
                arrow = _ddl_to_arrow(df.schema)
                cols = {f.name: [r[i] for r in rows]
                        for i, f in enumerate(arrow)}
                pq.write_table(pa.table(cols, schema=arrow),
                               str(path / "part-00000.parquet"))
                return name, {"path": str(path),
                              "files": {"part-00000.parquet": len(rows)},
                              "rows": len(rows),
                              "write_sec": round(
                                  time.monotonic() - t_w0, 3)}
            df.write.mode("overwrite").parquet(str(path))
            files = sorted(str(f) for f in path.glob("*.parquet"))
            # footer-only metadata reads; parallel — at 32 shuffle
            # partitions x 5 tables the serial version was a visible
            # slice of the per-superstep commit floor
            if len(files) > 4:
                with ThreadPoolExecutor(max_workers=8) as fex:
                    counts = list(fex.map(
                        lambda f: pq.read_metadata(f).num_rows, files))
            else:
                counts = [pq.read_metadata(f).num_rows for f in files]
            parts = {os.path.basename(f): n for f, n in zip(files, counts)}
            # per-table write wall — commit-cost attribution lineage (the
            # commit runs writes concurrently, so the commit wall is the
            # max of these, not the sum)
            return name, {"path": str(path), "files": parts,
                          "rows": sum(parts.values()),
                          "write_sec": round(time.monotonic() - t_w0, 3)}

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
        if "frontier" in tables:
            if delta_frontier:
                prev = self.manifest(s - 1)["tables"]["frontier"]
                lineage["frontier"]["base"] = prev["base"]
                lineage["frontier"]["deltas"] = [*prev["deltas"], s]
                lineage["frontier"]["delta_rows"] = \
                    prev.get("delta_rows", 0) + lineage["frontier"]["rows"]
            else:
                lineage["frontier"]["base"] = s
                lineage["frontier"]["deltas"] = []
                lineage["frontier"]["delta_rows"] = 0
        if "seen" in tables:
            if seen_is_delta:
                prev = self.manifest(s - 1)["tables"]["seen"]
                lineage["seen"]["base"] = prev["base"]
                lineage["seen"]["deltas"] = [*prev["deltas"], s]
                lineage["seen"]["total_rows"] = \
                    prev.get("total_rows", 0) + lineage["seen"]["rows"]
            else:
                lineage["seen"]["base"] = s
                lineage["seen"]["deltas"] = []
                lineage["seen"]["total_rows"] = lineage["seen"]["rows"]
        manifest = {
            "superstep": s,
            "committed_at": time.time(),
            "tables": lineage,
            **(extra or {}),
        }
        tmp = self._manifest_path(s).with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self._manifest_path(s))  # atomic publish
        # a fresh base supersedes the old base + delta chain — GC anything
        # the recent manifest window no longer references
        wrote_base = ("frontier" in tables and not delta_frontier) or \
                     ("seen" in tables and not seen_is_delta)
        if wrote_base and self.gc_keep_commits:
            self._gc_stale_dirs(s)
        return manifest

    def _gc_stale_dirs(self, s: int) -> None:
        """Best-effort delete of frontier/seen state dirs unreferenced by
        the last ``gc_keep_commits`` manifests (Iceberg expire_snapshots
        analogue; older manifests lose time-travel, resume never needs
        them).  Only ``s=``/``delta_s=`` dirs are candidates."""
        import shutil
        keep: dict[str, set[str]] = {"frontier": set(), "seen": set(),
                                     "budgets": set(), "bloom": set()}
        for k in range(max(0, s - self.gc_keep_commits + 1), s + 1):
            if not self.has_manifest(k):
                continue
            tabs = self.manifest(k)["tables"]
            for t in keep:
                ent = tabs.get(t)
                if ent is None:
                    continue
                if "base" in ent:
                    keep[t].add(f"s={ent['base']:06d}")
                    keep[t].update(f"delta_s={d:06d}"
                                   for d in ent.get("deltas", ()))
                else:  # snapshot / legacy / reused entries: the named path
                    keep[t].add(Path(ent["path"]).name)
        for t, names in keep.items():
            tdir = self.root / t
            if not tdir.exists():
                continue
            for sub in tdir.iterdir():
                if (sub.is_dir()
                        and sub.name.split("=")[0] in ("s", "delta_s")
                        and sub.name not in names):
                    shutil.rmtree(sub, ignore_errors=True)

    def manifest(self, s: int) -> dict:
        return json.loads(self._manifest_path(s).read_text())

    # -- readers (only ever through manifests) ------------------------------

    def read_snapshot(self, table: str, s: int) -> DataFrame:
        """Read a snapshot table as of committed superstep ``s`` (the path
        the manifest points at — possibly a reused earlier directory)."""
        path = self.manifest(s)["tables"][table]["path"]
        return self.spark.read.parquet(path)

    def read_frontier(self, s: int) -> DataFrame:
        """Current frontier as of committed superstep ``s``: fold the base
        snapshot and the delta chain the manifest records.

        A row version is stale iff its (url_hash, url) reappears at a
        higher ``rev``; only wave transitions ever supersede (a fetched /
        failed row, or a retry re-entry with attempt > 0), so the stale-key
        set is exactly those rows of the deltas — bounded by the compaction
        interval, hence broadcast-hinted.  Deterministic: (key, rev) pairs
        are unique by construction, so the fold has no ties.
        """
        ent = self.manifest(s)["tables"]["frontier"]
        base, deltas = ent["base"], ent["deltas"]
        paths = [str(self.root / "frontier" / f"s={base:06d}")]
        paths += [str(self.root / "frontier" / f"delta_s={k:06d}")
                  for k in deltas]
        df = self.spark.read.schema(FRONTIER_REV_SCHEMA).parquet(*paths)
        return fold_frontier(df, base, bool(deltas),
                             delta_rows=ent.get("delta_rows"))

    def read_seen(self, s: int) -> DataFrame | None:
        """Seen set as of committed superstep ``s``: the base snapshot plus
        the delta chain the manifest records — never a directory glob over
        every superstep ever run (at 10^4 supersteps that glob alone is a
        file-listing stall)."""
        ent = self.manifest(s)["tables"].get("seen")
        if ent is None:
            return None
        if "base" not in ent:  # pre-r3 manifest (see migrate_legacy_seen)
            return self.read_deltas("seen", s, SEEN_SCHEMA)
        paths = [str(self.root / "seen" / f"s={ent['base']:06d}")]
        paths += [str(self.root / "seen" / f"delta_s={k:06d}")
                  for k in ent["deltas"]]
        return self.spark.read.schema(SEEN_SCHEMA).parquet(*paths)

    def migrate_legacy_seen(self, s: int) -> None:
        """One-time format upgrade: pre-r3 manifests recorded ``seen``
        without the ``base``/``deltas``/``total_rows`` chain keys (data
        lived in one ``delta_s=<k>`` dir per commit).  Fold every legacy
        delta into a fresh base at step ``s`` and republish the manifest,
        so ``resume=True`` on an old checkpoint keeps working instead of
        raising KeyError (and the running seen total reads correctly)."""
        legacy = self.read_deltas("seen", s, SEEN_SCHEMA)
        if legacy is None:
            return
        path = self.root / "seen" / f"s={s:06d}"
        legacy.write.mode("overwrite").parquet(str(path))
        files = sorted(str(f) for f in path.glob("*.parquet"))
        parts = {os.path.basename(f): pq.ParquetFile(f).metadata.num_rows
                 for f in files}
        manifest = self.manifest(s)
        manifest["tables"]["seen"] = {
            "path": str(path), "files": parts, "rows": sum(parts.values()),
            "base": s, "deltas": [], "total_rows": sum(parts.values()),
        }
        tmp = self._manifest_path(s).with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self._manifest_path(s))

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

    def metrics_summary(self, s: int) -> dict:
        """Totals + next_eligible histograms from superstep ``s``'s metrics
        — a driver-local parquet read, no Spark job.  Returns
        {"totals": {...}, "wave_hist": {ne: n}, "retry_hist": {ne: n}}
        (hist rows are encoded as partition_id = -1000-ne / -2000-ne)."""
        import pandas as pd
        path = self.manifest(s)["tables"]["metrics"]["path"]
        pdf = pq.read_table(path).to_pandas()
        return _summarize_metrics(
            pdf.to_dict("records"),
            lambda v: int(v) if pd.notna(v) else 0)


class InMemorySnapshotStorage:
    """Second ``FrontierStorage`` impl — same commit/read protocol, state
    held as collected rows in driver memory (no filesystem).

    Exists to make "swapping the backend is a constructor change" a tested
    claim rather than a comment (on a cluster the third impl is Iceberg:
    snapshot-per-superstep + MERGE, see SCALE.md).  Collecting pins each
    commit's rows eagerly, which doubles as the determinism barrier the
    parquet impl gets from writing files.  Test-scale only by design.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._manifests: dict[int, dict] = {}
        self._data: dict[tuple[str, int], tuple] = {}  # (table, s) -> rows

    def clear(self) -> None:
        self._manifests.clear()
        self._data.clear()

    def last_committed(self) -> int | None:
        return max(self._manifests) if self._manifests else None

    def has_manifest(self, s: int) -> bool:
        return s in self._manifests

    def manifest(self, s: int) -> dict:
        return self._manifests[s]

    def commit(self, s: int, tables: dict[str, DataFrame],
               extra: dict | None = None,
               reuse: dict[str, int] | None = None,
               delta_frontier: bool = False,
               delta_seen: bool = True) -> dict:
        lineage: dict[str, dict] = {}
        for name, prev in (reuse or {}).items():
            lineage[name] = self._manifests[prev]["tables"][name]
        for name, df in tables.items():
            if isinstance(df, LocalTable):
                from pyspark.sql import Row
                mk = Row(*df.field_names())
                rows = [mk(*r) for r in df.resolve()]
                self._data[(name, s)] = (df.schema, rows)
                lineage[name] = {"path": f"mem://{name}/{s}", "step": s,
                                 "files": {f"mem-{s}": len(rows)},
                                 "rows": len(rows)}
                continue
            rows = df.collect()
            self._data[(name, s)] = (df.schema, rows)
            lineage[name] = {"path": f"mem://{name}/{s}", "step": s,
                             "files": {f"mem-{s}": len(rows)},
                             "rows": len(rows)}
        if "frontier" in tables:
            if delta_frontier:
                prev_f = self._manifests[s - 1]["tables"]["frontier"]
                lineage["frontier"]["base"] = prev_f["base"]
                lineage["frontier"]["deltas"] = [*prev_f["deltas"], s]
                lineage["frontier"]["delta_rows"] = \
                    prev_f.get("delta_rows", 0) + lineage["frontier"]["rows"]
            else:
                lineage["frontier"]["base"] = s
                lineage["frontier"]["deltas"] = []
                lineage["frontier"]["delta_rows"] = 0
        if "seen" in tables:
            if delta_seen and (s - 1) in self._manifests:
                prev_s = self._manifests[s - 1]["tables"]["seen"]
                lineage["seen"]["base"] = prev_s["base"]
                lineage["seen"]["deltas"] = [*prev_s["deltas"], s]
                lineage["seen"]["total_rows"] = \
                    prev_s.get("total_rows", 0) + lineage["seen"]["rows"]
            else:
                lineage["seen"]["base"] = s
                lineage["seen"]["deltas"] = []
                lineage["seen"]["total_rows"] = lineage["seen"]["rows"]
        manifest = {"superstep": s, "committed_at": time.time(),
                    "tables": lineage, **(extra or {})}
        self._manifests[s] = manifest
        return manifest

    def _df(self, table: str, s: int) -> DataFrame:
        schema, rows = self._data[(table, s)]
        return self.spark.createDataFrame(rows, schema)

    def read_snapshot(self, table: str, s: int) -> DataFrame:
        ent = self._manifests[s]["tables"][table]
        return self._df(table, ent["step"])  # possibly a reused older step

    def read_frontier(self, s: int) -> DataFrame:
        ent = self._manifests[s]["tables"]["frontier"]
        base, deltas = ent["base"], ent["deltas"]
        df = self._df("frontier", base)
        for k in deltas:
            df = df.unionByName(self._df("frontier", k))
        return fold_frontier(df, base, bool(deltas),
                             delta_rows=ent.get("delta_rows"))

    def read_seen(self, s: int) -> DataFrame | None:
        ent = self._manifests[s]["tables"].get("seen")
        if ent is None:
            return None
        df = self._df("seen", ent["base"])
        for k in ent["deltas"]:
            df = df.unionByName(self._df("seen", k))
        return df

    def read_deltas(self, table: str, up_to: int,
                    schema: str | None = None) -> DataFrame | None:
        steps = [k for k in range(up_to + 1)
                 if k in self._manifests and (table, k) in self._data]
        if not steps:
            return None
        df = self._df(table, steps[0])
        for k in steps[1:]:
            df = df.unionByName(self._df(table, k))
        return df

    def metrics_summary(self, s: int) -> dict:
        _, rows = self._data[("metrics", s)]
        return _summarize_metrics(
            [r.asDict() for r in rows],
            lambda v: int(v) if v is not None else 0)


class IcebergStorage:
    """Third ``FrontierStorage`` impl — Apache Iceberg tables (SURVEY §4.3
    names the design; the north rule says "persists to Iceberg").

    Same commit/read protocol as :class:`ParquetSnapshotStorage`, with the
    directory layout re-expressed as Iceberg constructs:

    ========================  =========================================
    parquet impl              Iceberg impl
    ========================  =========================================
    ``<table>/s=<k>`` dirs    one table per logical name, partitioned by
                              a ``commit_s INT`` column (base and delta
                              writes both append a new partition; the
                              manifest's ``base``/``deltas`` chain says
                              which partitions a read folds)
    ``_COMMIT_<s>.json`` +    one row appended to ``<prefix>_manifest``
    atomic rename             — an Iceberg append commit is atomic, so
                              the manifest row IS the publish point
    parquet footer counts     the write's snapshot-summary
                              ``added-records`` (metadata-only)
    ``_gc_stale_dirs``        ``DELETE WHERE commit_s = <stale>``
                              (partition-aligned → metadata delete) +
                              best-effort ``expire_snapshots``
    per-partition lineage     manifest JSON (identical shape) + native
                              ``history()`` / ``.snapshots`` metadata
    ========================  =========================================

    A compaction commit folds base+deltas into a fresh partition — the
    declarative alternative is ``MERGE INTO`` keyed on (url_hash, url,
    rev); this impl keeps the engine's fold plan (identical output) so
    both backends execute the same physics.

    Requires an Iceberg-enabled session: ``iceberg-spark-runtime`` on the
    classpath and a catalog configured, e.g.::

        spark.sql.catalog.local = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.local.type = hadoop
        spark.sql.catalog.local.warehouse = /tmp/warehouse

    The sandbox ships no Iceberg jar, so the constructor probe raises
    RuntimeError there; the storage contract suite
    (``tests/test_storage_contract.py``) runs identical assertions over
    every impl and skips this one when the probe fails.
    """

    def __init__(self, spark: SparkSession, namespace: str,
                 prefix: str = "crawl", gc_keep_commits: int = 8):
        """``namespace``: catalog-qualified namespace, e.g.
        ``local.remilia`` (``<catalog>.<db>``)."""
        self.spark = spark
        self.ns = namespace
        self.prefix = prefix
        self.gc_keep_commits = gc_keep_commits
        self._manifest_cache: dict[int, dict] = {}
        try:
            spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {self._ident('manifest')} "
                "(superstep INT, manifest STRING) USING iceberg "
                "PARTITIONED BY (superstep)")
        except Exception as ex:  # pragma: no cover - needs the jar
            raise RuntimeError(
                "IcebergStorage needs an Iceberg-enabled SparkSession "
                "(iceberg-spark-runtime on the classpath and the "
                f"'{namespace.split('.')[0]}' catalog configured); the "
                f"probe DDL failed: {ex}") from ex

    def _ident(self, table: str) -> str:
        return f"{self.ns}.{self.prefix}_{table}"

    # -- commit protocol ----------------------------------------------------

    def clear(self) -> None:
        for t in (*SNAPSHOT_TABLES, *DELTA_TABLES, "quota", "manifest"):
            self.spark.sql(f"DROP TABLE IF EXISTS {self._ident(t)}")
        self._manifest_cache.clear()
        self.spark.sql(
            f"CREATE TABLE {self._ident('manifest')} "
            "(superstep INT, manifest STRING) USING iceberg "
            "PARTITIONED BY (superstep)")

    def last_committed(self) -> int | None:
        row = self.spark.table(self._ident("manifest")) \
            .agg(F.max("superstep")).collect()[0][0]
        return int(row) if row is not None else None

    def has_manifest(self, s: int) -> bool:
        if s in self._manifest_cache:
            return True
        return bool(self.spark.table(self._ident("manifest"))
                    .where(F.col("superstep") == s).take(1))

    def manifest(self, s: int) -> dict:
        got = self._manifest_cache.get(s)
        if got is None:
            rows = (self.spark.table(self._ident("manifest"))
                    .where(F.col("superstep") == s).collect())
            if not rows:
                raise FileNotFoundError(f"no manifest for superstep {s}")
            got = json.loads(rows[0]["manifest"])
            self._manifest_cache[s] = got
        return got

    def _ensure_table(self, name: str, df: DataFrame) -> str:
        ident = self._ident(name)
        if not self.spark.catalog.tableExists(ident):
            df.limit(0).writeTo(ident).partitionedBy(F.col("commit_s")) \
                .create()
        return ident

    def _added_rows(self, ident: str) -> int:
        """Row count of the write that just committed — snapshot-summary
        metadata, no data scan (the parquet impl's footer-read twin)."""
        row = (self.spark.sql(
            f"SELECT summary FROM {ident}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1").collect())
        return int(row[0]["summary"].get("added-records", 0)) if row else 0

    def commit(self, s: int, tables: dict[str, DataFrame],
               extra: dict | None = None,
               reuse: dict[str, int] | None = None,
               delta_frontier: bool = False,
               delta_seen: bool = True) -> dict:
        lineage: dict[str, dict] = {}
        for name, prev in (reuse or {}).items():
            lineage[name] = self.manifest(prev)["tables"][name]
        seen_is_delta = delta_seen and self.has_manifest(s - 1)

        def write_one(item: tuple[str, DataFrame]) -> tuple[str, dict]:
            name, df = item
            t_w0 = time.monotonic()
            if isinstance(df, LocalTable):
                # driver-local bounded rows (metrics): one tiny append job
                # — Iceberg has no out-of-band file drop like the pyarrow
                # path, but the write is a single task over ~40 rows
                from pyspark.sql import Row
                mk = Row(*df.field_names())
                local_rows = df.resolve()
                sdf = self.spark.createDataFrame(
                    [mk(*r) for r in local_rows], df.schema)
                n_local = len(local_rows)
            else:
                sdf, n_local = df, None
            sdf = sdf.withColumn("commit_s", F.lit(s).cast("int"))
            ident = self._ensure_table(name, sdf)
            sdf.writeTo(ident).append()
            rows = self._added_rows(ident) if n_local is None else n_local
            return name, {"path": f"iceberg://{ident}", "commit_s": s,
                          "files": {f"commit_s={s}": rows}, "rows": rows,
                          "write_sec": round(time.monotonic() - t_w0, 3)}

        if len(tables) > 1:
            with ThreadPoolExecutor(max_workers=len(tables)) as ex:
                for name, entry in ex.map(write_one, tables.items()):
                    lineage[name] = entry
        else:
            for item in tables.items():
                name, entry = write_one(item)
                lineage[name] = entry
        if "frontier" in tables:
            if delta_frontier:
                prev = self.manifest(s - 1)["tables"]["frontier"]
                lineage["frontier"]["base"] = prev["base"]
                lineage["frontier"]["deltas"] = [*prev["deltas"], s]
                lineage["frontier"]["delta_rows"] = \
                    prev.get("delta_rows", 0) + lineage["frontier"]["rows"]
            else:
                lineage["frontier"]["base"] = s
                lineage["frontier"]["deltas"] = []
                lineage["frontier"]["delta_rows"] = 0
        if "seen" in tables:
            if seen_is_delta:
                prev = self.manifest(s - 1)["tables"]["seen"]
                lineage["seen"]["base"] = prev["base"]
                lineage["seen"]["deltas"] = [*prev["deltas"], s]
                lineage["seen"]["total_rows"] = \
                    prev.get("total_rows", 0) + lineage["seen"]["rows"]
            else:
                lineage["seen"]["base"] = s
                lineage["seen"]["deltas"] = []
                lineage["seen"]["total_rows"] = lineage["seen"]["rows"]
        manifest = {"superstep": s, "committed_at": time.time(),
                    "tables": lineage, **(extra or {})}
        # the atomic publish: state is visible iff this append commits
        self.spark.createDataFrame(
            [(s, json.dumps(manifest))], "superstep int, manifest string"
        ).writeTo(self._ident("manifest")).append()
        self._manifest_cache[s] = manifest
        wrote_base = ("frontier" in tables and not delta_frontier) or \
                     ("seen" in tables and not seen_is_delta)
        if wrote_base and self.gc_keep_commits:
            self._gc_stale_partitions(s)
        return manifest

    def _gc_stale_partitions(self, s: int) -> None:
        """``expire_snapshots`` analogue at the partition level: DELETE
        frontier/seen/budgets/bloom partitions unreferenced by the last
        ``gc_keep_commits`` manifests.  The predicate is partition-aligned
        so Iceberg drops files in metadata; a follow-up
        ``expire_snapshots`` (left to table maintenance) reclaims them."""
        keep: dict[str, set[int]] = {"frontier": set(), "seen": set(),
                                     "budgets": set(), "bloom": set()}
        for k in range(max(0, s - self.gc_keep_commits + 1), s + 1):
            if not self.has_manifest(k):
                continue
            tabs = self.manifest(k)["tables"]
            for t in keep:
                ent = tabs.get(t)
                if ent is None:
                    continue
                if "base" in ent:
                    keep[t].add(int(ent["base"]))
                    keep[t].update(int(d) for d in ent.get("deltas", ()))
                elif "commit_s" in ent:
                    keep[t].add(int(ent["commit_s"]))
        for t, steps in keep.items():
            ident = self._ident(t)
            if not self.spark.catalog.tableExists(ident) or not steps:
                continue
            keep_list = ", ".join(str(k) for k in sorted(steps))
            self.spark.sql(f"DELETE FROM {ident} "
                           f"WHERE commit_s <= {s} "
                           f"AND commit_s NOT IN ({keep_list})")

    # -- readers (only ever through manifests) ------------------------------

    def _read_steps(self, table: str, steps: list[int],
                    schema: str | None = None) -> DataFrame:
        df = self.spark.table(self._ident(table)) \
            .where(F.col("commit_s").isin([int(k) for k in steps])) \
            .drop("commit_s")
        if schema is not None:  # pin column order to the DDL
            names = [f.split()[0] for f in schema.split(",")]
            df = df.select(*[n.strip() for n in names])
        return df

    def read_snapshot(self, table: str, s: int) -> DataFrame:
        ent = self.manifest(s)["tables"][table]
        return self._read_steps(table, [ent["commit_s"]])

    def read_frontier(self, s: int) -> DataFrame:
        ent = self.manifest(s)["tables"]["frontier"]
        df = self._read_steps("frontier", [ent["base"], *ent["deltas"]],
                              FRONTIER_REV_SCHEMA)
        return fold_frontier(df, ent["base"], bool(ent["deltas"]),
                             delta_rows=ent.get("delta_rows"))

    def read_seen(self, s: int) -> DataFrame | None:
        ent = self.manifest(s)["tables"].get("seen")
        if ent is None:
            return None
        return self._read_steps("seen", [ent["base"], *ent["deltas"]],
                                SEEN_SCHEMA)

    def migrate_legacy_seen(self, s: int) -> None:
        """No-op: the pre-r3 manifest format predates this impl, so no
        Iceberg checkpoint can carry it."""

    def read_deltas(self, table: str, up_to: int,
                    schema: str | None = None) -> DataFrame | None:
        ident = self._ident(table)
        if not self.spark.catalog.tableExists(ident):
            return None
        steps = [r["superstep"] for r in
                 self.spark.table(self._ident("manifest"))
                 .where(F.col("superstep") <= up_to)
                 .select("superstep").collect()]
        if not steps:
            return None
        return self._read_steps(table, steps, schema)

    def metrics_summary(self, s: int) -> dict:
        ent = self.manifest(s)["tables"]["metrics"]
        rows = self._read_steps("metrics", [ent["commit_s"]]).collect()
        return _summarize_metrics(
            [r.asDict() for r in rows],
            lambda v: int(v) if v is not None else 0)

    def history(self, table: str) -> DataFrame:
        """Native Iceberg lineage: the table's snapshot history
        (made_current_at, snapshot_id, parent_id, is_current_ancestor)."""
        return self.spark.sql(f"SELECT * FROM {self._ident(table)}.history")
