"""Manifest-based snapshot tables — the Iceberg-shaped source contract.

The production target is an Iceberg catalog table of source-code
repositories at 10^12-file scale (``sources/tables.py::read_source_table``
plugs straight into one).  This sandbox has no Iceberg runtime jars, so
this module implements the *table-format contract the engine actually
relies on* — append-only snapshots described by manifest files — over
plain parquet, exactly the mechanism Iceberg's metadata layer provides:

- **snapshot isolation / time travel**: ``read(spark, sid)`` plans a scan
  over only the data files listed in snapshot ``sid``'s manifest, so a
  reader pinned to a snapshot never sees files appended after it.
- **incremental scan**: ``incremental(spark, from_sid, to_sid)`` plans a
  scan over only the files *added* between two snapshots — O(delta), not
  O(table).  At 10^12 files this is the difference between re-sketching
  the corpus nightly and folding yesterday's delta into the existing
  mergeable sketch blobs (``engine.py`` partials are built for exactly
  this: build partials over the delta, OR/sum-merge into the checkpointed
  pyramid).
- **atomic commits**: a snapshot becomes visible only when its manifest
  JSON is renamed into place; a crashed writer leaves data files but no
  manifest, and readers never see them.
- **min/max file skipping**: ``append(df, stats_cols=[...])`` records
  per-file-set column bounds in the manifest (Iceberg's per-data-file
  ``lower_bounds``/``upper_bounds``); ``read_pruned`` plans only the
  files whose [min, max] intersects the predicate range.  At 10^12
  files this is what makes a point/range query O(files-that-matter)
  instead of O(table) — the planning never opens a parquet footer, it
  reads manifest JSON only.
- **schema evolution**: later appends may add columns; ``read(...,
  merge_schema=True)`` plans the union schema and back-fills NULLs for
  old files, Iceberg's add-column semantics.

Manifests are tiny JSON (file list + parent pointer + row/byte counts) —
the driver-side cost of planning a scan is O(files-in-snapshot) metadata,
never data.  Real Iceberg shards this into manifest *lists* at the
10^12-file scale; the contract exposed to the engine is identical.

Reference analog: the reference rebuilds its filter from a full table
scan on every run (``/root/reference/prototype/ipfilter.py:124-143``);
snapshot deltas + mergeable partials replace that with incremental
maintenance — the capability its report's future-work section asks for.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_PREFIX = "manifest-"


class SnapshotTable:
    """An append-only snapshot table rooted at ``table_dir``.

    Layout::

        table_dir/
          data/<sid>-<uuid>.parquet/   one parquet dir per append
          manifest-<sid>.json          {"sid", "parent", "files", "rows"}

    Snapshot ids are dense integers assigned by ``append`` (1-based);
    ``parent`` is the previous snapshot (0 = empty table), so the chain
    gives incremental scans for any (from, to] window.
    """

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)

    # ------------------------------------------------------------ metadata
    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self.table_dir, f"{_MANIFEST_PREFIX}{sid}.json")

    def snapshots(self) -> list[int]:
        """Committed snapshot ids, ascending. Uncommitted data files
        (crashed writers) are invisible by construction."""
        out = []
        for name in os.listdir(self.table_dir):
            if name.startswith(_MANIFEST_PREFIX) and name.endswith(".json"):
                out.append(int(name[len(_MANIFEST_PREFIX) : -len(".json")]))
        return sorted(out)

    def _read_manifest(self, sid: int) -> dict:
        with open(self._manifest_path(sid)) as fh:
            return json.load(fh)

    def current_snapshot(self) -> int:
        sids = self.snapshots()
        return sids[-1] if sids else 0

    # -------------------------------------------------------------- write
    def append(self, df: DataFrame, stats_cols: list[str] | None = None) -> int:
        """Write ``df`` as a new data file set and commit a new snapshot
        containing parent's files + the new ones.  The commit is the
        atomic rename of the manifest into place (POSIX rename within a
        directory is atomic; Iceberg uses the same trick via its catalog
        pointer swap).

        ``stats_cols`` columns get [min, max] bounds recorded in the
        manifest for this file set (computed in the same count pass over
        the written files), enabling ``read_pruned`` file skipping."""
        from pyspark.sql import functions as F

        parent = self.current_snapshot()
        sid = parent + 1
        rel = f"data/{sid}-{uuid.uuid4().hex[:8]}.parquet"
        path = os.path.join(self.table_dir, rel)
        df.write.mode("errorifexists").parquet(path)
        written = df.sparkSession.read.parquet(path)
        aggs = [F.count("*").alias("__n")]
        for c in stats_cols or []:
            aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        row = written.agg(*aggs).first()
        rows = row["__n"]
        stats = {c: [row[f"__lo_{c}"], row[f"__hi_{c}"]] for c in stats_cols or []}
        parent_manifest = self._read_manifest(parent) if parent else {}
        prev_files = parent_manifest.get("files", [])
        prev_stats = parent_manifest.get("file_stats", {})
        manifest = {
            "sid": sid,
            "parent": parent,
            "files": prev_files + [rel],
            "added_files": [rel],
            "file_stats": {**prev_stats, **({rel: stats} if stats else {})},
            "rows": rows,
        }
        tmp = self._manifest_path(sid) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, self._manifest_path(sid))
        return sid

    # --------------------------------------------------------------- read
    def _scan(
        self, spark: SparkSession, rel_files: list[str], merge_schema: bool = False
    ) -> DataFrame:
        paths = [os.path.join(self.table_dir, rel) for rel in rel_files]
        if not paths:
            raise ValueError("empty file list — nothing to scan")
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    def read(
        self, spark: SparkSession, sid: int | None = None, merge_schema: bool = False
    ) -> DataFrame:
        """Scan snapshot ``sid`` (default: current).  Time travel is just
        planning over an older manifest's file list.  ``merge_schema``
        plans the union schema across file sets (add-column evolution:
        files written before a column existed read as NULL)."""
        sid = self.current_snapshot() if sid is None else sid
        return self._scan(spark, self._read_manifest(sid)["files"], merge_schema)

    def plan_pruned(self, col: str, lo, hi, sid: int | None = None) -> tuple[list[str], int]:
        """Manifest-only planning for ``col BETWEEN lo AND hi``: returns
        (files whose recorded [min, max] intersects [lo, hi], total file
        count in the snapshot).  Files with no recorded bounds for
        ``col`` are conservatively kept (exactly Iceberg's rule for
        missing column stats).  Zero data/footer I/O — this is the
        10^12-file planning path."""
        sid = self.current_snapshot() if sid is None else sid
        m = self._read_manifest(sid)
        stats = m.get("file_stats", {})
        kept = []
        for rel in m["files"]:
            b = stats.get(rel, {}).get(col)
            if b is None or (b[0] is None or b[1] is None) or not (b[1] < lo or b[0] > hi):
                kept.append(rel)
        return kept, len(m["files"])

    def read_pruned(
        self, spark: SparkSession, col: str, lo, hi, sid: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Scan only the files ``plan_pruned`` keeps, with the row-level
        predicate applied on top (file skipping is a superset guarantee,
        never a filter).  Returns (df, files_planned, files_total)."""
        from pyspark.sql import functions as F

        kept, total = self.plan_pruned(col, lo, hi, sid)
        df = self._scan(spark, kept).where(F.col(col).between(lo, hi))
        return df, len(kept), total

    def incremental(self, spark: SparkSession, from_sid: int, to_sid: int) -> DataFrame:
        """Scan only files appended in snapshots (from_sid, to_sid] —
        the O(delta) maintenance read.  ``from_sid=0`` means 'since the
        empty table' (equivalent to ``read(to_sid)``)."""
        if not 0 <= from_sid < to_sid:
            raise ValueError(f"need 0 <= from_sid < to_sid, got ({from_sid}, {to_sid}]")
        added: list[str] = []
        sid = to_sid
        while sid > from_sid:
            m = self._read_manifest(sid)
            added = m["added_files"] + added
            sid = m["parent"]
        return self._scan(spark, added)
