# -*- coding: utf-8 -*-
"""LakeTable — a thin Iceberg-style table layer over partitioned parquet.

The north-star pipeline needs ``MERGE INTO`` node/edge tables with
snapshot isolation and idempotent resume (BASELINE.json north_rule);
the sandbox's pyspark 4.1.2 ships no Iceberg/Delta jars, so this module
provides the minimal equivalent (~200 LoC):

- immutable parquet **snapshots** under ``<root>/<name>/snap-NNNNNN/``
- a JSON **manifest** holding the current-snapshot pointer, lineage
  (one entry per commit: operation, parent, row counts, applied batch
  ids) and user counters, committed via atomic ``os.replace``
- ``merge_into`` with Iceberg-like WHEN MATCHED semantics, implemented
  as anti-join + union + full snapshot rewrite
- **idempotent batch application**: every write can carry a
  ``batch_id``; re-applying an already-committed batch is a no-op, so
  any stage resumes safely after a crash (at-least-once driver, exactly
  -once table state)

On a real cluster this class is swapped for
``spark.sql("MERGE INTO ...")`` against Iceberg; the call sites are
shaped so that swap is mechanical. The reference's per-row Neo4j MERGE
round-trips (/root/reference/backend/kgapi/kg_writer.py:20-32,36-68)
are replaced by set-based joins — intentional divergence, SURVEY.md §7.4.

Concurrency note: single-writer (the driver loop). Readers always see
a complete snapshot because the manifest pointer flips atomically after
the snapshot directory is fully written.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def F_count():
    from pyspark.sql import functions as F

    return F.count("*")


class LakeTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.manifest_path = os.path.join(self.dir, "_manifest.json")

    # ---- manifest ----------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(self.manifest_path)

    def _manifest(self) -> dict:
        with open(self.manifest_path, "r", encoding="utf-8") as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, ensure_ascii=False, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic pointer swap

    def current_snapshot(self) -> Optional[str]:
        if not self.exists():
            return None
        m = self._manifest()
        return m["current"]

    def applied_batches(self) -> set[str]:
        if not self.exists():
            return set()
        return {
            e["batch_id"] for e in self._manifest()["lineage"] if e.get("batch_id")
        }

    def history(self) -> list[dict]:
        return self._manifest()["lineage"] if self.exists() else []

    # ---- read --------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"LakeTable {self.dir} has no snapshot")
        return spark.read.parquet(os.path.join(self.dir, snap))

    # ---- write primitives ---------------------------------------------

    def _next_snap_id(self) -> int:
        return (self._manifest()["snap_id"] + 1) if self.exists() else 1

    def _write_snapshot(
        self, df: DataFrame, op: str, batch_id: Optional[str],
        counters: Optional[dict] = None, partition_by: Optional[list[str]] = None,
    ) -> dict:
        snap_id = self._next_snap_id()
        snap_name = f"snap-{snap_id:06d}"
        path = os.path.join(self.dir, snap_name)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        written = df.sparkSession.read.parquet(path)
        rows = written.count()
        # per-partition lineage counters (north-star requirement):
        # one row-count per partition value, recorded in the manifest
        partition_rows = None
        if partition_by:
            partition_rows = {
                "|".join(str(r[c]) for c in partition_by): r["_n"]
                for r in written.groupBy(*partition_by)
                .agg(F_count().alias("_n")).collect()
            }
        manifest = self._manifest() if self.exists() else {
            "table": self.dir, "snap_id": 0, "current": None, "lineage": [],
        }
        entry = {
            "snapshot": snap_name,
            "parent": manifest["current"],
            "op": op,
            "batch_id": batch_id,
            "rows": rows,
            "counters": counters or {},
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if partition_rows is not None:
            entry["partition_rows"] = partition_rows
        manifest["snap_id"] = snap_id
        manifest["current"] = snap_name
        manifest["lineage"].append(entry)
        self._commit(manifest)
        return entry

    # ---- public ops ----------------------------------------------------

    def overwrite(
        self, df: DataFrame, batch_id: Optional[str] = None,
        counters: Optional[dict] = None, partition_by: Optional[list[str]] = None,
    ) -> dict:
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        return self._write_snapshot(df, "overwrite", batch_id, counters, partition_by)

    def append(
        self, df: DataFrame, batch_id: Optional[str] = None,
        counters: Optional[dict] = None,
    ) -> dict:
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        if self.exists():
            df = self.read(df.sparkSession).unionByName(df)
        return self._write_snapshot(df, "append", batch_id, counters)

    def merge_into(
        self,
        updates: DataFrame,
        on: list[str],
        when_matched: str = "update",
        batch_id: Optional[str] = None,
        counters: Optional[dict] = None,
        dedupe: bool = True,
    ) -> dict:
        """Iceberg-style MERGE:

        - ``when_matched="update"``  — MATCHED THEN UPDATE (row replaced
          by the update row), NOT MATCHED THEN INSERT. Node-table
          semantics (reference MERGE..SET, kg_writer.py:24-25).
        - ``when_matched="ignore"``  — ON CREATE only: matched rows keep
          their existing values, unmatched are inserted. Edge-table
          semantics (reference ON CREATE SET, kg_writer.py:56-57).

        Update rows are deduplicated on the merge key first (last-writer
        -wins is meaningless inside one batch; dropDuplicates keeps an
        arbitrary-but-single row, matching repeated MERGE idempotence).
        Callers whose batches are key-unique by construction pass
        ``dedupe=False`` and skip that shuffle.
        """
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        if dedupe:
            updates = updates.dropDuplicates(on)
        if not self.exists():
            return self._write_snapshot(updates, f"merge:{when_matched}", batch_id, counters)
        current = self.read(updates.sparkSession)
        if when_matched == "update":
            kept = current.join(updates.select(*on), on=on, how="left_anti")
            result = kept.unionByName(updates)
        elif when_matched == "ignore":
            fresh = updates.join(current.select(*on), on=on, how="left_anti")
            result = current.unionByName(fresh)
        else:
            raise ValueError(f"unknown when_matched: {when_matched}")
        return self._write_snapshot(result, f"merge:{when_matched}", batch_id, counters)

    def delete_where(
        self, spark: SparkSession, condition: str,
        batch_id: Optional[str] = None,
    ) -> dict:
        """DELETE FROM t WHERE condition — rewrite keeping the negation.
        (Iceberg DELETE equivalent; reference DETACH DELETE is composed
        from this plus an anti-join at the call site, operators/queries.)"""
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        from pyspark.sql import functions as F

        current = self.read(spark)
        kept = current.filter(~F.expr(condition))
        return self._write_snapshot(kept, f"delete:{condition}", batch_id)

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop all but the newest ``keep_last`` snapshots."""
        if not self.exists():
            return []
        m = self._manifest()
        snaps = [e["snapshot"] for e in m["lineage"] if not e.get("skipped")]
        live = set(snaps[-keep_last:]) | {m["current"]}
        removed = []
        for s in set(snaps) - live:
            p = os.path.join(self.dir, s)
            if os.path.exists(p):
                shutil.rmtree(p)
                removed.append(s)
        return removed
