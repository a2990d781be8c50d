# -*- coding: utf-8 -*-
"""LakeTable — a thin Iceberg-style table layer over partitioned parquet.

The north-star pipeline needs ``MERGE INTO`` node/edge tables with
snapshot isolation and idempotent resume (BASELINE.json north_rule);
the sandbox's pyspark 4.1.2 ships no Iceberg/Delta jars, so this module
provides the minimal equivalent:

- immutable parquet **snapshots** under ``<root>/<name>/snap-NNNNNN/``
- a JSON **manifest** holding the current-snapshot pointer, lineage
  (one entry per commit: operation, parent, row counts, applied batch
  ids) and user counters, committed via atomic ``os.replace``
- **partition-scoped commits** (the Iceberg behavior that matters at
  100 TB): a partitioned ``merge_into``/``append`` rewrites ONLY the
  partitions the batch touches; untouched partition directories are
  carried forward in the manifest *by reference* — their files are
  never read, rewritten, or copied. ``append`` on a partitioned table
  adds new files without reading the current snapshot at all.
- ``merge_into`` with Iceberg-like WHEN MATCHED semantics
- **idempotent batch application**: every write can carry a
  ``batch_id``; re-applying an already-committed batch is a no-op, so
  any stage resumes safely after a crash (at-least-once driver, exactly
  -once table state)

Partition layout: rows are bucketed by a synthetic ``_pk`` string
column (``"|".join(partition values)``) so the data files keep every
user column; the manifest maps partition key -> list of directory
references (possibly spanning snapshots). Keys must be non-null,
non-EMPTY, and must not contain ``"|"`` (graph ids, url-hash buckets
— the engine's partition columns — satisfy this by construction; an
empty string would be written as Hive's __HIVE_DEFAULT_PARTITION__
and desynchronize the manifest index from the directory names —
``_keys_of`` validates and raises).

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
import urllib.parse
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_PK = "_pk"
_SEQ = "_seq"   # merge-on-read write sequence
_TOMB = "_tomb"  # merge-on-read tombstone marker


def _f():
    from pyspark.sql import functions as F

    return F


def F_col(name: str):
    return _f().col(name)


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
        return self._manifest()["current"]

    def current_entry(self) -> Optional[dict]:
        if not self.exists():
            return None
        m = self._manifest()
        for e in reversed(m["lineage"]):
            if e["snapshot"] == m["current"]:
                return e
        return None

    def applied_batches(self) -> set[str]:
        if not self.exists():
            return set()
        m = self._manifest()
        out = {e["batch_id"] for e in m["lineage"] if e.get("batch_id")}
        # batch ids of lineage entries folded away by vacuum() — the
        # idempotence guarantee outlives the detailed history
        out.update(m.get("applied_batch_archive") or [])
        return out

    def history(self) -> list[dict]:
        return self._manifest()["lineage"] if self.exists() else []

    # ---- read --------------------------------------------------------

    def read(self, spark: SparkSession,
             as_of: Optional[str] = None) -> DataFrame:
        """Scan the current snapshot, or — with ``as_of`` — a named
        historical one (Iceberg ``VERSION AS OF`` time travel). Pure
        metadata: the lineage entry IS the file listing, so reading an
        old version opens exactly its files; ``vacuum(keep_last=N)``
        bounds how far back reads can reach (older entries' files are
        reclaimed and their lineage folded away).

        When the entry pins a table schema (every commit since schema
        tracking), the scan applies it explicitly — files written
        before a column was added project NULL for it (Iceberg
        schema-on-read add-column evolution), and the reader never
        footer-samples to infer a schema."""
        entry = (self.current_entry() if as_of is None
                 else self._entry_for(as_of))
        if entry is None:
            raise FileNotFoundError(f"LakeTable {self.dir} has no snapshot")
        dirs = entry.get("partition_dirs")
        reader = self._reader(spark, entry)
        if dirs is None:
            df = reader.parquet(os.path.join(self.dir, entry["snapshot"]))
        else:
            paths = [os.path.join(self.dir, p) for ps in dirs.values() for p in ps]
            df = reader.parquet(*paths)
        return self._resolve_mor(df, entry)

    @staticmethod
    def _reader(spark: SparkSession, entry: Optional[dict]):
        """DataFrameReader with the entry's pinned schema applied (when
        recorded) — schema-on-read: missing columns in old files read
        as NULL, and no footer sampling happens at plan time."""
        schema_json = (entry or {}).get("schema")
        if not schema_json:
            return spark.read
        from pyspark.sql.types import StructType

        return spark.read.schema(StructType.fromJson(json.loads(schema_json)))

    def _merge_schema(self, old_json: Optional[str], df: DataFrame) -> str:
        """Union of the recorded table schema and the batch's schema:
        existing columns keep their position, new columns append at the
        end (add-column evolution). A batch whose column TYPE
        contradicts the table's raises at write time — committing it
        would land files the pinned schema can't read (a committed-but-
        unreadable table is strictly worse than a failed write)."""
        from pyspark.sql.types import StructType

        if not old_json:
            return df.schema.json()
        old = StructType.fromJson(json.loads(old_json))
        by_name = {f.name: f for f in old.fields}
        for f in df.schema.fields:
            prev = by_name.get(f.name)
            if prev is not None and prev.dataType != f.dataType:
                raise ValueError(
                    f"{self.dir}: column {f.name!r} arrives as "
                    f"{f.dataType.simpleString()} but the table schema "
                    f"pins {prev.dataType.simpleString()} — type changes "
                    "are not add-column evolution")
        fields = list(old.fields)
        fields += [f for f in df.schema.fields if f.name not in by_name]
        return StructType(fields).json()

    def _check_partition_spec(self, entry: Optional[dict],
                              partition_by: Optional[list[str]]) -> None:
        """A write's partition_by must match the table's recorded
        partition spec: a mismatched spec would mix differently-shaped
        keys in one partition_dirs index ('g|3' vs 'g'), after which
        every prefix-matched prune (partition-scoped merges, DELETE
        reach) indexes the wrong key positions and silently misses
        partitions it should rewrite. A partitioned table also cannot
        be appended/merged unpartitioned (that path would de-partition
        it on the next full rewrite). ``overwrite``/``compact`` are
        exempt: they replace the whole layout deliberately."""
        spec = (entry or {}).get("partition_spec")
        if spec is None:
            return
        if partition_by is None or list(partition_by) != list(spec):
            raise ValueError(
                f"{self.dir}: partition_by={list(partition_by) if partition_by else None} "
                f"conflicts with the table's recorded partition spec "
                f"{list(spec)} — pass the recorded spec (or overwrite() "
                "to re-layout)")

    def _check_evolution(self, entry: Optional[dict], df: DataFrame,
                         evolve: bool) -> None:
        """Reject ACCIDENTAL new columns: adding one is schema evolution
        and must be opted into (``evolve_schema=True``) — a typo'd
        column name in a producer batch must error, not silently fork a
        junk column while NULLing the real one (table formats like
        Iceberg gate evolution behind explicit DDL for the same
        reason). Writer-side MISSING columns stay allowed: they land as
        NULL (nullable add-column is safe in that direction)."""
        if evolve or entry is None:
            return
        if entry.get("schema"):
            have = {f["name"]
                    for f in json.loads(entry["schema"])["fields"]}
        else:
            have = set(self._table_columns(entry))
            if not have:
                return
        extra = [c for c in df.columns
                 if c not in have and c not in (_SEQ, _TOMB)]
        if extra:
            raise ValueError(
                f"{self.dir}: batch adds column(s) {extra} not in the "
                "table schema — pass evolve_schema=True to add them, or "
                "fix the producer")

    def _entry_for(self, snapshot: str) -> dict:
        """Latest non-skipped lineage entry for ``snapshot``; raises if
        vacuum already folded it away (its files are gone too)."""
        target = next(
            (e for e in reversed(self.history())
             if e["snapshot"] == snapshot and not e.get("skipped")), None
        )
        if target is None:
            raise ValueError(
                f"{self.dir}: no readable lineage entry for {snapshot!r} "
                f"(never committed, or reclaimed by vacuum)")
        return target

    def read_partitions(self, spark: SparkSession, keys: list[str]) -> Optional[DataFrame]:
        """Scan only the named partitions (planning-time pruning: the
        manifest IS the partition index, unlisted files are never
        opened). MOR resolution is partition-local, so reading a subset
        of partitions stays correct as long as each partition's dirs
        are all listed — which the manifest guarantees."""
        entry = self.current_entry()
        dirs = (entry or {}).get("partition_dirs") or {}
        paths = [os.path.join(self.dir, p) for k in keys for p in dirs.get(k, [])]
        if not paths:
            return None
        return self._resolve_mor(self._reader(spark, entry).parquet(*paths),
                                 entry)

    def read_changes(self, spark: SparkSession, from_snapshot: str,
                     to_snapshot: Optional[str] = None) -> DataFrame:
        """Incremental scan (Iceberg incremental-append / CDC read):
        the rows ADDED by append commits AFTER ``from_snapshot``, up to
        ``to_snapshot`` (default: current), plus a ``_change_type``
        column — ``insert`` for plain appends, ``upsert``/``delete``
        for merge-on-read batches (tombstones surface as deletes).

        Planning is a pure metadata diff: an append entry's added
        files are its manifest listing minus its predecessor's, so the
        changelog costs zero data reads and the scan opens ONLY the
        files the window added — O(changes), never O(table). Raises
        when the window crosses an overwrite / compact / rollback /
        delete commit (those rewrite files: an incremental consumer
        must re-baseline from that snapshot — Iceberg's
        incremental-scan contract) or when ``from_snapshot`` was
        already folded away by vacuum."""
        if not self.exists():
            raise FileNotFoundError(f"LakeTable {self.dir} has no snapshot")
        m = self._manifest()
        lineage = [e for e in m["lineage"] if not e.get("skipped")]

        def _idx(snap: str) -> int:
            for i in range(len(lineage) - 1, -1, -1):
                if lineage[i]["snapshot"] == snap:
                    return i
            raise ValueError(
                f"{self.dir}: no readable lineage entry for {snap!r} "
                "(never committed, or reclaimed by vacuum)")

        i0 = _idx(from_snapshot)
        i1 = _idx(to_snapshot or m["current"])
        if i1 < i0:
            raise ValueError(
                f"{self.dir}: to_snapshot {to_snapshot!r} precedes "
                f"from_snapshot {from_snapshot!r}")
        F = _f()
        added: list[str] = []
        for j in range(i0 + 1, i1 + 1):
            prev, e = lineage[j - 1], lineage[j]
            if e["op"] != "append":
                raise ValueError(
                    f"{self.dir}: incremental read crosses a "
                    f"{e['op']!r} commit ({e['snapshot']}) — files were "
                    "rewritten; re-baseline the consumer from it")
            dirs = e.get("partition_dirs")
            prev_dirs = prev.get("partition_dirs")
            if dirs is None or prev_dirs is None:
                raise ValueError(
                    f"{self.dir}: unpartitioned appends rewrite the "
                    "snapshot; incremental read needs a partitioned table")
            prev_set = {p for ps in prev_dirs.values() for p in ps}
            added += [p for ps in dirs.values() for p in ps
                      if p not in prev_set]
        if not added:
            return (
                self.read(spark, as_of=lineage[i1]["snapshot"]).limit(0)
                .withColumn("_change_type", F.lit("insert"))
            )
        df = self._reader(spark, lineage[i1]).parquet(
            *[os.path.join(self.dir, p) for p in added])
        if _SEQ in df.columns:
            return (
                df.withColumn(
                    "_change_type",
                    F.when(F.col(_TOMB), F.lit("delete"))
                    .otherwise(F.lit("upsert")),
                )
                .drop(_SEQ, _TOMB)
            )
        return df.withColumn("_change_type", F.lit("insert"))

    @staticmethod
    def _resolve_mor(df: DataFrame, entry: dict) -> DataFrame:
        """Merge-on-read resolution: keep each key's rows from its
        winning write sequence ('last' = newest _seq wins, the UPDATE
        policy; 'first' = oldest wins, the ON-CREATE policy), then drop
        tombstones. No-op for copy-on-write snapshots."""
        mor = entry.get("mor")
        if not mor:
            return df
        from pyspark.sql import Window

        F = _f()
        w = Window.partitionBy(*mor["key"])
        # a tombstone at seq T kills every STRICTLY OLDER row under
        # either policy, and never competes itself; live rows AT the
        # tombstone's own seq survive (the streaming convention: a
        # batch tombstones its full key set at its own seq so a
        # re-crawl with zero rows clears stale state while the same
        # batch's live rows win). Rows written after a tombstone
        # compete fresh under the policy. The old single-window form
        # picked the policy winner FIRST, so under policy='first' an
        # early live row beat any later tombstone — the delete
        # silently no-oped while read_changes still emitted its CDC
        # 'delete'.
        last_tomb = F.max(
            F.when(F.col(_TOMB), F.col(_SEQ))).over(w)
        alive = (df.withColumn("_lt", last_tomb)
                 .filter((~F.col(_TOMB))
                         & (F.col("_lt").isNull()
                            | (F.col(_SEQ) >= F.col("_lt")))))
        win = (F.max if mor["policy"] == "last" else F.min)(_SEQ).over(w)
        return (
            alive.withColumn("_win", win)
            .filter(F.col(_SEQ) == F.col("_win"))
            .drop(_SEQ, _TOMB, "_win", "_lt")
        )

    # ---- write primitives ---------------------------------------------

    def _next_snap_id(self) -> int:
        return (self._manifest()["snap_id"] + 1) if self.exists() else 1

    @staticmethod
    def _pk_col(partition_by: list[str]):
        F = _f()
        return F.concat_ws("|", *[F.col(c).cast("string") for c in partition_by])

    @staticmethod
    def _footer_rows(path: str) -> int:
        """Row count from parquet footers — no Spark job. (On a real
        cluster this comes from the write task commit stats.)"""
        import pyarrow.parquet as pq

        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total

    # parallel writers per partition key: pure key-partitioning would
    # serialize each partition's write through ONE task (a whole-graph
    # refresh then writes single-threaded); the salt keeps files-per-key
    # bounded while letting big partitions write in parallel
    WRITE_SALT = 4

    # replay-dedupe horizon for vacuum-folded batch ids (see vacuum())
    ARCHIVE_KEEP = 10_000

    def _persist(self, df: DataFrame, snap_name: str,
                 partition_by: Optional[list[str]],
                 n_keys: Optional[int] = None):
        """Write df under snap_name. Returns (partition_dirs, partition_rows,
        rows) — the first two None when unpartitioned.

        ``n_keys``: number of partition keys this write touches, when the
        caller knows it. The write salt scales so key-count × salt covers
        the cluster: a whole-graph refresh (ONE key) would otherwise
        funnel the write through WRITE_SALT tasks while the rest of the
        cluster idles; with many keys the salt stays at the minimum so
        files-per-key remain bounded."""
        path = os.path.join(self.dir, snap_name)
        F = _f()
        if not partition_by:
            df.write.mode("overwrite").parquet(path)
            return None, None, self._footer_rows(path)
        spark = df.sparkSession
        par = spark.sparkContext.defaultParallelism
        salt_n = self.WRITE_SALT
        if n_keys:
            salt_n = min(max(par, self.WRITE_SALT),
                         max(self.WRITE_SALT, -(-par // n_keys)))
        # co-locate each partition key in few tasks before the
        # partitionBy write: otherwise every task fans out one file per
        # key it sees (k tasks x p keys files) — a small-file storm.
        # The partition COUNT is explicit (REPARTITION_BY_NUM): a
        # column-only repartition is re-coalesced by AQE toward its
        # advisory size, which funnels a small-table write through 1-2
        # tasks while the cluster idles. Each (key, salt) combo still
        # lands wholly in one task, so files-per-key stays <= salt_n.
        n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions")),
                      (n_keys or 1) * salt_n)
        salt = (F.rand(0) * salt_n).cast("int")
        df.withColumn(_PK, self._pk_col(partition_by)).repartition(
            n_parts, F_col(_PK), salt
        ).write.mode("overwrite").partitionBy(_PK).parquet(path)
        # per-partition lineage counters (north-star requirement) from
        # the written footers — zero Spark jobs
        dirs, counts = {}, {}
        n_seg = len(partition_by)
        for d in os.listdir(path):
            if d.startswith(_PK + "="):
                key = urllib.parse.unquote(d[len(_PK) + 1:])
                # zero-job write-side validation (catches the paths
                # that never ran _keys_of): a NULL/empty partition
                # value writes as __HIVE_DEFAULT_PARTITION__ (or an
                # empty/short-segment key) and would permanently
                # desynchronize the manifest index from _keys_of's
                # '' form — refuse the commit while the snapshot dir
                # is still orphaned (never referenced by a manifest)
                if (key == "__HIVE_DEFAULT_PARTITION__"
                        or key.count("|") != n_seg - 1
                        or "" in key.split("|")):
                    raise ValueError(
                        f"{self.dir}: invalid partition key {key!r} "
                        f"for spec {partition_by}: partition columns "
                        "must be non-null, non-empty strings "
                        "without '|'")
                dirs[key] = [f"{snap_name}/{d}"]
                counts[key] = self._footer_rows(os.path.join(path, d))
        return dirs, counts, sum(counts.values())

    def _commit_entry(self, op: str, batch_id: Optional[str],
                      counters: Optional[dict], snap_name: str, rows: int,
                      partition_dirs=None, partition_rows=None,
                      carried: int = 0,
                      partition_by: Optional[list[str]] = None,
                      mor: Optional[dict] = None,
                      schema: Optional[str] = None) -> dict:
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
        if partition_dirs is not None:
            entry["partition_dirs"] = partition_dirs
            entry["partition_rows"] = partition_rows
            entry["carried_partitions"] = carried
            if partition_by is not None:
                entry["partition_spec"] = list(partition_by)
        if mor is not None:
            # the resolution spec MUST land in the same atomic commit as
            # the lineage entry: a second stamping commit would leave a
            # crash window where the batch_id is applied but readers
            # resolve nothing (raw _seq/_tomb rows surface)
            entry["mor"] = mor
        if schema is not None:
            entry["schema"] = schema
        # monotonic even when a commit re-points at an older snapshot
        # (metadata-only delete after a rollback): the next write must
        # not collide with directories still on disk
        manifest["snap_id"] = max(manifest["snap_id"],
                                  int(snap_name.split("-")[1]))
        manifest["current"] = snap_name
        manifest["lineage"].append(entry)
        self._commit(manifest)
        return entry

    def _write_snapshot(
        self, df: DataFrame, op: str, batch_id: Optional[str],
        counters: Optional[dict] = None, partition_by: Optional[list[str]] = None,
        mor: Optional[dict] = None, n_keys: Optional[int] = None,
    ) -> dict:
        snap_name = f"snap-{self._next_snap_id():06d}"
        dirs, counts, rows = self._persist(df, snap_name, partition_by, n_keys)
        return self._commit_entry(op, batch_id, counters, snap_name, rows,
                                  dirs, counts, partition_by=partition_by,
                                  mor=mor, schema=df.schema.json())

    # ---- partition-key helpers ----------------------------------------

    @staticmethod
    def _keys_of(df: DataFrame, partition_by: list[str]) -> set[str]:
        """Distinct partition keys present in df (small collect: one
        string per touched partition). Uses THE _pk_col encoding — the
        manifest index and the written directory keys must stay
        byte-identical or partition-scoped merges silently miss."""
        pk = LakeTable._pk_col(partition_by)
        keys = {r["k"] for r in
                df.select(pk.alias("k")).distinct().collect()}
        bad = [k for k in keys
               if k.count("|") != len(partition_by) - 1
               or "" in k.split("|")]
        if bad:
            # a NULL segment (concat_ws drops it -> wrong segment
            # count) or an empty-string value (written as Hive's
            # __HIVE_DEFAULT_PARTITION__, never matching the
            # manifest's '' key) would silently desynchronize the
            # key index from the written directories
            raise ValueError(
                f"invalid partition key values {sorted(bad)[:5]} for "
                f"spec {partition_by}: partition columns must be "
                "non-null, non-empty strings without '|'")
        return keys

    @staticmethod
    def _match_subset(old_keys, partition_by, key_df: DataFrame) -> set[str]:
        """Partitions whose values on key_df's columns match any key_df
        row — the DELETE-side reach when the merge key is a strict
        subset of the partition spec (e.g. refresh-whole-graph on a
        (graph_id, url_bucket)-partitioned table). A key sharing NO
        column with the partition spec matches every partition: such a
        merge cannot be scoped (the key could live anywhere)."""
        common = [(i, c) for i, c in enumerate(partition_by)
                  if c in key_df.columns]
        wanted = {
            tuple(str(r[c]) for _, c in common)
            for r in key_df.select(*[c for _, c in common]).distinct().collect()
        }
        out = set()
        for k in old_keys:
            parts = k.split("|")
            if tuple(parts[i] for i, _ in common) in wanted:
                out.add(k)
        return out

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
        counters: Optional[dict] = None, partition_by: Optional[list[str]] = None,
        mor: Optional[dict] = None, evolve_schema: bool = False,
    ) -> dict:
        """Fast append. On a partitioned table this is a pure file add:
        the new rows are written as fresh directories and the manifest
        carries every existing directory forward by reference — the
        current snapshot is NEVER read (Iceberg append semantics).
        Unpartitioned tables keep the legacy read+union rewrite.

        ``mor``: resolution spec to stamp on the new lineage entry IN
        THE SAME atomic commit (merge_on_read passes it; a MOR table's
        existing spec is carried automatically otherwise)."""
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        entry = self.current_entry()
        self._check_evolution(entry, df, evolve_schema)
        self._check_partition_spec(entry, partition_by)
        old_dirs = (entry or {}).get("partition_dirs")
        if entry is not None and entry.get("mor") and _SEQ not in df.columns:
            raise ValueError(
                f"{self.dir}: plain append to a merge-on-read table "
                "(rows lack the _seq column) — use merge_on_read()"
            )
        # a MOR table's resolution spec survives appends: carry it into
        # the new entry atomically (never a follow-up commit — a crash
        # between two commits would strand an applied batch without mor)
        if mor is None and entry is not None and entry.get("mor"):
            mor = entry["mor"]
        if partition_by and (entry is None or old_dirs is not None):
            snap_name = f"snap-{self._next_snap_id():06d}"
            # n_keys scales the write salt: a single-key batch (one
            # graph's streaming micro-batch) would otherwise funnel
            # through WRITE_SALT tasks while the cluster idles — the
            # same degeneration the COW paths already pass
            # n_keys=len(touched) to avoid; the distinct-keys probe is
            # one tiny job against a batch-sized frame
            new_dirs, new_counts, new_rows = self._persist(
                df, snap_name, partition_by,
                n_keys=len(self._keys_of(df, partition_by)) or None)
            dirs = {k: list(v) for k, v in (old_dirs or {}).items()}
            counts = dict((entry or {}).get("partition_rows") or {})
            for k, paths in new_dirs.items():
                dirs.setdefault(k, []).extend(paths)
                counts[k] = counts.get(k, 0) + new_counts[k]
            out = self._commit_entry(
                "append", batch_id, counters, snap_name,
                sum(counts.values()), dirs, counts,
                carried=len(dirs) - len(new_dirs), partition_by=partition_by,
                mor=mor,
                # legacy entries (no pinned schema) stay unpinned: pinning
                # the batch's schema would drop old files' other columns
                schema=(self._merge_schema((entry or {}).get("schema"), df)
                        if entry is None or entry.get("schema") else None),
            )
        else:
            if self.exists():
                df = self.read(df.sparkSession).unionByName(
                    df, allowMissingColumns=True)
            out = self._write_snapshot(df, "append", batch_id, counters,
                                       partition_by, mor=mor)
        return out

    def merge_into(
        self,
        updates: DataFrame,
        on: list[str],
        when_matched: str = "update",
        batch_id: Optional[str] = None,
        counters: Optional[dict] = None,
        dedupe: bool = True,
        partition_by: Optional[list[str]] = None,
        delete_keys: Optional[DataFrame] = None,
        touched_keys: Optional[list[str]] = None,
        evolve_schema: bool = False,
    ) -> dict:
        """Iceberg-style MERGE:

        - ``when_matched="update"``  — MATCHED THEN UPDATE (row replaced
          by the update row), NOT MATCHED THEN INSERT. Node-table
          semantics (reference MERGE..SET, kg_writer.py:24-25). With
          multi-row keys (``dedupe=False``) this is a key-scoped
          replace: ALL current rows sharing a key present in the batch
          are replaced by the batch's rows for that key.
        - ``when_matched="ignore"``  — ON CREATE only: matched rows keep
          their existing values, unmatched are inserted. Edge-table
          semantics (reference ON CREATE SET, kg_writer.py:56-57).

        ``delete_keys`` (update mode): the key set to clear, when wider
        than the keys present in ``updates`` — e.g. a re-crawled page
        that now extracts zero triples must still delete its old rows.

        ``partition_by``: partition-scoped commit. Only partitions whose
        key appears in ``updates``/``delete_keys`` are read and
        rewritten; every other partition directory is carried forward by
        manifest reference (its files untouched on disk). The merge key
        may be a strict subset of the partition spec (the reach is then
        computed by prefix match over the manifest's partition index).

        ``touched_keys``: caller-declared SUPERSET of the partition keys
        this batch can touch (format ``"v1|v2"``). Skips the
        touched-key discovery job — which otherwise recomputes
        ``updates`` once just to enumerate its partitions. Must cover
        every partition the merge writes to or deletes from; declaring
        extra keys only costs re-writing those partitions verbatim.

        Update rows are deduplicated on the merge key first (last-writer
        -wins is meaningless inside one batch; dropDuplicates keeps an
        arbitrary-but-single row, matching repeated MERGE idempotence).
        Callers whose batches are key-unique by construction pass
        ``dedupe=False`` and skip that shuffle.
        """
        if when_matched not in ("update", "ignore"):
            # validate BEFORE the first write: _merged only runs once
            # the table exists, so a typo'd policy would commit the
            # first batch under op 'merge:<typo>' and only fail on
            # batch two
            raise ValueError(f"unknown when_matched: {when_matched}")
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        if dedupe:
            updates = updates.dropDuplicates(on)
        if not self.exists():
            return self._write_snapshot(
                updates, f"merge:{when_matched}", batch_id, counters,
                partition_by,
                n_keys=len(touched_keys) if touched_keys else None,
            )
        entry = self.current_entry()
        self._check_evolution(entry, updates, evolve_schema)
        self._check_partition_spec(entry, partition_by)
        if entry.get("mor"):
            raise ValueError(
                f"{self.dir}: copy-on-write merge on a merge-on-read "
                "table — compact() it first or use merge_on_read()"
            )
        old_dirs = entry.get("partition_dirs")
        if partition_by and old_dirs is not None:
            return self._merge_partitioned(
                updates, on, when_matched, batch_id, counters,
                partition_by, delete_keys, entry, touched_keys,
            )
        current = self.read(updates.sparkSession)
        result = self._merged(current, updates, on, when_matched, delete_keys)
        return self._write_snapshot(result, f"merge:{when_matched}", batch_id,
                                    counters, partition_by)

    @staticmethod
    def _merged(current: Optional[DataFrame], updates: DataFrame, on: list[str],
                when_matched: str, delete_keys: Optional[DataFrame]) -> DataFrame:
        if current is None:
            return updates
        if when_matched == "update":
            keys = (delete_keys if delete_keys is not None else updates).select(*on)
            kept = current.join(keys, on=on, how="left_anti")
            return kept.unionByName(updates, allowMissingColumns=True)
        if when_matched == "ignore":
            fresh = updates.join(current.select(*on), on=on, how="left_anti")
            return current.unionByName(fresh, allowMissingColumns=True)
        raise ValueError(f"unknown when_matched: {when_matched}")

    def _merge_partitioned(
        self, updates, on, when_matched, batch_id, counters,
        partition_by, delete_keys, entry, touched_keys=None,
    ) -> dict:
        old_dirs: dict = entry["partition_dirs"]
        old_rows: dict = entry.get("partition_rows") or {}
        spark = updates.sparkSession

        # the partitions this commit must rewrite
        if touched_keys is not None:
            touched = set(touched_keys)
        else:
            touched = self._keys_of(updates, partition_by)
            if delete_keys is not None:
                if all(c in delete_keys.columns for c in partition_by):
                    touched |= self._keys_of(delete_keys, partition_by)
                else:
                    touched |= self._match_subset(old_dirs, partition_by,
                                                  delete_keys)
            if not all(c in on for c in partition_by):
                # merge key narrower than the partition spec: the anti-
                # join can reach any partition matching a key prefix
                touched |= self._match_subset(old_dirs, partition_by,
                                              updates.select(*on))

        cur_touched = self.read_partitions(
            spark, [k for k in touched if k in old_dirs]
        )
        result = self._merged(cur_touched, updates, on, when_matched, delete_keys)

        snap_name = f"snap-{self._next_snap_id():06d}"
        new_dirs, new_counts, _ = self._persist(result, snap_name, partition_by,
                                                n_keys=len(touched))
        dirs = {k: v for k, v in old_dirs.items() if k not in touched}
        rows_by = {k: old_rows.get(k, 0) for k in dirs}
        carried = len(dirs)
        dirs.update(new_dirs)
        rows_by.update(new_counts)
        return self._commit_entry(
            f"merge:{when_matched}", batch_id, counters, snap_name,
            sum(rows_by.values()), dirs, rows_by, carried=carried,
            partition_by=partition_by,
            schema=(self._merge_schema(entry["schema"], result)
                    if entry.get("schema") else None),
        )

    def overwrite_partitions(
        self,
        df: DataFrame,
        partition_by: list[str],
        touched_keys: Optional[list[str]] = None,
        batch_id: Optional[str] = None,
        counters: Optional[dict] = None,
        evolve_schema: bool = False,
    ) -> dict:
        """Dynamic partition overwrite (Iceberg INSERT OVERWRITE ...
        PARTITION): every partition named in ``touched_keys`` (or
        present in ``df``) is REPLACED by df's rows wholesale — the old
        partition data is never read, no anti-join runs. The right
        primitive when a stage regenerates a partition's full contents
        (per-graph triples refresh, canonicalization rewrite); plain
        ``merge_into`` pays a read+anti-join for rows that are all
        doomed anyway."""
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        entry = self.current_entry()
        self._check_evolution(entry, df, evolve_schema)
        self._check_partition_spec(entry, partition_by)
        if entry is None or entry.get("partition_dirs") is None:
            return self._write_snapshot(
                df, "overwrite_partitions", batch_id, counters, partition_by,
                n_keys=len(touched_keys) if touched_keys else None,
            )
        if entry.get("mor"):
            raise ValueError(
                f"{self.dir}: overwrite_partitions on a merge-on-read table"
            )
        touched = set(touched_keys) if touched_keys is not None else \
            self._keys_of(df, partition_by)
        old_dirs: dict = entry["partition_dirs"]
        old_rows: dict = entry.get("partition_rows") or {}
        snap_name = f"snap-{self._next_snap_id():06d}"
        new_dirs, new_counts, _ = self._persist(df, snap_name, partition_by,
                                                n_keys=len(touched))
        dirs = {k: v for k, v in old_dirs.items() if k not in touched}
        rows_by = {k: old_rows.get(k, 0) for k in dirs}
        carried = len(dirs)
        dirs.update(new_dirs)
        rows_by.update(new_counts)
        return self._commit_entry(
            "overwrite_partitions", batch_id, counters, snap_name,
            sum(rows_by.values()), dirs, rows_by, carried=carried,
            partition_by=partition_by,
            schema=(self._merge_schema(entry["schema"], df)
                    if entry.get("schema") else None),
        )

    def merge_on_read(
        self,
        updates: DataFrame,
        on: list[str],
        seq: int,
        policy: str = "last",
        batch_id: Optional[str] = None,
        tombstone_keys: Optional[DataFrame] = None,
        partition_by: Optional[list[str]] = None,
        counters: Optional[dict] = None,
        evolve_schema: bool = False,
    ) -> dict:
        """Iceberg-v2-style MERGE-ON-READ: the commit APPENDS the batch
        (pure file add, current snapshot never read — O(batch) I/O no
        matter how the keys hash across partitions, where copy-on-write
        bucketing degenerates to O(table) once a batch touches every
        bucket); readers resolve each key to its winning sequence.

        - ``policy="last"``  — newest ``seq`` wins per key (UPDATE
          semantics; node/extraction tables).
        - ``policy="first"`` — oldest ``seq`` wins (ON CREATE semantics;
          edge tables: later writes never overwrite properties).
        - ``tombstone_keys`` — keys whose new version has ZERO rows
          (a re-crawl that lost all its triples): one marker row per
          key is appended; resolution drops the key entirely.

        Read amplification grows with appended batches — call
        :func:`compact` periodically (streaming: every N batches).
        """
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        if not partition_by:
            # the unpartitioned append path rewrites via a RESOLVED read
            # (no _seq/_tomb) — MOR requires the partitioned file-add
            # layout to stay O(batch)
            raise ValueError(
                f"{self.dir}: merge_on_read requires partition_by"
            )
        F = _f()
        upd = updates.withColumn(_SEQ, F.lit(int(seq))).withColumn(
            _TOMB, F.lit(False)
        )
        if tombstone_keys is not None:
            # tombstones carry the key columns AND the partition columns
            # (a tombstone must land in the same partition as the rows
            # it kills, or partition-scoped reads would miss it); all
            # other columns null
            missing = [c for c in (partition_by or [])
                       if c not in tombstone_keys.columns]
            if missing:
                # a missing partition column would become NULL,
                # concat_ws would drop the segment, and the tombstone
                # would land in the WRONG partition — partition-scoped
                # reads would then resolve the dead rows as live while
                # full reads kill them
                raise ValueError(
                    f"{self.dir}: tombstone_keys must carry every "
                    f"partition column (missing {missing}) so each "
                    "tombstone lands in the partition it kills")
            keep = list(on) + [
                c for c in (partition_by or [])
                if c in tombstone_keys.columns and c not in on
            ]
            tombs = tombstone_keys.select(*keep).distinct()
            for c in updates.columns:
                if c not in keep:
                    tombs = tombs.withColumn(
                        c, F.lit(None).cast(updates.schema[c].dataType)
                    )
            tombs = tombs.select(*updates.columns).withColumn(
                _SEQ, F.lit(int(seq))
            ).withColumn(_TOMB, F.lit(True))
            upd = upd.unionByName(tombs)
        entry = self.current_entry()
        if entry is not None and not entry.get("mor"):
            raise ValueError(
                f"{self.dir}: merge_on_read on a copy-on-write table; "
                "compact()/overwrite() it first or use merge_into"
            )
        if entry is not None and entry.get("mor") != {"key": on, "policy": policy}:
            raise ValueError(
                f"{self.dir}: merge_on_read spec {on}/{policy} conflicts "
                f"with the table's {entry['mor']} — resolution is a table "
                "property, not a per-batch choice"
            )
        # the mor spec rides the append's ONE atomic commit — a crash can
        # leave either no trace of the batch (clean replay) or a complete
        # entry (replay skipped), never an applied-but-unresolvable state
        out = self.append(upd, batch_id=batch_id, counters=counters,
                          partition_by=partition_by,
                          mor={"key": on, "policy": policy},
                          evolve_schema=evolve_schema)
        if not out.get("skipped"):
            out["mor"] = {"key": on, "policy": policy}
        return out

    def compact(self, spark: SparkSession, batch_id: Optional[str] = None) -> dict:
        """Materialize the MOR resolution (and/or fold multi-dir
        partitions) into a fresh single-dir-per-partition snapshot.
        Keeps the mor spec with the accumulated history reset to one
        base sequence, so subsequent merge_on_read batches apply on a
        compacted base — Iceberg's rewrite_data_files."""
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        entry = self.current_entry()
        if entry is None:
            raise FileNotFoundError(f"LakeTable {self.dir} has no snapshot")
        F = _f()
        mor = entry.get("mor")
        resolved = self.read(spark)
        if mor:
            resolved = resolved.withColumn(_SEQ, F.lit(0)).withColumn(
                _TOMB, F.lit(False)
            )
        partition_by = None
        if entry.get("partition_dirs") is not None:
            partition_by = entry.get("partition_spec")  # recorded at write
        out = self._write_snapshot(resolved, "compact", batch_id,
                                   partition_by=partition_by,
                                   mor=mor if mor else None)
        if mor:
            out["mor"] = mor
        return out

    def rollback(self, snapshot: str) -> dict:
        """Iceberg ``rollback_to_snapshot``: re-commit an older lineage
        entry as current. Pure metadata — no data files move; vacuum's
        reference counting keeps the restored snapshot's files alive."""
        m = self._manifest()
        target = next(
            (e for e in reversed(m["lineage"])
             if e["snapshot"] == snapshot and not e.get("skipped")), None
        )
        if target is None:
            raise ValueError(f"{self.dir}: no lineage entry for {snapshot}")
        entry = {
            k: target[k]
            for k in ("snapshot", "rows", "partition_dirs", "partition_rows",
                      "partition_spec", "mor", "schema")
            if k in target
        }
        entry.update({
            "parent": m["current"],
            "op": f"rollback:{snapshot}",
            "batch_id": None,
            "counters": {},
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        })
        # snap_id keeps monotonically increasing: the next write must not
        # collide with directories that still exist on disk
        m["current"] = target["snapshot"]
        m["lineage"].append(entry)
        self._commit(m)
        return entry

    def _table_columns(self, entry: dict) -> list[str]:
        """Column names of the stored files (one footer read, no job).
        Falls back to the entry's snapshot directory for unpartitioned
        tables, so schema checks never silently no-op there."""
        import pyarrow.parquet as pq

        dirs = [os.path.join(self.dir, rel)
                for paths in (entry.get("partition_dirs") or {}).values()
                for rel in paths]
        if not dirs and entry.get("snapshot"):
            dirs = [os.path.join(self.dir, entry["snapshot"])]
        for d in dirs:
            for root, _dirs, files in os.walk(d):
                for f in files:
                    if f.endswith(".parquet"):
                        return pq.ParquetFile(
                            os.path.join(root, f)
                        ).schema_arrow.names
        return []

    def _prune_delete_keys(self, spark: SparkSession, condition: str,
                           entry: dict) -> Optional[set[str]]:
        """Partition keys a DELETE predicate can reach, evaluated on the
        manifest's partition index (planning-time prune, zero data
        files opened). Non-partition columns evaluate as NULL, and a
        partition is pruned only when the predicate is definitively
        FALSE for it (three-valued logic: UNKNOWN = could match) — so
        mixed predicates like ``graph_id='g' AND url='u'`` still prune
        to one graph. Keys are evaluated in their canonical string form
        — exact for the engine's partition columns (graph ids, integer
        buckets). Returns None when evaluation fails (unscopeable)."""
        spec = entry.get("partition_spec")
        dirs = entry.get("partition_dirs")
        if not spec or dirs is None:
            return None
        # SOUNDNESS GUARD: the NULL-substitution trick below concludes
        # "cannot match" from a definitive FALSE — valid only when a
        # NULL data column can never produce one. Null-TOLERANT
        # operators (IS [NOT] NULL, <=>, isnull()/isnotnull(),
        # coalesce/ifnull/nvl) return real booleans on the NULL
        # substitute ("v IS NOT NULL" -> FALSE) and would prune
        # partitions whose actual rows match; bail to the full
        # rewrite when any such token appears.
        import re as _re
        if _re.search(
                r"\bis\s+(not\s+)?null\b|<=>|\bisnull\s*\(|"
                r"\bisnotnull\s*\(|\bcoalesce\s*\(|"
                r"\bifnull\s*\(|\bnvl\s*\(",
                condition, _re.IGNORECASE):
            return None
        try:
            F = _f()
            keys_df = spark.createDataFrame(
                [tuple(k.split("|")) for k in dirs],
                ", ".join(f"`{c}` string" for c in spec),
            )
            for c in self._table_columns(entry):
                if c not in spec and c != _PK:
                    keys_df = keys_df.withColumn(c, F.lit(None))
            matched = (
                keys_df.withColumn("_m", F.expr(condition))
                .filter(F.col("_m").isNull() | F.col("_m"))
                .collect()
            )
        except Exception:
            return None  # unresolvable/unevaluable -> full rewrite
        return {"|".join(r[c] for c in spec) for r in matched}

    def delete_where(
        self, spark: SparkSession, condition: str,
        batch_id: Optional[str] = None,
    ) -> dict:
        """DELETE FROM t WHERE condition — rewrite keeping the negation.
        (Iceberg DELETE equivalent; reference DETACH DELETE is composed
        from this plus an anti-join at the call site, operators/queries.)

        Partition-pruned: when the predicate resolves against the
        partition columns alone, only partitions that can contain
        matching rows are read and rewritten — the rest are carried by
        manifest reference, byte-untouched (Iceberg metadata-delete
        behavior). Predicates touching data columns, MOR tables, and
        unpartitioned tables take the full-rewrite path."""
        if batch_id and batch_id in self.applied_batches():
            return {"skipped": True, "batch_id": batch_id}
        F = _f()
        entry = self.current_entry()
        touched = None
        if entry is not None and not entry.get("mor"):
            touched = self._prune_delete_keys(spark, condition, entry)
        if touched is not None:
            spec = entry["partition_spec"]
            old_dirs: dict = entry["partition_dirs"]
            touched &= set(old_dirs)  # only partitions that exist
            if not touched:
                # nothing can match: pure-metadata commit carrying every
                # partition forward (records the batch_id for resume)
                return self._commit_entry(
                    f"delete:{condition}", batch_id, None,
                    entry["snapshot"], entry["rows"],
                    dict(old_dirs), dict(entry.get("partition_rows") or {}),
                    carried=len(old_dirs), partition_by=spec,
                    schema=entry.get("schema"),
                )
            cur = self.read_partitions(spark, sorted(touched))
            # SQL DELETE removes rows where the predicate is TRUE; rows
            # evaluating NULL are kept (coalesce, not bare negation)
            kept = cur.filter(~F.coalesce(F.expr(condition), F.lit(False)))
            return self.overwrite_partitions(
                kept, partition_by=spec, touched_keys=sorted(touched),
                batch_id=batch_id,
            )
        if entry is not None and entry.get("mor"):
            # rewriting RESOLVED rows would silently drop the mor spec
            # and the _seq/_tomb bookkeeping — the next merge_on_read
            # would then refuse the table as copy-on-write
            raise ValueError(
                f"{self.dir}: delete_where on a merge-on-read table — "
                "append tombstones via merge_on_read(), or compact() "
                "first")
        current = self.read(spark)
        kept = current.filter(~F.coalesce(F.expr(condition), F.lit(False)))
        # the full-rewrite fallback must keep the table's partition
        # layout: dropping it would silently de-partition the table
        # (read_partitions -> None, partition-scoped merges gone)
        spec = (entry or {}).get("partition_spec")
        return self._write_snapshot(kept, f"delete:{condition}", batch_id,
                                    partition_by=spec)

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop snapshot directories not reachable from the newest
        ``keep_last`` lineage entries. A directory is reachable if it
        is one of those snapshots OR any of their ``partition_dirs``
        references points into it (carried-forward partitions keep
        their donor snapshot alive — reference counting, like Iceberg's
        expire_snapshots honoring live manifests).

        Also FOLDS the expired lineage entries: their batch ids move to
        a compact ``applied_batch_archive`` set (idempotent-resume
        checks still see them) and the detailed entries are dropped, so
        a month-long micro-batch stream keeps an O(keep_last) manifest
        instead of one entry per table per batch. Rollback targets are
        therefore limited to the retained history — the same contract
        as Iceberg's expire_snapshots."""
        if not self.exists():
            return []
        m = self._manifest()
        entries = [e for e in m["lineage"] if not e.get("skipped")]
        keep = entries[-keep_last:]
        live = {m["current"]}
        for e in keep:
            live.add(e["snapshot"])
            for paths in (e.get("partition_dirs") or {}).values():
                for p in paths:
                    live.add(p.split("/", 1)[0])
        # removal walks the FILESYSTEM, not the lineage: a donor dir can
        # outlive its (folded) lineage entry while carried partitions
        # reference it — once the last reference goes, no entry names it
        # anymore, so a lineage-driven loop would leak it forever
        removed = []
        for s in sorted(os.listdir(self.dir)):
            if not s.startswith("snap-") or s in live:
                continue
            p = os.path.join(self.dir, s)
            if os.path.isdir(p):
                shutil.rmtree(p)
                removed.append(s)
        # fold expired entries (everything before the keep window) into
        # the archive; directories may outlive their entry (carried-
        # partition donors) — reachability above is directory-based, so
        # folding the entry never drops live files
        expired = entries[:-keep_last] if keep_last > 0 else entries
        if expired:
            archive = list(m.get("applied_batch_archive") or [])
            seen = set(archive)
            for e in expired:
                b = e.get("batch_id")
                if b and b not in seen:
                    archive.append(b)
                    seen.add(b)
            # the archive is insertion-ordered and CAPPED — otherwise it
            # just relocates the unbounded growth it exists to prevent.
            # Contract: replay dedupe covers the most recent
            # ARCHIVE_KEEP folded batches; that horizon is orders of
            # magnitude beyond any real replay depth (Structured
            # Streaming re-delivers only the last uncommitted batch
            # from its checkpoint; batch drivers resume the current run)
            m["applied_batch_archive"] = archive[-self.ARCHIVE_KEEP:]
            kept_set = {id(e) for e in keep}
            m["lineage"] = [e for e in m["lineage"]
                            if e.get("skipped") or id(e) in kept_set]
            self._commit(m)
        return removed
