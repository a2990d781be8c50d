# -*- coding: utf-8 -*-
"""Structured-Streaming incremental KG ingestion.

The reference's "自动化...更新" (automated update) semantics are batch
re-runs with per-row Neo4j MERGE (/root/reference/backend/kgapi/
kg_writer.py:24,56 — MERGE = idempotent re-apply). The scale-correct
equivalent is a micro-batch stream: new page files land in a directory
(the Iceberg-commit stand-in), each micro-batch runs the SAME
extraction + materialization operators as the batch pipeline, and
``foreachBatch`` MERGEs into the LakeTables with the batch id recorded
in lineage — giving exactly-once table state on top of Spark's
at-least-once micro-batch replay.

Also provides the classic streaming-analytics surface over the
``events`` table shape: watermarked sliding-window aggregation
(readStream -> withWatermark -> groupBy(window) -> writeStream).

Scale notes:
- ``maxFilesPerTrigger`` bounds micro-batch size so extraction cost per
  trigger is predictable;
- the MERGE key set matches the batch path, so a page re-crawled in a
  later batch updates its nodes (when_matched="update") but preserves
  first-seen edge properties (when_matched="ignore") — identical
  semantics to the reference's ON CREATE SET;
- checkpointLocation + LakeTable batch ids make crash/replay safe from
  both ends (source offsets AND sink idempotence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of page parquet drops (Iceberg-commit stand-in)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )


def start_kg_ingest(
    pages_stream: DataFrame,
    warehouse,
    checkpoint_dir: str,
    user_id: str = "user_001",
    graph_id: str = "graph_stream",
    compact_every: int = 16,
):
    """pages stream -> extraction -> MERGE INTO nodes/edges per batch.

    Returns the StreamingQuery. Each micro-batch reuses the batch
    operators; LakeTable batch ids (``stream/{graph_id}/{batch_id}``)
    de-duplicate replayed batches after a crash.

    Commits are MERGE-ON-READ (Iceberg-v2 style): every micro-batch is
    a pure O(batch) file APPEND — the accumulated tables are never read
    or rewritten per trigger (url keys hash across every partition
    bucket, so copy-on-write merges degenerate to O(table) as soon as a
    batch exceeds ~bucket-count urls). Readers resolve each key to its
    winning write: extracted/triples last-writer-wins (a re-crawl
    replaces its rows; a re-crawl with ZERO triples tombstones them),
    NODE rows last-writer-wins per (graph_id, id) — an entity absent
    from a re-crawl persists, exactly the reference's MERGE semantics
    (kg_writer.py:24 — MERGE updates, never deletes) — and edges
    first-writer-wins (reference ON CREATE SET). Every
    ``compact_every`` batches the MOR history folds into a fresh base
    snapshot (and superseded snapshots are vacuumed) so read
    amplification and disk stay bounded.

    Batch identity is a CONTENT fingerprint (order-insensitive xxhash64
    over the batch's (url, warc_ts, text, html) rows — a re-crawl with
    changed content is a NEW batch), not the bare epoch number:
    Spark's epoch counter restarts at 0 with a fresh
    ``checkpoint_dir``, and an epoch-keyed id would then collide with
    the warehouse's already-applied batches — every early micro-batch
    of NEW data silently skipped as a replay (data loss). With content
    ids, a replay of the same drop skips under ANY checkpoint (the
    restart-idempotence contract), while new data always applies. One
    caveat remains documented: after checkpoint loss the epoch-derived
    MERGE sequence restarts too, so a url RE-crawled across the loss
    can lose last-writer resolution to its pre-loss row — continue a
    lost stream into a compacted warehouse or a fresh graph_id if
    re-crawl ordering matters.
    """
    from ..operators.extraction import extract, triples_table
    from ..operators.graph_build import materialize_graph
    from ..pipeline import with_url_bucket

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # one trigger can deliver the same url twice (two file drops in
        # one batch): keep the newest crawl so downstream merges stay
        # key-unique and node/triple tables never hold duplicate rows.
        # Dedup BEFORE the content fingerprint: xor over a multiset
        # self-cancels duplicate rows, so {A, A, B} would collide with
        # an already-applied {B} batch and rows A would be skipped as
        # a replay — silent data loss (r5 review finding). Over the
        # url-unique frame the xor fold is duplication-free.
        w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
        batch_df = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
        )
        sig = batch_df.agg(
            F.expr("bit_xor(xxhash64(url, warc_ts, text, html))").alias("s")
        ).first()["s"]
        bid = f"stream/{graph_id}/{sig & 0xFFFFFFFFFFFFFFFF:016x}"
        # the micro-batch's own extraction IS the commit input — never
        # re-read the accumulated extracted table per trigger (that scan
        # is O(table), the opposite of incremental). persist() because
        # three tables consume it.
        extracted = with_url_bucket(extract(batch_df)).persist()
        warehouse.extracted.merge_on_read(
            extracted, on=["url"], seq=batch_id, policy="last",
            batch_id=f"{bid}/extracted", partition_by=["url_bucket"],
        )
        trip = with_url_bucket(
            triples_table(extracted).withColumn("graph_id", F.lit(graph_id))
        )
        # tombstone keys = the batch's full url set: a page whose
        # re-crawl now yields ZERO triples still clears its stale rows
        batch_keys = with_url_bucket(extracted.select("url")).withColumn(
            "graph_id", F.lit(graph_id)
        )
        warehouse.triples.merge_on_read(
            trip, on=["graph_id", "url"], seq=batch_id, policy="last",
            batch_id=f"{bid}/triples", tombstone_keys=batch_keys,
            partition_by=["graph_id", "url_bucket"],
        )
        materialize_graph(
            extracted, warehouse.nodes, warehouse.edges, warehouse.dropped,
            graph_id=graph_id, user_id=user_id, batch_id=bid,
            mor_seq=batch_id,
        )
        extracted.unpersist()
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            # dropped included: its partitioned append adds one directory
            # per micro-batch; plain compact folds multi-dir partitions
            # even without a MOR spec (unbounded small-file growth
            # otherwise)
            for t in (warehouse.extracted, warehouse.triples,
                      warehouse.nodes, warehouse.edges, warehouse.dropped):
                if t.exists():
                    t.compact(spark, batch_id=f"{bid}/compact/{t.dir}")
                    # reclaim superseded snapshots right away: a
                    # long-running stream otherwise keeps one full table
                    # copy per compact cycle and an O(batches) manifest
                    # that every commit reparses
                    t.vacuum(keep_last=2)

    return (
        pages_stream.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked (sliding) window aggregation over the events shape
    (event_id, ts, user_id, event_type, value). Late rows beyond the
    watermark are dropped; state is bounded by watermark horizon."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


def streaming_dedup(
    pages_stream: DataFrame, watermark: str = "1 hour",
    ts_col: str = "warc_ts", content_col: str = "text",
    fallback_col: str | None = "html",
) -> DataFrame:
    """Streaming exact-content dedup: drop a page whose content hash
    was already seen within the watermark horizon (re-crawls, mirror
    hosts, duplicate submissions in the drop directory).

    Built on ``dropDuplicatesWithinWatermark`` so the dedup state store
    is BOUNDED — a key is forgotten once the watermark passes it, which
    is the only viable contract for an unbounded crawl stream (an
    unwatermarked dropDuplicates grows state forever). Cross-horizon
    duplicates are the batch operators' job (the MERGE keys make
    re-applying them idempotent anyway). The state key is the 256-bit
    content hash, not the body, so per-key state is ~100 bytes.

    NULL-content rows (the held-out slice ships ``text = NULL`` to be
    recovered from html) hash their ``fallback_col`` instead —
    dropDuplicates groups NULL keys together, so hashing the text
    column alone would keep only the FIRST held-out page per horizon
    and silently discard every other one as a "duplicate"."""
    if "_content_hash" in pages_stream.columns:
        raise ValueError(
            "input already has a _content_hash column; streaming_dedup "
            "would silently overwrite and drop it")
    content = F.col(content_col).cast("binary")
    if fallback_col and fallback_col in pages_stream.columns:
        content = F.coalesce(content, F.col(fallback_col).cast("binary"))
    ch = F.sha2(content, 256)
    # content-LESS rows (both text and html NULL — failed fetches,
    # redirect records) hash to NULL, and dropDuplicates groups NULL
    # keys together: every such row in a horizon would collapse to
    # one. Key them by url instead (distinct urls survive; a same-url
    # resend still dedupes), or by a per-row uuid when no url column
    # exists (no dedup is safer than collapsing distinct pages).
    if "url" in pages_stream.columns:
        fallback_key = F.concat(F.lit("nullcontent:"), F.col("url"))
    else:
        fallback_key = F.expr("uuid()")
    hashed = pages_stream.withColumn(
        "_content_hash", F.coalesce(ch, fallback_key))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_content_hash"])
        .drop("_content_hash")
    )
