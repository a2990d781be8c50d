# -*- coding: utf-8 -*-
"""WARC/WET record splitting — the step zero of every Common-Crawl
pipeline: one crawl file is a concatenation of ``WARC/1.0`` records
(ISO 28500; the WET text variant carries extracted-text payloads),
and the engine's unit of work is the RECORD, not the file.

``parse_warc_text`` splits text-mode (WET-style) WARC blobs into
records and extracts the three load-bearing headers
(``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``) plus the
payload. Declared limitation, by design: exact ISO-28500 framing is
``Content-Length`` BYTE offsets — correct for payloads that
themselves contain record markers, but it needs stateful byte
walking (a UDF). This operator implements the textual-split
convention instead (records open at ``WARC/1.0\\r\\n``; WET text
payloads do not legitimately start a line with that marker), which
keeps the whole parse row-local codegen regex — zero Python, zero
exchange — and validates each record's header block so malformed
splits surface as ``warc_type IS NULL`` rows rather than silent
corruption.

Scale shape: one ``split`` + ``posexplode`` per blob and three
regexp extracts per record, all row-local; a crawl file never
crosses an exchange whole. Partition sizing is the file reader's
(``spark.sql.files.maxPartitionBytes``) — one 1-GB WET file splits
into Arrow-page-sized slices upstream, not here.

Not in the reference (its input is pre-extracted prose); format per
ISO 28500 / the Common Crawl WET convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: record opener: the split delimiter (textual-split convention)
WARC_MARKER = "WARC/1.0\r\n"

#: the same marker as a regex (split() takes a pattern; the dot must
#: not match "WARC/1x0..."). (?m)^ anchors the marker at LINE STARTS
#: only — the documented textual-split convention; unanchored, a
#: mid-line "... WARC/1.0\r\n" inside a payload would truncate the
#: real record and fabricate a garbage one. Shared with the SQL
#: oracle.
WARC_MARKER_RE = r"(?m)^WARC/1\.0\r\n"

#: header block ends at the first blank line; payload is the rest
_HDR_RE = r"(?s)^(.*?)\r\n\r\n(.*)$"


def parse_warc_text(blobs: DataFrame, blob_col: str = "warc",
                    id_col: str = "blob_id") -> DataFrame:
    """Split text-mode WARC blobs into records.

    Returns one row per record: ``(id_col, rec_idx, warc_type,
    target_uri, warc_date, payload)`` — ``rec_idx`` 0-based in blob
    order, header fields NULL when the record lacks them (the
    malformed-record signal; filter or quarantine downstream), and
    ``payload`` the text after the header block with the trailing
    record separator trimmed.
    """
    parts = F.split(F.col(blob_col), WARC_MARKER_RE, -1)
    rec = (blobs.select(F.col(id_col),
                        F.size(parts).alias("_np"),
                        F.posexplode(parts).alias("rec_idx", "_r"))
           # everything before the first marker is non-record
           # preamble — EXCEPT when the blob contains no marker at
           # all (corrupt/mis-decoded file): that blob must surface
           # as ONE malformed record (NULL headers — the quarantine
           # signal) instead of vanishing from the output entirely
           .filter((F.col("rec_idx") >= 1)
                   | ((F.col("_np") == 1) & (F.col("_r") != "")))
           .select(id_col,
                   (F.col("rec_idx")
                    - F.when(F.col("_np") == 1, F.lit(0))
                    .otherwise(F.lit(1))).cast("long").alias("rec_idx"),
                   F.col("_r")))
    hdr = F.regexp_extract(F.col("_r"), _HDR_RE, 1)
    body = F.regexp_extract(F.col("_r"), _HDR_RE, 2)

    def _h(name):
        # header names are case-insensitive per ISO 28500
        # no trailing $: Java's multiline $ matches before \r\n but
        # RE2's only before \n, and header lines end with \r — the
        # negated class already stops the capture at the line end
        v = F.regexp_extract(hdr, rf"(?im)^{name}: *([^\r\n]*)", 1)
        return F.when(v == "", F.lit(None).cast("string")).otherwise(v)

    return rec.select(
        id_col, "rec_idx",
        _h("WARC-Type").alias("warc_type"),
        _h("WARC-Target-URI").alias("target_uri"),
        _h("WARC-Date").alias("warc_date"),
        # trim EXACTLY the one \r\n\r\n record separator (\z, not $:
        # absolute end in both Java and RE2) — a greedy (\r\n)+ would
        # also eat CRLFs that belong to the payload itself, breaking
        # the byte-for-byte round trip with build_warc_text
        F.regexp_replace(body, "\r\n\r\n\\z", "").alias("payload"),
    )


def build_warc_text(records: DataFrame, group_col: str,
                    order_col: str, type_col: str, uri_col: str,
                    date_col: str, payload_col: str) -> DataFrame:
    """Inverse sink: assemble (group, ordered records) back into one
    text-mode WARC blob per group — the round-trip partner that lets
    tests and re-exports pin ``parse_warc_text`` byte-for-byte.

    Scale shape: one group-keyed sort_array(collect_list) aggregate;
    blob size = the group's payload volume, so group by crawl shard,
    not by host, when shards are large.

    NULL handling mirrors the parser: a NULL header field emits NO
    header line (parse_warc_text reads it back as NULL), and a NULL
    payload writes as empty — a record is never silently dropped
    because one field is missing (concat over a NULL would null the
    whole record and array_join would skip it). The round trip is
    byte-exact whenever >= 1 header is non-NULL; a record with all
    three headers NULL has an empty header block, which the textual
    framing cannot delimit (it parses back as a malformed record
    with NULL headers — the quarantine signal, not silent loss)."""

    def _hline(name, col):
        return F.when(
            F.col(col).isNotNull(),
            F.concat(F.lit(name + ": "), F.col(col), F.lit("\r\n")),
        ).otherwise(F.lit(""))

    rec_txt = F.concat(
        F.lit(WARC_MARKER),
        _hline("WARC-Type", type_col),
        _hline("WARC-Target-URI", uri_col),
        _hline("WARC-Date", date_col),
        F.lit("\r\n"),
        F.coalesce(F.col(payload_col), F.lit("")), F.lit("\r\n\r\n"))
    return (records
            .select(F.col(group_col).alias("blob_id"),
                    F.struct(F.col(order_col).alias("_o"),
                             rec_txt.alias("_t")).alias("_s"))
            .groupBy("blob_id")
            .agg(F.array_join(
                F.transform(F.sort_array(F.collect_list("_s")),
                            lambda s: s["_t"]), "").alias("warc")))
