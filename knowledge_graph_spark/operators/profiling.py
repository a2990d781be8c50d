# -*- coding: utf-8 -*-
"""Schema profiling: functional and inclusion dependency discovery.

Web-scale KG construction ingests millions of harvested relations
(web tables, infoboxes, microdata) whose schemas arrive unlabeled;
deciding "this column is a key", "brand determines manufacturer", or
"this column is a foreign key into that entity table" is the
schema-alignment groundwork under any table-to-KG mapping. The two
classic profiling primitives:

- functional dependencies A -> B (TANE — Huhtala, Karkkainen, Porkka,
  Toivonen, Comput. J. 1999): A determines B iff grouping by A never
  sees two B values; discovered FDs become KG functional predicates
  (one value per subject) and key candidates.
- inclusion dependencies R.a ⊆ S.b (De Marchi, Lopes, Petit, JIIS
  2002 / Bell & Brockhausen 1995): the foreign-key discovery signal —
  which harvested column references which entity table.

Both emit INTEGER censuses (distinct counts, violation counts), so
the SQL oracles replay them exactly and the verdicts ("holds",
"covers 98%") stay derivable row-locally.

Scale shape: everything folds to per-column(-pair) DISTINCT
aggregates before any comparison — map-side partial distincts, then
(value)-keyed exchanges; raw rows never cross twice. One aggregate
per profiled pair, unioned; the pair list is metadata-scale.

Not in the reference (its input is pre-shaped JSON); the profiling
semantics follow the cited public papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fd_profile(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency census for the given (lhs, rhs) column
    pairs of one relation: ``A -> B`` holds iff every distinct A
    value maps to exactly one B value.

    Returns one row per pair: ``(lhs, rhs, n_lhs, n_pairs,
    n_violating_keys)`` where ``n_lhs`` counts distinct non-null A,
    ``n_pairs`` distinct non-null (A, B) combinations, and
    ``n_violating_keys`` the A values carrying >= 2 B values (0 iff
    the FD holds). NULLs are excluded on either side — the TANE
    convention.

    Scale shape: ALL pairs melt into ONE ``(pair, A, B)`` stream
    (the column_profile pattern — a 20-pair audit still reads the
    table once, where a per-pair loop would issue 20 independent
    scan+distinct pipelines), then one distinct fold, one
    (pair, A)-keyed count, one |pairs|-row summary joined to a
    literal pair spine so pairs with zero valid rows still emit
    their all-zeros row.
    """
    if not pairs:
        raise ValueError("fd_profile needs >= 1 (lhs, rhs) column pair")
    melted = (df.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("_p"),
                 F.col(lhs).cast("string").alias("_a"),
                 F.col(rhs).cast("string").alias("_b"))
        for i, (lhs, rhs) in enumerate(pairs)])).alias("_m"))
        .select("_m._p", "_m._a", "_m._b")
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .distinct())
    per_key = melted.groupBy("_p", "_a").agg(F.count("*").alias("_nb"))
    summary = per_key.groupBy("_p").agg(
        F.count("*").cast("long").alias("n_lhs"),
        F.sum("_nb").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("_nb") >= 2, 1).otherwise(0))
        .cast("long").alias("n_violating_keys"))
    spine = df.sparkSession.createDataFrame(
        [(i, lhs, rhs) for i, (lhs, rhs) in enumerate(pairs)],
        "_p int, lhs string, rhs string")
    return (spine.join(summary, "_p", "left")
            .select("lhs", "rhs",
                    F.coalesce("n_lhs", F.lit(0)).cast("long")
                    .alias("n_lhs"),
                    F.coalesce("n_pairs", F.lit(0)).cast("long")
                    .alias("n_pairs"),
                    F.coalesce("n_violating_keys", F.lit(0))
                    .cast("long").alias("n_violating_keys")))


def inclusion_profile(
        candidates: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Inclusion-dependency census for ``(name, child_df, child_col,
    parent_df, parent_col)`` candidates: how much of the child
    column's distinct value set exists in the parent column —
    ``n_child`` distinct non-null child values, ``n_matched`` of
    them present in the parent. ``n_matched == n_child`` is a
    foreign-key candidate (De Marchi et al. 2002); a high-but-
    partial ratio flags dirty references needing quarantine.

    Values compare as strings (harvested web-table columns are
    untyped — the De Marchi unary-IND convention).

    Scale shape: per candidate, both sides fold to distinct value
    sets map-side, then one value-keyed LEFT SEMI join counts the
    overlap — the smaller (entity-table) side is broadcast when it
    fits, and no raw row ever crosses.
    """
    if not candidates:
        raise ValueError("inclusion_profile needs >= 1 candidate")
    outs = []
    for name, child, ccol, parent, pcol in candidates:
        cvals = (child.select(F.col(ccol).cast("string").alias("_v"))
                 .filter(F.col("_v").isNotNull()).distinct())
        pvals = (parent.select(F.col(pcol).cast("string").alias("_v"))
                 .filter(F.col("_v").isNotNull()).distinct())
        matched = cvals.join(pvals, "_v", "left_semi")
        n_child = cvals.agg(F.count("*").cast("long").alias("n"))
        n_match = matched.agg(F.count("*").cast("long").alias("m"))
        outs.append(
            n_child.crossJoin(n_match).select(
                F.lit(name).alias("candidate"),
                F.col("n").alias("n_child"),
                F.col("m").alias("n_matched")))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def column_profile(df: DataFrame, cols: list[str] | None = None,
                   table_name: str = "") -> DataFrame:
    """Per-column profiling census — the single-pass summary every
    ingestion audit publishes before schema mapping (the unary leg
    of Abedjan, Golab, Naumann's VLDB-J 2015 profiling survey):
    row/null/distinct counts plus lexicographic min/max of the
    string form. Values profile AS STRINGS (harvested columns are
    untyped on the way in), making the census one union-able shape
    for every table.

    Returns one row per column: ``(table_col, n_rows, n_nulls,
    n_distinct, min_val, max_val)``.

    Scale shape: the whole census is ONE aggregate over the melted
    ``(column, value)`` stream — rows × |cols| value strings,
    map-side partial aggregation, no per-column scan loop (a 100-
    column table still reads once). count_distinct shuffles
    (column, value) pairs; for sketch-precision-is-enough audits,
    compose :func:`sketches.hll_sketch` per column instead.
    """
    names = list(cols) if cols is not None else list(df.columns)
    if not names:
        raise ValueError("column_profile needs >= 1 column")
    prefix = f"{table_name}." if table_name else ""
    # backtick-quote the derived names: harvested web-table schemas
    # carry dotted column names ('price.usd'), which bare F.col/df[c]
    # would parse as a nested-field path and crash with
    # UNRESOLVED_COLUMN (embedded backticks double per SQL quoting)
    def _q(c):
        return F.col("`" + c.replace("`", "``") + "`")

    melted = df.select(F.explode(F.array(*[
        F.struct(F.lit(prefix + c).alias("_c"),
                 _q(c).cast("string").alias("_v"))
        for c in names
    ])).alias("_m")).select(F.col("_m._c").alias("_c"),
                            F.col("_m._v").alias("_v"))
    agg = (melted.groupBy("_c")
           .agg(F.count("*").cast("long").alias("n_rows"),
                F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0))
                .cast("long").alias("n_nulls"),
                F.count_distinct(F.col("_v")).cast("long")
                .alias("n_distinct"),
                F.min("_v").alias("min_val"),
                F.max("_v").alias("max_val"))
           .select(F.col("_c").alias("table_col"), "n_rows", "n_nulls",
                   "n_distinct", "min_val", "max_val"))
    # |cols|-row literal skeleton guarantees the contract (one row
    # per column, n_rows=0 for an empty table) instead of the melted
    # groupBy silently dropping columns of an empty ingest
    skeleton = df.sparkSession.createDataFrame(
        [(prefix + c,) for c in names], "table_col string")
    return (skeleton.join(agg, "table_col", "left")
            .select("table_col",
                    F.coalesce("n_rows", F.lit(0)).cast("long")
                    .alias("n_rows"),
                    F.coalesce("n_nulls", F.lit(0)).cast("long")
                    .alias("n_nulls"),
                    F.coalesce("n_distinct", F.lit(0)).cast("long")
                    .alias("n_distinct"),
                    "min_val", "max_val"))
