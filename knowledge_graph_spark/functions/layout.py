# -*- coding: utf-8 -*-
"""Data-layout keys for lake-table clustering: Z-order (Morton) codes.

Multi-dimensional clustering is the standard lake-table optimization
(Morton 1966; the technique behind Delta/Iceberg ``OPTIMIZE ZORDER
BY``): interleaving the bits of several sort dimensions produces one
integer key whose contiguous ranges are small hyper-rectangles in the
original space, so files written in z-key order serve min/max-pruned
scans on EVERY interleaved dimension, not just the leading sort
column.

Pure codegen: the key is a fixed sum of shift/mask terms (disjoint
target bits, so ``+`` ≡ ``|``), no UDF, no shuffle of its own —
callers feed it to ``repartitionByRange``/``sortWithinPartitions``
when laying out files.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def zorder_key2(col_a, col_b, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    columns into one BIGINT z-key: bit i of ``col_a`` lands at
    position 2i, bit i of ``col_b`` at 2i+1. ``bits <= 31`` keeps
    the result in the positive BIGINT range. Values wider than
    ``bits`` wrap (masked) — normalize or bucket the dimensions
    first, as ZORDER implementations do."""
    if not 1 <= bits <= 31:
        raise ValueError("zorder_key2: bits must be in [1, 31]")
    a = F.col(col_a).cast("long") if isinstance(col_a, str) else col_a
    b = F.col(col_b).cast("long") if isinstance(col_b, str) else col_b
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)),
                                 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_key2_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """The same interleave as :func:`zorder_key2` as a SQL string
    valid in Spark SQL and DuckDB — the oracle embeds it so the two
    engines share one bit-layout definition. Inputs are widened to
    BIGINT FIRST (the Python twin's .cast('long')): a 32-bit column
    shifted to bit position 31 would otherwise overflow at INTEGER
    width — wrapping negative on Spark, erroring on DuckDB — and the
    two engines' keys would silently diverge."""
    if not 1 <= bits <= 31:
        raise ValueError("zorder_key2_sql: bits must be in [1, 31]")
    a = f"CAST({col_a} AS BIGINT)"
    b = f"CAST({col_b} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
