# -*- coding: utf-8 -*-
"""Quantity / measurement extraction — numeric KG attribute facts.

Web prose asserts numeric attributes ("a population of 3,500,000",
"2.5 million users", "42 km") far more densely than it asserts
entity-entity relations, and harvesting them is its own extraction
family (cf. Banko et al. 2007 TextRunner's numeric tuples; Saha et
al. 2017 "Bootstrapping for Numerical OpenIE"). The unit vocabulary
and scale-word normalization below are the declared public
convention; the reference has no numeric stage.

Scale shape: entirely row-local — one RE2-safe regex pass (shared
verbatim with the SQL oracle), group re-extraction per match, and
integer thousandths arithmetic. Zero exchanges, zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: number (with optional ,###-groups and decimals) + optional scale
#: word + unit from the declared vocabulary. RE2-safe: no lookaround.
#: '%' can't sit before a word boundary, so the unit alternation ends
#: with an explicit percent-sign branch.
QUANTITY_RE = (r"(\d+(?:,\d{3})*(?:\.\d+)?) ?"
               r"(thousand|million|billion)? ?"
               r"(km|kg|percent|users|people|dollars|%)")

_SCALES = {"thousand": 1_000, "million": 1_000_000,
           "billion": 1_000_000_000}


def extract_quantities(pages: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Harvest ``(doc_id, raw, mantissa, scale_word, unit,
    value_milli)`` measurement rows.

    ``mantissa`` is the comma-stripped numeral string; ``value_milli``
    is the fully scaled value in integer THOUSANDTHS
    (``round(mantissa * scale * 1000)``) so no float ever reaches a
    downstream hasher or comparison — '2.5 million users' →
    ``value_milli = 2_500_000_000``. ``%`` normalizes to
    ``percent``.
    """
    sql_re = QUANTITY_RE.replace("\\", "\\\\")
    raw = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(
            f"regexp_extract_all({text_col}, '{sql_re}', 0)"))
        .alias("raw"),
    )
    mant = F.regexp_replace(
        F.regexp_extract("raw", QUANTITY_RE, 1), ",", "")
    scale_word = F.regexp_extract("raw", QUANTITY_RE, 2)
    unit = F.regexp_extract("raw", QUANTITY_RE, 3)
    scale = F.coalesce(
        *[F.when(scale_word == w, F.lit(v)) for w, v in _SCALES.items()],
        F.lit(1))
    return raw.select(
        "doc_id", "raw",
        mant.alias("mantissa"),
        F.when(scale_word != "", scale_word).alias("scale_word"),
        F.when(unit == "%", F.lit("percent")).otherwise(unit)
        .alias("unit"),
        # DECIMAL, not double: the docstring's integer-exactness
        # contract breaks past 2^53 through a double (and a huge
        # quantity would silently clamp at the bigint cast);
        # try_cast surfaces out-of-range values as NULL with the raw
        # string still present — visible, never garbage
        F.round(mant.try_cast("decimal(32,6)") * scale * 1000, 0)
        .try_cast("bigint")
        .alias("value_milli"),
    )
