# -*- coding: utf-8 -*-
"""Reference-shape JSON export/import of extraction results.

The reference persists extraction output as ``extracted_result.json``
with ``json.dump(result, f, ensure_ascii=False, indent=2)``
(/root/reference/backend/kgapi/extractor.py:197-199) and kg_writer
reads it back with ``json.load`` (kg_writer.py:257-260). This module
reproduces that interchange format (S2/S3 in SURVEY.md §2.1) both for
single documents (byte-exact serialization) and as distributed
DataFrame JSON lines.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# nested schema of one extraction document (FIXTURES.md §2/§3)
RESULT_SCHEMA = T.StructType([
    T.StructField("entities", T.ArrayType(T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
    ]))),
    T.StructField("relations", T.ArrayType(T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("target", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("verb", T.StringType()),
        T.StructField("similarity", T.DoubleType()),
    ]))),
])


def to_reference_json(result: dict) -> str:
    """Serialize one {entities, relations} dict exactly as the
    reference does (ensure_ascii=False, indent=2)."""
    return json.dumps(result, ensure_ascii=False, indent=2)


def extraction_to_json(extracted: DataFrame) -> DataFrame:
    """(url, entities, relations, ...) -> (url, result_json) rows.

    ``to_json`` runs JVM-side; nulls inside relation structs (SVO rows
    have no similarity) are omitted by to_json, matching the reference
    dicts which only carry ``similarity`` on co-occurrence edges."""
    return extracted.select(
        "url",
        F.to_json(
            F.struct("entities", "relations"), {"ignoreNullFields": "true"}
        ).alias("result_json"),
    )


def write_extraction_json(extracted: DataFrame, path: str) -> None:
    """Persist the reference-interchange documents as JSON lines
    (url + nested result), the distributed stand-in for one big
    ``extracted_result.json``."""
    extracted.select("url", "entities", "relations").write.mode(
        "overwrite"
    ).json(path)


def read_extraction_json(spark: SparkSession, path: str) -> DataFrame:
    """Load the interchange format back with an explicit schema (the
    reference's json.load counterpart; no schema inference jobs)."""
    schema = T.StructType(
        [T.StructField("url", T.StringType())] + list(RESULT_SCHEMA.fields)
    )
    return spark.read.schema(schema).json(path)
