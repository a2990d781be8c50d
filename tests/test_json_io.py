# -*- coding: utf-8 -*-
"""Reference-shape JSON interchange (S2/S3): byte-exact single-doc
serialization and lossless distributed round-trip."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from knowledge_graph_spark.kernel.extractor import extract_entities_relations
from knowledge_graph_spark.operators.extraction import extract
from knowledge_graph_spark.sources.json_io import (
    extraction_to_json, read_extraction_json, to_reference_json,
    write_extraction_json,
)
from knowledge_graph_spark.sources.pages import generate_spark


def test_single_doc_serialization_matches_reference_format():
    r = extract_entities_relations("华星科技公司宣布收购蓝海数据集团。")
    s = to_reference_json(r)
    # ensure_ascii=False: raw CJK, not \\u escapes; indent=2
    assert "华星科技公司" in s and "\\u" not in s
    assert s.startswith('{\n  "entities": [')
    assert json.loads(s) == r


def test_distributed_roundtrip_lossless(spark, tmp_path):
    extracted = extract(generate_spark(spark, 40, partitions=2))
    path = str(tmp_path / "exjson")
    write_extraction_json(extracted, path)
    back = read_extraction_json(spark, path)

    def key(df):
        return {
            r["url"]: (r["entities"], r["relations"])
            for r in df.select("url", "entities", "relations").collect()
        }

    assert key(back) == key(extracted)


def test_to_json_omits_null_similarity(spark):
    extracted = extract(generate_spark(spark, 20, partitions=2))
    row = (
        extraction_to_json(extracted)
        .filter(F.col("result_json").contains('"relations":[{'))
        .first()
    )
    doc = json.loads(row["result_json"])
    for rel in doc["relations"]:
        # SVO rows carry no similarity key; co-occurrence rows carry one
        if rel["type"] == "co-occurrence":
            assert "similarity" in rel
        else:
            assert "similarity" not in rel
