# -*- coding: utf-8 -*-
"""Pinned golden-triple fixture (SURVEY.md §5.2 gate).

``golden_triples.json`` is the kernel's pinned output over the
standard 120-page corpus (seed 42), with multiplicity. The Spark
pipeline must reproduce it exactly — P/R 1.0, not just >= 0.95: the
same kernel runs on both sides, so ANY divergence is a partitioning,
ordering, or serialization bug. The fixture also freezes kernel
behavior across rounds: an intentional kernel change must regenerate
it consciously (see the command in this file) rather than drift.

Regenerate: python -c "see git history of tests/golden_triples.json"
"""

from __future__ import annotations

import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_triples.json")


def load_golden():
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


def test_kernel_matches_pinned_golden():
    from knowledge_graph_spark.kernel.extractor import (
        extract_entities_relations, triples,
    )
    from knowledge_graph_spark.kernel.html2text import html_to_text
    from knowledge_graph_spark.sources.pages import page_row

    got = []
    for i in range(120):
        p = page_row(i)
        text = p["text"] if p["text"] is not None else html_to_text(p["html"])
        for t in triples(extract_entities_relations(text)):
            got.append({"url": p["url"], **t})
    got.sort(key=lambda d: (d["url"], d["subj"], d["pred"], d["obj"]))
    assert got == load_golden()


def test_spark_pipeline_matches_pinned_golden(spark, pages_df):
    from knowledge_graph_spark.operators.extraction import extract, triples_table

    rows = triples_table(extract(pages_df)).collect()
    got = sorted(
        (r["url"], r["subj"], r["pred"], r["obj"]) for r in rows
    )
    want = sorted(
        (d["url"], d["subj"], d["pred"], d["obj"]) for d in load_golden()
    )
    assert got == want  # exact multiset match — P/R 1.0
