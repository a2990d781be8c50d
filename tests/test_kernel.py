# -*- coding: utf-8 -*-
"""Unit tests for the pure extraction kernel (no Spark).

Mirrors the reference's observable semantics point by point
(SURVEY.md §2.2, reference /root/reference/backend/kgapi/extractor.py):
entity patterns, id assignment, stop verbs, SVO/prep relations,
co-occurrence gate, and the invariants the Spark layer depends on
(determinism, totality, dense ids)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from knowledge_graph_spark.kernel.extractor import (
    extract_entities_relations, triples,
)
from knowledge_graph_spark.kernel.html2text import html_to_text
from knowledge_graph_spark.kernel.similarity import calculate_similarity
from knowledge_graph_spark.kernel import vocab as V
from knowledge_graph_spark.sources.pages import page_row


def ents(r):
    return [(e["name"], e["type"]) for e in r["entities"]]


def test_org_suffix_entity():
    r = extract_entities_relations("华星科技公司宣布新计划。")
    assert ("华星科技公司", "Organization") in ents(r)


def test_product_patterns():
    r = extract_entities_relations("蓝海集团开发智能诊断系统。")
    assert ("智能诊断系统", "Product") in ents(r)
    r2 = extract_entities_relations("研究院发表新型检测技术。")
    assert ("新型检测技术", "Product") in ents(r2)


def test_title_pattern():
    r = extract_entities_relations("李明担任首席执行官。")
    assert ("首席执行官", "Title") in ents(r)
    assert ("李明", "Person") in ents(r)


def test_location_gazetteer():
    r = extract_entities_relations("远大集团在北京成立研究中心。")
    assert ("北京", "Location") in ents(r)


def test_entity_ids_dense_and_positional():
    r = extract_entities_relations("华星公司收购蓝海集团。李明加入华星公司。")
    ids = [e["id"] for e in r["entities"]]
    assert ids == [f"e{i + 1}" for i in range(len(ids))]
    starts = [e["start"] for e in r["entities"]]
    assert starts == sorted(starts)


def test_svo_mapped_verb():
    t = triples(extract_entities_relations("华星科技公司收购蓝海数据集团。"))
    assert {"subj": "华星科技公司", "pred": "acquire", "obj": "蓝海数据集团"} in t


def test_raw_verb_fallthrough():
    # 举办 is not in VERB_RELATION_MAP -> predicate is the surface verb
    t = triples(extract_entities_relations("九州集团举办新型封装技术展示活动。"))
    assert any(x["pred"] == "举办" for x in t)


def test_stop_verbs_emit_no_svo():
    r = extract_entities_relations("李明是华星科技公司的总经理。")
    assert all(rel["type"] == "co-occurrence" for rel in r["relations"])


def test_prep_object_relation():
    t = triples(extract_entities_relations("华星科技公司与蓝海数据集团达成合作。"))
    assert {"subj": "华星科技公司", "pred": "reach", "obj": "蓝海数据集团"} in t


def test_cooccurrence_requires_different_types():
    r = extract_entities_relations("华星公司与蓝海集团达成合作，李明出席。")
    for rel in r["relations"]:
        if rel["type"] == "co-occurrence":
            by_id = {e["id"]: e for e in r["entities"]}
            assert by_id[rel["source"]]["type"] != by_id[rel["target"]]["type"]
            assert rel["verb"] == "同现"
            assert rel["similarity"] == round(rel["similarity"], 2)


def test_cooccurrence_skips_already_related():
    r = extract_entities_relations("李明担任首席执行官。")
    pairs = {(rel["source"], rel["target"]) for rel in r["relations"]}
    co = [rel for rel in r["relations"] if rel["type"] == "co-occurrence"]
    for rel in co:
        assert not any(
            o["type"] != "co-occurrence"
            and {o["source"], o["target"]} == {rel["source"], rel["target"]}
            for o in r["relations"]
        )


def test_similarity_gate_threshold_and_rounding():
    s = calculate_similarity("华星科技公司", "华星科技集团")
    assert 0.0 <= s <= 1.0
    assert calculate_similarity("abc", "abc") > 0.99


def test_entity_overlap_suppression():
    # the ORG span must not also yield a nested entity for its location stem
    r = extract_entities_relations("北京大学发表新成果。")
    names = [e["name"] for e in r["entities"]]
    assert "北京大学" in names and "北京" not in names


def test_determinism():
    text = page_row(17)["text"] or html_to_text(page_row(17)["html"])
    assert extract_entities_relations(text) == extract_entities_relations(text)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.text(max_size=300))
def test_total_on_arbitrary_unicode(s):
    r = extract_entities_relations(s)
    ids = [e["id"] for e in r["entities"]]
    assert ids == [f"e{i + 1}" for i in range(len(ids))]
    id_set = set(ids)
    for rel in r["relations"]:
        assert rel["source"] in id_set and rel["target"] in id_set


@settings(max_examples=50, deadline=None, derandomize=True)
@given(st.integers(min_value=0, max_value=5000))
def test_html_roundtrip_byte_identical(i):
    p = page_row(i)
    if p["text"] is not None:
        assert html_to_text(p["html"]) == p["text"]


def test_heldout_pages_recoverable():
    # held-out rows (text NULL) must regenerate text from html
    found = 0
    for i in range(100):
        p = page_row(i)
        if p["text"] is None:
            assert len(html_to_text(p["html"])) > 0
            found += 1
    assert found > 0
