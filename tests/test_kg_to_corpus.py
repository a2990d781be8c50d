# -*- coding: utf-8 -*-
"""KG → training-corpus bridges (entity cards, templated QA pairs)
and the Zipf term-frequency census — hand-computed twins."""

import math

import pytest

from knowledge_graph_spark.operators.kg_export import (
    entity_cards, qa_pairs)
from knowledge_graph_spark.operators.textstats import term_powerlaw


@pytest.fixture(scope="module")
def kb(spark):
    rows = [
        ("s1", "supplies", "p2"), ("s1", "supplies", "p1"),
        ("s1", "located_in", "n1"),
        ("s2", "supplies", "p1"),
        # duplicate triple collapses
        ("s2", "supplies", "p1"),
        (None, "supplies", "p9"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def test_entity_cards_rendering(kb):
    out = {r.entity: r for r in entity_cards(kb).collect()}
    assert out["s1"].card == "s1\nlocated_in: n1\nsupplies: p1, p2"
    assert out["s1"].n_facts == 3
    assert out["s2"].card == "s2\nsupplies: p1"
    assert out["s2"].n_facts == 1
    assert None not in out and len(out) == 2


def test_entity_cards_object_cap(kb):
    out = {r.entity: r for r in entity_cards(kb, max_objects=1).collect()}
    # cap trims the rendered list but n_facts stays uncapped
    assert out["s1"].card == "s1\nlocated_in: n1\nsupplies: p1"
    assert out["s1"].n_facts == 3


def test_qa_pairs(kb):
    tpl = {"supplies": "What does {s} supply?"}
    out = {(r.subj, r.pred): r for r in qa_pairs(kb, tpl).collect()}
    # located_in has no template -> no row
    assert set(out) == {("s1", "supplies"), ("s2", "supplies")}
    r = out[("s1", "supplies")]
    assert r.question == "What does s1 supply?"
    assert r.answers == "p1, p2"
    assert r.n_answers == 2
    assert out[("s2", "supplies")].n_answers == 1


def test_qa_pairs_answer_cap_and_validation(kb):
    tpl = {"supplies": "What does {s} supply?"}
    out = {r.subj: r for r in qa_pairs(kb, tpl, max_answers=1).collect()}
    assert out["s1"].answers == "p1" and out["s1"].n_answers == 2
    with pytest.raises(ValueError):
        qa_pairs(kb, {})
    with pytest.raises(ValueError):
        qa_pairs(kb, {"supplies": "no placeholder"})


def test_term_powerlaw(spark):
    docs = spark.createDataFrame(
        [("a a a a b b c",), ("b c? C.",)], "text string")
    # freqs: a=4, b=3, c=3 (case-folded, punctuation split)
    r = term_powerlaw(docs, f_min=2).collect()[0]
    assert (r.n_nodes, r.n_tail, r.d_min, r.max_degree) == (3, 3, 2, 4)
    expect = (round(math.log(4 / 1.5) * 1e6)
              + 2 * round(math.log(3 / 1.5) * 1e6))
    assert r.sum_log_1e6 == expect
    with pytest.raises(ValueError):
        term_powerlaw(docs, f_min=1)
