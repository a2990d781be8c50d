# -*- coding: utf-8 -*-
"""Line-level boilerplate stripping: corpus-frequency rule, short-line
rule, rule precedence, and order-preserving reassembly."""
from __future__ import annotations

import pytest

from knowledge_graph_spark.operators.cleaning import strip_boilerplate


@pytest.fixture(scope="module")
def spark():
    from knowledge_graph_spark.session import get_spark

    s = get_spark(app="clean-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_frequency_and_short_rules(spark):
    pages = _pages(spark, [
        (1, "Home | About\nThis is a long enough prose line one.\nShare"),
        (2, "Home | About\nA different long enough prose line two."),
        (3, "Home | About\nShort.\nThird long enough content line here."),
        (4, None),
    ])
    out = {r["doc_id"]: r
           for r in strip_boilerplate(pages, min_docs=1,
                                      max_doc_frac=0.5).collect()}
    # 'Home | About' is in 3/4 docs > max(1, 2) -> frequency-dropped
    assert out[1]["n_dropped_freq"] == 1
    assert out[1]["n_dropped_short"] == 1          # 'Share'
    assert out[1]["clean_text"] == "This is a long enough prose line one."
    # 'Short.' keeps: terminal punctuation exempts short lines
    assert out[3]["n_dropped_short"] == 0
    assert out[3]["clean_text"].startswith("Short.\n")
    # NULL text -> one empty line, short-dropped, doc survives
    assert (out[4]["n_kept"], out[4]["clean_text"]) == (0, "")


def test_every_copy_of_frequent_line_dropped(spark):
    # unlike span_dedup there is no first-occurrence survivor
    pages = _pages(spark, [(i, "Cookie banner line that is long enough.\n"
                               f"Unique content line number {i} padded out.")
                           for i in range(1, 5)])
    out = strip_boilerplate(pages, min_docs=1, max_doc_frac=0.5).collect()
    assert all(r["n_dropped_freq"] == 1 for r in out)
    assert all(r["clean_text"].startswith("Unique content") for r in out)


def test_within_doc_repeat_counts_once(spark):
    # a line repeated inside ONE doc is not corpus-frequent
    pages = _pages(spark, [
        (1, "Repeated navigation line padded long.\n"
            "Repeated navigation line padded long."),
        (2, "Totally unrelated content line padded long."),
    ])
    out = {r["doc_id"]: r
           for r in strip_boilerplate(pages, min_docs=1,
                                      max_doc_frac=0.6).collect()}
    assert out[1]["n_dropped_freq"] == 0
    assert out[1]["n_kept"] == 2


def test_rejects_bad_frac(spark):
    pages = _pages(spark, [(1, "x")])
    with pytest.raises(ValueError, match="max_doc_frac"):
        strip_boilerplate(pages, max_doc_frac=0.0)


def test_main_content_block_selection(spark):
    from knowledge_graph_spark.operators.cleaning import main_content_block

    chrome = "[[Home]] [[About]] [[Contact]]"
    art1 = "this paragraph carries the real article body of the page."
    art2 = "it continues with a second dense informative prose line."
    small = "a smaller but still valid content block lives down here."
    pages = spark.createDataFrame(
        [(1, "\n".join([chrome, art1, art2, chrome, small])),
         (2, chrome),                       # chrome-only -> no block
         (3, None),
         (4, art1)],                        # single-line page
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in main_content_block(pages).collect()}
    r1 = out[1]
    assert (r1["block_start"], r1["block_lines"]) == (1, 2)
    assert r1["main_text"] == art1 + "\n" + art2
    assert r1["block_words"] == 19
    assert out[2]["block_lines"] == 0 and out[2]["main_text"] == ""
    assert out[2]["block_start"] == -1
    assert out[3]["n_lines"] == 1 and out[3]["block_lines"] == 0
    assert out[4]["block_start"] == 0 and out[4]["block_lines"] == 1


def test_truecase_stats_argmax_and_ties(spark):
    """Most frequent casing wins; exact ties break to the bytewise-
    smallest form (uppercase first); pure-number tokens are excluded;
    keys below min_total are dropped; n_total sums ALL variants."""
    from knowledge_graph_spark.operators.cleaning import truecase_stats

    docs = spark.createDataFrame([
        (1, "NASA NASA Nasa launches; iPhone iphone IPHONE iPhone"),
        (2, "Paris paris 12345 once"),
        (3, None),
    ], "doc_id long, text string")
    got = {r["token_lc"]: (r["best_form"], r["n_best"], r["n_total"])
           for r in truecase_stats(docs).collect()}
    assert got["nasa"] == ("NASA", 2, 3)
    assert got["iphone"] == ("iPhone", 2, 4)
    # exact 1-1 tie: 'Paris' < 'paris' bytewise
    assert got["paris"] == ("Paris", 1, 2)
    assert "12345" not in got          # no letter -> no casing
    assert "once" not in got           # n_total=1 < min_total=2
    assert "launches" not in got
    # min_total=1 keeps the singletons
    all_keys = {r["token_lc"] for r in
                truecase_stats(docs, min_total=1).collect()}
    assert "once" in all_keys and "launches" in all_keys
