# -*- coding: utf-8 -*-
"""End-to-end Spark pipeline tests: pages -> extraction -> graph ->
queries, resume idempotence, repartition stability, golden parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.kernel.extractor import extract_entities_relations, triples
from knowledge_graph_spark.kernel.html2text import html_to_text
from knowledge_graph_spark.operators.extraction import (
    entities_table, extract, relations_table, triples_table,
)
from knowledge_graph_spark.operators import queries as Q
from knowledge_graph_spark.pipeline import KGWarehouse, run_pipeline
from knowledge_graph_spark.sources.pages import generate_spark, page_row


def test_extraction_matches_kernel_golden(spark, pages_df, extracted_df):
    """P/R vs the pinned kernel output (the golden oracle) must be 1.0:
    same kernel, so any divergence is a partitioning/ordering bug."""
    spark_triples = {
        (r["subj"], r["pred"], r["obj"])
        for r in triples_table(extracted_df).collect()
    }
    golden = set()
    for p in [page_row(i) for i in range(120)]:
        text = p["text"] if p["text"] is not None else html_to_text(p["html"])
        for t in triples(extract_entities_relations(text)):
            golden.add((t["subj"], t["pred"], t["obj"]))
    assert golden, "golden corpus produced no triples — generator broken"
    # set-level P/R (duplicate triples across pages collapse)
    tp = len(spark_triples & golden)
    precision = tp / max(len(spark_triples), 1)
    recall = tp / max(len(golden), 1)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)


def test_extraction_stable_under_repartitioning(spark, pages_df):
    a = extract(pages_df, partitions=2)
    b = extract(pages_df, partitions=7)
    ta = {(r["subj"], r["pred"], r["obj"], r["url"]) for r in triples_table(a).collect()}
    tb = {(r["subj"], r["pred"], r["obj"], r["url"]) for r in triples_table(b).collect()}
    assert ta == tb


def test_exploded_tables_consistent(spark, extracted_df):
    ents = entities_table(extracted_df)
    rels = relations_table(extracted_df)
    assert ents.filter(F.col("id").isNull() | F.col("name").isNull()).count() == 0
    # every relation endpoint resolves to an entity of the same url
    joined = rels.join(
        ents.select("url", F.col("id").alias("source")),
        on=["url", "source"], how="left_anti",
    )
    assert joined.count() == 0


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    pages = generate_spark(spark, 60, partitions=3)
    wh = KGWarehouse(str(tmp_path))
    c1 = run_pipeline(spark, pages, wh, graph_id="g1", link_entities=True)
    assert c1["nodes"] > 0 and c1["edges"] > 0 and c1["triples"] > 0

    nodes_before = wh.nodes.read(spark).count()
    hist_before = len(wh.nodes.history())
    # resume: same graph_id -> every stage skips, state unchanged
    c2 = run_pipeline(spark, pages, wh, graph_id="g1", link_entities=True)
    assert wh.nodes.read(spark).count() == nodes_before
    assert c2["graph_id"] == "g1"


def test_query_graph_shape(spark, tmp_path):
    pages = generate_spark(spark, 40, partitions=2)
    wh = KGWarehouse(str(tmp_path))
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=False)
    nodes, edges = wh.nodes.read(spark), wh.edges.read(spark)
    g = Q.query_graph(spark, nodes, edges, "g1")
    assert g["nodes"] and g["links"]
    for ln in g["links"]:
        # full **r spread (kg_writer.py:109-115): every edge property
        # rides the link, graph_id/user_id included
        assert {"source", "target", "type", "label", "verb", "similarity",
                "graph_id", "user_id", "url"} <= set(ln)
        assert ln["graph_id"] == "g1"
    node_ids = {n["id"] for n in g["nodes"]}
    for ln in g["links"]:
        assert ln["source"] in node_ids and ln["target"] in node_ids
    # missing graph -> empty fallback (kg_writer.py:86-93)
    g2 = Q.query_graph(spark, nodes, edges, "nope")
    assert g2 == {"nodes": [], "links": []}


def test_rowlocal_edges_equal_join_edges(spark, extracted_df):
    """The pipeline's join-free edge builder must produce exactly the
    edge/dropped sets of the generic join-based builder."""
    from knowledge_graph_spark.operators.extraction import (
        entities_table, relations_table,
    )
    from knowledge_graph_spark.operators.graph_build import (
        build_edges, build_edges_rowlocal, build_nodes,
    )

    nodes = build_nodes(entities_table(extracted_df), "g", "u")
    e1, d1 = build_edges(relations_table(extracted_df), nodes, "g", "u")
    e2, d2 = build_edges_rowlocal(extracted_df, "g", "u")

    def eset(df):
        return {tuple(r) for r in
                df.select("graph_id", "src", "dst", "rel_type", "verb",
                          "similarity", "url").collect()}

    def dset(df):
        return {tuple(r) for r in
                df.select("url", "src", "dst", "type", "reason").collect()}

    assert eset(e1) == eset(e2)
    assert dset(d1) == dset(d2)


def test_sanitization_quarantine(spark, tmp_path):
    """Chinese predicates (raw-verb fallthrough) must be dropped from
    edges but preserved in dropped_relations (reference kg_writer.py:48-52
    prints-and-drops; we quarantine — SURVEY.md §7.4.4)."""
    pages = generate_spark(spark, 120, partitions=3)
    wh = KGWarehouse(str(tmp_path))
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=False)
    edges = wh.edges.read(spark)
    assert edges.filter(~F.col("rel_type").rlike("^[A-Z0-9_]+$")).count() == 0
    dropped = wh.dropped.read(spark)
    assert dropped.filter(F.col("reason") == "invalid_type").count() > 0


def test_keyword_search(spark, tmp_path):
    pages = generate_spark(spark, 40, partitions=2)
    wh = KGWarehouse(str(tmp_path))
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=False)
    hits = Q.search_entities_by_keyword(wh.nodes.read(spark), "user_001", "公司")
    assert hits.count() > 0
    assert hits.filter(~F.col("name").contains("公司")).count() == 0


def test_detach_delete(spark, tmp_path):
    pages = generate_spark(spark, 40, partitions=2)
    wh = KGWarehouse(str(tmp_path))
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=False)
    run_pipeline(spark, pages, wh, graph_id="g2", link_entities=False)
    nodes, edges = wh.nodes.read(spark), wh.edges.read(spark)
    kept_n, kept_e = Q.clear_graph_by_id(nodes, edges, "g1")
    assert kept_n.filter(F.col("graph_id") == "g1").count() == 0
    assert kept_e.filter(F.col("graph_id") == "g1").count() == 0
    assert kept_n.filter(F.col("graph_id") == "g2").count() > 0
    # no dangling endpoints
    ids = {r["id"] for r in kept_n.select("id").distinct().collect()}
    for r in kept_e.select("src", "dst").collect():
        assert r["src"] in ids and r["dst"] in ids


def test_query_graphs_by_user_single_pass(spark, tmp_path):
    pages = generate_spark(spark, 30, partitions=2)
    wh = KGWarehouse(str(tmp_path))
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=False)
    run_pipeline(spark, generate_spark(spark, 30, 43, 2), wh,
                 graph_id="g2", link_entities=False)
    out = Q.query_graphs_by_user(
        wh.nodes.read(spark), wh.edges.read(spark), "user_001"
    ).collect()
    assert {r["graph_id"] for r in out} == {"g1", "g2"}
    for r in out:
        assert len(r["nodes"]) > 0


def test_entity_linking_canonicalizes_abbreviations(spark, tmp_path):
    """The OA template emits stem+kind abbreviations (华星科技) of full
    org names (华星科技公司) — linking must map both to one canonical id."""
    pages = generate_spark(spark, 200, partitions=4)
    wh = KGWarehouse(str(tmp_path))
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=True)
    nodes = wh.nodes.read(spark)
    assert "canonical_id" in nodes.columns
    merged = (
        nodes.groupBy("canonical_id")
        .agg(F.countDistinct("name").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert merged.count() > 0
    # canonical ids never conflate different stems
    bad = (
        nodes.filter(F.col("name") != F.col("canonical_id"))
        .filter(~F.col("name").startswith(F.substring(F.col("canonical_id"), 1, 2)))
    )
    assert bad.count() == 0


def test_node_degrees(spark):
    """node_degrees: per-node out/in/total over one graph, names
    joined, other graphs excluded."""
    from knowledge_graph_spark.operators.queries import node_degrees

    nodes = spark.createDataFrame(
        [("g1", "a", "A"), ("g1", "b", "B"), ("g1", "c", "C"),
         ("g2", "z", "Z")],
        ["graph_id", "id", "name"])
    edges = spark.createDataFrame(
        [("g1", "a", "b"), ("g1", "a", "c"), ("g1", "b", "a"),
         ("g2", "z", "z")],
        ["graph_id", "src", "dst"])
    out = {r["id"]: r for r in node_degrees(nodes, edges, "g1").collect()}
    assert set(out) == {"a", "b", "c"}
    assert (out["a"]["out_deg"], out["a"]["in_deg"], out["a"]["degree"]) == (2, 1, 3)
    assert (out["b"]["out_deg"], out["b"]["in_deg"]) == (1, 1)
    assert (out["c"]["out_deg"], out["c"]["in_deg"]) == (0, 1)
    assert out["a"]["name"] == "A"


def test_clear_graph_preserves_null_scoped_nodes(spark):
    """Cypher MATCH {graph_id: $gid} never binds NULL properties: nodes
    with graph_id / user_id NULL must survive a one-graph or one-user
    delete (a bare != filter drops them via three-valued logic)."""
    nodes = spark.createDataFrame(
        [("n1", "A", "g1", "u1"), ("n2", "B", None, None),
         ("n3", "C", "g2", "u2")],
        "id string, name string, graph_id string, user_id string")
    edges = spark.createDataFrame(
        [], "src string, dst string, graph_id string")
    kept_n, _ = Q.clear_graph_by_id(nodes, edges, "g1")
    assert {r["id"] for r in kept_n.collect()} == {"n2", "n3"}
    kept_u, _ = Q.clear_graphs_by_user(nodes, edges, "u1")
    assert {r["id"] for r in kept_u.collect()} == {"n2", "n3"}


def test_node_degrees_reports_isolated_nodes(spark):
    """Every node of the graph appears; isolated entities report
    degree 0 instead of vanishing from the census."""
    nodes = spark.createDataFrame(
        [("a", "A", "g"), ("b", "B", "g"), ("lonely", "L", "g")],
        "id string, name string, graph_id string")
    edges = spark.createDataFrame(
        [("a", "b", "g")], "src string, dst string, graph_id string")
    got = {r["id"]: (r["out_deg"], r["in_deg"], r["degree"])
           for r in Q.node_degrees(nodes, edges, "g").collect()}
    assert got == {"a": (1, 0, 1), "b": (0, 1, 1), "lonely": (0, 0, 0)}
