# -*- coding: utf-8 -*-
"""Update ("自动化...更新") and crash-resume semantics.

- re-crawl update: a page's content changes between runs; node rows
  update (reference MERGE..SET, kg_writer.py:24-25) while existing
  edge properties persist (ON CREATE SET, kg_writer.py:56-57)
- crash-resume: a failure after the (expensive) extraction stage must
  not re-run extraction on retry, and the final state must equal an
  uninterrupted run
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.operators import graph_build
from knowledge_graph_spark.pipeline import KGWarehouse, run_pipeline
from knowledge_graph_spark.sources.pages import generate_spark


def test_recrawl_updates_nodes_preserves_edge_props(spark, tmp_path):
    wh = KGWarehouse(str(tmp_path))
    pages_v1 = generate_spark(spark, 30, seed=42, partitions=2)
    run_pipeline(spark, pages_v1, wh, graph_id="g1", link_entities=False)
    edges_before = {
        (r["src"], r["dst"], r["rel_type"]): r["verb"]
        for r in wh.edges.read(spark).collect()
    }

    # re-crawl: same urls, content extended with one extra sentence
    # (held-out rows keep text NULL and re-derive from unchanged html)
    pages_v2 = pages_v1.withColumn(
        "text", F.concat("text", F.lit("九州网络公司支持华星科技公司。"))
    )
    run_pipeline(spark, pages_v2, wh, graph_id="g1",
                 link_entities=False, batch_suffix="recrawl")

    nodes = wh.nodes.read(spark)
    # nodes reflect the NEW content (update semantics): v2 entity names
    # present for ids that collide with v1 positions
    assert nodes.count() > 0
    # every pre-existing edge kept its original verb (ON CREATE only)
    edges_after = {
        (r["src"], r["dst"], r["rel_type"]): r["verb"]
        for r in wh.edges.read(spark).collect()
    }
    for k, verb in edges_before.items():
        if k in edges_after:
            assert edges_after[k] == verb


def test_recrawl_with_respelled_urls_updates_not_duplicates(spark, tmp_path):
    """canonicalize=True makes the canonical url the merge key: a
    re-crawl whose urls gained tracking params + case noise UPDATES
    each page (extracted-table row count unchanged, urls canonical)
    instead of doubling the corpus; without it the respelled batch
    would land as new rows."""
    wh = KGWarehouse(str(tmp_path))
    pages_v1 = generate_spark(spark, 20, seed=7, partitions=2)
    run_pipeline(spark, pages_v1, wh, graph_id="g1",
                 link_entities=False, canonicalize=True)
    n1 = wh.extracted.read(spark).count()
    assert n1 == 20

    # re-crawl: same resources, messier spellings (scheme/host case,
    # www. prefix, tracking params, fragment — NOT the path: paths are
    # case-sensitive and deliberately not normalized)
    pages_v2 = pages_v1.withColumn(
        "url",
        F.concat(F.regexp_replace("url", "^http://", "HTTP://WWW."),
                 F.lit("?utm_source=feed#top")))
    run_pipeline(spark, pages_v2, wh, graph_id="g1", link_entities=False,
                 batch_suffix="respelled", canonicalize=True)
    ext = wh.extracted.read(spark)
    assert ext.count() == 20  # updated, not duplicated
    # every stored url is canonical: no uppercase scheme, no utm, no #
    bad = ext.filter(
        F.col("url").rlike("[A-Z]") | F.col("url").contains("utm_")
        | F.col("url").contains("#")).count()
    assert bad == 0


def test_crash_after_extraction_resumes_without_reparse(spark, tmp_path, monkeypatch):
    wh = KGWarehouse(str(tmp_path))
    pages = generate_spark(spark, 30, partitions=2)

    # uninterrupted reference run in a second warehouse
    wh_ref = KGWarehouse(str(tmp_path / "ref"))
    run_pipeline(spark, pages, wh_ref, graph_id="g1", link_entities=False)

    # crash the first run inside materialization (after stage 1+2)
    real = graph_build.materialize_graph

    def boom(*a, **kw):
        raise RuntimeError("injected crash")

    monkeypatch.setattr(graph_build, "materialize_graph", boom)
    import knowledge_graph_spark.pipeline as P
    monkeypatch.setattr(P.graph_build, "materialize_graph", boom)
    with pytest.raises(RuntimeError):
        run_pipeline(spark, pages, wh, graph_id="g1", link_entities=False)
    monkeypatch.setattr(P.graph_build, "materialize_graph", real)

    # extraction was persisted before the crash
    assert f"g1/extracted" in wh.extracted.applied_batches()

    # resume: extraction stage must be skipped (batch already applied);
    # prove it by making extract() explode if called
    def no_extract(*a, **kw):
        raise AssertionError("extraction re-ran on resume")

    monkeypatch.setattr(P, "extract", no_extract)
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=False)

    # final state equals the uninterrupted run
    def snap(w):
        return (
            sorted(tuple(r) for r in w.nodes.read(spark)
                   .select("graph_id", "id", "name", "type").collect()),
            sorted(tuple(r) for r in w.edges.read(spark)
                   .select("graph_id", "src", "dst", "rel_type", "verb").collect()),
        )

    assert snap(wh) == snap(wh_ref)


def test_second_update_batch_with_linking_schema_stable(spark, tmp_path):
    """Round-1 regression: with link_entities=True the canonical stage
    used to ADD a canonical_id column, so the next batch's node merge
    crashed on schema mismatch. The node schema must now be identical
    across any number of update batches."""
    wh = KGWarehouse(str(tmp_path))
    pages = generate_spark(spark, 20, partitions=2)
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=True)
    cols1 = set(wh.nodes.read(spark).columns)
    # second batch into the SAME warehouse (re-crawl) — was AnalysisException
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=True,
                 batch_suffix="b2")
    # and a different graph too
    run_pipeline(spark, pages, wh, graph_id="g2", link_entities=True)
    assert set(wh.nodes.read(spark).columns) == cols1
    assert "canonical_id" in cols1
    # canonical_id is populated everywhere (default = name)
    assert wh.nodes.read(spark).filter("canonical_id IS NULL").count() == 0


def test_update_batch_rewrites_only_touched_partitions(spark, tmp_path):
    """The triples refresh of graph g1 must not rewrite graph g2's
    partitions (VERDICT r1 #3: O(batch) commits, not O(table))."""
    wh = KGWarehouse(str(tmp_path))
    run_pipeline(spark, generate_spark(spark, 20, partitions=2), wh,
                 graph_id="g1", link_entities=False)
    run_pipeline(spark, generate_spark(spark, 20, 43, partitions=2), wh,
                 graph_id="g2", link_entities=False)
    g1_dirs = {
        k: list(v)
        for k, v in wh.triples.current_entry()["partition_dirs"].items()
        if k.startswith("g1|")
    }
    # update batch over g2 only
    run_pipeline(spark, generate_spark(spark, 20, 43, partitions=2), wh,
                 graph_id="g2", link_entities=False, batch_suffix="r2")
    e = wh.triples.current_entry()
    for k, paths in g1_dirs.items():
        assert e["partition_dirs"][k] == paths  # carried by reference


def test_second_graph_scopes_to_its_own_pages(spark, tmp_path):
    """A second graph built into the SAME warehouse must contain only
    its own pages — the shared extracted table is url-keyed storage,
    not graph membership (round-3 graph scoping)."""
    wh = KGWarehouse(str(tmp_path))
    pages_a = generate_spark(spark, 20, partitions=2)
    run_pipeline(spark, pages_a, wh, graph_id="gA", link_entities=False)
    pages_b = generate_spark(spark, 10, partitions=1, start=20)
    counters_b = run_pipeline(spark, pages_b, wh, graph_id="gB", user_id="u2",
                              link_entities=False)
    # the pages counter reports THIS graph's pages, not the shared table
    assert counters_b["pages"] == 10
    urls_a = {r[0] for r in pages_a.select("url").distinct().collect()}
    urls_b = {r[0] for r in pages_b.select("url").distinct().collect()}
    trips = wh.triples.read(spark)
    got_b = {r[0] for r in trips.filter("graph_id = 'gB'")
             .select("url").distinct().collect()}
    assert got_b and got_b <= urls_b  # no graph-A pages leaked into B
    got_a = {r[0] for r in trips.filter("graph_id = 'gA'")
             .select("url").distinct().collect()}
    assert got_a and got_a <= urls_a
    nodes_b_urls = {r[0] for r in wh.nodes.read(spark)
                    .filter("graph_id = 'gB'").select("url")
                    .distinct().collect()}
    assert nodes_b_urls <= urls_b


# ---------------------------------------------------------------------------
# round-5 KG-core review regressions
# ---------------------------------------------------------------------------


def test_update_batch_does_not_duplicate_dropped_relations(spark, tmp_path):
    """Stage 3 re-derives quarantined relations from the graph's FULL
    extraction on every batch; the dropped table must hold ONE copy
    (partition overwrite), not an append per batch (r5 review
    finding: every update batch doubled the quarantine)."""
    wh = KGWarehouse(str(tmp_path))
    pages = generate_spark(spark, 40, partitions=2)
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=False)
    first = wh.dropped.read(spark).count()
    # idempotent update batch over the same pages
    run_pipeline(spark, pages, wh, graph_id="g1", link_entities=False,
                 batch_suffix="r2")
    assert wh.dropped.read(spark).count() == first


def test_materialize_resume_totals_survive_skip(spark, tmp_path):
    wh = KGWarehouse(str(tmp_path))
    pages = generate_spark(spark, 30, partitions=2)
    c1 = run_pipeline(spark, pages, wh, graph_id="g1",
                      link_entities=False)
    # identical re-run: all commits skip, totals must NOT collapse to 0
    c2 = run_pipeline(spark, pages, wh, graph_id="g1",
                      link_entities=False)
    assert c2["nodes_total"] == c1["nodes_total"] > 0
    assert c2["edges_total"] == c1["edges_total"] > 0


def test_rowlocal_null_entities_quarantined_not_lost(spark):
    from knowledge_graph_spark.operators.graph_build import (
        build_edges_rowlocal)

    extracted = spark.createDataFrame(
        [("u1", None,
          [{"source": "e1", "target": "e2", "type": "ACQUIRE",
            "verb": "买", "similarity": 0.5}])],
        "url string, "
        "entities array<struct<id:string,name:string,type:string>>, "
        "relations array<struct<source:string,target:string,"
        "type:string,verb:string,similarity:double>>")
    edges, dropped = build_edges_rowlocal(extracted, "g", "u")
    assert edges.count() == 0
    d = dropped.collect()
    assert len(d) == 1 and d[0]["reason"] == "missing_endpoint"


def test_user_graph_links_survive_cross_user_update(spark, tmp_path):
    """Edges keep the FIRST writer's user_id (ON CREATE); Q4 must
    list a graph's links by graph membership, not the edge rows'
    user_id (r5 review finding: links vanished for every user)."""
    from knowledge_graph_spark.operators.queries import (
        query_graphs_by_user)

    wh = KGWarehouse(str(tmp_path))
    pages = generate_spark(spark, 40, partitions=2)
    run_pipeline(spark, pages, wh, graph_id="g1", user_id="userB",
                 link_entities=False)
    run_pipeline(spark, pages, wh, graph_id="g1", user_id="userA",
                 link_entities=False, batch_suffix="r2")
    nodes, edges = wh.nodes.read(spark), wh.edges.read(spark)
    row = query_graphs_by_user(nodes, edges, "userA").collect()[0]
    assert len(row["links"]) > 0


def test_detach_keeps_null_graph_edges_of_surviving_nodes(spark):
    from knowledge_graph_spark.operators.queries import clear_all_graphs

    nodes = spark.createDataFrame(
        [(None, "n1", "a"), (None, "n2", "b"), ("g1", "n3", "c")],
        "graph_id string, id string, name string")
    edges = spark.createDataFrame(
        [(None, "n1", "n2", "REL"), ("g1", "n3", "n1", "REL")],
        "graph_id string, src string, dst string, rel_type string")
    kept_nodes, kept_edges = clear_all_graphs(nodes, edges)
    rows = kept_edges.collect()
    # the NULL-graph edge between surviving NULL-graph nodes lives;
    # the g1 edge dies with its graph
    assert len(rows) == 1
    assert (rows[0]["src"], rows[0]["dst"]) == ("n1", "n2")
