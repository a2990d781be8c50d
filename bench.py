# -*- coding: utf-8 -*-
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` = total wall seconds across the headline queries. The
per-query dict includes the KG pipeline end-to-end (the north-star
triples/sec path, also reported as ``triples_per_sec``) plus the
relational/training-data headliners.

Scaling evidence (north_rule: efficiency >= 0.8 from N to 4N):
  SPARK_GRAFT_CPUS=8 python bench.py   # N
  SPARK_GRAFT_CPUS=32 python bench.py  # 4N
See BENCH/BASELINE.md for recorded numbers.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# KG corpus size is fixed per bench run (not per sf) so throughput is
# comparable across parallelism levels; large enough that per-page work
# dominates the pipeline's fixed orchestration cost
KG_PAGES = int(os.environ.get("SPARK_GRAFT_KG_PAGES", "100000"))
# optional scale-trend row: re-run the FULL pipeline at this page count
# (e.g. 1000000 = the 10x row recorded in BENCH/BASELINE.md §1) and
# attach it to the JSON as "scale_row", so round-over-round scale
# regressions stay visible. 0 = off (the driver's per-round run).
SCALE_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "0"))


def main():
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from knowledge_graph_spark.pipeline import KGWarehouse, run_pipeline
    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.sources.pages import generate_spark

    spark = get_spark(app="kg-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    # ---- KG pipeline end-to-end (the north-star metric) ---------------
    # the input table is materialized first, untimed: in production the
    # corpus already exists as an Iceberg table — generating synthetic
    # pages is bench scaffolding, not pipeline work
    tmp = tempfile.mkdtemp(prefix="kg_bench_")
    generate_spark(spark, KG_PAGES, partitions=CPUS * 2).write.parquet(
        f"{tmp}/pages"
    )
    pages = spark.read.parquet(f"{tmp}/pages")

    # untimed JIT warm-up on a 2k-page corpus: a cold JVM measures
    # C2-compilation of the codegen'd stages, not the engine — observed
    # cold-vs-warm spread on this path is 33 s vs 19 s for the SAME
    # work (see BENCH/BASELINE.md §1). Production pipelines run warm;
    # excluding a warm-up rep is standard throughput methodology.
    run_pipeline(spark, generate_spark(spark, 2000, partitions=CPUS),
                 KGWarehouse(f"{tmp}/wh_warm"), graph_id="warmup",
                 partitions=CPUS, link_entities=True)

    t0 = time.time()
    wh = KGWarehouse(f"{tmp}/wh")
    # one extraction partition per core: measured sweet spot — smaller
    # tasks pay per-task Arrow stream setup without amortizing it
    counters = run_pipeline(spark, pages, wh, graph_id="graph_bench",
                            partitions=CPUS, link_entities=True)
    kg_wall = time.time() - t0
    n_triples = wh.triples.read(spark).count()
    timings["kg_pipeline"] = round(kg_wall, 3)
    kg_stages = counters.get("stage_seconds", {})

    # ---- headline relational / training-data queries ------------------
    headliners = [
        "pricing_summary", "nation_revenue", "top_parts_per_brand",
        "events_daily", "order_priority_semi",
        "dedup_exact_survivors", "dedup_best_survivors",
        "minhash_pairs", "simhash_neardups",
        "token_counts", "language_id", "quality_scores",
        "repetition_stats", "cross_dup", "corpus_profile",
        "pii_scrub", "curate_corpus",
        "decontamination", "mixture_sample", "hash_split",
        "pack_sequences", "doc_chunks", "bm25_search",
        "tfidf_terms", "bpe_pairs", "dsir_weights", "partsupp_bfs",
        "partsupp_sssp", "span_dedup", "event_retention",
        "partsupp_walks", "hard_negatives",
        "embedding_topk", "embedding_neardups",
        "lm_perplexity", "nb_predictions", "bpe_encoded",
        "event_anomalies", "stratified_k",
        "pq_topk", "kmv_distinct", "kmv_overlap", "cms_freq",
        "hll_distinct", "bloom_members", "fuzzy_part_names",
        "semantic_dedup",
        "url_canonical", "url_dup_groups", "weighted_sample",
        "dd_quantiles", "text_normalized", "textrank_keywords", "doc_links",
        "ngram_novelty", "containment", "boilerplate_strip",
        "span_corruption", "robots_filter", "crawl_frontier",
        "ccnet_buckets", "dup_spans", "winnow_census", "phrase_search",
        "incr_dedup", "source_overlap", "redirects", "lang_consistency",
        "gopher_rules", "c4_filters", "anchor_texts", "jsonld_entities",
        "entity_linking", "web_tables", "script_profiles",
        "repetition_plan", "hearst_isa", "main_content",
        "triple_fusion", "postings", "lp_eval", "snapshot_diff",
        "scd2_status", "readability", "corpus_report", "quotes",
        "distant_ner", "acronyms", "doc_dates",
        "entity_salience", "infobox_triples", "reciprocal_links",
        "microdata_entities", "ntriples_export",
        "coref_pronouns", "bootstrap_relations",
        "quantities", "comparative_edges", "coordination_pairs",
        "polarity_triples", "type_checked_triples",
        "truth_discovery", "amie_rules", "char_sets", "dirt_paths",
        "predicate_canon", "er_eval", "kb_diff", "blocking_eval",
        "pathsim", "set_expansion", "seeded_hosts", "basket_pairs",
        "rule_inferences", "predicate_profile", "kg_motif",
        "degree_powerlaw", "entity_cards", "qa_pairs",
        "term_powerlaw", "entity_alignment", "kg_snapshot",
        "wl_roles", "host_spam_mass", "golden_record",
        "rake_keywords", "mirror_hosts",
        "landmark_dists", "landmark_est", "fd_census", "fk_census",
        "texttiling", "column_census", "event_changepoints",
        "event_trends", "warc_records", "assortativity",
        "heaps_census", "term_dispersion",
        "closeness_census", "graph_stress", "fs_linkage", "snm_pairs",
        "host_salsa", "ds_labels", "rich_club",
        "yule_census", "distinct_terms", "bcubed_eval",
        "zorder_layout", "allen_census", "supply_matching",
        "kn_counts",
        "trade_katz", "dyad_census", "conductance", "good_turing",
        "allpairs_sim", "supply_coreness", "triad_census",
        "event_bursts", "supply_msf", "sales_cube", "events_rolling",
        "coreset_centers", "snn_clusters", "ann_agreement",
        "nb_confusion", "temporal_conflicts", "token_gini",
        "robots_wildcards", "stylometry", "ql_search",
        "lexrank_summaries", "opic_priorities",
        "stream_windowed_counts", "stream_dedup_replay",
    ]
    qs = entrymod.queries()
    for name in headliners:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "kg_construction_and_headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
        "kg_pages": KG_PAGES,
        "kg_stages": kg_stages,
        "kg_triples": n_triples,
        "triples_per_sec": round(n_triples / kg_wall, 1),
        "pages_per_sec": round(KG_PAGES / kg_wall, 1),
    }

    # ---- optional 10x scale-trend row ---------------------------------
    if SCALE_PAGES:
        generate_spark(spark, SCALE_PAGES, partitions=CPUS * 4).write \
            .parquet(f"{tmp}/pages_scale")
        big = spark.read.parquet(f"{tmp}/pages_scale")
        t0 = time.time()
        whb = KGWarehouse(f"{tmp}/wh_scale")
        run_pipeline(spark, big, whb, graph_id="graph_scale",
                     partitions=CPUS, link_entities=True)
        scale_wall = time.time() - t0
        nt = whb.triples.read(spark).count()
        out["scale_row"] = {
            "pages": SCALE_PAGES,
            "wall_s": round(scale_wall, 3),
            "triples": nt,
            "pages_per_sec": round(SCALE_PAGES / scale_wall, 1),
            "triples_per_sec": round(nt / scale_wall, 1),
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
