# -*- coding: utf-8 -*-
"""spark-submit entrypoint for the KG construction pipeline.

Cluster usage (north_rule: "run via spark-submit --py-files on a
multi-executor cluster"):

    zip -r kgs.zip knowledge_graph_spark
    spark-submit --py-files kgs.zip jobs/run_kg_pipeline.py \\
        --pages /data/pages --warehouse /data/kg_warehouse \\
        --graph-id graph_20260817 [--batch-suffix recrawl1] \\
        [--partitions 4096] [--no-linking] [--synthetic N]

Local sandbox usage (no cluster; the session factory picks local[*]):

    python jobs/run_kg_pipeline.py --synthetic 10000 \\
        --warehouse /tmp/kg_wh --graph-id g1

The job is idempotent per (graph-id, batch-suffix): re-submitting
after a crash resumes from the last committed stage (LakeTable batch
ids), and the final counters — including per-stage wall seconds and
per-partition lineage — are printed as one JSON line and persisted in
each table's manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="path to the pages table (parquet)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of --pages")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--graph-id", default=None)
    ap.add_argument("--batch-suffix", default=None)
    ap.add_argument("--user-id", default="user_001")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-linking", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from knowledge_graph_spark.pipeline import KGWarehouse, run_pipeline
    from knowledge_graph_spark.session import get_spark

    # under spark-submit an active session exists; standalone we build one
    spark = SparkSession.getActiveSession() or get_spark(app="kg-pipeline")

    if args.synthetic:
        from knowledge_graph_spark.sources.pages import generate_spark

        pages = generate_spark(spark, args.synthetic,
                               partitions=args.partitions)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("one of --pages / --synthetic is required")

    wh = KGWarehouse(args.warehouse)
    counters = run_pipeline(
        spark, pages, wh,
        graph_id=args.graph_id,
        user_id=args.user_id,
        partitions=args.partitions,
        link_entities=not args.no_linking,
        batch_suffix=args.batch_suffix,
    )
    print(json.dumps(counters, ensure_ascii=False))


if __name__ == "__main__":
    main()
