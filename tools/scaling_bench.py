# -*- coding: utf-8 -*-
"""Scaling-efficiency evidence: the same job at N and 4N cores.

Measures the KG text->triples job (the throughput-critical path: html
recovery + NER + SVO extraction + triple materialization) over an
identical 1M-page corpus at ``local[N]`` and ``local[4N]``, several
repetitions each, and reports throughput + scaling efficiency
``eff = T_N / (4 * T_4N)`` (equivalently ``tput_4N / (4 * tput_N)``).

Methodology notes (recorded in BENCH/BASELINE.md):
- N=4 vs 4N=16 by default: the sandbox host has exactly 32 cores, and a
  ``local[32]`` run oversubscribes it (32 task threads + 32 Arrow
  python workers + JVM service threads), which would measure host
  contention, not the engine's scaling. At 4 vs 16 threads both levels
  run unconstrained — the honest analogue of a 2-node vs 8-node
  cluster where executors have dedicated cores.
- best-of-R per level: the sandbox VM shows multi-second noise from
  neighbors (observed steal up to 13%); min is the standard
  noise-robust estimator for throughput.
- per-page work is identical at both levels (same input parquet, same
  partition COUNT per core so task granularity matches).

Usage: python tools/scaling_bench.py [N] [pages] [reps]
Writes one JSON line, e.g.
  {"n_cores": 4, "pages": 1000000, "t_n": ..., "t_4n": ...,
   "tput_n": ..., "tput_4n": ..., "efficiency": 0.9}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_level(corpus: str, cores: int, reps: int) -> float:
    from knowledge_graph_spark.operators.extraction import extract, triples_table
    from knowledge_graph_spark.session import get_spark

    spark = get_spark(app=f"scaling-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    pages = spark.read.parquet(corpus)
    out = tempfile.mkdtemp(prefix=f"scale_out_{cores}_")
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        ex = extract(pages, partitions=cores)  # one partition per core
        triples_table(ex).write.mode("overwrite").parquet(f"{out}/triples")
        best = min(best, time.time() - t0)
    n_triples = spark.read.parquet(f"{out}/triples").count()
    spark.stop()
    return best, n_triples


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.sources.pages import generate_spark

    corpus = os.path.join(tempfile.gettempdir(), f"scale_corpus_{pages}")
    if not os.path.exists(corpus):
        spark = get_spark(app="scaling-gen", master="local[32]")
        generate_spark(spark, pages, partitions=256).write.parquet(corpus)
        spark.stop()

    t_n, triples = run_level(corpus, n, reps)
    t_4n, _ = run_level(corpus, 4 * n, reps)
    out = {
        "job": "pages->triples (extract + materialize triples)",
        "pages": pages,
        "triples": triples,
        "n_cores": n,
        "t_n_sec": round(t_n, 1),
        "t_4n_sec": round(t_4n, 1),
        "tput_n_pages_s": round(pages / t_n, 1),
        "tput_4n_pages_s": round(pages / t_4n, 1),
        "tput_n_triples_s": round(triples / t_n, 1),
        "tput_4n_triples_s": round(triples / t_4n, 1),
        "efficiency": round(t_n / (4 * t_4n), 3),
        "reps": reps,
        "estimator": "best-of-reps",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
