# -*- coding: utf-8 -*-
"""Scaling-efficiency evidence for the web-mining operator family.

Same methodology as tools/scaling_bench.py (N vs 4N cores, identical
input, best-of-R, eff = T_N / (4 * T_4N)), applied to a composite
web-mining job over a generated multi-line page corpus: Gopher rule
flags + C4 line filters + Hearst is-a census + wikilink anchor
inversion, all consumed by value aggregates so Catalyst cannot prune
the work. The corpus is written to parquet ONCE and read identically
at both levels, so the measured quantity is the operator path, not
synthesis.

Usage: python tools/scaling_webmine.py [N] [pages] [reps]
Writes one JSON line:
  {"n_cores": N, "pages": P, "t_n": ..., "t_4n": ...,
   "tput_n": ..., "tput_4n": ..., "efficiency": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = ("the quick brown fox jumps over lazy dog and that have with "
         "data table row scan merge sort hash join filter spark value "
         "key part batch line window graph node edge token corpus page "
         "crawl index query plan store shard block chunk frame link "
         "such other including especially systems metrics").split()


def synthesize(pages: int) -> str:
    from pyspark.sql import functions as F

    from knowledge_graph_spark.session import get_spark

    spark = get_spark(app="webmine-synth", master="local[16]",
                      shuffle_partitions=16)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.expr(
        f"array_join(transform(sequence(1, 60), i -> "
        f"element_at(vv, cast(pmod(xxhash64(doc_id * 64 + i), "
        f"{len(VOCAB)}) + 1 AS int))), ' ')")
    out = tempfile.mkdtemp(prefix="webmine_corpus_")
    (
        spark.range(pages).select(F.col("id").alias("doc_id"))
        .withColumn("vv", vocab)
        .select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.lit("[[Home]] [[About]] [[Contact]] [[Login]] "
                      "[[Search]]"),
                F.concat(words, F.lit(".")),
                F.concat(F.lit("see [[node_"),
                         (F.col("doc_id") % 1000).cast("string"),
                         F.lit("|alias "),
                         (F.col("doc_id") % 7).cast("string"),
                         F.lit(" term]]")),
                words,
            ).alias("text"),
        )
        .repartition(64)
        .write.mode("overwrite").parquet(out)
    )
    spark.stop()
    return out


def run_level(corpus: str, cores: int, reps: int) -> float:
    from pyspark.sql import functions as F

    from knowledge_graph_spark.operators.cleaning import c4_line_filter
    from knowledge_graph_spark.operators.patterns import hyponym_census
    from knowledge_graph_spark.operators.textstats import gopher_rules
    from knowledge_graph_spark.operators.wikilinks import (
        anchor_summary, extract_wikilinks)

    from knowledge_graph_spark.session import get_spark

    spark = get_spark(app=f"webmine-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    pages = spark.read.parquet(corpus)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        a = gopher_rules(pages).agg(
            F.sum(F.col("n_words")
                  + F.col("pass_gopher").cast("long"))).first()[0]
        b = c4_line_filter(pages).agg(
            F.sum(F.col("n_kept") + F.length("clean_text"))).first()[0]
        c = hyponym_census(pages).agg(F.sum("n_mentions")).first()[0]
        d = anchor_summary(extract_wikilinks(pages), k=5).agg(
            F.sum("n_inlinks")).first()[0]
        best = min(best, time.time() - t0)
        assert a and b and c and d
    spark.stop()
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    corpus = synthesize(pages)
    try:
        t_n = run_level(corpus, n, reps)
        t_4n = run_level(corpus, 4 * n, reps)
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
    print(json.dumps({
        "n_cores": n, "pages": pages, "t_n": round(t_n, 2),
        "t_4n": round(t_4n, 2),
        "tput_n": round(pages / t_n), "tput_4n": round(pages / t_4n),
        "efficiency": round(t_n / (4 * t_4n), 3),
    }))


if __name__ == "__main__":
    main()
