# -*- coding: utf-8 -*-
"""Association mining over (basket, item) streams.

Frequent-itemset counting (Agrawal, Imieliński, Swami, SIGMOD 1993;
the 2-itemset core every market-basket / co-occurrence pipeline
ships) re-expressed relationally: the support / confidence / lift
ingredients for item pairs, with the quadratic pair generation kept
inside per-basket aggregations behind a basket-size guard.

Not in the reference; semantics from the cited public paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frequent_item_pairs(baskets: DataFrame,
                        basket_col: str = "basket",
                        item_col: str = "item",
                        min_support: int = 2,
                        max_basket: int = 256) -> DataFrame:
    """Frequent 2-itemsets with the Agrawal-style rule ingredients:
    one row per unordered item pair co-occurring in ``>=
    min_support`` baskets —

    - ``pair_count``        — baskets containing BOTH items
    - ``count_a``/``count_b`` — baskets containing each item
    - ``n_baskets``         — total distinct baskets

    Support, confidence (both directions) and lift are row-local
    divisions of these integers.

    Scale shape: (basket, item) folds to distinct; pairs are
    generated IN-AGGREGATE per basket (sorted collect + triangular
    slice — one shuffle, no self-join) with baskets above
    ``max_basket`` items dropped whole BEFORE the collect (the
    degenerate-basket guard; a crawl session touching 10^5 items is
    evidence of nothing and would go quadratic); per-item supports
    and the basket census ride the same distinct fold. The basket
    census is a one-row in-plan broadcast (crossJoin), never a
    collected literal.
    """
    bi = (baskets.select(F.col(basket_col).alias("b"),
                         F.col(item_col).alias("i"))
          .filter(F.col("b").isNotNull() & F.col("i").isNotNull())
          .distinct()
          .localCheckpoint(eager=True))  # pairs + supports + census

    # EVERY statistic censuses the same guarded universe: an
    # oversized basket is dropped from supports and the basket count
    # too, not just from pairing — otherwise conf(a->b) =
    # pair_count/count_a mixes a guarded numerator with an unguarded
    # denominator and deflates every rule touching the dropped
    # basket's items. Singleton baskets DO count toward supports
    # (they carry real item evidence; they just generate no pairs).
    from pyspark.sql import Window
    w = Window.partitionBy("b")
    guarded = (bi.withColumn("_n", F.count("*").over(w))
               .filter(F.col("_n") <= int(max_basket))
               .localCheckpoint(eager=True))
    supports = (guarded.groupBy("i")
                .agg(F.count("*").cast("long").alias("n")))
    census = guarded.agg(
        F.countDistinct("b").cast("long").alias("n_baskets"))
    sized = guarded.filter(F.col("_n") >= 2).drop("_n")
    grouped = sized.groupBy("b").agg(
        F.sort_array(F.collect_list("i")).alias("_is"))
    pairs = F.flatten(
        F.transform(
            "_is",
            lambda x, i: F.transform(
                F.slice("_is", i + F.lit(2), F.size("_is")),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    co = (grouped.select(F.explode(pairs).alias("p"))
          .groupBy(F.col("p.pa").alias("item_a"),
                   F.col("p.pb").alias("item_b"))
          .agg(F.count("*").cast("long").alias("pair_count"))
          .filter(F.col("pair_count") >= int(min_support)))
    sa = supports.select(F.col("i").alias("item_a"),
                         F.col("n").alias("count_a"))
    sb = supports.select(F.col("i").alias("item_b"),
                         F.col("n").alias("count_b"))
    return (co.join(sa, "item_a").join(sb, "item_b")
            .crossJoin(census)
            .select("item_a", "item_b", "pair_count", "count_a",
                    "count_b", "n_baskets"))
