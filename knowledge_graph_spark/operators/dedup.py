# -*- coding: utf-8 -*-
"""Document deduplication operators for the training-data pipeline.

Not present in the reference (it has no corpus-hygiene stage); these are
the operators a 100 TB web corpus needs before KG extraction, built
entirely from JVM-side DataFrame primitives (no Python in the hot path
except where sketching genuinely needs it — and then Arrow-vectorized).

Operators:
- :func:`exact_duplicates`      — hash-groupBy on full text
- :func:`minhash_lsh_pairs`     — shingle -> minhash -> band -> bucket join
- :func:`simhash`               — 64-bit SimHash per document (JVM-side)
- :func:`simhash_near_duplicates` — Hamming-distance pairs via band blocking
- :func:`ngram_jaccard_pairs`   — exact n-gram Jaccard on candidate pairs
- :func:`embedding_near_duplicates` — cosine near-dup over vector column

Scale notes (the whole point):
- every operator dedupes on *content hashes*, so the shuffles move
  64-bit keys, not document bodies; full texts are only re-joined when
  a caller asks for survivors.
- LSH band keys are 64-bit hashes -> band self-joins are equi joins on
  longs; oversized buckets (boilerplate-identical shingle sets) are
  dropped by a skew guard before the join can go quadratic.
- SimHash blocking splits the 64-bit fingerprint into 4 x 16-bit bands:
  any pair within Hamming distance 3 shares at least one exact band
  (pigeonhole), so candidate generation is again an equi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import word_ngrams

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_dups, keep_id,
    dup_ids). ``keep_id`` = min id (deterministic survivor)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.sha2(F.col(text_col), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keep_id"),
            F.sort_array(F.collect_list("doc_id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Survivor set after exact dedup: the min-id row per content hash.
    One shuffle on a 256-bit hash — never on document bodies."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# shingling (shared by minhash / jaccard)
# ---------------------------------------------------------------------------


def shingle_table(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded distinct word-n-gram shingles
    (JVM-side lambda expressions, functions/vectors.py)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("shingle"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 16) -> DataFrame:
    """K minhashes per doc in ONE hash-aggregate:
    mh_k = min over shingles of xxhash64(shingle, k). K seeded xxhash64
    columns approximate K independent permutations; all JVM-side."""
    sh = shingle_table(docs, id_col, text_col, n)
    aggs = [F.min(F.xxhash64("shingle", F.lit(k))).alias(f"mh{k}")
            for k in range(num_hashes)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 16, bands: int = 8,
                      max_bucket: int = 256) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded LSH.

    bands=8, rows=2 over 16 hashes: P(candidate | Jaccard s) =
    1-(1-s^2)^8 — 0.96 at s=0.6, 0.04 at s=0.07. Buckets larger than
    ``max_bucket`` (boilerplate clusters) are dropped before the
    self-join — the standard quadratic-blowup guard; recall loss is
    confined to blocks that are already ambiguous."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, n, num_hashes)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias("h"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.h").alias("h"))

    w = Window.partitionBy("band", "h")
    banded = (
        banded.withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["band", "h"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification over candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """Exact Jaccard over word-n-gram sets for given (id_a, id_b) pairs.

    Set-based: |A∩B| via a groupBy over the shingle join; |A|,|B| from a
    pre-aggregated size table. No quadratic work, no Python."""
    sh = shingle_table(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))

    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    za = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(za, "id_a").join(zb, "id_b")
        .select(
            "id_a", "id_b",
            (F.coalesce("inter", F.lit(0))
             / (F.col("sz_a") + F.col("sz_b") - F.coalesce("inter", F.lit(0)))
             ).alias("jaccard"),
        )
    )


def dedup_minhash(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  threshold: float = 0.7) -> DataFrame:
    """Near-dup survivor set: LSH candidates -> exact Jaccard >= threshold
    -> connected components -> keep min id per component."""
    from .components import connected_components

    cands = minhash_lsh_pairs(docs, id_col, text_col, n)
    dup_pairs = ngram_jaccard_pairs(docs, cands, id_col, text_col, n).filter(
        F.col("jaccard") >= threshold
    )
    comp = connected_components(
        dup_pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    )
    # survivors: docs that are their own component representative
    losers = (
        comp.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


# 4 x 16-bit lanes per long: bit b's mask selects original bits
# b, b+16, b+32, b+48 into lanes 0..3 of the summed accumulator
_LANE_MASK = 0x0001000100010001


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", n: int = 2) -> DataFrame:
    """64-bit SimHash per document, entirely JVM-side.

    Classic SimHash: for each of 64 bit positions, the +1/-1 votes of
    every shingle's xxhash64 bit; fingerprint bit = sign. Computed with
    SIMD-in-a-register lane packing: ``(h >> b) & 0x0001000100010001``
    accumulates FOUR bit-counters per sum (16-bit lanes), so the
    aggregate needs 16 lane-sums + 1 count instead of 64 conditional
    sums — 4x fewer aggregation buffers per group, same result
    (``ones*2 > n`` ⟺ vote sum > 0). Lane capacity 65535 distinct
    shingles per doc; beyond that (a document with >65k distinct word
    bigrams — ~entire-vocabulary² scale) carries would corrupt lanes.
    Map-side partial aggregation keeps the shuffle tiny."""
    sh = shingle_table(docs, id_col, text_col, n).withColumn(
        "h", F.xxhash64("shingle")
    )
    aggs = [
        F.sum(F.expr(f"(h >> {b}) & {_LANE_MASK}")).alias(f"l{b}")
        for b in range(16)
    ] + [F.count("*").alias("n")]
    lanes = sh.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for bit in range(64):
        b, k = bit % 16, bit // 16
        ones = F.expr(f"(l{b} >> {16 * k}) & 65535")
        add = 2 ** bit if bit < 63 else -(2 ** 63)
        fp = fp + F.when(ones * 2 > F.col("n"),
                         F.lit(add).cast("long")).otherwise(F.lit(0).cast("long"))
    return lanes.select("doc_id", fp.alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", n: int = 2,
                            max_hamming: int = 3) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of 64-bit SimHash.

    Blocking: split the fingerprint into 4 x 16-bit bands; any pair at
    distance <= 3 agrees on >= 1 band exactly (pigeonhole), so the
    candidate join is an equi join on (band, 16 bits). Hamming distance
    verified with bit_count(xor) — one JVM expression."""
    fps = simhash(docs, id_col, text_col, n)
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.expr(f"(simhash >> {16 * b}) & 65535").alias("bits"))
        for b in range(4)
    ]
    banded = fps.select(
        "doc_id", "simhash", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", "simhash",
             F.col("bk.band").alias("band"), F.col("bk.bits").alias("bits"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["band", "bits"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_duplicates(embeddings: DataFrame, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              threshold: float = 0.95,
                              n_planes: int = 8) -> DataFrame:
    """Vector near-duplicates: cosine >= threshold, blocked by
    random-hyperplane LSH (sign of dot with ``n_planes`` seeded
    pseudo-random planes -> one band key; near-identical vectors
    collide with high probability).

    The plane test avoids materializing plane vectors: component j of
    plane p uses the deterministic hash xxhash64(p, j) scaled to [-1,1].
    Dot products via ``aggregate`` over zipped arrays — JVM-side."""
    dim_expr = f"size({vec_col})"
    sign_bits = []
    for p in range(n_planes):
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, sequence(0, {dim_expr}-1), "
            f"(x, j) -> x * (cast(xxhash64({p}, j) as double) / 9.223372036854776e18)), "
            f"cast(0.0 as double), (acc, y) -> acc + y)"
        )
        sign_bits.append(F.when(dot >= 0, 2 ** p).otherwise(0))
    key = sign_bits[0]
    for sb in sign_bits[1:]:
        key = key + sb

    from ..functions.vectors import dot, norm

    v = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
        key.alias("bucket"), norm(vec_col).alias("norm"),
    )
    a, b = v.alias("a"), v.alias("b")
    cos = dot("a.vec", "b.vec") / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(b, on=F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"),
                cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
