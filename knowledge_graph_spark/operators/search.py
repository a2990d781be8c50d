# -*- coding: utf-8 -*-
"""Ranked full-text retrieval over the document corpus: BM25.

The reference's search surface is a substring scan over node names
(kg_writer.py:243-251 — covered by ``queries.search_entities_by_
keyword``). A corpus engine also needs ranked DOCUMENT retrieval —
finding the pages most about a topic (for curation audits, eval-set
mining, context retrieval). BM25 (Robertson-Sparck Jones; the
Okapi formula as published in TREC-3) is the standard lexical
baseline.

Scale shape:
- the query-term filter lands directly on the exploded token stream,
  so only postings of the query's terms ever reach an exchange — the
  shuffled volume is O(docs containing a query term), not O(corpus
  tokens);
- document-frequency and corpus stats (N, avgdl) are tiny aggregates
  broadcast back into the plan (per-term df has |query| rows; N/avgdl
  is one row) — no driver-side collect;
- everything is JVM codegen (split/explode/agg); no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vectors import word_tokens


def bm25_search(docs: DataFrame, terms: list[str], k1: float = 1.2,
                b: float = 0.75, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Score every document containing at least one of ``terms``.

    Returns ``(doc_id, score)`` with the Okapi BM25 score (idf variant
    ``ln((N - df + 0.5)/(df + 0.5) + 1)``, always positive).
    Tokenization = :func:`word_tokens` (lowercased, split on
    non-letter/digit runs) — the same definition the dedup shingles
    use; query ``terms`` pass through the same case fold, so
    'Spark' finds documents containing 'spark'."""
    terms = [str(t).lower() for t in terms]
    base = (
        docs.select(F.col(id_col).alias("doc_id"),
                    word_tokens(text_col).alias("_toks"))
        .select("doc_id", F.size("_toks").alias("dl"),
                F.explode("_toks").alias("term"))
    )
    # localCheckpoint: tf feeds the df aggregate AND the final join,
    # and each reference would otherwise re-run the full corpus
    # tokenize+explode (the ql_search pattern, applied here too)
    tf = (
        base.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfs = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))
    stats = docs.select(
        F.size(word_tokens(text_col)).alias("_dl")
    ).agg(F.count("*").alias("n_docs"), F.avg("_dl").alias("avgdl"))

    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text",
                    min_doc_len: int = 1) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the classic keyword /
    topic-signature extraction over a corpus (Salton & Buckley 1988;
    smooth idf ``ln((1 + N) / (1 + df)) + 1`` as popularized by
    scikit-learn, always positive so rare-everywhere corpora still
    rank). Returns ``(doc_id, rank, term, tfidf)``, rank 1..k, ties
    broken by term ascending so the result is deterministic.

    Scale shape:
    - term frequencies are one explode + groupBy ``(doc_id, term)``
      with map-side combine;
    - document frequency is a second aggregate keyed by ``term``
      (vocabulary-sized) joined back BROADCAST — no corpus-sized
      shuffle for the idf side;
    - the per-doc top-k window partitions by ``doc_id``: a partition is
      one document's distinct terms (bounded by document length), so no
      reducer ever sees more than one document — the safe window case;
      Spark's WindowGroupLimit additionally prunes map-side.
    - everything is JVM codegen; no Python.
    """
    tf = (
        docs.select(F.col(id_col).alias("doc_id"),
                    word_tokens(text_col).alias("_toks"))
        .filter(F.size("_toks") >= min_doc_len)
        .select("doc_id", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term",
            F.round(
                F.col("tf")
                * (F.log((F.lit(1.0) + F.col("n_docs"))
                         / (F.lit(1.0) + F.col("df"))) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tfidf")
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 60,
             id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of any
    number of ranked lists over the same id space:
    ``rrf_score(d) = Σ_lists 1 / (k + rank_d)`` — the standard way to
    combine lexical (BM25) and dense (embedding) retrieval without
    score calibration, since only RANKS enter. Returns
    ``(id_col, rrf_score, n_lists)`` where ``n_lists`` counts how many
    input lists retrieved the document (a consensus signal worth
    keeping: score alone cannot distinguish one great rank from two
    mediocre ones).

    Scale shape: a union of the (already small) ranked lists and ONE
    id-keyed aggregate — rankings are top-k objects by construction,
    so every input is bounded by k·|queries|, not the corpus. Building
    the input rankings at corpus scale is the retrieval operators' job
    (:func:`bm25_search`, ``simsearch.brute_force_topk``)."""
    if not rankings:
        raise ValueError("rrf_fuse needs >= 1 ranking")
    if k < 1:
        # k + rank hits zero at rank = -k; k=0 divides by zero on any
        # 0-based ranking (a common caller shape) — require k >= 1 so
        # the failure is a clear error here, not an ANSI divide-by-zero
        # mid-aggregate
        raise ValueError(f"k={k}: need >= 1")
    tagged = None
    for r in rankings:
        t = r.select(F.col(id_col),
                     F.col(rank_col).cast("long").alias("_r"))
        tagged = t if tagged is None else tagged.unionByName(t)
    return (
        tagged.groupBy(id_col)
        .agg(F.sum(1.0 / (F.lit(k) + F.col("_r"))).alias("rrf_score"),
             F.count("*").alias("n_lists"))
    )


def phrase_search(docs: DataFrame, phrase: str, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact phrase matching over a positional index — the classic IR
    operator BM25's bag-of-words scoring cannot express ("new york"
    must not match "york new"). Standard formulation (positional
    postings intersection, e.g. Manning et al., IIR §2.4.2), done as
    ONE aggregation instead of a k-way self-join: a token at position
    ``p`` matching the phrase's ``i``-th term votes for phrase start
    ``p - i``; a start with all ``k`` distinct term-slots present is a
    match. Repeated phrase terms are handled by joining token rows to
    the (slot, term) list, so one token can vote for several slots.

    Returns ``(id_col, n_matches, first_pos)`` for matching documents
    only — ``n_matches`` counts distinct starts, ``first_pos`` the
    0-based earliest.

    Scale shape: the token stream is filtered to the phrase's terms
    BEFORE anything is exchanged (for web-scale phrases that is a tiny
    corpus fraction), slots attach via a broadcast of the k-row term
    list, and both the slot-dedup and the vote count are one
    map-side-combined aggregate keyed (doc, start). No joins between
    corpus-sized inputs, no Python."""
    from ..functions.vectors import ws_tokens

    terms = [t for t in phrase.split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one term")
    k = len(terms)
    spark = docs.sparkSession
    slots = spark.createDataFrame(
        list(enumerate(terms)), "slot int, term string")

    toks = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.coalesce(ws_tokens(text_col), F.array()))
            .alias("pos", "term"),
        )
        .filter(F.col("term").isin(terms))
    )
    votes = (
        toks.join(F.broadcast(slots), "term")
        .select("_id", (F.col("pos") - F.col("slot")).alias("start"),
                "slot")
        .filter(F.col("start") >= 0)
        .distinct()
    )
    return (
        votes.groupBy("_id", "start")
        .agg(F.count("*").alias("_nslots"))
        .filter(F.col("_nslots") == k)
        .groupBy("_id")
        .agg(F.count("*").cast("long").alias("n_matches"),
             F.min("start").cast("long").alias("first_pos"))
        .withColumnRenamed("_id", id_col)
    )


def postings_export(docs: DataFrame, min_df: int = 1,
                    max_df: int | None = None,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Inverted-index postings construction — the index ARTIFACT
    (IIR ch.1/ch.4 block merge; what Lucene/Anserini materialize),
    complementing :func:`bm25_search` which scores against an ad-hoc
    query without ever building the index.

    One row per term: ``(term, df, first_doc, gaps)`` where the
    posting list is delta-encoded — ``first_doc`` plus ``df-1``
    positive gaps between CONSECUTIVE ascending doc ids (the classic
    compression-friendly form; docs are reconstructed by prefix sum).
    Terms are lowercased whitespace tokens; a term appearing twice in
    one document posts once. ``min_df``/``max_df`` bound the exported
    vocabulary (stopword-band and hapax trimming).

    Scale shape: explode -> distinct (term, doc) -> ONE groupBy(term)
    whose ``sort_array(collect_list(doc))`` is bounded by the term's
    document frequency — and terms above ``max_df`` are the only
    unbounded lists, which is exactly what ``max_df`` exists to cut
    (at web scale you ALWAYS cap the stopword band; an uncapped 'the'
    posting list is a single-key hot spot in ANY index builder, ours
    or Lucene's). Exchanges carry ``(term, long)`` pairs only."""
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1 (got {min_df})")
    # delta encoding needs numeric doc ids; a string id would hit the
    # long cast mid-job as CAST_INVALID_INPUT under ANSI (or NULL-out
    # silently with ANSI off) — reject up front like pack_sequences
    id_type = docs.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"postings_export needs an integral {id_col!r} for gap "
            f"encoding (got {id_type}); derive one upstream, e.g. "
            "xxhash64 of the natural key")
    from ..functions.vectors import ws_tokens

    postings = (
        docs.select(
            F.col(id_col).cast("long").alias("doc"),
            F.explode(ws_tokens(text_col)).alias("w"))
        .select("doc", F.lower("w").alias("term"))
        .distinct()
    )
    lists = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sort_array(F.collect_list("doc")).alias("_docs"),
    ).filter(F.col("df") >= min_df)
    if max_df is not None:
        lists = lists.filter(F.col("df") <= max_df)
    # sequence(2, 1) counts DOWN in Spark, so df=1 needs the guard
    return lists.select(
        "term", "df",
        F.element_at("_docs", 1).alias("first_doc"),
        F.when(
            F.size("_docs") >= 2,
            F.expr("transform(sequence(2, size(_docs)), "
                   "i -> element_at(_docs, i) - element_at(_docs, i - 1))"),
        ).otherwise(F.array().cast("array<long>")).alias("gaps"),
    )


def kendall_agreement(rank_a, rank_b, qid_col: str = "query_id",
                      item_col: str = "vec_id",
                      rank_col: str = "rank"):
    """Kendall rank-agreement census (Kendall, Biometrika 1938)
    between two per-query rankings of the same corpus — the standard
    answer to "how much retrieval quality does the cheap tier give
    up": exact-vs-PQ, exact-vs-IVF, lexical-vs-dense. Per query, the
    INTEGER ingredients of tau over the COMMON item set —
    ``(n_common, concordant, discordant)`` — plus the one-sided
    leakage counts ``only_a`` / ``only_b`` (items one ranking
    returned that the other pruned; recall@k of B against A is
    ``n_common / (n_common + only_a)``, row-local). tau itself,
    ``(C - D) / C(n,2)``, is a row-local division for the caller.

    Scale shape: one (query, item)-keyed join + two anti-join
    counts; the pair comparison is a query-keyed self-join whose
    fan-out is bounded by k² BY CONSTRUCTION (inputs are top-k
    lists — the operator never sees the corpus). All-integer
    output; rank positions come from the callers' deterministic
    tie-broken rankings, so nothing drifts cross-engine.
    """
    a = rank_a.select(F.col(qid_col).alias("q"),
                      F.col(item_col).alias("i"),
                      F.col(rank_col).alias("ra"))
    b = rank_b.select(F.col(qid_col).alias("q"),
                      F.col(item_col).alias("i"),
                      F.col(rank_col).alias("rb"))
    common = a.join(b, ["q", "i"]).localCheckpoint(eager=True)
    x = common.select("q", F.col("ra").alias("ra1"),
                      F.col("rb").alias("rb1"))
    y = common.select("q", F.col("ra").alias("ra2"),
                      F.col("rb").alias("rb2"))
    pairs = (x.join(y, "q").filter(F.col("ra2") > F.col("ra1"))
             .groupBy("q")
             .agg(F.sum(F.when(F.col("rb2") > F.col("rb1"), 1)
                        .otherwise(0)).cast("long").alias("concordant"),
                  F.sum(F.when(F.col("rb2") < F.col("rb1"), 1)
                        .otherwise(0)).cast("long").alias("discordant")))
    ncom = common.groupBy("q").agg(
        F.count("*").cast("long").alias("n_common"))
    oa = (a.join(b, ["q", "i"], "left_anti").groupBy("q")
          .agg(F.count("*").cast("long").alias("only_a")))
    ob = (b.join(a, ["q", "i"], "left_anti").groupBy("q")
          .agg(F.count("*").cast("long").alias("only_b")))
    qs = (a.select("q").unionByName(b.select("q")).distinct())
    z = F.lit(0).cast("long")
    return (qs.join(ncom, "q", "left").join(pairs, "q", "left")
            .join(oa, "q", "left").join(ob, "q", "left")
            .select(F.col("q").alias(qid_col),
                    F.coalesce("n_common", z).alias("n_common"),
                    F.coalesce("concordant", z).alias("concordant"),
                    F.coalesce("discordant", z).alias("discordant"),
                    F.coalesce("only_a", z).alias("only_a"),
                    F.coalesce("only_b", z).alias("only_b")))


def ql_search(docs: DataFrame, terms: list, mu: float = 2000.0,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Ponte &
    Croft SIGIR 1998; Zhai & Lafferty SIGIR 2001 — the language-
    modeling alternative to BM25, and the stronger baseline on
    verbose queries): ``score(d) = Σ_w ln((tf_{w,d} + μ·P(w|C)) /
    (|d| + μ))`` over EVERY query term — absent terms contribute
    their smoothed background mass, which is what makes the model a
    proper likelihood and penalizes short matches correctly (the
    part a naive "sum over matched terms" port silently drops).

    Returns ``(doc_id, score)`` (6-dp, the bm25_search convention)
    for documents matching at least one query term.

    Scale shape: the collection LM is one vocabulary-bounded
    aggregate filtered to the query terms (a |Q|-row broadcast);
    candidates come from the postings of the query terms only; the
    absent-term background contributions ride a candidate ×
    |Q|-literal-frame join — never a corpus × vocabulary product.
    Same tokenization as bm25_search (word_tokens), so the two
    models rank the same index — query terms are case-folded like
    the token stream."""
    terms = [str(t).lower() for t in terms]
    base = (
        docs.select(F.col(id_col).alias("doc_id"),
                    word_tokens(text_col).alias("_toks"))
        .select("doc_id", F.size("_toks").alias("dl"),
                F.explode("_toks").alias("term"))
        .localCheckpoint(eager=True)
    )
    totals = base.agg(F.count("*").alias("n_tokens"))
    cf = (base.filter(F.col("term").isin(terms))
          .groupBy("term").agg(F.count("*").alias("cf")))
    spark = docs.sparkSession
    qframe = spark.createDataFrame([(t,) for t in terms],
                                   "term string")
    # a query term absent from the whole corpus has P(w|C) = 0 and
    # tf = 0 everywhere -> ln(0) for every document; the standard
    # practice (Zhai & Lafferty's implementations) drops OOV terms,
    # which shifts every score identically and keeps the ranking
    lm = (qframe.join(cf, "term")
          .crossJoin(F.broadcast(totals))
          .select("term",
                  (F.col("cf") / F.col("n_tokens")).alias("p_c")))
    tf = (base.filter(F.col("term").isin(terms))
          .groupBy("doc_id", "dl", "term")
          .agg(F.count("*").alias("tf")))
    cand = tf.select("doc_id", "dl").distinct()
    grid = cand.crossJoin(F.broadcast(lm))
    scored = (grid.join(tf, ["doc_id", "dl", "term"], "left")
              .select("doc_id", "dl", "term", "p_c",
                      F.coalesce("tf", F.lit(0)).alias("tf")))
    term_ll = F.log((F.col("tf") + F.lit(float(mu)) * F.col("p_c"))
                    / (F.col("dl") + F.lit(float(mu))))
    return (scored.groupBy("doc_id")
            .agg(F.round(F.sum(term_ll), 6).alias("score")))
