# -*- coding: utf-8 -*-
"""Lexico-syntactic pattern mining: Hearst hyponym extraction.

Hearst patterns (Hearst, COLING 1992 — "Automatic Acquisition of
Hyponyms from Large Text Corpora") are the oldest and still the most
precise zero-training relation extractor: surface templates like
"X such as Y" and "Y and other X" directly assert ``is-a(Y, X)``.
Run over a web corpus they yield the taxonomy backbone (the is-a
layer) that the extraction kernel's SVO triples don't cover, and
modern KG pipelines still use them for that exact slot (cf.
WebIsADB, Seitner et al. 2016, which mined 400M is-a pairs from
Common Crawl with this method).

The reference has no taxonomy stage; semantics follow the cited
public papers.

Scale shape: matching is row-local codegen (regexp over the page
body; the body never survives the explode); the corpus aggregation
exchanges ``(hypernym, hyponym, pattern, long)`` rows with map-side
combine. No UDF, no window, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# (pattern_tag, regex, hypernym_group, hyponym_group) — single-word
# arguments by design: without a parser, the head-noun adjacency rule
# (the word touching the pattern) is the declared approximation.
HEARST_PATTERNS = (
    ("such_as", r"([A-Za-z]+) such as ([A-Za-z]+)", 1, 2),
    ("and_other", r"([A-Za-z]+) and other ([A-Za-z]+)", 2, 1),
    ("including", r"([A-Za-z]+) including ([A-Za-z]+)", 1, 2),
    ("especially", r"([A-Za-z]+) especially ([A-Za-z]+)", 1, 2),
)


def extract_hyponyms(pages: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Emit one ``(doc_id, hypernym, hyponym, pattern)`` row per
    Hearst-pattern occurrence. Matches are non-overlapping
    left-to-right (both engines' regexp_extract_all semantics); both
    terms are lowercased (taxonomy nodes are case-insensitive by
    convention). Pages without matches contribute nothing."""
    per_pattern = []
    for tag, rx, g_hyper, g_hypo in HEARST_PATTERNS:
        sql_rx = rx.replace("\\", "\\\\")
        per_pattern.append(F.expr(
            f"transform(regexp_extract_all({text_col}, '{sql_rx}', 0), "
            f"m -> struct('{tag}' AS pattern, "
            f"lower(regexp_extract(m, '{sql_rx}', {g_hyper})) AS hypernym, "
            f"lower(regexp_extract(m, '{sql_rx}', {g_hypo})) AS hyponym))"
        ))
    matches = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(*per_pattern)).alias("m"),
    )
    # NULL text: regexp_extract_all(NULL) is NULL and explode drops it
    return matches.select(
        "doc_id", "m.hypernym", "m.hyponym", "m.pattern")


def hyponym_census(pages: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Corpus-level is-a aggregation: ``(hypernym, hyponym, pattern,
    n_mentions, n_docs)``. Support counts are the fusion signal — a
    pair asserted by many documents through many patterns is taxonomy;
    a single mention is noise (Seitner et al. gate on exactly these
    counts)."""
    return (
        extract_hyponyms(pages, id_col, text_col)
        .groupBy("hypernym", "hyponym", "pattern")
        .agg(F.count("*").cast("long").alias("n_mentions"),
             F.countDistinct("doc_id").cast("long").alias("n_docs"))
    )


# speaker-verb vocabulary for attribution (declared subset of the
# reporting verbs used by quote-attribution corpora, e.g. PARC 3.0)
_SAY_VERBS = "said|says|wrote|argued|claimed|noted|added"

# Speaker said, "quote"   /   "quote," said Speaker
# The BEFORE capture is LAZY ([^"]+?): a greedy run would absorb the
# attribution comma into the quote ('"We will win," said X' -> quote
# 'We will win,'), making the ',?' it was written to strip dead code
_QUOTE_AFTER = (r'([A-Z][a-z]+(?: [A-Z][a-z]+)?) '
                r'(?:' + _SAY_VERBS + r'),? "([^"]+)"')
_QUOTE_BEFORE = (r'"([^"]+?),?" (?:' + _SAY_VERBS + r') '
                 r'([A-Z][a-z]+(?: [A-Z][a-z]+)?)')


def extract_quotes(pages: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Attributed-quotation extraction — the provenance edge
    (speaker, statement, document) that news-KG pipelines mine for
    claim attribution (cf. the PARC attribution corpus, Pareti 2016;
    at web scale this is how "X said Y" enters a knowledge graph with
    a citable source).

    Two declared surface templates over straight double quotes:
    ``Speaker said, "..."`` and ``"...," said Speaker`` — speaker is
    1-2 capitalized words adjacent to a reporting verb from a fixed
    7-verb vocabulary. Emits ``(doc_id, speaker, quote, position)``
    where position is 'before'/'after' (speaker relative to quote).
    Curly quotes, nested quotes, and pronoun speakers are out of
    scope (declared) — precision over recall, the right trade for a
    seed extractor.

    Row-local regex codegen; the page body never survives the
    explode."""
    outs = []
    for rx, tag, g_speaker, g_quote in (
            (_QUOTE_AFTER, "before", 1, 2),
            (_QUOTE_BEFORE, "after", 2, 1)):
        sql_rx = rx.replace("\\", "\\\\").replace("'", "\\'")
        outs.append(F.expr(
            f"transform(regexp_extract_all({text_col}, '{sql_rx}', 0), "
            f"m -> struct("
            f"regexp_extract(m, '{sql_rx}', {g_speaker}) AS speaker, "
            f"regexp_extract(m, '{sql_rx}', {g_quote}) AS quote, "
            f"'{tag}' AS position))"
        ))
    return (
        pages.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.concat(*outs)).alias("m"),
        )
        .select("doc_id", "m.speaker", "m.quote", "m.position")
    )


# "Long Form (ACRO)" — 2-6 capitalized words followed by a
# parenthesized 2-6 letter uppercase token
_ACRO_RE = (r'((?:[A-Z][a-z]+ ){1,5}[A-Z][a-z]+) '
            r'\(([A-Z]{2,6})\)')


def extract_acronyms(pages: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Acronym-definition mining (Schwartz & Hearst, PSB 2003 — the
    standard algorithm every biomedical/news alias pipeline still
    runs): "World Health Organization (WHO)" asserts an (alias,
    canonical-name) pair with near-perfect precision, feeding the
    same dictionary the wikilink inversion feeds.

    The surface pattern captures 2-6 capitalized words followed by a
    parenthesized 2-6 letter uppercase token; a candidate survives
    only if the acronym's letters are EXACTLY the long form's
    initials in order (the strict first-letter variant of
    Schwartz-Hearst's character matching — declared; their fuzzier
    inner-letter rule trades precision for recall we don't need from
    a seed extractor). Emits ``(doc_id, acronym, long_form)``.

    Row-local regex + an array-fold initials check — zero exchanges,
    no UDF."""
    sql_rx = _ACRO_RE.replace("\\", "\\\\")
    cand = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(
            f"regexp_extract_all({text_col}, '{sql_rx}', 0)"))
        .alias("m"),
    ).select(
        "doc_id",
        F.expr(f"regexp_extract(m, '{sql_rx}', 1)").alias("long_form"),
        F.expr(f"regexp_extract(m, '{sql_rx}', 2)").alias("acronym"),
    )
    initials = F.upper(F.concat_ws(
        "", F.transform(F.split("long_form", " "),
                        lambda w: F.substring(w, 1, 1))))
    return (
        cand.filter(initials == F.col("acronym"))
        .select("doc_id", "acronym", "long_form")
    )


def taxonomy_forest(pairs: DataFrame, child_col: str = "hyponym",
                    parent_col: str = "hypernym",
                    weight_col: str = "n_docs",
                    max_rounds: int = 5) -> DataFrame:
    """Taxonomy induction from weighted is-a pairs (the WebIsADB ->
    taxonomy step, cf. Velardi et al. 2013 OntoLearn): pick ONE parent
    per child (argmax support weight, ties to the bytewise-smallest
    parent — deterministic), then resolve every node to its ROOT and
    DEPTH by pointer doubling. Emits ``(node, root, depth)`` — depth 0
    rows are the forest roots themselves.

    Pointer doubling (the standard O(log d) path-halving trick, same
    shape as the redirect-chain resolver): each round every node's
    ancestor pointer jumps to its ancestor's ancestor, so ``max_rounds
    = 5`` resolves chains up to 2^5 = 32 deep — far beyond any real
    taxonomy. Nodes that fail to reach a root within the cap sit on a
    cycle (two patterns asserting is-a both ways) and are DROPPED,
    declared — a cycle has no root.

    Scale shape: the parent-selection window partitions by child over
    the vocabulary-bounded pair table (never the corpus); each
    doubling round exchanges (node, anc, depth) triples of that same
    bounded table and cuts lineage with localCheckpoint (the iterative-
    operator convention here)."""
    from pyspark.sql import Window

    p = (pairs.select(F.col(child_col).alias("node"),
                      F.col(parent_col).alias("anc"),
                      F.col(weight_col).alias("w"))
         .filter(F.col("node") != F.col("anc")))
    w = Window.partitionBy("node").orderBy(
        F.col("w").desc(), F.col("anc").asc())
    sel = (p.select("node", "anc", F.row_number().over(w).alias("_rn"))
           .filter(F.col("_rn") == 1)
           .select("node", "anc")
           .localCheckpoint(eager=True))
    f = sel.select("node", "anc", F.lit(1).alias("depth"))
    for _ in range(max_rounds):
        g = f.select(F.col("node").alias("g_node"),
                     F.col("anc").alias("g_anc"),
                     F.col("depth").alias("g_depth"))
        f = (f.join(g, f["anc"] == g["g_node"], "left")
             .select(f["node"],
                     F.coalesce("g_anc", "anc").alias("anc"),
                     (f["depth"] + F.coalesce("g_depth", F.lit(0)))
                     .alias("depth"))
             .localCheckpoint(eager=True))
    children = sel.select("node").distinct()
    resolved = f.join(children.withColumnRenamed("node", "_c"),
                      f["anc"] == F.col("_c"), "left_anti")
    roots = (sel.select(F.col("anc").alias("node")).distinct()
             .join(children.withColumnRenamed("node", "_c"),
                   F.col("node") == F.col("_c"), "left_anti")
             .select("node", F.col("node").alias("root"),
                     F.lit(0).alias("depth")))
    return (resolved.select("node", F.col("anc").alias("root"), "depth")
            .unionByName(roots)
            .select("node", "root", F.col("depth").cast("int").alias("depth")))


def _candidate_windows(docs: DataFrame, id_col: str, text_col: str,
                       max_middle: int) -> DataFrame:
    """``(_doc, a, middle, b)`` candidate windows: every
    ``(token_i, middle, token_j)`` with ``1 <= len(middle) <=
    max_middle`` — generated ROW-LOCALLY from shifted array slices
    zipped per middle-length (one explode per length, unioned): the
    token array never leaves its row (no positional self-join, no
    per-token array duplication), and the slice/zip_with/arrays_zip
    chain stays an order of magnitude faster than a nested-transform
    struct build (measured 5x on the bench corpus). Shared by
    :func:`bootstrap_relations` (DIPRE) and :func:`dirt_paths`."""
    if max_middle < 1:
        raise ValueError(f"max_middle must be >= 1, got {max_middle}")
    arr = F.split(F.col(text_col), r"\s+")
    base = (docs
            .filter(F.col(text_col).isNotNull() & (F.size(arr) >= 3))
            .select(F.col(id_col).alias("_doc"), arr.alias("_arr")))
    a = F.col("_arr")
    sz = F.size(a)
    parts = []
    for L in range(1, int(max_middle) + 1):
        # full windows only: head index i = 1..sz-L-1 (1-based), so
        # every zipped triple has a real b — no partials to filter
        w_len = F.greatest(sz - L - 1, F.lit(0))
        heads = F.slice(a, 1, w_len)
        tails = F.slice(a, L + 2, w_len)
        mid = F.slice(a, 2, w_len)
        for j in range(1, L):
            mid = F.zip_with(mid, F.slice(a, 2 + j, w_len),
                             lambda x, y: F.concat_ws(" ", x, y))
        z = F.arrays_zip(heads.alias("a"), mid.alias("middle"),
                         tails.alias("b"))
        parts.append(base.select("_doc", F.explode(z).alias("w")))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    return (cand
            .select("_doc", F.col("w.a").alias("a"),
                    F.col("w.middle").alias("middle"),
                    F.col("w.b").alias("b"))
            .filter((F.col("a") != "") & (F.col("b") != "")))


def bootstrap_relations(docs: DataFrame, seeds: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        subj_col: str = "subj", obj_col: str = "obj",
                        max_middle: int = 3, min_support: int = 2,
                        entity_re: str = r"^[A-Z][a-z]+$") -> DataFrame:
    """One DIPRE/Snowball bootstrapping iteration (Brin 1998;
    Agichtein & Gravano 2000): seed (subj, obj) pairs locate their
    co-occurrence contexts, the middle token sequences become
    relation patterns scored by document support, and the surviving
    patterns (support >= ``min_support``) extract NEW entity pairs
    the seeds never mentioned — the classic semi-supervised relation
    harvester, one full corpus iteration per call.

    Candidate windows are every ``(token_i, middle, token_j)`` with
    ``1 <= len(middle) <= max_middle`` — generated ROW-LOCALLY from
    shifted array slices zipped per middle-length (one explode per
    length, unioned): the token array never leaves its row (no
    positional self-join, no per-token array duplication), and the
    slice/zip_with/arrays_zip chain stays an order of magnitude
    faster than a nested-transform struct build (measured 5x on the
    bench corpus). New pairs require both endpoints to match
    ``entity_re`` (the entity-shape gate; Snowball's NER slot) and to
    not be a seed.

    Emits ``(subj, middle, obj, n_docs, pattern_support)`` where
    ``n_docs`` counts documents asserting the new pair via that
    pattern and ``pattern_support`` is the seed-document support that
    promoted the pattern.

    Scale shape: the window explode is O(tokens x max_middle) rows of
    three short strings — the shingling cost class; pattern mining
    joins candidates to the BROADCAST seed list and folds to
    (middle, long) with map-side combine; extraction joins candidates
    to the BROADCAST promoted-pattern list (patterns are corpus
    metadata, orders below data size) and folds to (pair, middle,
    long). Page bodies never shuffle anywhere.
    """
    cand = _candidate_windows(docs, id_col, text_col, max_middle)

    seed_pairs = seeds.select(F.col(subj_col).alias("a"),
                              F.col(obj_col).alias("b")).distinct()
    patterns = (cand.join(F.broadcast(seed_pairs), ["a", "b"])
                .groupBy("middle")
                .agg(F.countDistinct("_doc").cast("long")
                     .alias("pattern_support"))
                .filter(F.col("pattern_support") >= int(min_support)))

    new_pairs = (
        cand.filter(F.col("a").rlike(entity_re)
                    & F.col("b").rlike(entity_re))
        .join(F.broadcast(patterns), "middle")
        .join(F.broadcast(seed_pairs), ["a", "b"], "left_anti")
        .groupBy(F.col("a").alias("subj"), "middle",
                 F.col("b").alias("obj"), "pattern_support")
        .agg(F.countDistinct("_doc").cast("long").alias("n_docs"))
        .select("subj", "middle", "obj", "n_docs", "pattern_support"))
    return new_pairs


#: comparative surface template: "<X> is <cmp> than <Y>". Single-word
#: arguments (the head-adjacency rule, same declared approximation as
#: HEARST_PATTERNS). RE2-safe.
COMPARATIVE_RE = (r"([A-Za-z0-9_-]+) is "
                  r"(faster|slower|bigger|smaller|cheaper|pricier|"
                  r"better|worse) than ([A-Za-z0-9_-]+)")

#: comparative -> (dimension, does-the-LEFT-side-win). The losing
#: direction swaps the endpoints so every edge is (superior,
#: dimension, inferior) — the canonical partial-order form ranking
#: and fusion stages consume (cf. Jindal & Liu 2006 "Mining
#: Comparative Sentences and Relations").
_COMPARATIVES = {
    "faster": ("speed", True), "slower": ("speed", False),
    "bigger": ("size", True), "smaller": ("size", False),
    "cheaper": ("cost", True), "pricier": ("cost", False),
    "better": ("quality", True), "worse": ("quality", False),
}


def comparative_edges(pages: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Comparative-relation mining (Jindal & Liu 2006): every
    "X is <comparative> than Y" sentence asserts a directed
    partial-order edge. Emits ``(superior, dimension, inferior,
    n_docs)`` with antonyms folded onto one canonical direction —
    "A is faster than B" and "B is slower than A" land on the SAME
    edge and their supports add.

    Scale shape: row-local regex (the body never survives the
    explode); antonym folding is an in-row CASE; one map-side-combined
    ``(edge, long)`` count exchange. No UDF, no window, no join.
    """
    sql_re = COMPARATIVE_RE.replace("\\", "\\\\")
    m = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(
            f"regexp_extract_all({text_col}, '{sql_re}', 0)"))
        .alias("m"),
    )
    left = F.regexp_extract("m", COMPARATIVE_RE, 1)
    cmpw = F.regexp_extract("m", COMPARATIVE_RE, 2)
    right = F.regexp_extract("m", COMPARATIVE_RE, 3)
    dim = F.coalesce(
        *[F.when(cmpw == w, F.lit(d)) for w, (d, _) in
          _COMPARATIVES.items()])
    wins = F.coalesce(
        *[F.when(cmpw == w, F.lit(lw)) for w, (_, lw) in
          _COMPARATIVES.items()])
    return (m.select(
        "doc_id",
        F.when(wins, left).otherwise(right).alias("superior"),
        dim.alias("dimension"),
        F.when(wins, right).otherwise(left).alias("inferior"))
        .groupBy("superior", "dimension", "inferior")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs")))


#: "A, B(,) and C" — a three-item coordination. Single-word items,
#: RE2-safe. The web's list constructions assert co-hyponymy (the
#: sibling signal Hearst patterns miss — cf. the set-expansion
#: literature: Wang & Cohen 2007 SEAL; Google Sets).
COORDINATION_RE = (r"([A-Za-z][A-Za-z0-9_-]*), "
                   r"([A-Za-z][A-Za-z0-9_-]*),? and "
                   r"([A-Za-z][A-Za-z0-9_-]*)")


def _coordination_doc_pairs(pages: DataFrame, id_col: str,
                            text_col: str) -> DataFrame:
    """``(doc_id, item_a, item_b)`` per coordination-list match —
    the pre-aggregation pair stream shared by
    :func:`coordination_siblings` (census) and :func:`set_expansion`
    (seed scoring). Row-local regex + in-row 3-pair explode; no
    exchange."""
    sql_re = COORDINATION_RE.replace("\\", "\\\\")
    m = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(
            f"regexp_extract_all({text_col}, '{sql_re}', 0)"))
        .alias("m"),
    )
    a = F.lower(F.regexp_extract("m", COORDINATION_RE, 1))
    b = F.lower(F.regexp_extract("m", COORDINATION_RE, 2))
    c = F.lower(F.regexp_extract("m", COORDINATION_RE, 3))

    def pair(x, y):
        return F.struct(F.least(x, y).alias("item_a"),
                        F.greatest(x, y).alias("item_b"))

    pairs = F.array(pair(a, b), pair(a, c), pair(b, c))
    return (m.select("doc_id", F.explode(pairs).alias("p"))
            .select("doc_id", "p.item_a", "p.item_b")
            .filter(F.col("item_a") != F.col("item_b")))

def coordination_siblings(pages: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Coordination sibling mining: every "A, B(,) and C" list
    asserts pairwise co-hyponym candidates (A,B) (A,C) (B,C). Emits
    ``(item_a, item_b, n_docs)`` with ``item_a < item_b`` (canonical
    unordered orientation, lowercase-folded); self-pairs drop.

    Scale shape: row-local regex + an in-row 3-pair array explode;
    one map-side-combined ``(pair, long)`` count exchange.
    """
    return (_coordination_doc_pairs(pages, id_col, text_col)
            .groupBy("item_a", "item_b")
            .agg(F.countDistinct("doc_id").cast("long")
                 .alias("n_docs")))


#: "X [did not|never|no longer] <verb> Y" — polarity-aware relation
#: surface. Verb vocabulary is declared; negated forms use the
#: infinitive, asserted forms the past tense, so the lemma CASE below
#: folds both onto one relation name. RE2-safe (no lookaround).
NEGATION_RE = (r"([A-Za-z][A-Za-z0-9_-]*) "
               r"(?:(did not|never|no longer) )?"
               r"(acquired|acquire|bought|buy|sued|sue|hired|hire|"
               r"merged|merge) "
               r"(?:with )?([A-Za-z][A-Za-z0-9_-]*)")

_VERB_LEMMA = {
    "acquired": "acquire", "acquire": "acquire",
    "bought": "buy", "buy": "buy",
    "sued": "sue", "sue": "sue",
    "hired": "hire", "hire": "hire",
    "merged": "merge", "merge": "merge",
}


def polarity_triples(pages: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Negation-scoped relation extraction — the KG precision guard
    (NegEx, Chapman et al. 2001: a fact extractor that can't see
    "did not" asserts the OPPOSITE of the page; negation detection is
    the cheapest highest-yield precision filter a triple pipeline
    has). Emits ``(doc_id, subj, verb, obj, negated)`` with the verb
    lemma folded across tense and ``negated`` true when a declared
    cue ("did not", "never", "no longer") scopes the verb — fusion
    stages downstream treat negated rows as counter-evidence instead
    of support.

    Scale shape: one row-local RE2 regex pass (shared verbatim with
    the SQL oracle) + in-row CASE folds; the page body never survives
    the explode; no exchange at all (the census is the caller's)."""
    sql_re = NEGATION_RE.replace("\\", "\\\\")
    m = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(
            f"regexp_extract_all({text_col}, '{sql_re}', 0)"))
        .alias("m"),
    )
    verb_raw = F.regexp_extract("m", NEGATION_RE, 3)
    lemma = F.coalesce(
        *[F.when(verb_raw == w, F.lit(l))
          for w, l in _VERB_LEMMA.items()])
    return m.select(
        "doc_id",
        F.regexp_extract("m", NEGATION_RE, 1).alias("subj"),
        lemma.alias("verb"),
        F.regexp_extract("m", NEGATION_RE, 4).alias("obj"),
        (F.regexp_extract("m", NEGATION_RE, 2) != "").alias("negated"),
    )


def dirt_paths(docs: DataFrame,
               id_col: str = "doc_id", text_col: str = "text",
               max_middle: int = 2, min_shared: int = 2,
               max_pair_paths: int = 64,
               entity_re: str = r"^[A-Z][a-z]+$") -> DataFrame:
    """DIRT path-similarity mining (Lin & Pantel, KDD 2001 —
    "Discovery of Inference Rules from Text"): two dependency paths
    (here: middle token sequences between entity-shaped endpoints,
    the same surface approximation as :func:`bootstrap_relations`)
    are paraphrase candidates when they connect many of the SAME
    argument pairs — "X works at Y" ~ "X is employed by Y". The
    output is the raw material for predicate canonicalization in KG
    fusion: synonymous relation surface forms collapse to one edge
    type.

    Emits ``(path_a, path_b, n_shared, n_a, n_b)`` with ``path_a <
    path_b``: ``n_shared`` = distinct argument pairs the two paths
    share (>= ``min_shared``, counted over non-promiscuous pairs —
    see the guard below), ``n_a``/``n_b`` = each path's distinct
    argument-pair support. Integer ingredients only — the
    Lin/Jaccard path similarity ``n_shared / (n_a + n_b - n_shared)``
    is a row-local division the caller applies.

    Scale shape: candidate windows are row-local slices (see
    :func:`_candidate_windows`); (path, pair) evidence folds to
    DISTINCT triples first; path co-occurrence pairs are generated
    IN-AGGREGATE per argument pair (sorted collect + triangular
    slice — the LSH ``_bucket_pairs`` shape, one shuffle, no
    self-join, no join-back: ``n_shared`` is the per-path-pair
    EMISSION count, since each emitting bucket IS one shared
    argument pair). Argument pairs connected by more than
    ``max_pair_paths`` paths are dropped whole BEFORE the collect —
    the promiscuous-pair guard: a generic pair like (He, It) linked
    by thousands of middles carries no paraphrase signal (DIRT's
    mutual-information weighting exists to discount exactly these)
    and would go quadratic in the pair generator. Bodies never
    shuffle.
    """
    cand = _candidate_windows(docs, id_col, text_col, max_middle)
    triples = (
        cand.filter(F.col("a").rlike(entity_re)
                    & F.col("b").rlike(entity_re))
        .select("middle", "a", "b").distinct()
        .localCheckpoint(eager=True)  # referenced by pairing AND support
    )
    support = (triples.groupBy("middle")
               .agg(F.count("*").cast("long").alias("n")))

    # triangular path pairs per argument-pair bucket, WITHOUT the
    # trailing distinct: each emission is one shared argument pair
    w = Window.partitionBy("a", "b")
    sized = (triples.withColumn("_n", F.count("*").over(w))
             .filter((F.col("_n") >= 2)
                     & (F.col("_n") <= int(max_pair_paths)))
             .drop("_n"))
    grouped = sized.groupBy("a", "b").agg(
        F.sort_array(F.collect_list("middle")).alias("_ms"))
    pairs = F.flatten(
        F.transform(
            "_ms",
            lambda x, i: F.transform(
                F.slice("_ms", i + F.lit(2), F.size("_ms")),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    shared = (
        grouped.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.pa").alias("_m1"), F.col("p.pb").alias("_m2"))
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )
    na = support.select(F.col("middle").alias("_m1"),
                        F.col("n").alias("n_a"))
    nb = support.select(F.col("middle").alias("_m2"),
                        F.col("n").alias("n_b"))
    return (shared.join(na, "_m1").join(nb, "_m2")
            .select(F.col("_m1").alias("path_a"),
                    F.col("_m2").alias("path_b"),
                    "n_shared", "n_a", "n_b"))


def canonicalize_predicates(docs: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            max_middle: int = 2, min_shared: int = 2,
                            max_pair_paths: int = 64,
                            jaccard_num: int = 1, jaccard_den: int = 2,
                            entity_re: str = r"^[A-Z][a-z]+$") -> DataFrame:
    """Predicate canonicalization — the stage that turns
    :func:`dirt_paths`' paraphrase evidence into one canonical
    relation per synonym cluster (the predicate-merge step of open-KG
    canonicalization, cf. Galárraga, Heitz, Murphy, Suchanek, CIKM
    2014, "Canonicalizing Open Knowledge Bases"):

    1. mine path-paraphrase candidates (:func:`dirt_paths`);
    2. keep pairs whose argument-set Jaccard meets
       ``jaccard_num/jaccard_den`` — tested as the INTEGER cross
       product ``den·n_shared >= num·(n_a + n_b − n_shared)``, so no
       float enters the decision;
    3. connected components over the surviving synonym edges
       (:func:`~..operators.components.connected_components` — same
       min-representative contract at every scale);
    4. canonical form = the lexicographically smallest path in the
       component (deterministic, replayable).

    Returns ``(path, canonical)`` for every path that appears in at
    least one surviving synonym pair; unclustered paths are their own
    canonical form by definition and are omitted (the caller's
    COALESCE on the mapping join).

    Scale shape: inherits :func:`dirt_paths`' single-shuffle pair
    generation; the component stage runs over the synonym graph,
    which is VOCABULARY-sized (distinct paths), orders below the
    corpus.
    """
    pairs = dirt_paths(docs, id_col, text_col, max_middle, min_shared,
                       max_pair_paths, entity_re)
    num, den = int(jaccard_num), int(jaccard_den)
    edges = (
        pairs.filter(
            F.lit(den) * F.col("n_shared")
            >= F.lit(num) * (F.col("n_a") + F.col("n_b")
                             - F.col("n_shared")))
        .select(F.col("path_a").alias("u"), F.col("path_b").alias("v"))
    )
    from .components import connected_components
    labels = connected_components(edges)
    canon = labels.groupBy("component").agg(
        F.min("node").alias("canonical"))
    return (labels.join(canon, "component")
            .select(F.col("node").alias("path"), "canonical"))


def set_expansion(pages: DataFrame, seeds: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  seed_col: str = "item") -> DataFrame:
    """Seed-driven entity-set expansion (SEAL — Wang & Cohen, ICDM
    2007): rank candidate entities by how often they co-occur with a
    SEED in the same coordination list ("A, B and C"). The classic
    grow-a-gazetteer loop: seeds {python, java} surface the other
    members of whatever lists they appear in.

    Emits ``(item, n_seed_docs, n_seeds)`` for non-seed items:
    ``n_seed_docs`` = distinct documents where the item shares a
    list pair with some seed (the expansion score — integer),
    ``n_seeds`` = distinct seeds it co-occurred with (multi-seed
    corroboration beats single-seed frequency, the SEAL ranking
    insight). Seeds are lowercase-folded like the list items.

    Scale shape: rides the same row-local pair extraction as
    :func:`coordination_siblings`; the seed list BROADCASTS to both
    pair slots (each side one broadcast equi-join), candidates fold
    in one map-side-combined aggregate. Page bodies never shuffle.
    """
    pairs = _coordination_doc_pairs(pages, id_col, text_col)
    s = F.broadcast(
        seeds.select(F.lower(F.col(seed_col)).alias("_seed")).distinct())
    hits = (
        pairs.join(s, pairs["item_a"] == s["_seed"])
        .select("doc_id", F.col("item_b").alias("item"), "_seed")
        .unionByName(
            pairs.join(s, pairs["item_b"] == s["_seed"])
            .select("doc_id", F.col("item_a").alias("item"), "_seed"))
    )
    return (
        hits.join(s.select(F.col("_seed").alias("item")), "item",
                  "left_anti")
        .groupBy("item")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_seed_docs"),
             F.countDistinct("_seed").cast("long").alias("n_seeds"))
    )
