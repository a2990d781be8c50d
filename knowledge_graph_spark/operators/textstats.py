# -*- coding: utf-8 -*-
"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Corpus-hygiene stages for the 100 TB training-data pipeline (the
reference assumes pre-cleaned Chinese prose — these operators are what
lets the engine accept raw web text). Everything is JVM-side column
expressions: no UDFs, fully inside whole-stage codegen, so these scans
run at parquet-read speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import word_tokens, ws_tokens

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

# BPE-ish word pattern: letter runs, digit runs, or single CJK chars —
# approximates subword tokenizers' treatment of CJK (1 char ~ 1 token).
_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[\\u4e00-\\u9fff]"


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_tokens`` (whitespace tokens) and ``n_bpe_tokens``
    (regexp token count: letter runs + digit runs + CJK chars)."""
    ws = F.size(ws_tokens(text_col))
    bpe = F.size(F.expr(f"regexp_extract_all({text_col}, '{_TOKEN_PATTERN}', 0)"))
    return docs.withColumn("n_tokens", ws).withColumn("n_bpe_tokens", bpe)


# ---------------------------------------------------------------------------
# language identification
# ---------------------------------------------------------------------------

_EN_STOPWORDS = ("the", "and", "of", "to", "in", "is", "that", "for",
                 "with", "was", "are", "this")


def with_language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``lang_pred``: 'zh' if CJK chars dominate, 'en' if ASCII
    letters dominate AND English stopwords appear, else 'other'.

    Char-class-ratio heuristic (the n-gram-model-free version that is
    exact on the synthetic corpus and reasonable on real web text)."""
    total = F.greatest(F.length(text_col), F.lit(1))
    cjk = F.length(text_col) - F.length(
        F.regexp_replace(text_col, r"[一-鿿]", "")
    )
    ascii_letters = F.length(text_col) - F.length(
        F.regexp_replace(text_col, r"[A-Za-z]", "")
    )
    stop_hits = sum(
        (F.when(F.col("_lc").contains(f" {w} "), 1).otherwise(0) for w in _EN_STOPWORDS),
        F.lit(0),
    )
    return (
        docs.withColumn("_lc", F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" ")))
        .withColumn(
            "lang_pred",
            F.when(cjk / total > 0.25, F.lit("zh"))
            .when((ascii_letters / total > 0.5) & (stop_hits >= 1), F.lit("en"))
            .otherwise(F.lit("other")),
        )
        .drop("_lc")
    )


def line_language_profile(pages: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Paragraph-level language consistency (CCNet runs LID per
    paragraph, not per page, because web pages mix languages —
    navigation in one, content in another; a page whose lines
    disagree is a poor training document in EITHER language).

    Splits each page on newlines, DROPS blank (whitespace-only)
    lines — they are paragraph separators, not paragraphs; CCNet
    LIDs only non-empty lines, and counting them as 'other' would
    manufacture code-switching on clean multi-paragraph prose — then
    applies :func:`with_language_id`'s rule per line and reports the
    per-document majority: ``(doc_id, n_lines, majority_lang,
    n_majority, n_minority)``. A page with no non-blank line has no
    profile row (nothing to LID).
    Majority ties break toward the lexicographically greatest
    language tag (``max(struct(count, lang))`` — declared, replayable
    ordering). ``n_minority / n_lines`` is the code-switching
    fraction, left as a row-local division for the caller.

    Scale shape: one explode, the row-local LID rule (pure codegen),
    one (doc, lang) count with map-side combine, one per-doc rollup —
    exchanges carry ``(id, tag, long)`` rows, never page bodies."""
    lines = pages.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("idx", "line"),
    ).filter(F.trim("line") != "")
    tagged = with_language_id(lines, text_col="line")
    per = tagged.groupBy("doc_id", "lang_pred").agg(
        F.count("*").alias("c"))
    maj = per.groupBy("doc_id").agg(
        F.max(F.struct(F.col("c"), F.col("lang_pred"))).alias("_m"),
        F.sum("c").alias("n_lines"),
    )
    return maj.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("_m.lang_pred").alias("majority_lang"),
        F.col("_m.c").cast("long").alias("n_majority"),
        (F.col("n_lines") - F.col("_m.c")).cast("long")
        .alias("n_minority"),
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds C4/Gopher-style quality signals + a composite ``quality``
    in [0,1]:

    - ``punct_ratio``     — punctuation chars / length
    - ``digit_ratio``     — digit chars / length
    - ``mean_word_len``   — avg whitespace-token length
    - ``quality``         — 1 minus penalties for: too short (<20 chars),
      punctuation-heavy (>0.3), digit-heavy (>0.3), degenerate word
      length (mean <2 or >12 over >=5 whitespace tokens — the Gopher
      word-length filter, applied only when the text is actually
      space-delimited so CJK prose isn't blanket-penalized)

    NULL text scores NULL (not 1.0): every penalty condition evaluates
    NULL on NULL input and would fall through to its otherwise(0)
    arm — an unreadable document must not sail through ``quality >= x``
    curation gates as perfect. NULL quality then fails any such filter.
    """
    length = F.greatest(F.length(text_col), F.lit(1))
    # ASCII punct spelled as explicit ranges so the DuckDB oracle
    # ([[:punct:]] in RE2) and Java agree char-for-char
    punct = F.length(text_col) - F.length(
        F.regexp_replace(text_col, r"[!-/:-@\[-`{-~，。、；：！？“”‘’（）《》【】]", "")
    )
    digits = F.length(text_col) - F.length(
        F.regexp_replace(text_col, r"[0-9]", "")
    )
    words = ws_tokens(text_col)
    mean_wl = F.when(
        F.size(words) > 0,
        F.aggregate(words, F.lit(0).cast("double"),
                    lambda acc, w: acc + F.length(w)) / F.size(words),
    ).otherwise(F.lit(0.0))

    out = (
        docs.withColumn("punct_ratio", punct / length)
        .withColumn("digit_ratio", digits / length)
        .withColumn("mean_word_len", mean_wl)
    )
    penalty = (
        F.when(F.length(text_col) < 20, 0.5).otherwise(0.0)
        + F.when(F.col("punct_ratio") > 0.3, 0.25).otherwise(0.0)
        + F.when(F.col("digit_ratio") > 0.3, 0.25).otherwise(0.0)
        + F.when(
            (F.size(words) >= 5)
            & ((F.col("mean_word_len") < 2) | (F.col("mean_word_len") > 12)),
            0.25,
        ).otherwise(0.0)
    )
    return out.withColumn(
        "quality",
        F.when(F.col(text_col).isNull(), F.lit(None).cast("double"))
        .otherwise(F.greatest(F.lit(0.0), F.lit(1.0) - penalty)),
    )


# Unicode script ranges (BMP core blocks — declared subset; rare
# supplementary blocks count as 'other')
_SCRIPT_RANGES = (
    ("latin", "A-Za-z"),
    ("cyrillic", "\\u0400-\\u04FF"),
    ("greek", "\\u0370-\\u03FF"),
    ("arabic", "\\u0600-\\u06FF"),
    ("cjk", "\\u4E00-\\u9FFF"),
    ("hangul", "\\uAC00-\\uD7AF"),
    ("kana", "\\u3040-\\u30FF"),
    ("digit", "0-9"),
)


def script_profile(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Unicode script composition per document — the signal BELOW
    language ID: a LID tag says "this looks Russian", the script
    profile says "78% Cyrillic, 12% Latin, 10% digits", which is what
    mixed-script spam detection, transliteration routing, and
    tokenizer-coverage audits actually consume (cf. the script-ratio
    filters in CCNet and the fastText LID preprocessing).

    Counts characters in eight declared BMP ranges (Latin, Cyrillic,
    Greek, Arabic, CJK-unified, Hangul, Kana, ASCII digits); anything
    else — punctuation, whitespace, unlisted scripts — is ``n_other``.
    ``majority_script`` is the max-count range (``'other'`` included),
    ties broken toward the lexicographically GREATEST name via
    ``max(struct(count, name))`` — declared and replayable.

    Outputs are longs + one tag; no ratio ever materializes (callers
    cross-multiply against ``n_chars``). NULL text profiles as the
    empty document: all counts 0, majority ``'other'``. Row-local
    codegen — zero exchanges, zero UDFs.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t).cast("long")
    counts = {
        name: (F.length(t)
               - F.length(F.regexp_replace(t, f"[{rng}]", ""))
               ).cast("long")
        for name, rng in _SCRIPT_RANGES
    }
    n_listed = None
    for c in counts.values():
        n_listed = c if n_listed is None else n_listed + c
    counts["other"] = (n_chars - n_listed).cast("long")
    majority = F.greatest(*[
        F.struct(c.alias("c"), F.lit(name).alias("s"))
        for name, c in counts.items()
    ])
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        *[counts[name].alias(f"n_{name}")
          for name, _ in _SCRIPT_RANGES],
        counts["other"].alias("n_other"),
        majority.getField("s").alias("majority_script"),
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                     "with")


def gopher_rules(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """Gopher document-level quality rule flags (Rae et al. 2021,
    "Scaling Language Models", Appendix A1.1 — the rule battery that
    MassiveWeb/RefinedWeb/Dolma all reuse). Unlike
    :func:`with_quality_score` (one composite scalar), this emits the
    per-rule verdicts a curation pipeline filters and AUDITS on —
    which rule killed a page matters when tuning thresholds.

    Rules (a document must pass ALL to pass):

    - ``ok_word_count``  — whitespace-word count in [min_words, max_words]
    - ``ok_mean_wl``     — mean word length in [3, 10]
    - ``ok_symbols``     — (count('#') + count('...') + count('…'))
      per word <= 0.1
    - ``ok_bullets``     — <= 90% of lines start with a bullet
      (``-``, ``*``, ``•``) after trimming
    - ``ok_ellipsis``    — <= 30% of lines end with ``...`` or ``…``
    - ``ok_alpha``       — >= 80% of words contain an [A-Za-z] char
    - ``ok_stopwords``   — >= 2 distinct members of the 8-word Gopher
      stop set appear as lowercased whitespace tokens

    Every threshold is evaluated by INTEGER cross-multiplication
    (``10*n_sym <= n_words``, not ``n_sym/n_words <= 0.1``) so the
    verdicts are exact and engine-independent — no float ratio ever
    decides a flag or reaches the output schema. Outputs are longs and
    booleans only: ``(doc_id, n_words, n_lines, n_alpha_words,
    n_stop_hits, ok_* x7, pass_gopher)``. NULL text behaves as the
    empty document (0 words, 1 empty line) and fails the word-count
    and stopword gates rather than passing NULLs through.

    Scale shape: pure row-local codegen over the page body — zero
    exchanges, zero UDFs; the scan runs at parquet-read speed and the
    flags are computed before any downstream shuffle sees the row.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.coalesce(ws_tokens(text_col), F.array())
    n_words = F.size(words).cast("long")
    sum_wl = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.filter(
        lines, lambda l: F.trim(l).rlike(r"^[-*•]")
    )
    n_bullet = F.size(n_bullet).cast("long")
    n_ellipsis = F.size(F.filter(
        lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    ).cast("long")
    n_alpha = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
              ).cast("long")
    n_dots = ((F.length(t)
               - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
              ).cast("long")
    n_uni_ell = (F.length(t)
                 - F.length(F.replace(t, F.lit("…"), F.lit("")))
                 ).cast("long")
    n_sym = n_hash + n_dots + n_uni_ell
    low_words = F.transform(words, F.lower)
    n_stop = None
    for sw in _GOPHER_STOPWORDS:
        hit = F.array_contains(low_words, sw).cast("long")
        n_stop = hit if n_stop is None else n_stop + hit

    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stop_hits"),
        ((n_words >= min_words) & (n_words <= max_words))
        .alias("ok_word_count"),
        ((sum_wl >= 3 * n_words) & (sum_wl <= 10 * n_words)
         & (n_words > 0)).alias("ok_mean_wl"),
        ((10 * n_sym <= n_words) & (n_words > 0)).alias("ok_symbols"),
        (10 * n_bullet <= 9 * n_lines).alias("ok_bullets"),
        (10 * n_ellipsis <= 3 * n_lines).alias("ok_ellipsis"),
        ((10 * n_alpha >= 8 * n_words) & (n_words > 0)).alias("ok_alpha"),
        (n_stop >= 2).alias("ok_stopwords"),
    )
    return out.withColumn(
        "pass_gopher",
        F.col("ok_word_count") & F.col("ok_mean_wl") & F.col("ok_symbols")
        & F.col("ok_bullets") & F.col("ok_ellipsis") & F.col("ok_alpha")
        & F.col("ok_stopwords"),
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


def with_fingerprint(docs: DataFrame, text_col: str = "text",
                     window: int = 64, stride: int | None = None) -> DataFrame:
    """Adds ``fingerprint``: a winnowing-style rolling-hash signature —
    the MINIMUM xxhash64 over ``window``-char substrings sampled every
    ``stride`` chars (edits usually leave the global minimizer intact,
    so near-copies tend to collide — a probabilistic signature, not a
    guarantee), plus ``content_hash`` (sha256) for exact identity.

    ``stride`` defaults to window/2 (adjacent windows overlap half, so
    every char is covered twice): per-doc work drops from O(len·window)
    to O(len·2) and a 1 MB document materializes ~32k array cells
    instead of 10^6 (round-1 scale fix). The enumeration is a JVM
    sequence/transform — no UDF."""
    stride = stride or max(1, window // 2)
    sub_hashes = F.expr(
        f"transform(sequence(0, greatest(length({text_col}) - {window}, 0), {stride}), "
        f"i -> xxhash64(substring({text_col}, i + 1, {window})))"
    )
    return (
        docs.withColumn("content_hash", F.sha2(F.col(text_col), 256))
        # NULL text must fingerprint as NULL, like content_hash: the
        # substring of NULL is NULL and xxhash64(NULL) is the SEED, so
        # every NULL-text (held-out) doc would otherwise share one
        # non-NULL fingerprint and collapse into a single bogus
        # near-dup cluster
        .withColumn("fingerprint",
                    F.when(F.col(text_col).isNotNull(),
                           F.array_min(sub_hashes)))
    )


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        k: int = 4,
                        replayable_hash: bool = True) -> DataFrame:
    """Winnowing fingerprint census (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every overlapping word
    ``n``-gram, slide a ``k``-gram window over the hash sequence, and
    select each window's MINIMUM hash. The winnowing guarantee: any
    shared substring of at least ``n + k - 1`` words produces at
    least one shared selected hash, while only ~``2/(k+1)`` of all
    grams are kept — a density-bounded robust signature that full
    min-hashing (``with_fingerprint``'s single global minimum) can't
    give.

    This is the POSITION-FREE variant: the fingerprint is the SET of
    selected hashes per document (what MOSS similarity consumes), so
    equal-hash ties inside a window — only possible for identical
    grams, which yield the identical fingerprint either way — need no
    tie-break rule, and the result is deterministic on any engine.

    Returns integer-only ``(doc_id, n_grams, n_fingerprints,
    n_shared)`` — ``n_shared`` counts this doc's fingerprints that
    also appear in at least one OTHER document's fingerprint set (the
    MOSS overlap numerator). Every input row survives; a document
    shorter than ``n + k - 1`` words has zero windows.

    Scale shape: grams fold to longs BEFORE any exchange; the sliding
    min is a per-document ROWS frame window (partitions bounded by
    document length); the sharing census exchanges distinct
    ``(hash, doc)`` long pairs only. No Python anywhere.
    ``replayable_hash=True`` uses the SQL-recomputable md5-52-bit
    fold (the oracle path); ``False`` the xxhash64 intrinsic —
    measured 27.7 s → 24.8 s on a 500k-doc / 38.5M-gram corpus
    (local[32]); the selected SETS differ across hash functions (a
    different hash has different minima), so pick one corpus-wide and
    keep it."""
    from .sketches import h52

    slim = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(ws_tokens(text_col), F.array()).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))

    grams = (
        slim.filter(F.col("_n") >= n)
        .select(
            "doc_id", "_n",
            F.posexplode(
                F.expr(f"transform(sequence(0, _n - {n}), s -> "
                       f"array_join(slice(_toks, s + 1, {n}), ' '))")
            ).alias("pos", "_gram"),
        )
        .withColumn("_h", h52(F.col("_gram")) if replayable_hash
                    else F.xxhash64(F.col("_gram")))
        .drop("_gram")
    )
    # window q covers gram positions [q, q+k-1]; valid q ≤ n_grams - k
    wf = (Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(0, k - 1))
    fps = (
        grams.withColumn("_wm", F.min("_h").over(wf))
        .filter(F.col("pos") <= F.col("_n") - n + 1 - k)
        .select("doc_id", F.col("_wm").alias("fp"))
        .distinct()
    )
    shared = (
        fps.groupBy("fp").agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") > 1).select("fp")
    )
    per_doc = (
        fps.join(shared.withColumn("_s", F.lit(1)), "fp", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_fingerprints"),
             F.sum(F.coalesce("_s", F.lit(0)).cast("long"))
             .alias("n_shared"))
    )
    return (
        slim.select(
            "doc_id",
            F.greatest(F.col("_n") - n + 1, F.lit(0))
             .cast("long").alias("n_grams"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id", "n_grams",
            F.coalesce("n_fingerprints", F.lit(0))
             .cast("long").alias("n_fingerprints"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        )
    )


# ---------------------------------------------------------------------------
# repetition statistics (Gopher repetition filters)
# ---------------------------------------------------------------------------


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", ) -> DataFrame:
    """Gopher-style repetition signals per document (token-based):

    - ``top_2gram_frac`` — occurrences of the most frequent word-2-gram
      over all 2-gram occurrences (boilerplate / template spam has a
      dominant repeated phrase)
    - ``dup_3gram_frac`` — fraction of word-3-gram occurrences that are
      repeats (1 − distinct/total)

    A document with fewer than n tokens has NO n-grams and scores
    0.0 on that signal (nothing is repeated — the ``word_ngrams``
    whole-text fallback used before r5 scored every 1-2-word doc a
    maximally-repetitive 1.0, flagging short pages as template spam
    on the wrong axis; Gopher separates length filters from
    repetition filters). NULL text likewise scores (0.0, 0.0).
    Every input document gets exactly one output row.

    Set-based and shuffle-bounded: explode grams → per-(doc, gram)
    count → per-doc aggregate. The gram shuffles carry short strings
    keyed by doc id, never document bodies; the final per-doc joins
    align on doc_id. At 100 TB this is the same shape as the shingle
    stages of MinHash dedup (proven there). The id column is emitted
    under the caller's ``id_col`` name so joins back to the input line
    up."""

    toks = docs.select(F.col(id_col).alias("doc_id"),
                       word_tokens(text_col).alias("ws"))

    def _grams(n):
        return (toks.filter(F.size("ws") >= n)
                .select("doc_id", F.explode(F.expr(
                    f"transform(sequence(0, size(ws) - {n}), "
                    f"i -> array_join(slice(ws, i + 1, {n}), ' '))"))
                    .alias("g")))

    top2 = (
        _grams(2).groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("top_2gram_frac"))
    )
    dup3 = (
        _grams(3).groupBy("doc_id")
        .agg((F.lit(1.0) - F.countDistinct("g") / F.count("*"))
             .alias("dup_3gram_frac"))
    )
    spine = toks.select("doc_id")
    return (spine.join(top2, "doc_id", "left")
            .join(dup3, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("top_2gram_frac", F.lit(0.0))
                    .alias("top_2gram_frac"),
                    F.coalesce("dup_3gram_frac", F.lit(0.0))
                    .alias("dup_3gram_frac"))
            .withColumnRenamed("doc_id", id_col))


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

# patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"1[0-9]{10}"  # CN mobile shape; swap per-locale in prod


def with_pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_emails`` / ``n_phones``: occurrences of email-shaped and
    phone-shaped spans. Pure codegen (regexp_extract_all).

    The patterns go through the Column API, NOT an ``F.expr`` SQL
    string — a SQL string literal eats the backslash in ``\\.``, which
    silently turns the dot into match-anything and diverges from
    :func:`redact_pii` (Python-API regexp_replace keeps it literal)."""
    return (
        docs.withColumn(
            "n_emails",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(_EMAIL_RE), F.lit(0))),
        )
        .withColumn(
            "n_phones",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(_PHONE_RE), F.lit(0))),
        )
    )


def redact_pii(docs: DataFrame, text_col: str = "text",
               email_token: str = "<EMAIL>",
               phone_token: str = "<PHONE>") -> DataFrame:
    """Replaces email/phone spans with redaction tokens (the standard
    pre-training scrub). Row-local regexp_replace — no shuffle."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), _EMAIL_RE, email_token),
        _PHONE_RE, phone_token,
    )
    return docs.withColumn(text_col, redacted)


# ---------------------------------------------------------------------------
# corpus profiling
# ---------------------------------------------------------------------------


def corpus_profile(docs: DataFrame, group_col: str = "source",
                   value_col: str = "n_chars") -> DataFrame:
    """Per-group length profile: count, mean, exact interpolated
    median/p95, min, max — the first dashboard every corpus curation
    run reads (is a source truncated? spammy? empty?).

    Exact percentiles are a single sort-based aggregate per group
    (``percentile``, JVM-side); at 100 TB swap in
    ``approx_percentile`` with the same call shape if the exact sort
    per group is too hot — the operator's contract stays identical.
    One shuffle, keyed by the group column."""
    v = F.col(value_col)
    return docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(v), 4).alias("avg_len"),
        F.round(F.percentile(v, F.lit(0.5)), 4).alias("p50_len"),
        F.round(F.percentile(v, F.lit(0.95)), 4).alias("p95_len"),
        F.min(v).alias("min_len"),
        F.max(v).alias("max_len"),
    )


# ---------------------------------------------------------------------------
# subword-vocabulary induction statistics
# ---------------------------------------------------------------------------


def bpe_pair_counts(docs: DataFrame, text_col: str = "text",
                    top_n: int = 50) -> DataFrame:
    """The first BPE merge-step statistic (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units"):
    corpus frequency of each adjacent character pair WITHIN words,
    weighted by word frequency. Returns the ``top_n`` pairs as
    ``(lhs, rhs, pair_count)``, ties broken by (lhs, rhs) ascending.

    This is the inner loop of training a subword tokenizer on the
    corpus — the operator a 100 TB pipeline runs (repeatedly) to build
    its vocabulary. Scale shape:

    - the corpus-sized pass is ONE explode + word-count aggregate with
      map-side combine, shuffling ``(word, count)`` pairs — bounded by
      the VOCABULARY, not corpus tokens;
    - pair extraction then runs over distinct words only (a
      ``transform(sequence(...))`` codegen lambda — no Python), so the
      second aggregate is O(vocabulary · avg word length);
    - the global top-n is a ``TakeOrderedAndProject`` (per-partition
      heads, driver merges top_n rows) — no single-reducer sort.
    """
    words = (
        docs.select(F.explode(word_tokens(text_col)).alias("word"))
        .groupBy("word").agg(F.count("*").alias("wc"))
    )
    pairs = (
        words.filter(F.length("word") >= 2)
        .select(
            "wc",
            F.explode(F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> struct(substring(word, i, 1) as lhs, "
                "substring(word, i + 1, 1) as rhs))"
            )).alias("p"),
        )
        .select(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"),
                "wc")
    )
    return (
        pairs.groupBy("lhs", "rhs")
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
        .limit(top_n)
    )

_LM_BOS = "<s>"
_LM_UNK = "<unk>"


def lm_perplexity(docs: DataFrame, target, id_col: str = "doc_id",
                  text_col: str = "text", alpha: float = 0.1) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2019,
    which filters Common Crawl by KenLM perplexity against a clean
    target corpus): train an add-α-smoothed word-BIGRAM model on the
    rows where ``target`` is true, then score EVERY document's
    cross-entropy under it. Low perplexity ≈ target-like prose; high ≈
    boilerplate/gibberish — the complement of
    :func:`...sampling.dsir_weights`' importance ratio (that ranks for
    resampling; this is the absolute fluency gate).

    Model: tokens are :func:`word_tokens`; scoring tokens outside the
    training vocabulary map to ``<unk>`` (V = train vocabulary + unk);
    each document is scored as the mean over its tokens of
    ``-ln P(w_i | w_{i-1})`` with a BOS start symbol, where
    ``P(w|p) = (c(p,w) + α) / (c(p) + α·V)`` and ``c(p)`` is the
    bigram-prefix count (so probabilities sum to 1 over V). Returns
    ``(id_col, n_scored, xent, ppl)``; wordless documents carry NULL
    scores (no defined perplexity), not a fake value.

    Scale shape: the train pass is one bigram-count aggregate (map-side
    combined, exchanges carry (word, word, long) — vocabulary²-bounded
    in theory, observed-bigram-bounded in fact); prefix counts and the
    vocabulary derive from that one aggregate, never a second corpus
    pass. Scoring explodes to (id, pos, token) rows, maps OOV with a
    vocabulary join (AQE broadcasts it when small), forms bigrams with
    a per-document ``lag`` window (partitions bounded by document
    length), then joins the model keyed on the bigram — stopword-pair
    hot keys are exactly AQE's skew-join case. No Python anywhere."""
    toks = docs.select(F.col(id_col), target.alias("_is_t"),
                       word_tokens(text_col).alias("_ws"))
    train = (
        toks.filter(F.col("_is_t") & (F.size("_ws") >= 1))
        .select(F.concat(F.array(F.lit(_LM_BOS)), F.col("_ws")).alias("_a"))
    )
    bi = (
        train.select(F.explode(F.expr(
            "transform(sequence(1, size(_a) - 1), "
            "i -> struct(element_at(_a, i) as w1, "
            "element_at(_a, i + 1) as w2))")).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("c_bi"))
        # reused three times (prefix counts, vocab, scoring join);
        # localCheckpoint not persist — GC-reclaimed, no CacheManager
        # entry left behind by a long-running driver (linking.py pattern)
        .localCheckpoint(eager=True)
    )
    pre = bi.groupBy("w1").agg(F.sum("c_bi").alias("c_pre"))
    vocab = bi.select(F.col("w2").alias("w")).distinct()
    vsize = vocab.agg((F.count("*") + F.lit(1)).alias("_v"))

    scored_toks = (
        toks.filter(F.size("_ws") >= 1)
        .select(F.col(id_col), F.posexplode("_ws").alias("_pos", "_raw"))
        .join(vocab, F.col("_raw") == F.col("w"), "left")
        .select(F.col(id_col), "_pos",
                F.coalesce(F.col("w"), F.lit(_LM_UNK)).alias("_cur"))
    )

    w = Window.partitionBy(id_col).orderBy("_pos")
    bigr = scored_toks.select(
        F.col(id_col),
        F.lag("_cur", 1, _LM_BOS).over(w).alias("_prev"),
        F.col("_cur"),
    )
    nll = -F.log(
        (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("c_pre"), F.lit(0)) + F.lit(alpha) * F.col("_v"))
    )
    # name-based equi-joins: bigr shares lineage with bi (via the vocab
    # OOV join), so DataFrame-attribute join conditions would hit
    # Spark's ambiguous-self-join resolution and silently mismatch
    model = bi.select(F.col("w1").alias("_prev"),
                      F.col("w2").alias("_cur"), "c_bi")
    prefix = pre.select(F.col("w1").alias("_prev"), "c_pre")
    agg = (
        bigr.join(model, ["_prev", "_cur"], "left")
        .join(prefix, ["_prev"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(F.col(id_col), nll.alias("_nll"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_scored"), F.avg("_nll").alias("xent"))
    )
    ids = docs.select(id_col).distinct()
    return ids.join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_scored"), F.lit(0)).alias("n_scored"),
        F.col("xent"),
        F.exp(F.col("xent")).alias("ppl"),
    )


def perplexity_buckets(docs: DataFrame, target, lang_col: str = "lang",
                       id_col: str = "doc_id", text_col: str = "text",
                       alpha: float = 0.1, round_dp: int = 6) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): per
    language, bucket every scored document into perplexity TERCILES —
    "head" (most target-like third) / "middle" / "tail" — the standard
    corpus partition downstream mixtures sample from (head-heavy for
    quality, tail kept for diversity).

    Buckets are assigned against the exact interpolated 1/3 and 2/3
    cross-entropy cut points of the document's language, computed over
    ``round_dp``-ROUNDED scores: raw-double ordering could flip
    sub-ulp near-ties across engines, and an interpolated cut between
    two distinct ADJACENT rounded values can never sit within one ulp
    of a data point, so bucket membership is deterministic and
    replayable in SQL. Documents with no scorable tokens carry no
    bucket (NULL perplexity is not "low perplexity").

    Returns ``(lang, id_col, xent_r, bucket)``.

    Scale shape: scoring is :func:`lm_perplexity` (one train aggregate
    + one scoring pass); the cut points are one (lang, two-doubles)
    row per language — broadcast back, assignment row-local. The
    exact ``percentile`` keeps the oracle bit-replayable; a production
    run at 100 TB would swap in ``approx_percentile`` (same two-pass
    broadcast shape, documented trade).

    Documents with NULL ``lang_col`` carry no bucket either (a
    tercile is per-LANGUAGE-cohort; there is no cohort to cut
    against) — filtered EXPLICITLY up front, not dropped as a side
    effect of the NULL-never-matches equi-join, so they also never
    leak into a NULL-lang cuts group."""
    scored = lm_perplexity(docs, target, id_col, text_col, alpha)
    sx = (
        scored.filter(F.col("n_scored") >= 1)
        .select(id_col, F.round("xent", round_dp).alias("xent_r"))
        .join(docs.filter(F.col(lang_col).isNotNull())
              .select(id_col, F.col(lang_col).alias("lang")), id_col)
    )
    cuts = sx.groupBy("lang").agg(
        F.percentile("xent_r", F.lit([1 / 3, 2 / 3])).alias("_c"))
    return (
        sx.join(F.broadcast(cuts), "lang")
        .withColumn(
            "bucket",
            F.when(F.col("xent_r") <= F.col("_c")[0], "head")
            .when(F.col("xent_r") <= F.col("_c")[1], "middle")
            .otherwise("tail"),
        )
        .select("lang", id_col, "xent_r", "bucket")
    )


def _sql_str_lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_fold_expr(lhs: str, rhs: str, col: str = "syms"):
    """One BPE merge applied left-to-right non-overlapping to a symbol
    array, as a JVM ``aggregate()`` fold. CASE arms are evaluated in
    order, so ``element_at`` never sees an empty accumulator
    (guaranteed short-circuit, ANSI-mode safe). Exact under the fold
    because ``lhs||rhs`` can never compare equal to ``lhs`` (``rhs``
    is non-empty), so a symbol just produced cannot be re-consumed as
    the left side of the same merge (``aaaa`` + (a,a) → ``[aa, aa]``)."""
    merged = lhs + rhs
    return F.expr(
        f"aggregate({col}, cast(array() as array<string>), (acc, s) -> "
        "case when size(acc) = 0 then array(s) "
        f"when element_at(acc, -1) = {_sql_str_lit(lhs)} "
        f"and s = {_sql_str_lit(rhs)} "
        f"then concat(slice(acc, 1, size(acc) - 1), "
        f"array({_sql_str_lit(merged)})) "
        "else concat(acc, array(s)) end)"
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", text_col: str = "text",
               checkpoint_every: int = 8) -> DataFrame:
    """Tokenize the corpus with a TRAINED BPE merge list (the apply
    half of Sennrich et al. 2016; :func:`bpe_train` produces the
    merges): per document, the word count and the subword-token count
    after applying every merge in order, left-to-right non-overlapping
    per word. Returns ``(id_col, n_words, n_tokens)``; documents with
    no words (empty or NULL text) report 0/0 — the per-doc cost
    column a token-budget pipeline (:func:`...sampling.budget_select`)
    consumes.

    Scale shape — the corpus is never re-tokenized per merge:

    - ONE corpus pass builds ``(doc, word, count)`` (map-side combined;
      the exchange carries ids and counts, bounded by per-doc distinct
      words, never text bodies);
    - the merge loop runs over the DISTINCT-WORD vocabulary only, each
      merge a codegen ``aggregate()`` fold over the symbol array (no
      Python), ``localCheckpoint``-ed every ``checkpoint_every`` merges
      so plan depth stays bounded regardless of merge-list length;
    - per-word token counts then join back to the (doc, word) frame —
      vocabulary-sized build side, AQE broadcasts it when small;
    - the id spine (one more column-pruned scan of ``docs``) restores
      wordless documents via a left join.
    """
    wpd = (
        docs.select(F.col(id_col), F.explode(word_tokens(text_col))
                    .alias("word"))
        .groupBy(id_col, "word").agg(F.count("*").alias("wc"))
    )
    vocab = (
        wpd.select("word").distinct()
        .select(
            "word",
            F.expr("transform(sequence(1, length(word)), "
                   "i -> substring(word, i, 1))").alias("syms"),
        )
    )
    for i, (lhs, rhs) in enumerate(merges):
        vocab = vocab.select(
            "word", _merge_fold_expr(lhs, rhs).alias("syms"))
        if (i + 1) % checkpoint_every == 0 and i + 1 < len(merges):
            vocab = vocab.localCheckpoint(eager=True)
    per_word = vocab.select("word", F.size("syms").alias("_n_sub"))
    agg = (
        wpd.join(per_word, "word")
        .groupBy(id_col)
        .agg(F.sum("wc").alias("n_words"),
             F.sum(F.col("wc") * F.col("_n_sub")).alias("n_tokens"))
    )
    ids = docs.select(id_col).distinct()
    return ids.join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
    )


def bpe_train(docs: DataFrame, n_merges: int = 20,
              text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Train a BPE merge list on the corpus (the full training loop of
    Sennrich et al. 2016, of which :func:`bpe_pair_counts` is one
    step): start from character symbols, repeatedly merge the globally
    most-frequent adjacent symbol pair (ties broken by (lhs, rhs)
    ascending), ``n_merges`` times. Returns the ordered merge table
    ``(step, lhs, rhs, merged, pair_count)`` — the trained tokenizer.

    Scale shape — the reason this runs at 100 TB:

    - the CORPUS-sized pass happens ONCE: the word-count aggregate
      (map-side combined, shuffling ``(word, count)`` pairs bounded by
      the vocabulary, not corpus tokens);
    - the merge loop then runs DRIVER-SIDE on the collected
      (word, count) vocabulary with incremental pair-count updates
      (each merge touches only the words that actually contain the
      winning pair, via a pair→words index) — the classic fast BPE
      trainer. This replaces the earlier one-Spark-job-per-merge loop,
      which at a real 32k-merge vocabulary meant 32k sequential jobs;
      the distributed path (:func:`bpe_encode`) is unchanged.
    - the collect is VOCABULARY-sized, not corpus-sized; at true web
      scale pass ``min_count`` > 1 to bound it (standard practice —
      hapax "words" are noise the trainer should never see anyway).
      The default ``min_count=1`` keeps exact parity with the golden
      fixtures.

    The merge is applied left-to-right non-overlapping per word, the
    same semantics as :func:`bpe_encode`'s JVM fold: a symbol just
    produced by this round's merge cannot be re-consumed as the left
    side of the same merge (``aaaa`` + (a,a) → ``[aa, aa]``).
    """
    vocab_df = (
        docs.select(F.explode(word_tokens(text_col)).alias("word"))
        .groupBy("word").agg(F.count("*").alias("wc"))
        .filter(F.length("word") >= 2)
    )
    if min_count > 1:
        vocab_df = vocab_df.filter(F.col("wc") >= min_count)
    rows = vocab_df.collect()

    words = [list(r["word"]) for r in rows]
    wcs = [int(r["wc"]) for r in rows]

    from collections import defaultdict

    pair_count: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for i, syms in enumerate(words):
        wc = wcs[i]
        for a, b in zip(syms, syms[1:]):
            pair_count[(a, b)] += wc
            pair_words[(a, b)].add(i)

    merges = []
    for step in range(1, n_merges + 1):
        if not pair_count:
            break
        # max count, ties by (lhs, rhs) ascending — Python's per-code-
        # point string order matches Spark's UTF-8 binary string order
        # (UTF-8 is order-preserving), so the winner is identical to
        # the old orderBy(desc(count), lhs, rhs).limit(1)
        (lhs, rhs), cnt = min(pair_count.items(),
                              key=lambda kv: (-kv[1], kv[0]))
        merged = lhs + rhs
        merges.append((step, lhs, rhs, merged, int(cnt)))
        for i in sorted(pair_words[(lhs, rhs)]):
            syms, wc = words[i], wcs[i]
            # retire this word's old pair contributions…
            for a, b in zip(syms, syms[1:]):
                pair_count[(a, b)] -= wc
                if pair_count[(a, b)] <= 0:
                    del pair_count[(a, b)]
                pair_words[(a, b)].discard(i)
            # …apply the merge left-to-right non-overlapping…
            new, j, n = [], 0, len(syms)
            while j < n:
                if j + 1 < n and syms[j] == lhs and syms[j + 1] == rhs:
                    new.append(merged)
                    j += 2
                else:
                    new.append(syms[j])
                    j += 1
            words[i] = new
            # …and re-index the surviving pairs (a 1-symbol word has
            # none — it leaves the working set, as before)
            for a, b in zip(new, new[1:]):
                pair_count[(a, b)] += wc
                pair_words[(a, b)].add(i)
        pair_words.pop((lhs, rhs), None)
    return docs.sparkSession.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, pair_count bigint"
    )

def pmi_collocations(docs: DataFrame, text_col: str = "text",
                     min_count: int = 5, top_n: int = 50) -> DataFrame:
    """Collocation mining by pointwise mutual information (Church &
    Hanks 1990; the phrase-detection score behind word2vec's phrase
    pass): for every adjacent word pair with corpus count >=
    ``min_count``, ``pmi = ln( p(w1,w2) / (p(w1)·p(w2)) )`` with
    ``p(w1,w2) = c12/B`` over B total bigrams and ``p(w) = c/N`` over N
    total tokens. Returns the ``top_n`` pairs as
    ``(lhs, rhs, pair_count, pmi)``, ties by (lhs, rhs) — the phrase
    vocabulary a tokenizer or entity-discovery pass consumes.

    Scale shape: TWO corpus scans — one per counting aggregate
    (unigrams, bigrams), each map-side combined so the exchanges are
    bounded by observed vocabulary. Deliberately NOT one shared pass: a
    checkpoint/persist of the tokenized corpus would materialize
    corpus-sized token arrays to executor disk, which at 100 TB costs
    far more than re-running the regexp tokenizer on a second columnar
    scan of the one projected column. N and
    B fold in as one-row in-plan broadcasts; the unigram joins on the
    bigram table are vocabulary-sized (AQE broadcasts when small); the
    global top-n is a ``TakeOrderedAndProject``. No driver actions, no
    Python."""
    words = docs.select(word_tokens(text_col).alias("_ws"))
    uni = (
        words.select(F.explode("_ws").alias("w"))
        .groupBy("w").agg(F.count("*").alias("c"))
        # feeds N, both prob joins — GC-reclaimed checkpoint
        .localCheckpoint(eager=True)
    )
    n_tok = uni.agg(F.sum("c").alias("_n"))
    bi_all = (
        words.filter(F.size("_ws") >= 2)
        .select(F.explode(F.expr(
            "transform(sequence(1, size(_ws) - 1), "
            "i -> struct(element_at(_ws, i) as lhs, "
            "element_at(_ws, i + 1) as rhs))")).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.count("*").alias("pair_count"))
        .localCheckpoint(eager=True)
    )
    # B is the TOTAL bigram mass (before the frequency floor) — the
    # floor prunes candidates, it must not reweight probabilities
    n_bi = bi_all.agg(F.sum("pair_count").alias("_b"))
    bi = bi_all.filter(F.col("pair_count") >= min_count)
    c1 = uni.select(F.col("w").alias("lhs"), F.col("c").alias("_c1"))
    c2 = uni.select(F.col("w").alias("rhs"), F.col("c").alias("_c2"))
    pmi = F.log(
        (F.col("pair_count") / F.col("_b"))
        / ((F.col("_c1") / F.col("_n")) * (F.col("_c2") / F.col("_n")))
    )
    return (
        bi.join(c1, "lhs").join(c2, "rhs")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bi))
        .select("lhs", "rhs", "pair_count", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "lhs", "rhs")
        .limit(top_n)
    )


def host_profile(pages: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Crawl census: per url host, page count, held-out count (rows
    whose ``text`` is NULL and must be recovered from html), total and
    average text chars, and corpus share — the first report run on a
    new crawl snapshot, and the skew map that justifies the url-host
    partitioning (the synthetic corpus deliberately gives one hub host
    ~20% of pages).

    Scale shape: the corpus is scanned ONCE — a host-keyed aggregate
    whose map-side combine collapses the hub host inside each task
    before the exchange, so host skew never concentrates raw rows on
    one reducer. The corpus share then comes from a global window over
    the AGGREGATED frame (one row per host — a cross-join against a
    re-aggregated total would scan the corpus twice instead).
    Everything is codegen (parse_url, length, conditional counts);
    no UDFs."""

    host = F.expr(f"parse_url({url_col}, 'HOST')")
    per = (
        pages.select(host.alias("host"),
                     F.length(F.col(text_col)).alias("n_chars"))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.when(F.col("n_chars").isNull(), 1).otherwise(0))
            .alias("n_heldout"),
            F.sum("n_chars").alias("n_chars"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )
    # constant non-foldable key (pmod of a non-null long is 0) — the
    # single-partition total over the per-HOST frame is intended, but
    # an empty partition spec would fire the WindowExec warning the
    # codebase reserves for real unbounded-window regressions
    total = F.sum("n_pages").over(
        Window.partitionBy(F.pmod(F.col("n_pages"), F.lit(1))))
    return per.select(
        "host", "n_pages", "n_heldout", "n_chars", "avg_chars",
        F.round(F.col("n_pages") / total, 6).alias("share"),
    )


def textrank_keywords(docs: DataFrame, text_col: str = "text",
                      window: int = 2, top_n: int = 20,
                      iterations: int = 10, damping: float = 0.85,
                      min_len: int = 3) -> DataFrame:
    """Corpus keyword extraction by TextRank (Mihalcea & Tarau, EMNLP
    2004): build the word co-occurrence graph (an undirected edge per
    word pair within ``window`` token positions, weight = corpus
    co-occurrence count; words shorter than ``min_len`` dropped), run
    ``iterations`` rounds of weighted PageRank

        WS(v) = (1 - d) + d * sum_u  w_uv / S(u) * WS(u),

    with ``S(u)`` = u's total edge weight and scores initialized to 1,
    and return the ``top_n`` words as ``(rank, word, score)`` — ties
    by word ascending, scores rounded to 6 dp (the oracle's golden
    twin recomputes the identical fixed-iteration float loop).

    Scale shape:

    - pair generation is IN-PLAN index arithmetic over each document's
      token array (the :func:`~..operators.kg_export.skipgram_pairs`
      pattern — no positional self-join, which would shuffle the
      token stream twice); the only corpus-sized exchange is the
      map-side-combined pair count, bounded by the observed pair
      vocabulary;
    - every PageRank round touches the WORD GRAPH only (vocabulary-
      sized, like the BPE working set): one join + one aggregate per
      round over (word, word, weight) rows, localCheckpoint-ed so the
      plan never grows with the iteration count;
    - the final top-n is a ``TakeOrderedAndProject``.
    """
    if window < 1:
        raise ValueError(f"window={window}: need >= 1")
    toks = docs.select(
        F.expr(
            f"filter(split(lower({text_col}), '[^\\\\p{{L}}\\\\p{{N}}]+'), "
            f"x -> x != '' and length(x) >= {min_len})"
        ).alias("_ws")
    )
    # sequence(1, 0) steps DOWNWARD (the training_triples trap): guard
    # short docs before generating index pairs
    pair_expr = F.expr(f"""
        CASE WHEN size(_ws) < 2 THEN array()
        ELSE flatten(transform(sequence(1, size(_ws) - 1), i ->
          transform(
            filter(sequence(i + 1, least(i + {window}, size(_ws))),
                   j -> element_at(_ws, j) != element_at(_ws, i)),
            j -> struct(
              least(element_at(_ws, i), element_at(_ws, j)) AS w1,
              greatest(element_at(_ws, i), element_at(_ws, j)) AS w2))))
        END
    """)
    und = (
        toks.select(F.explode(pair_expr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count("*").alias("wt"))
    )
    adj = (
        und.select(F.col("w1").alias("u"), F.col("w2").alias("v"), "wt")
        .unionByName(
            und.select(F.col("w2").alias("u"), F.col("w1").alias("v"), "wt"))
    )
    strength = adj.groupBy("u").agg(F.sum("wt").alias("s"))
    links = (
        adj.join(strength, "u")
        .select("u", "v", (F.col("wt") / F.col("s")).alias("frac"))
        .localCheckpoint(eager=True)
    )
    scores = links.select(F.col("u").alias("id")).distinct() \
        .select("id", F.lit(1.0).alias("score"))
    for _ in range(iterations):
        scores = (
            links.join(scores, links["u"] == scores["id"])
            .select("v", (F.col("frac") * F.col("score")).alias("c"))
            .groupBy("v").agg(F.sum("c").alias("c"))
            .select(F.col("v").alias("id"),
                    (F.lit(1.0 - damping) + damping * F.col("c"))
                    .alias("score"))
            .localCheckpoint(eager=True)
        )

    # rank over the ROUNDED score: the oracle's pure-Python twin sums
    # floats in a different order (sub-ulp differences), and a rank
    # computed on raw doubles could flip near-ties across engines;
    # at 6 dp the noise washes out and word-asc breaks real ties
    rounded = scores.select(F.col("id").alias("word"),
                            F.round("score", 6).alias("score"))
    # constant non-foldable partition key for the bounded (≤ vocab)
    # final ranking: cast→pmod is 0 for any O(1)-bounded double (a
    # bare pmod(double, 1) would be the FRACTIONAL PART and split the
    # ranking); x*0 gets folded away, re-emptying the partition spec
    w = Window.partitionBy(
        F.pmod(F.col("score").cast("bigint"), F.lit(1))).orderBy(
        F.col("score").desc(), F.col("word"))
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("rank", "word", "score")
    )


def readability_counts(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Flesch-Kincaid readability INGREDIENTS (Kincaid et al. 1975) —
    the classic prose-difficulty feature in curation stacks (easy
    prose over-represents boilerplate; PhD-ese over-represents OCR
    noise; both tails get inspected). Emits the integer counts and
    leaves the two famous formulas to the caller, keeping floats out
    of the verified path:

    - ``n_sentences`` — terminal-punctuation runs (``[.!?]+``), min 1
    - ``n_words``     — whitespace words, and ``n_syllables`` — vowel
      GROUPS per word (``[aeiouy]+`` runs, case-folded), the standard
      syllable approximation, with the silent-e correction: a word
      ending in ``e`` (not ``le``) with >= 2 vowel groups counts one
      less; every word counts at least 1 when it has a letter

    FK grade = 0.39*(words/sentences) + 11.8*(syllables/words) - 15.59
    — derivable from the outputs by cross-multiplication or division
    downstream. NULL text yields the 0/1/0 empty profile. Row-local
    codegen; zero exchanges."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.coalesce(ws_tokens(text_col), F.array())
    n_words = F.size(words).cast("long")
    # terminal-punct RUNS: count non-empty pieces of the inverse split
    n_sent = F.greatest(F.lit(1), F.size(F.filter(
        F.split(t, r"[^.!?]+"), lambda s: s != F.lit("")))
        .cast("long"))
    # fold each word to its letters before counting, so 'purred!'
    # and 'purred' syllabify identically
    letters = (lambda w: F.regexp_replace(F.lower(w), "[^a-z]", ""))
    syl_of = (lambda w: F.greatest(
        F.when(letters(w) != "", F.lit(1)).otherwise(F.lit(0)),
        F.size(F.filter(F.split(letters(w), r"[^aeiouy]+"),
                        lambda s: s != F.lit("")))
        - F.when(letters(w).rlike("[aeiouy].*[aeiouy]")
                 & letters(w).rlike("[^l]e$"), F.lit(1))
        .otherwise(F.lit(0)),
    ))
    n_syl = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + syl_of(w).cast("long"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
    )


def term_powerlaw(docs: DataFrame, text_col: str = "text",
                  f_min: int = 2) -> DataFrame:
    """Zipf/power-law exponent census of the corpus TERM-FREQUENCY
    distribution — the standard corpus-statistics health check
    (Zipf 1949; estimator: Clauset-Shalizi-Newman SIAM Rev. 2009 eq.
    3.1 over frequencies ≥ ``f_min``), sharing
    :func:`~..graph_analytics.powerlaw_ingredients` with the degree
    census so the two fits can never drift apart. ``n_nodes`` here =
    vocabulary size, ``max_degree`` = the top term's frequency;
    alpha = ``1 + n_tail / (sum_log_1e6 / 1e6)`` row-locally.

    Tokenization is the repo-canonical :func:`word_tokens` (lowercase,
    split on non-letter/digit runs) so Zipf, PMI, and Jaccard all
    census the same vocabulary.

    Scale shape: one explode + (term)-keyed count with map-side
    combine (the term vocabulary bounds the exchange), then the
    bounded frequency census — terms never co-occur on any wire.
    """
    from .graph_analytics import powerlaw_ingredients

    freqs = (docs.select(F.explode(word_tokens(text_col)).alias("w"))
             .groupBy("w")
             .agg(F.count("*").cast("long").alias("f")))
    return powerlaw_ingredients(freqs, "f", f_min)


# RAKE's phrase-boundary lexicon: function words that terminate a
# candidate phrase (Rose et al. 2010 use a full stoplist; this fixed
# 32-word core keeps the operator deterministic and the SQL oracle
# literal). Module-level so the oracle generator injects the SAME list.
RAKE_STOPWORDS = (
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on",
    "at", "for", "with", "by", "from", "as", "is", "are", "was",
    "were", "be", "been", "it", "its", "this", "that", "these",
    "those", "their", "they", "we", "you",
)


def rake_stop_pattern(stopwords: tuple) -> str:
    """Regex alternation over the stopword list, each word escaped
    (``re.escape`` output is valid in both Java regex and RE2) —
    shared by :func:`rake_phrases` and the SQL oracle generator so a
    stopword carrying a metacharacter can't corrupt either parse."""
    import re

    if not stopwords:
        raise ValueError("rake stopword list must be non-empty "
                         "(an empty alternation matches every word "
                         "boundary and shreds all text)")
    return "|".join(re.escape(w) for w in stopwords)


def rake_phrases(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 stopwords: tuple = RAKE_STOPWORDS,
                 min_words: int = 2, max_words: int = 4) -> DataFrame:
    """RAKE candidate keyphrases (Rose, Engel, Cramer, Cowley 2010
    "Automatic keyword extraction from individual documents"):
    candidate phrases are maximal stopword-free word runs; each
    word's degree is the total size of the phrases it appears in and
    its frequency is its phrase-occurrence count; a phrase's score is
    the sum over its words of degree/frequency. This emits the
    INTEGER ingredients — ``sum_deg`` and ``sum_freq`` per distinct
    phrase — plus occurrence/document counts, keeping the output
    hash-stable (the float ratio is a row-local division for API
    users).

    Returns ``(phrase, n_words, n_occur, n_docs, sum_deg,
    sum_freq)``.

    Scale shape: texts fold row-locally to phrase strings (lower →
    non-alphanumeric collapse → stopword-boundary split — all
    codegen regex, shared verbatim with the RE2 oracle); word stats
    are one vocabulary-bounded aggregate; the phrase table exchanges
    phrase strings and longs only. The word-stats join is keyed on
    single words — the stopword band is already cut, so no 'the'-
    scale hot key exists by construction.
    """
    alt = rake_stop_pattern(stopwords)
    s = F.lower(F.col(text_col))
    s = F.regexp_replace(s, "[^a-z0-9]+", " ")
    s = F.regexp_replace(s, rf"\b({alt})\b", "|")
    cand = (docs.select(F.col(id_col).alias("_doc"),
                        F.explode(F.split(s, r"\|")).alias("_p"))
            .select("_doc",
                    F.trim(F.regexp_replace(F.col("_p"), " +", " "))
                    .alias("phrase"))
            .filter(F.col("phrase") != "")
            .withColumn("n_words", F.size(F.split(F.col("phrase"), " "))
                        .cast("long")))
    # feeds word stats AND the filtered phrase table
    cand = cand.localCheckpoint(eager=True)
    # word degree/frequency come from ALL candidate runs — RAKE's
    # definition. Filtering first would erase the contribution of
    # runs outside [min_words, max_words] (e.g. a standalone 'dog'
    # under min_words=2) and inflate the deg/freq of multi-word
    # phrases sharing those words; only the EMITTED phrases obey the
    # length band.
    words = cand.select("n_words",
                        F.explode(F.split("phrase", " ")).alias("w"))
    stats = words.groupBy("w").agg(
        F.count("*").cast("long").alias("_freq"),
        F.sum("n_words").cast("long").alias("_deg"))
    inst = cand.filter((F.col("n_words") >= int(min_words))
                       & (F.col("n_words") <= int(max_words)))
    phrases = inst.groupBy("phrase", "n_words").agg(
        F.count("*").cast("long").alias("n_occur"),
        F.count_distinct(F.col("_doc")).cast("long").alias("n_docs"))
    pw = phrases.select("phrase",
                        F.explode(F.split("phrase", " ")).alias("w"))
    scores = (pw.join(stats, "w")
              .groupBy("phrase")
              .agg(F.sum("_deg").cast("long").alias("sum_deg"),
                   F.sum("_freq").cast("long").alias("sum_freq")))
    return (phrases.join(scores, "phrase")
            .select("phrase", "n_words", "n_occur", "n_docs",
                    "sum_deg", "sum_freq"))


def texttiling_ingredients(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           block_words: int = 20) -> DataFrame:
    """TextTiling gap statistics (Hearst, CL 1997 "TextTiling:
    Segmenting text into multi-paragraph subtopic passages"): the
    text splits into fixed ``block_words``-token blocks; for every
    internal gap the lexical-cohesion score is the cosine between
    the adjacent blocks' term-count vectors — topic boundaries are
    the cosine valleys. This emits the INTEGER ingredients per gap —
    ``dot`` (term-count dot product) and both squared norms — so the
    output is hash-stable and the cosine ``dot/sqrt(na2*nb2)`` is a
    row-local division for API users.

    Returns ``(doc_id, gap, dot, na2, nb2)``, ``gap`` = index of the
    left block (0-based); docs with fewer than 2 blocks emit no rows.

    Scale shape: tokens fold row-locally to (doc, block, word,
    count) — the only exchange key, bounded by text length — then
    one adjacent-block self-join per (doc, word) and one squared-
    norm aggregate; gaps sharing no word still surface via the
    norm-frame join with ``dot = 0``. No window, no collect, no
    position reindexing shuffle.
    """
    arr = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                   lambda x: x != "")
    tok = (docs.select(F.col(id_col).alias("_doc"),
                       F.posexplode(arr).alias("_pos", "_w"))
           .select("_doc", F.floor(F.col("_pos") / block_words)
                   .alias("_b"), "_w"))
    counts = (tok.groupBy("_doc", "_b", "_w")
              .agg(F.count("*").cast("long").alias("_c"))
              .localCheckpoint(eager=True))  # feeds norms AND dots
    norms = counts.groupBy("_doc", "_b").agg(
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_n2"))
    na = norms.select("_doc", F.col("_b").alias("gap"),
                      F.col("_n2").alias("na2"))
    nb = norms.select("_doc", (F.col("_b") - 1).alias("gap"),
                      F.col("_n2").alias("nb2"))
    gaps = na.join(nb, ["_doc", "gap"])
    ca = counts.select("_doc", F.col("_b").alias("gap"), "_w",
                       F.col("_c").alias("_ca"))
    cb = counts.select("_doc", (F.col("_b") - 1).alias("gap"), "_w",
                       F.col("_c").alias("_cb"))
    dots = (ca.join(cb, ["_doc", "gap", "_w"])
            .groupBy("_doc", "gap")
            .agg(F.sum(F.col("_ca") * F.col("_cb")).cast("long")
                 .alias("dot")))
    return (gaps.join(dots, ["_doc", "gap"], "left")
            .select(F.col("_doc").alias(id_col),
                    F.col("gap").cast("long").alias("gap"),
                    F.coalesce(F.col("dot"), F.lit(0)).cast("long")
                    .alias("dot"), "na2", "nb2"))


def heaps_census(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 buckets: int = 10) -> DataFrame:
    """Heaps'-law vocabulary-growth census (Heaps 1978; Baeza-Yates
    & Ribeiro-Neto ch. 6): cumulative token count vs cumulative
    DISTINCT vocabulary over growing corpus prefixes — the curve
    whose V ≈ k·nᵝ fit sizes tokenizer vocabularies and dedup hash
    tables before a full crawl lands.

    The corpus orders by ``id_col`` and folds into ``buckets`` equal
    id-range slices; for prefix k the census reports total tokens
    and distinct vocabulary of slices 1..k. The vocabulary of a
    PREFIX needs no per-prefix distinct pass: a word belongs to
    prefix k iff its FIRST slice <= k, so one (word -> min slice)
    aggregate plus a slice histogram gives every prefix via a
    running sum over ``buckets`` rows.

    Returns per prefix: ``(prefix, n_tokens, n_vocab)``,
    ``prefix`` in 1..buckets.

    Scale shape: one row-local tokenize, one (word)-keyed min/count
    aggregate (vocabulary-bounded), then window arithmetic over the
    ``buckets``-row summary — keyed by a constant non-foldable
    partition so the plan carries no real unpartitioned window.
    """
    from pyspark.sql.types import IntegralType


    # the slice arithmetic is closed-form over a numeric id range; a
    # string id would NULL out silently (least() skips NULLs) and
    # pile the whole corpus into the LAST slice — reject loudly
    if not isinstance(docs.schema[id_col].dataType, IntegralType):
        raise ValueError(
            f"heaps_census needs an integral {id_col!r} (got "
            f"{docs.schema[id_col].dataType.simpleString()}); derive "
            "one upstream, e.g. xxhash64 of the natural key")
    # NULL ids carry no position in the prefix order — drop them
    # (a NULL slice would also sort NULLS FIRST in Spark but NULLS
    # LAST in DuckDB, silently skewing the running sums)
    docs = docs.filter(F.col(id_col).isNotNull())
    ids = docs.select(F.col(id_col).alias("_id"))
    lo_hi = ids.agg(F.min("_id").alias("_lo"),
                    F.max("_id").alias("_hi"))
    b = int(buckets)
    # slice = 1..b by id position in [lo, hi] (closed-form, no sort;
    # all arithmetic in DOUBLE — hash-derived ids span the full int64
    # range, where id - lo and hi - lo + 1 overflow long); tokens are
    # the repo-canonical word_tokens so the census composes with the
    # Zipf/Yule vocabulary as documented (the old ASCII-only split
    # censused nothing on CJK text)
    toks = (docs.crossJoin(F.broadcast(lo_hi))
            .select(
                F.least(F.lit(b), (F.floor(
                    (F.col(id_col).cast("double")
                     - F.col("_lo").cast("double"))
                    * b / (F.col("_hi").cast("double")
                           - F.col("_lo").cast("double") + 1)) + 1)
                    .cast("int")).alias("_s"),
                F.explode(word_tokens(text_col)).alias("_w")))
    per_word = toks.groupBy("_w").agg(
        F.min("_s").alias("_first"),
        F.count("*").cast("long").alias("_n"))
    tok_hist = (toks.groupBy("_s")
                .agg(F.count("*").cast("long").alias("_tok")))
    voc_hist = (per_word.groupBy(F.col("_first").alias("_s"))
                .agg(F.count("*").cast("long").alias("_voc")))
    # dense 1..buckets slice spine: an id-range slice holding no
    # document still gets its prefix row (repeating the cumulative
    # totals) — sparse/skewed doc ids must not punch holes in the
    # growth curve a Heaps' fit consumes
    spine = (docs.sparkSession.range(1, b + 1)
             .select(F.col("id").cast("int").alias("_s")))
    grid = (spine.join(tok_hist, "_s", "left")
            .join(voc_hist, "_s", "left")
            .select(F.col("_s"),
                    F.coalesce("_tok", F.lit(0)).alias("_tok"),
                    F.coalesce("_voc", F.lit(0)).alias("_voc")))
    w = (Window.partitionBy(F.pmod(F.col("_s"), F.lit(1)))
         .orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid
            .withColumn("n_tokens", F.sum("_tok").over(w).cast("long"))
            .withColumn("n_vocab", F.sum("_voc").over(w).cast("long"))
            .select(F.col("_s").cast("long").alias("prefix"),
                    "n_tokens", "n_vocab"))


def term_dispersion(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    min_cf: int = 5) -> DataFrame:
    """Term burstiness/dispersion census (Church & Gale 1995
    "Poisson mixtures"): collection frequency vs document frequency
    vs peak within-document frequency per term. cf/df >> 1 with a
    high max_tf marks BURSTY content words (they arrive in clumps);
    cf/df ≈ 1 marks dispersed function words — the statistic that
    separates topical vocabulary from glue without any stoplist,
    and a spam signal (keyword stuffing = extreme max_tf).

    Returns ``(term, cf, df, max_tf)`` for terms with ``cf >=
    min_cf`` — all integers.

    Scale shape: one row-local tokenize, one (doc, term) count
    aggregate (map-side combined), one term-keyed fold. The term
    key space is the vocabulary; the cf filter bounds the output.
    """
    tf = (docs.select(F.col(id_col).alias("_doc"),
                      F.explode(F.split(F.lower(F.col(text_col)),
                                        "[^a-z0-9]+")).alias("term"))
          .filter(F.col("term") != "")
          .groupBy("_doc", "term")
          .agg(F.count("*").cast("long").alias("_tf")))
    return (tf.groupBy("term")
            .agg(F.sum("_tf").cast("long").alias("cf"),
                 F.count("*").cast("long").alias("df"),
                 F.max("_tf").cast("long").alias("max_tf"))
            .filter(F.col("cf") >= int(min_cf)))


def yule_census(docs: DataFrame, slice_col: str = "lang",
                text_col: str = "text") -> DataFrame:
    """Yule's characteristic K ingredients per corpus slice (Yule,
    "The Statistical Study of Literary Vocabulary", 1944): the
    classic repeat-rate / lexical-diversity statistic

        K = 10^4 * (S2 - N) / N^2,   S2 = sum over types of f^2

    — N tokens, V types, S2 the repeat-rate second moment. K is
    length-robust (unlike raw type/token ratio) and is the standard
    stylometry / corpus-drift alarm: template-generated or
    boilerplate-heavy slices spike K. The census stays INTEGER —
    ``(slice, n_tokens, n_types, sum_f_sq)`` — so it hashes stably
    cross-engine; K is a row-local division for API users.

    Tokenization is the repo-canonical :func:`word_tokens`, the same
    vocabulary as Zipf / Heaps / PMI so the censuses compose.

    Scale shape: one explode + (slice, term)-keyed count with
    map-side combine (exchange bounded by per-slice vocabulary),
    then one slice-keyed fold. Terms never co-occur on any wire."""

    freqs = (docs.select(F.col(slice_col).alias("slice"),
                         F.explode(word_tokens(text_col)).alias("w"))
             .groupBy("slice", "w")
             .agg(F.count("*").cast("long").alias("f")))
    return (freqs.groupBy("slice")
            .agg(F.sum("f").cast("long").alias("n_tokens"),
                 F.count("*").cast("long").alias("n_types"),
                 F.sum(F.col("f") * F.col("f")).cast("long")
                 .alias("sum_f_sq")))


def log_odds_terms(docs: DataFrame, group_a, group_b,
                   slice_col: str = "lang", text_col: str = "text",
                   alpha: float = 0.01, min_count: int = 5,
                   top_k: int = 50) -> DataFrame:
    """Distinctive-term extraction between two corpus slices via
    log-odds with an informative Dirichlet prior (Monroe, Colaresi &
    Quinn 2008, "Fightin' Words" — the corpus-comparison method that
    fixes naive log-ratio's low-frequency explosions): for term w
    with counts ``f_a, f_b`` and slice totals ``n_a, n_b``,

        delta_w = ln((f_a + a) / (n_a - f_a + a))
                - ln((f_b + a) / (n_b - f_b + a))
        z_w     = delta_w / sqrt(1/(f_a + a) + 1/(f_b + a))

    Returns the ``top_k`` most-a-distinctive terms: ``(term, f_a,
    f_b, z)`` with ``z`` rounded to 6 dp, ranked by (rounded z desc,
    term) — counts are exact integers and z is row-local arithmetic
    on them, so the output is hash-stable cross-engine.

    Scale shape: one explode + (slice, term) count per side
    (vocabulary-bounded, map-side combined), a full outer join on
    the term key, two one-row total aggregates broadcast in-plan,
    then a salt-free top-k over the already-vocabulary-bounded
    scored frame."""


    def _counts(group):
        vals = group if isinstance(group, (list, tuple)) else [group]
        return (docs.filter(F.col(slice_col).isin(list(vals)))
                .select(F.explode(word_tokens(text_col)).alias("w"))
                .groupBy("w")
                .agg(F.count("*").cast("long").alias("f")))

    ca = _counts(group_a)
    cb = _counts(group_b)
    joined = (ca.select("w", F.col("f").alias("f_a"))
              .join(cb.select("w", F.col("f").alias("f_b")),
                    "w", "full")
              .select("w",
                      F.coalesce(F.col("f_a"), F.lit(0)).alias("f_a"),
                      F.coalesce(F.col("f_b"), F.lit(0)).alias("f_b"))
              .filter(F.col("f_a") + F.col("f_b") >= min_count))
    na = ca.agg(F.coalesce(F.sum("f"), F.lit(0)).alias("n_a"))
    nb = cb.agg(F.coalesce(F.sum("f"), F.lit(0)).alias("n_b"))
    a = float(alpha)
    scored = (joined.crossJoin(F.broadcast(na))
              .crossJoin(F.broadcast(nb))
              .select("w", "f_a", "f_b",
                      F.round(
                          (F.log((F.col("f_a") + a)
                                 / (F.col("n_a") - F.col("f_a") + a))
                           - F.log((F.col("f_b") + a)
                                   / (F.col("n_b") - F.col("f_b") + a)))
                          / F.sqrt(1.0 / (F.col("f_a") + a)
                                   + 1.0 / (F.col("f_b") + a)),
                          6).alias("z")))
    w = Window.partitionBy(F.pmod(F.col("f_a"), F.lit(1))).orderBy(
        F.col("z").desc(), F.col("w"))
    return (scored
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= top_k)
            .select(F.col("w").alias("term"), "f_a", "f_b", "z",
                    "rank"))


def kneser_ney_ingredients(docs: DataFrame, text_col: str = "text",
                           min_count: int = 2) -> DataFrame:
    """Modified Kneser-Ney bigram ingredients (Kneser & Ney, ICASSP
    1995; Chen & Goodman 1999) — the integer sufficient statistics
    of the standard n-gram LM smoother, per bigram with count >=
    ``min_count``:

    - ``c_big``: bigram count; ``c_w1``: left-unigram count as a
      bigram HISTORY (sum of its bigram counts — the correct KN
      denominator, not the raw token count);
    - ``n1p_hist``: distinct continuations of w1 (``N1+(w1 •)``, the
      backoff-weight numerator);
    - ``n1p_cont``: distinct histories of w2 (``N1+(• w2)``, the
      continuation-probability numerator).

    With the corpus constants (total bigram types for the
    continuation denominator; discount ``D = n1/(n1+2 n2)`` from the
    count-of-counts, both derivable from this frame), the KN
    probability ``max(c_big - D, 0)/c_w1 + D·n1p_hist/c_w1 ·
    n1p_cont/T`` is row-local arithmetic — the census stays INTEGER
    so it hashes stably cross-engine.

    Tokenization is the repo-canonical :func:`word_tokens`; bigrams
    never cross documents.

    Scale shape: one explode to (doc-local) bigrams, one
    (w1, w2)-keyed count with map-side combine (exchange bounded by
    the bigram vocabulary), then two vocabulary-keyed folds joined
    back — words never co-occur on any wire beyond the bigram key
    itself."""

    toks = docs.select(word_tokens(text_col).alias("ws"))
    # docs with < 2 tokens carry no bigram — and MUST be filtered:
    # sequence(0, size-2) steps DOWNWARD for them, generating
    # negative indexes that ANSI Spark raises as INVALID_ARRAY_INDEX
    # (the training_triples trap, same guard as textrank/pmi)
    bigrams = (toks.filter(F.size("ws") >= 2)
               .select(F.explode(F.expr(
                   "transform(sequence(0, size(ws) - 2), "
                   "i -> struct(ws[i] AS w1, ws[i+1] AS w2))"))
                   .alias("b"))
               .select("b.w1", "b.w2"))
    cb = (bigrams.groupBy("w1", "w2")
          .agg(F.count("*").cast("long").alias("c_big")))
    hist = (cb.groupBy("w1")
            .agg(F.sum("c_big").cast("long").alias("c_w1"),
                 F.count("*").cast("long").alias("n1p_hist")))
    cont = (cb.groupBy("w2")
            .agg(F.count("*").cast("long").alias("n1p_cont")))
    return (cb.filter(F.col("c_big") >= int(min_count))
            .join(hist, "w1").join(cont, "w2")
            .select("w1", "w2", "c_big", "c_w1", "n1p_hist",
                    "n1p_cont"))


def good_turing_census(docs: DataFrame, text_col: str = "text",
                       max_r: int = 0) -> DataFrame:
    """Simple Good-Turing frequency-of-frequencies census (Good,
    Biometrika 1953; Gale & Sampson, J. Quant. Linguistics 1995):
    for each observed term frequency r, how many DISTINCT terms
    occur exactly r times (N_r), plus each r's nearest observed
    neighbors below and above — the exact ingredients of the SGT
    smoothed estimate ``Z_r = 2 N_r / (r_next - r_prev)`` and of
    the unseen-mass estimate ``P_0 = N_1 / N``. This is the count
    table every open-vocabulary LM smoother (Good-Turing, and the
    discount fits behind Kneser-Ney) consumes, and at corpus scale
    the Zipf tail diagnostic (N_1/V ~ hapax rate).

    Returns ``(r, n_r, r_prev, r_next)`` — all BIGINT; ``r_prev``
    is 0 for the smallest r and ``r_next`` is ``2*r - r_prev`` for
    the largest (Gale & Sampson's boundary convention), so Z_r is
    row-local everywhere. ``max_r > 0`` truncates the table (the
    SGT switch point makes the deep tail irrelevant).

    Scale shape: one row-local tokenize, one vocabulary-bounded
    (term -> r) count, one (r -> N_r) count-of-counts fold (output
    rows ~ O(sqrt(total tokens)) by Zipf), then lag/lead windows
    over THAT summary only — keyed by a constant non-foldable
    partition, so no corpus-scale row ever meets a window.
    """

    tf = (docs.select(F.explode(F.split(F.lower(F.col(text_col)),
                                        "[^a-z0-9]+")).alias("_w"))
          .filter(F.col("_w") != "")
          .groupBy("_w").agg(F.count("*").cast("long").alias("_r")))
    coc = tf.groupBy(F.col("_r").alias("r")).agg(
        F.count("*").cast("long").alias("n_r"))
    if int(max_r) > 0:
        coc = coc.filter(F.col("r") <= int(max_r))
    w = (Window.partitionBy(F.pmod(F.col("r"), F.lit(1)))
         .orderBy("r"))
    return (coc
            .withColumn("r_prev",
                        F.coalesce(F.lag("r").over(w),
                                   F.lit(0).cast("long")))
            .withColumn("r_next",
                        F.coalesce(F.lead("r").over(w),
                                   (F.lit(2) * F.col("r")
                                    - F.col("r_prev")).cast("long")))
            .select("r", "n_r", "r_prev", "r_next"))


def gini_ingredients(docs: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """Token-inequality census: the INTEGER ingredients of the Gini
    coefficient / Lorenz curve of the term-frequency distribution
    (Gini 1912; the vocabulary-concentration diagnostic — a crawl
    whose token mass collapses onto boilerplate terms shows G -> 1,
    and drift in G between crawls flags template contamination
    before any dedup runs).

    The key identity makes this summary-scale: with terms sorted by
    ascending count, ``S = Σ rank_i·count_i`` never needs per-term
    ranks — ranks within an equal-count group are interchangeable,
    so each (count c, group size m, offset o = #terms with smaller
    count) contributes ``c·(m·o + m(m+1)/2)`` and the whole sum
    folds over the COUNT-OF-COUNTS table (~O(sqrt(total tokens))
    rows by Zipf). ``G = 2S/(n·T) − (n+1)/n`` is a row-local
    division for the caller.

    Returns ONE row ``(n_terms, total_tokens, rank_weighted_sum)``,
    all BIGINT — integer-exact cross-engine. Overflow bound:
    ``S <= n_terms · total_tokens`` (BIGINT-safe to ~10^9 terms ×
    10^9 tokens; swap DECIMAL(38) in past that).

    Scale shape: one row-local tokenize, one vocabulary-bounded
    term count, one count-of-counts fold, then a running sum over
    THAT summary only (constant non-foldable partition key).
    """

    tf = (docs.select(F.explode(F.split(F.lower(F.col(text_col)),
                                        "[^a-z0-9]+")).alias("_w"))
          .filter(F.col("_w") != "")
          .groupBy("_w").agg(F.count("*").cast("long").alias("_c")))
    coc = tf.groupBy(F.col("_c").alias("c")).agg(
        F.count("*").cast("long").alias("m"))
    w = (Window.partitionBy(F.pmod(F.col("c"), F.lit(1)))
         .orderBy("c")
         .rowsBetween(Window.unboundedPreceding, -1))
    contrib = (coc
               .withColumn("o", F.coalesce(F.sum("m").over(w),
                                           F.lit(0).cast("long")))
               .select(
                   "c", "m", "o",
                   (F.col("c") * (F.col("m") * F.col("o")
                                  + F.expr("(m * (m + 1)) DIV 2")))
                   .cast("long").alias("_s")))
    return contrib.agg(
        F.sum("m").cast("long").alias("n_terms"),
        F.sum(F.col("c") * F.col("m")).cast("long")
        .alias("total_tokens"),
        F.sum("_s").cast("long").alias("rank_weighted_sum"))


def stylometry_ingredients(docs: DataFrame, source_col: str = "source",
                           text_col: str = "text",
                           top_f: int = 30) -> DataFrame:
    """Burrows' Delta ingredient matrix (Burrows, LLC 2002 "'Delta':
    a measure of stylistic difference"; Evert et al. 2017 for the
    modern form): per (marker word, source), the INTEGER counts
    behind the function-word frequency profile — the stylometric
    signature that attributes authorship, flags machine-templated
    hosts, and detects register drift between crawl snapshots. The
    marker vocabulary is the corpus's ``top_f`` most frequent words
    (Burrows' convention: frequent words are topic-free), selected
    deterministically by (corpus frequency desc, word asc).

    Returns ``(rank, word, source, n_word, n_source_tokens)`` — the
    full matrix, all integers. Delta itself (z-score each word's
    relative frequency across sources, then mean |z_a − z_b| per
    source pair) is a bounded F×S-matrix computation the caller
    runs on these sufficient statistics; keeping floats out of the
    operator keeps the census hash-exact cross-engine.

    Scale shape: one vocabulary-bounded corpus count; the top-F
    selection is a TakeOrdered over the vocabulary (map-side
    pruned); per-(source, word) and per-source counts are
    map-side-combined aggregates joined on the BROADCAST marker
    list. A missing (source, word) pair surfaces as an explicit
    zero row — the matrix shape is always F × #sources."""

    base = (docs.filter(F.col(source_col).isNotNull())
            .select(F.col(source_col).alias("source"),
                    F.explode(F.split(F.lower(F.col(text_col)),
                                      "[^a-z0-9]+")).alias("_w"))
            .filter(F.col("_w") != "")
            .localCheckpoint(eager=True))
    cf = base.groupBy("_w").agg(F.count("*").cast("long").alias("_cf"))
    w = (Window.partitionBy(F.pmod(F.col("_cf"), F.lit(1)))
         .orderBy(F.col("_cf").desc(), F.col("_w").asc()))
    markers = (cf.orderBy(F.col("_cf").desc(), F.col("_w").asc())
               .limit(int(top_f))
               .select(F.row_number().over(w).cast("long").alias("rank"),
                       F.col("_w").alias("word")))
    sw = (base.groupBy("source", F.col("_w").alias("word"))
          .agg(F.count("*").cast("long").alias("n_word")))
    stot = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_source_tokens"))
    grid = markers.crossJoin(stot.select("source"))
    return (grid.join(sw, ["source", "word"], "left")
            .join(stot, "source")
            .select("rank", "word", "source",
                    F.coalesce("n_word", F.lit(0).cast("long"))
                    .alias("n_word"),
                    "n_source_tokens"))


def lexrank_summary(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    t_num: int = 3, t_den: int = 10,
                    max_sents: int = 50) -> DataFrame:
    """Extractive summarization via thresholded LexRank (Erkan &
    Radev, JAIR 2004 — the degree variant of §4.1: sentences are
    nodes, an edge joins sentence pairs whose TF cosine clears the
    threshold, and the highest-degree sentence is the extract; the
    paper's own experiments show degree ≈ continuous LexRank at
    t ≈ 0.3): the corpus-scale "one representative sentence per
    document" pass that feeds snippet generation and LLM-context
    compression.

    The threshold is INTEGER-exact: with integer term frequencies,
    ``cos(a, b) >= t_num/t_den  ⇔  t_den²·dot² >= t_num²·|a|²·|b|²``
    (both sides BIGINT, dot >= 0 since tf >= 0) — no sqrt, no
    float, so the adjacency and therefore the summary hash-replay
    exactly. Ties on degree break to the EARLIEST sentence (lead
    bias is the standard extractive prior).

    Returns per document with >= 1 sentence: ``(doc_id, n_sents,
    top_sent_idx, top_degree, summary)`` — idx 0-based in sentence
    order, ``summary`` the winning sentence's trimmed text
    (selection-only string).

    Scale shape: everything is DOC-LOCAL — sentence split and
    tokenize row-local; the pair dot joins on (doc, term) so only
    same-document sentence pairs ever meet; the quadratic is
    bounded by ``max_sents``² per document (later sentences are
    dropped, documented). Exchanges carry (doc, sent-idx, term,
    int) rows. No cross-document work exists at all.
    """
    sents = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.expr(
            f"filter(transform(split({text_col}, '[.!?]+'), "
            f"x -> trim(x)), x -> x != '')"))
        .alias("idx", "sent"))
        .filter(F.col("idx") < int(max_sents))
        .localCheckpoint(eager=True))
    tf = (sents.select(
        "doc_id", "idx",
        F.explode(F.split(F.lower("sent"), "[^a-z0-9]+")).alias("_w"))
        .filter(F.col("_w") != "")
        .groupBy("doc_id", "idx", "_w")
        .agg(F.count("*").cast("long").alias("_tf"))
        .localCheckpoint(eager=True))
    norms = tf.groupBy("doc_id", "idx").agg(
        F.sum(F.col("_tf") * F.col("_tf")).cast("long").alias("_n2"))
    a = tf.select("doc_id", F.col("idx").alias("i"), "_w",
                  F.col("_tf").alias("_ta"))
    b = tf.select("doc_id", F.col("idx").alias("j"), "_w",
                  F.col("_tf").alias("_tb"))
    dots = (a.join(b, ["doc_id", "_w"])
            .filter(F.col("i") < F.col("j"))
            .groupBy("doc_id", "i", "j")
            .agg(F.sum(F.col("_ta") * F.col("_tb")).cast("long")
                 .alias("_dot")))
    na = norms.select("doc_id", F.col("idx").alias("i"),
                      F.col("_n2").alias("_na"))
    nb = norms.select("doc_id", F.col("idx").alias("j"),
                      F.col("_n2").alias("_nb"))
    tn, td = int(t_num), int(t_den)
    edges = (dots.join(na, ["doc_id", "i"]).join(nb, ["doc_id", "j"])
             .filter(F.lit(td * td) * F.col("_dot") * F.col("_dot")
                     >= F.lit(tn * tn) * F.col("_na") * F.col("_nb"))
             .select("doc_id", "i", "j"))
    deg = (edges.select("doc_id", F.col("i").alias("idx"))
           .unionByName(edges.select("doc_id", F.col("j").alias("idx")))
           .groupBy("doc_id", "idx")
           .agg(F.count("*").cast("long").alias("_d")))
    counts = sents.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_sents"))
    ranked = (sents.join(deg, ["doc_id", "idx"], "left")
              .select("doc_id", "idx", "sent",
                      F.coalesce("_d", F.lit(0).cast("long"))
                      .alias("_d"))
              .groupBy("doc_id")
              .agg(F.max(F.struct(F.col("_d"),
                                  (-F.col("idx")).alias("_ni"),
                                  F.col("sent"))).alias("_b")))
    return (counts.join(ranked, "doc_id")
            .select("doc_id", "n_sents",
                    (-F.col("_b._ni")).cast("long").alias("top_sent_idx"),
                    F.col("_b._d").alias("top_degree"),
                    F.col("_b.sent").alias("summary")))
