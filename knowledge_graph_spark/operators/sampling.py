# -*- coding: utf-8 -*-
"""Deterministic sampling and domain-mixture weighting.

A training-data pipeline doesn't sample with an RNG: a resumable
100 TB job needs the SAME rows kept on every rerun, on every cluster
size, from every re-ingest of the same corpus. The standard trick
(used by C4's hash-based splits and every reproducible holdout) is
content-keyed Bernoulli sampling — keep a row iff
``hash(key) mod M < rate * M``. That makes the sample a pure row-local
filter: no shuffle, no state, no seed file, stable under repartition,
and mergeable across incremental batches (a re-crawled url re-samples
to the same decision).

:func:`stratified_mixture` applies per-stratum rates (domain mixture
weighting a la C4/Pile/DoReMi-style recipes downstream of curation):
the rates table is a handful of literals folded into the plan — at any
corpus scale the whole operator is one codegen'd filter over the scan,
with the hash computed JVM-side (``F.xxhash64``, same function the
LSH/fingerprint operators build on; pure-Python twin in
``functions/xxh64.py`` lets oracles reproduce the exact keep set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# threshold denominator: rates are resolved to integer thresholds so
# both engines (and the pure-Python twin) compare exact integers, never
# floats
M = 1_000_000

SPARK_SEED = 42  # Spark's fixed xxhash64 seed


def _keep_expr(key_col: str, threshold: Column, seed: int) -> Column:
    h = (F.xxhash64(F.col(key_col)) if seed == SPARK_SEED
         else F.xxhash64(F.col(key_col), F.lit(seed)))
    return F.pmod(h, F.lit(M)) < threshold


def deterministic_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                         seed: int = SPARK_SEED) -> DataFrame:
    """Content-keyed Bernoulli sample: keeps a row iff
    ``pmod(xxhash64(key), 1e6) < rate * 1e6``. Row-local and
    reproducible. Varying ``seed`` gives INDEPENDENT samples — they
    overlap at ~rate₁·rate₂, they are not disjoint (two hash functions
    don't partition the key space). To carve disjoint subsets use one
    hash with non-overlapping threshold bands: :func:`hash_split`."""
    return df.filter(_keep_expr(key_col, F.lit(int(round(rate * M))), seed))


def _threshold_col(rates: dict[str, float], stratum_col: str,
                   default_rate: float) -> Column:
    pairs: list[Column] = []
    for s, r in rates.items():
        pairs += [F.lit(s), F.lit(int(round(r * M)))]
    return F.coalesce(
        F.create_map(*pairs)[F.col(stratum_col)] if pairs else F.lit(None),
        F.lit(int(round(default_rate * M))),
    )


def stratified_mixture(df: DataFrame, rates: dict[str, float],
                       stratum_col: str = "source",
                       key_col: str = "doc_id",
                       default_rate: float = 0.0,
                       seed: int = SPARK_SEED) -> DataFrame:
    """Per-stratum deterministic sampling rates (domain mixture
    weighting). ``rates`` maps stratum value -> keep rate; strata not
    listed keep at ``default_rate``. The rate map folds into the plan
    as literals — one codegen'd filter, zero joins, zero shuffles."""
    thr = _threshold_col(rates, stratum_col, default_rate)
    return df.filter(_keep_expr(key_col, thr, seed))


def hash_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id", seed: int = SPARK_SEED,
               split_col: str = "split") -> DataFrame:
    """Adds ``split_col`` assigning each row to a named split
    (train/val/test style) with probability proportional to
    ``weights``, deterministically by content key — the reproducible
    holdout construction (a re-ingested document lands in the SAME
    split forever, so eval rows can never leak into training between
    runs). Row-local: a when-chain over cumulative integer thresholds
    on ``pmod(xxhash64(key), 1e6)``; weights are normalized, the last
    split absorbs the rounding tail."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum > 0")
    bad = {k: v for k, v in weights.items() if v < 0}
    if bad:
        # a negative weight makes the cumulative threshold DECREASE,
        # so its split (and any split shadowed by the earlier larger
        # threshold) silently receives zero rows
        raise ValueError(f"negative split weights: {bad}")
    names = list(weights)
    h = (F.xxhash64(F.col(key_col)) if seed == SPARK_SEED
         else F.xxhash64(F.col(key_col), F.lit(seed)))
    bucket = F.pmod(h, F.lit(M))
    expr = None
    acc = 0
    for name in names[:-1]:
        acc += int(round(weights[name] / total * M))
        cond = bucket < F.lit(acc)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def mixture_report(df: DataFrame, rates: dict[str, float],
                   stratum_col: str = "source", key_col: str = "doc_id",
                   default_rate: float = 0.0,
                   seed: int = SPARK_SEED) -> DataFrame:
    """Audit of a mixture plan before committing to it: per stratum,
    total rows, rows the mixture keeps, and the realized rate — the
    numbers a mixture decision is reviewed on. ONE scan and one
    map-side-combined shuffle: the keep decision rides as a conditional
    aggregate, not a second pass."""
    thr = _threshold_col(rates, stratum_col, default_rate)
    keep = _keep_expr(key_col, thr, seed)
    return (
        df.groupBy(stratum_col)
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        )
        .select(
            stratum_col, "n_total", "n_kept",
            F.round(F.col("n_kept") / F.col("n_total"), 6)
            .alias("realized_rate"),
        )
    )


def dsir_weights(docs: DataFrame, target: Column, id_col: str = "doc_id",
                 text_col: str = "text", alpha: float = 1.0) -> DataFrame:
    """Data-selection importance weights (DSIR — Xie et al., NeurIPS
    2023, "Data Selection for Language Models via Importance
    Resampling"), reduced to word-unigram language models: per
    document, the mean log importance ratio
    ``ln(p_target(w) / p_raw(w))`` over its tokens, with add-``alpha``
    smoothing over the shared vocabulary. ``target`` is a boolean
    Column over ``docs`` rows defining the in-domain subset (e.g.
    ``F.col("lang") == "en"``). Feeding the weights into
    :func:`deterministic_sample`-style thresholding reproduces the
    paper's resampling step.

    Returns ``(doc_id, n_terms, dsir_weight)`` for documents with at
    least one token, weight rounded to 6 dp.

    Scale shape:
    - vocabulary statistics are ONE aggregate keyed by term over the
      token stream (map-side combined) emitting
      ``(term, c_raw, c_target)`` — vocabulary-sized output;
    - corpus totals and vocabulary size fold into a one-row broadcast
      aggregate built from the vocabulary frame, never the corpus;
    - scoring joins the token stream to the vocabulary keyed by term:
      hot stopword keys are exactly AQE's skew-join case, and when the
      vocabulary fits the broadcast threshold Catalyst broadcasts it —
      both without driver involvement;
    - the per-doc reduce is one groupBy ``doc_id``. No Python anywhere.
    """
    from ..functions.vectors import word_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target.cast("long").alias("is_t"),
        F.explode(word_tokens(text_col)).alias("term"),
    )
    vocab = toks.groupBy("term").agg(
        F.count("*").alias("c_raw"), F.sum("is_t").alias("c_t"))
    totals = vocab.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_t").alias("n_t"),
        F.count("*").alias("v"))
    a = F.lit(float(alpha))
    log_ratio = (
        F.log((F.col("c_t") + a) / (F.col("n_t") + a * F.col("v")))
        - F.log((F.col("c_raw") + a) / (F.col("n_raw") + a * F.col("v")))
    )
    return (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_terms"),
             F.round(F.avg(log_ratio), 6).alias("dsir_weight"))
    )

def budget_select(docs: DataFrame, budget: int, score: Column,
                  id_col: str = "doc_id",
                  tokens: Column | None = None,
                  text_col: str = "text",
                  boundary_row_cap: int = 4_000_000,
                  refine_buckets: int = 64,
                  max_rounds: int = 12) -> DataFrame:
    """Token-budget data selection: rank documents by
    ``(score DESC, id ASC)`` and keep the prefix whose RUNNING token
    total (inclusive) stays within ``budget`` — the curation step that
    turns "we can afford N tokens" plus a quality/importance score
    (:func:`dsir_weights`, quality metrics) into a concrete training
    subset. ``score`` must be non-negative; zero-token documents and
    NULL-score documents are never selected (an unscored row has no
    defined rank). Returns ``(doc_id, score, n_tokens)``.

    Scale shape — a naive global ``ORDER BY`` window funnels the whole
    corpus through ONE reducer; this is a RECURSIVE distributed prefix
    sum instead:

    1. rows are bucketed by a MONOTONE transform of the score
       (``floor(8·log2(score+1))`` at the top level), so each bucket
       is a contiguous block of the global ranking (ties share a
       bucket by construction);
    2. per-bucket (token total, row count, score min/max) — one tiny
       aggregate, O(buckets) rows — prefix-sums on the driver: whole
       buckets that fit are kept with a plain filter, buckets past the
       boundary are dropped unread;
    3. the single BOUNDARY bucket, if it holds more than
       ``boundary_row_cap`` rows, is re-bucketed by a FINER monotone
       transform (linear slicing of its own [min, max] score range
       into ``refine_buckets`` slices) and step 2 repeats — each round
       shrinks the candidate set geometrically. When the boundary
       bucket is one single tied score, refinement switches to the
       tiebreak key (``doc_id`` ascending: linear range slices for
       numeric ids, lexicographic prefixes for strings — both monotone
       in the tie ordering).
    4. ONLY a boundary set guaranteed ≤ ``boundary_row_cap`` rows
       (or the ``max_rounds`` escape hatch, for adversarially ulp-
       packed scores AND shared-prefix ids together) pays the ordered
       running-sum window, seeded with the tokens the kept buckets
       already consumed. The window carries a constant partition key
       so a genuinely unbounded unpartitioned window stays visible in
       logs.

    The result is row-identical to the one-reducer global window (the
    oracle recomputes it that way)."""
    from pyspark.sql.types import IntegralType

    if tokens is None:
        from ..functions.vectors import n_ws_tokens

        tokens = n_ws_tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), score.alias("score"),
        tokens.cast("long").alias("n_tokens"),
    ).filter((F.col("n_tokens") > 0) & F.col("score").isNotNull())

    id_is_numeric = isinstance(base.schema["doc_id"].dataType, IntegralType)
    # fractional numeric ids would fall to the STRING-prefix tiebreak,
    # whose lexicographic buckets are not monotone in numeric order
    # ('10.5' < '9.2' as text) — the selection would silently diverge
    # from the documented global-window result. Integral and string
    # ids are the supported domains; reject everything else loudly.
    from pyspark.sql.types import StringType

    if not id_is_numeric and not isinstance(
            base.schema["doc_id"].dataType, StringType):
        raise ValueError(
            f"budget_select id_col must be integral or string, got "
            f"{base.schema['doc_id'].dataType.simpleString()} — cast "
            f"fractional ids to string only if their text form sorts "
            f"like their numeric form")
    remaining = int(budget)
    kept: list[DataFrame] = []
    cur = base
    bucket = F.floor(F.log2(F.col("score") + 1) * 8).cast("long")
    on_score, prefix_len = True, 0
    window_input: DataFrame | None = None

    for _ in range(max_rounds):
        keyed = cur.withColumn("_b", bucket)
        stats = keyed.groupBy("_b").agg(
            F.sum("n_tokens").alias("t"), F.count("*").alias("c"),
            F.min("score").alias("smin"), F.max("score").alias("smax"),
            F.min("doc_id").alias("imin"), F.max("doc_id").alias("imax"),
        ).collect()
        # walk buckets in global-rank order: score phase descending,
        # id (tiebreak) phase ascending
        stats.sort(key=lambda r: r["_b"], reverse=on_score)
        full, boundary = [], None
        for r in stats:
            if r["t"] <= remaining:
                full.append(r["_b"])
                remaining -= int(r["t"])
            else:
                boundary = r
                break
        if full:
            kept.append(keyed.filter(F.col("_b").isin(full)).drop("_b"))
        if boundary is None:
            break
        bnd = keyed.filter(F.col("_b") == boundary["_b"]).drop("_b")
        if boundary["c"] <= boundary_row_cap:
            window_input = bnd
            break
        # choose the next, finer bucketing of the boundary bucket.
        # Linear slicing of [smin, smax] always makes progress when
        # smin != smax (smin lands in slice 0, smax in the last); the
        # tiebreak-key phase is only for a fully tied score, where the
        # residual ordering is doc_id alone (so id bucketing is
        # monotone in the global rank).
        if on_score and boundary["smin"] != boundary["smax"]:
            lo, hi = float(boundary["smin"]), float(boundary["smax"])
            bucket = F.least(
                F.floor((F.col("score") - F.lit(lo))
                        / F.lit(hi - lo) * refine_buckets),
                F.lit(refine_buckets - 1),
            ).cast("long")
        elif id_is_numeric:
            on_score = False
            ilo, ihi = int(boundary["imin"]), int(boundary["imax"])
            if ilo == ihi:  # a single row repeated — window it
                window_input = bnd
                break
            # subtract in DOUBLE: xxhash64-style ids span the full
            # int64 range, so long-typed doc_id - ilo overflows (ANSI
            # throws; legacy wraps non-monotone). The double cast is
            # monotone non-decreasing, which is all bucketing needs —
            # ilo still lands in slice 0 and ihi in the last, so each
            # round keeps shrinking the boundary bucket.
            bucket = F.least(
                F.floor((F.col("doc_id").cast("double") - F.lit(float(ilo)))
                        / F.lit(float(ihi - ilo)) * refine_buckets),
                F.lit(refine_buckets - 1),
            ).cast("long")
        else:
            on_score = False
            prefix_len += 4
            bucket = F.substring(F.col("doc_id").cast("string"),
                                 1, prefix_len)
        cur = bnd
    else:
        # max_rounds exhausted: window whatever remains (documented
        # escape hatch — requires ulp-packed tied scores AND ids that
        # defeat range/prefix slicing simultaneously)
        window_input = cur

    if window_input is not None:
        # constant-VALUED but non-foldable partition key: n_tokens is
        # filtered positive, so pmod(n_tokens, 1) is always 0 — but no
        # optimizer rule simplifies pmod, so the partition spec
        # survives planning (x * 0 does NOT survive: the simplifier
        # inlines the alias and folds the spec back to empty, which
        # re-raises the WindowExec warning this key exists to avoid)
        w = (Window.partitionBy(F.pmod(F.col("n_tokens"), F.lit(1)))
             .orderBy(F.col("score").desc(), F.col("doc_id")))
        kept.append(
            window_input.withColumn("_cum", F.sum("n_tokens").over(w))
            .filter(F.col("_cum") <= F.lit(remaining))
            .drop("_cum")
        )
    if not kept:
        return base.filter(F.lit(False))
    out = kept[0]
    for part in kept[1:]:
        out = out.unionByName(part)
    return out


def stratified_exact_k(df: DataFrame, k: int, stratum_col: str = "source",
                       key_col: str = "doc_id",
                       salt: str = "") -> DataFrame:
    """EXACTLY ``k`` rows per stratum (fewer when the stratum is
    smaller), chosen as the k smallest ``md5(key || '/' || salt)``
    values — the fixed-size companion to :func:`stratified_mixture`
    (rate-based sampling drifts with stratum size; an eval-set build
    or per-domain cap wants an exact count). Deterministic on any
    cluster size, stable under corpus growth for the rows that stay
    (a new row changes the picks only where its hash lands in the top
    k), and recomputable by a plain SQL oracle (md5 is
    engine-portable, unlike xxhash64). Ties on the full digest need
    identical keys; ``key_col`` is assumed unique per stratum.

    Scale shape: one stratum-keyed ``row_number`` window whose
    ``<= k`` filter Spark rewrites to a WindowGroupLimit — every map
    task pre-prunes to its local top k per stratum BEFORE the
    exchange, so a billion-row stratum ships ~k·tasks rows, not the
    stratum. The hash ranking key is computed in codegen."""
    if k < 1:
        raise ValueError(f"k={k}: need >= 1")
    rank_key = F.md5(F.concat_ws("/", F.col(key_col).cast("string"),
                                 F.lit(salt)))
    w = Window.partitionBy(stratum_col).orderBy(rank_key, key_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# the md5-52-bit hash space (see sketches.h52 — same construction, so
# the SQL oracle replays the uniform draw exactly)
_H52_SPACE = float(1 << 52)


def weighted_sample_k(df: DataFrame, k: int, weight: Column,
                      key_col: str = "doc_id",
                      stratum_col: str | None = None,
                      salt: str = "") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: ``k`` rows
    (per stratum, when ``stratum_col`` is given) where a row's
    inclusion probability is proportional to its ``weight`` — the
    standard way to build a quality- or length-weighted training
    subsample that is reproducible across reruns, cluster sizes, and
    incremental re-ingests.

    Algorithm: Efraimidis–Spirakis (2006) exponential clocks with a
    HASH-derived uniform instead of an RNG — ``u = (h52(key ∥ salt) +
    0.5) / 2^52`` (u ∈ (0,1), exact in a double: h + 0.5 is exact below
    2^53 and the divisor is a power of two), then keep the k SMALLEST
    ``-ln(u) / w``. Equivalent to keeping the k largest ``u^(1/w)`` —
    the classic weighted-reservoir key — and fully recomputable by the
    SQL oracle (md5 + ln are engine-portable; the draw itself is
    bit-identical, and key spacing at any realistic N is orders of
    magnitude above cross-engine 1-ulp ``ln`` differences).

    Rows with NULL or non-positive weight are excluded (no defined
    inclusion probability). ``key_col`` is assumed unique (per
    stratum); change ``salt`` to draw an independent sample.

    Scale shape: the ranking key is pure codegen; the single
    ``row_number`` window is stratum-keyed (constant-keyed when
    unstratified) and its ``<= k`` filter becomes a WindowGroupLimit —
    map tasks pre-prune to their local top k before the exchange, so
    a billion-row stratum ships ~k·tasks rows."""
    if k < 1:
        raise ValueError(f"k={k}: need >= 1")
    from .sketches import h52

    u = (h52(F.concat_ws("/", F.col(key_col).cast("string"),
                         F.lit(salt))) + F.lit(0.5)) / F.lit(_H52_SPACE)
    base = (
        df.withColumn("_w", weight.cast("double"))
        .filter(F.col("_w").isNotNull() & (F.col("_w") > 0))
        .withColumn("_es", -F.log(u) / F.col("_w"))
    )
    # constant-valued, non-foldable key for the unstratified case —
    # pmod, same construction budget_select documents (the simplifier
    # folds `x * 0` specs back to empty, re-raising the WindowExec
    # warning this key exists to avoid)
    part = (F.col(stratum_col) if stratum_col
            else F.pmod(F.col("_w").cast("long"), F.lit(1)))
    w = Window.partitionBy(part).orderBy(F.col("_es"), F.col(key_col))
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_es", "_rn")
        .withColumnRenamed("_w", "weight")
    )


def repetition_plan(docs: DataFrame, budget_tokens: int,
                    max_epochs: int = 4,
                    source_col: str = "source",
                    tokens: Column | None = None,
                    text_col: str = "text") -> DataFrame:
    """Data-constrained epoch allocation (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): when the token budget
    exceeds the unique corpus, repeating data up to ~4 epochs is
    nearly as good as fresh data, and beyond that returns decay to
    noise. This operator turns that finding into a concrete schedule:
    given per-source token masses and a total training budget, fill
    the budget source-by-source in declared priority order — more
    unique tokens first, source name as tie-break — capping every
    source at ``max_epochs`` full passes.

    The greedy fill has a closed form (each source takes
    ``clamp(budget - Σ earlier caps, 0, max_epochs · n_tokens)``), so
    the running-sum window is the whole algorithm. Returns one row per
    source: ``(source, n_tokens, cap_tokens, tokens_used,
    epochs_full, extra_tokens)`` — ``extra_tokens`` is the partial
    final epoch (``tokens_used = epochs_full · n_tokens +
    extra_tokens``). All integers; budgets and token counts never pass
    through a float.

    Scale shape: the corpus-sized work is ONE map-side-combined
    aggregation to per-source token masses; the prefix-sum window then
    runs over the SOURCE DIMENSION (dozens of rows at any corpus
    size) with a constant pmod key, so the "single reducer" it implies
    is a bounded metadata computation, not a data-path reducer."""
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0 (got {budget_tokens})")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1 (got {max_epochs})")
    if tokens is None:
        from ..functions.vectors import n_ws_tokens

        tokens = n_ws_tokens(text_col)
    per_source = (
        docs.select(F.col(source_col).alias("source"),
                    tokens.cast("long").alias("_t"))
        .groupBy("source").agg(F.sum("_t").alias("n_tokens"))
    )
    cap = (F.col("n_tokens") * max_epochs).cast("long")
    w = Window.partitionBy(F.pmod(F.col("n_tokens"), F.lit(1))) \
        .orderBy(F.col("n_tokens").desc(), F.col("source")) \
        .rowsBetween(Window.unboundedPreceding, -1)
    planned = (
        per_source.withColumn("cap_tokens", cap)
        .withColumn("_prev",
                    F.coalesce(F.sum("cap_tokens").over(w), F.lit(0)))
        .withColumn(
            "tokens_used",
            F.greatest(
                F.lit(0),
                F.least(F.col("cap_tokens"),
                        F.lit(int(budget_tokens)) - F.col("_prev")),
            ).cast("long"),
        )
    )
    # integer DIV (not float division: exact at any token scale);
    # a zero-token source allocates nothing rather than dividing by 0
    return planned.select(
        "source", "n_tokens", "cap_tokens", "tokens_used",
        F.when(F.col("n_tokens") > 0,
               F.expr("tokens_used DIV n_tokens")).otherwise(F.lit(0))
        .cast("long").alias("epochs_full"),
        F.when(F.col("n_tokens") > 0,
               F.col("tokens_used") % F.col("n_tokens"))
        .otherwise(F.lit(0)).cast("long").alias("extra_tokens"),
    )
