"""In-engine text classification: multinomial Naive Bayes train + score.

The fastText-style linear classifier slot of an LLM data pipeline
(CCNet/DCLM/FineWeb-style language-ID and quality gating) realized with a
closed-form trainer so both halves stay exactly oracle-checkable: training
is two aggregations (no iteration, no randomness), scoring is one
token-keyed join + one decimal-exact per-(doc,label) sum.  A fastText
binary is neither trainable nor reproducible inside a SQL oracle;
multinomial NB with add-α smoothing is the classical closed-form stand-in
with the same plan shape a learned linear scorer would have (token
weights joined in, summed per document).

Float determinism: every ``ln`` is truncated to ``decimal(20,10)`` BEFORE
any per-document sum (the lm_scores discipline — text.py:120), so scores
are exact decimals, partition-order independent, and bit-equal across
engines after the final ``round(…, 6)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tundradb_spark.pipeline.text import tokens

__all__ = [
    "nb_train", "nb_score", "lr_train", "lr_score", "lr_score_inline",
    "lr_score_sql", "lr_weight_literals", "lr_logit_col", "lr_prob_col",
]


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial Naive Bayes with add-``smoothing`` Laplace
    smoothing over whitespace tokens.

    Returns ``(terms, labels)``:

    * ``terms`` — ``(label, tok, llik)`` where ``llik = ln((c(label,tok)
      + α) / (N(label) + α·V))`` as ``decimal(20,10)``;
    * ``labels`` — ``(label, prior, unseen_llik)``: document-frequency
      log prior and the smoothed log-likelihood every token ABSENT from
      the label's training text receives at score time.

    Scale design: one explode + one map-side-combined
    groupBy(label, tok) builds the count table (the corpus shuffles
    32-char-bounded tokens, never text); label totals and the vocab size
    are tiny aggregates.  The model is (labels × vocab)-sized — broadcast
    material for any real label set.
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    counts = toks.groupBy("label", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    label_tot = counts.groupBy("label").agg(F.sum("c").alias("n_tok"))
    vocab = counts.select("tok").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    a = float(smoothing)
    terms = (
        counts.join(label_tot, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "tok",
            F.expr(
                f"cast(ln((cast(c as double) + {a!r})"
                f" / (cast(n_tok as double) + {a!r} * cast(v as double)))"
                " as decimal(20,10))"
            ).alias("llik"),
        )
    )
    doc_counts = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    labels = (
        doc_counts.crossJoin(F.broadcast(total_docs))
        .join(label_tot, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.expr(
                "cast(ln(cast(n_docs as double) / cast(n as double))"
                " as decimal(20,10))"
            ).alias("prior"),
            F.expr(
                f"cast(ln({a!r} / (cast(n_tok as double)"
                f" + {a!r} * cast(v as double))) as decimal(20,10))"
            ).alias("unseen_llik"),
        )
    )
    return terms, labels


def nb_score(
    docs: DataFrame,
    terms: DataFrame,
    labels: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against every label and keep the argmax.

    Output: ``(doc_id, pred_label, score, margin)`` — ``score`` the
    winning PER-TOKEN mean log-joint ``(prior + Σ llik) / max(n, 1)``
    rounded to 6 dp, ``margin`` its per-token lead over the runner-up
    (0.0 for a single-label model).  Ties break on ``pred_label``
    ascending; the argmax is taken on the exact decimal sums BEFORE any
    division, so predictions are engine-portable.  Documents with zero
    tokens are scored on priors alone.

    Per-token normalization is deliberate (the lm_scores discipline,
    text.py:120): raw log-joint sums amplify the ≤1-ulp
    ``Math.log``-vs-libm divergence of a single term by its occurrence
    count, which is enough to flip a 6-dp rounding boundary on a
    SUM-of-hundreds; dividing by ``n`` first shrinks the cross-engine
    delta back to ~1e-10, far inside the rounding grain.

    Scale design: tokens × |labels| rows flow through ONE
    (tok, label)-keyed equi-join against the model (inverted-index
    shuffle; the model side is broadcast material), then one
    map-side-combined groupBy(doc, label); the argmax is a per-doc
    window over |labels| rows.  Document text is never shuffled.
    """
    lab = F.broadcast(labels)
    toks = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    )
    per_label = (
        toks.crossJoin(lab.select("label"))
        .join(terms, ["tok", "label"], "left")
        .groupBy(id_col, "label")
        .agg(
            F.sum(F.col("llik")).alias("sum_seen"),
            F.sum(
                F.when(
                    F.col("llik").isNull() & F.col("tok").isNotNull(), 1
                ).otherwise(0)
            ).alias("n_unseen"),
            F.sum(
                F.when(F.col("tok").isNotNull(), 1).otherwise(0)
            ).alias("n_tok"),
        )
    )
    scored = per_label.join(lab, "label").select(
        id_col,
        "label",
        (
            F.col("prior")
            + F.coalesce(F.col("sum_seen"), F.lit(0).cast("decimal(20,10)"))
            # n_unseen cast to decimal(10,0): a LONG multiplicand makes
            # the product overflow Spark's 38-digit cap and its
            # precision-loss rule silently truncates the scale to 7 —
            # DuckDB keeps 10 (the tfidf_scores trap, text.py:743)
            + F.col("n_unseen").cast("decimal(10,0)")
            * F.col("unseen_llik")
        ).alias("score_d"),
        F.greatest(F.col("n_tok"), F.lit(1)).alias("n_div"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_d"), F.asc("label")
    )
    ranked = scored.withColumn("rk", F.row_number().over(w)).withColumn(
        "nxt", F.lead("score_d").over(w)
    )
    # the per-token division runs in DOUBLE on the exact decimal sum
    # (decimal-division scale rules differ across engines; IEEE double
    # division does not), then half-up rounding via floor(x·10⁶ + ½)
    # (engine round() conventions diverge on halfway doubles — the
    # tfidf_scores discipline)
    return ranked.filter(F.col("rk") == 1).select(
        id_col,
        F.col("label").alias("pred_label"),
        F.expr(
            "cast(floor(cast(score_d as double) / cast(n_div as double)"
            " * 1000000 + 0.5) as double) / 1000000.0"
        ).alias("score"),
        F.expr(
            "cast(floor(cast(score_d - coalesce(nxt, score_d) as double)"
            " / cast(n_div as double) * 1000000 + 0.5) as double)"
            " / 1000000.0"
        ).alias("margin"),
    )


def calibration_bins(
    scored: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier: partition
    predictions into ``n_bins`` equal-width probability bins and compare
    each bin's MEAN PREDICTED probability against its OBSERVED positive
    rate — the calibration check (Murphy 1973; Guo et al. 2017 "On
    Calibration of Modern Neural Networks") a filtering pipeline runs
    before trusting :func:`nb_score`'s probabilities as keep/drop
    thresholds.  A well-calibrated bin has ``gap ≈ 0``; the
    ``n``-weighted sum of gaps is the expected calibration error (ECE),
    computable from this output in one line.

    Semantics (engine-reproducible): ``bin = min(floor(p·n_bins),
    n_bins−1)`` (the 1.0 prediction joins the top bin); rows with
    ``p`` outside ``[0, 1]`` or NULL are excluded — a probability
    column containing anything else is a bug this operator should
    surface, not average away; ``label`` is any boolean-able column
    (cast to int 0/1, NULL label excluded and counted via ``n``'s
    absence).

    Plan / 100 TB shape: ONE map-side-combined ``groupBy(bin)`` over a
    two-column projection — output is ``n_bins`` rows, nothing else
    shuffles.  Mean prediction and observed rate come from
    ``decimal(38,12)`` sums (partition-order free) divided once in
    double, the module's float-determinism discipline.

    Output: ``(bin, p_lo, p_hi, n, mean_pred, obs_rate, gap)`` with
    ``gap = round(|mean_pred − obs_rate|, 6)``.
    """
    return calibration_score(
        calibration_partials(scored, prob_col, label_col, n_bins), n_bins
    )


def calibration_partials(
    scored: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin moment partials ``(bin, n, __sp, __sy)`` — the front half
    of :func:`calibration_bins`.  Every column is ADDITIVE (exact long
    counts, exact ``decimal(38,12)`` probability sums), so partials from
    disjoint row sets — micro-batch epochs, shards — merge by plain
    ``sum`` into exactly the single-pass aggregate
    (streaming.ops.stream_calibration_bins is that merge's producer)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    p = F.col(prob_col).cast("double")
    base = scored.select(
        p.alias("__p"),
        F.col(label_col).cast("boolean").cast("int").alias("__y"),
    ).filter((p >= 0.0) & (p <= 1.0) & F.col(label_col).isNotNull())
    binned = base.select(
        F.least(
            F.floor(F.col("__p") * n_bins).cast("long"),
            F.lit(n_bins - 1),
        ).alias("bin"),
        "__p",
        "__y",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__p").cast("decimal(38,12)")).alias("__sp"),
        F.sum(F.col("__y").cast("long")).alias("__sy"),
    )


def calibration_score(agg: DataFrame, n_bins: int = 10) -> DataFrame:
    """Score per-bin partials (:func:`calibration_partials` layout) into
    the reliability-diagram output — the back half of
    :func:`calibration_bins`, shared verbatim with the streaming reader
    so stream-merged partials score IDENTICALLY to the batch operator."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    return agg.select(
        "bin",
        (F.col("bin").cast("double") / n_bins).alias("p_lo"),
        ((F.col("bin") + 1).cast("double") / n_bins).alias("p_hi"),
        F.col("n").cast("long").alias("n"),
        F.expr(
            "cast(floor((cast(__sp as double) / cast(n as double))"
            " * 1000000 + 0.5) as double) / 1000000.0"
        ).alias("mean_pred"),
        F.expr(
            "cast(floor((cast(__sy as double) / cast(n as double))"
            " * 1000000 + 0.5) as double) / 1000000.0"
        ).alias("obs_rate"),
        F.expr(
            "cast(floor(abs(cast(__sp as double) / cast(n as double)"
            " - cast(__sy as double) / cast(n as double))"
            " * 1000000 + 0.5) as double) / 1000000.0"
        ).alias("gap"),
    )


def calibration_bins_sql(
    table: str,
    prob_expr: str,
    label_expr: str,
    n_bins: int = 10,
) -> str:
    """DuckDB oracle reproducing :func:`calibration_bins` exactly."""
    return f"""
    WITH base AS (
        SELECT CAST({prob_expr} AS DOUBLE) AS p,
               CAST(CAST({label_expr} AS BOOLEAN) AS INT) AS y
        FROM {table}
        WHERE CAST({prob_expr} AS DOUBLE) >= 0.0
          AND CAST({prob_expr} AS DOUBLE) <= 1.0
          AND ({label_expr}) IS NOT NULL
    ),
    binned AS (
        SELECT least(CAST(floor(p * {n_bins}) AS BIGINT),
                     {n_bins - 1}) AS bin, p, y
        FROM base
    ),
    agg AS (
        SELECT bin, count(*) AS n,
               sum(CAST(p AS DECIMAL(38,12))) AS sp,
               sum(CAST(y AS BIGINT)) AS sy
        FROM binned GROUP BY bin
    )
    SELECT bin,
           CAST(bin AS DOUBLE) / {n_bins} AS p_lo,
           CAST(bin + 1 AS DOUBLE) / {n_bins} AS p_hi,
           CAST(n AS BIGINT) AS n,
           CAST(floor((CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
                      * 1000000 + 0.5) AS DOUBLE) / 1000000.0 AS mean_pred,
           CAST(floor((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                      * 1000000 + 0.5) AS DOUBLE) / 1000000.0 AS obs_rate,
           CAST(floor(abs(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)
                          - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                      * 1000000 + 0.5) AS DOUBLE) / 1000000.0 AS gap
    FROM agg
    """


def precision_thresholds(
    scored: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Operating-point table for a probabilistic keep/drop gate: for
    every candidate threshold ``b/n_bins`` (the lower edge of each
    :func:`calibration_bins` bin), the EXACT precision and recall of
    the rule "keep rows with ``p >= threshold``" over the labeled set —
    the measured curve a pipeline reads to pick its quality-gate knob
    instead of hand-choosing ``min_quality`` against an uncalibrated
    sigmoid (r12 verdict item 7).

    Semantics: same binning/exclusion rules as
    :func:`calibration_partials` (``bin = min(floor(p·n_bins),
    n_bins−1)``, ``p`` outside [0,1] or NULL label excluded), then a
    cumulative-from-the-top roll-up, so row ``b`` aggregates every
    prediction in bins ``>= b``.  A bin with no predictions still
    contributes its threshold row (the curve is defined at every edge);
    its cumulative counts come from the bins above it.

    Plan / 100 TB shape: the corpus pays ONE map-side-combined
    ``groupBy(bin)`` (``calibration_partials``); the window roll-up
    runs over ``n_bins`` rows — model-state-sized, the single-partition
    window is deliberate, not a scale hazard.

    Output (one row per bin, ascending): ``(bin, threshold, cum_n,
    cum_pos, precision, recall)`` — precision/recall via the house
    floor-round-to-6 double render; ``precision`` is NULL for empty
    tails (no predictions at or above the edge), ``recall`` is NULL
    when the labeled set has no positives.
    """
    return precision_threshold_score(
        calibration_partials(scored, prob_col, label_col, n_bins), n_bins
    )


def precision_threshold_score(agg: DataFrame, n_bins: int = 10) -> DataFrame:
    """Score per-bin partials (:func:`calibration_partials` layout —
    only ``(bin, n, __sy)`` is read) into the operating-point curve:
    the back half of :func:`precision_thresholds`, shared verbatim with
    the streaming reader (``streaming.ops.read_precision_thresholds``)
    so stream-merged partials produce the IDENTICAL curve."""
    from pyspark.sql import Window

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    spark = agg.sparkSession
    grid = spark.range(n_bins).select(F.col("id").alias("bin"))
    filled = grid.join(agg, "bin", "left").select(
        "bin",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.col("__sy"), F.lit(0)).cast("long").alias("pos"),
    )
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.partitionBy()
    cum = filled.select(
        "bin",
        (F.col("bin").cast("double") / n_bins).alias("threshold"),
        F.sum("n").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("pos").over(total).alias("__tot_pos"),
    )
    r6 = (
        "cast(floor(cast({num} as double) / cast({den} as double)"
        " * 1000000 + 0.5) as double) / 1000000.0"
    )
    return cum.select(
        "bin",
        "threshold",
        F.col("cum_n").cast("long").alias("cum_n"),
        F.col("cum_pos").cast("long").alias("cum_pos"),
        F.when(
            F.col("cum_n") > 0,
            F.expr(r6.format(num="cum_pos", den="cum_n")),
        ).alias("precision"),
        F.when(
            F.col("__tot_pos") > 0,
            F.expr(r6.format(num="cum_pos", den="__tot_pos")),
        ).alias("recall"),
    ).orderBy("bin")


def precision_thresholds_sql(
    table: str,
    prob_expr: str,
    label_expr: str,
    n_bins: int = 10,
) -> str:
    """DuckDB oracle reproducing :func:`precision_thresholds` exactly."""
    return f"""
    WITH base AS (
        SELECT CAST({prob_expr} AS DOUBLE) AS p,
               CAST(CAST({label_expr} AS BOOLEAN) AS INT) AS y
        FROM {table}
        WHERE CAST({prob_expr} AS DOUBLE) >= 0.0
          AND CAST({prob_expr} AS DOUBLE) <= 1.0
          AND ({label_expr}) IS NOT NULL
    ),
    agg AS (
        SELECT least(CAST(floor(p * {n_bins}) AS BIGINT),
                     {n_bins - 1}) AS bin,
               count(*) AS n, sum(y) AS pos
        FROM base GROUP BY 1
    ),
    grid AS (
        SELECT CAST(range AS BIGINT) AS bin FROM range({n_bins})
    ),
    filled AS (
        SELECT g.bin,
               CAST(coalesce(a.n, 0) AS BIGINT) AS n,
               CAST(coalesce(a.pos, 0) AS BIGINT) AS pos
        FROM grid g LEFT JOIN agg a ON g.bin = a.bin
    ),
    cum AS (
        SELECT bin,
               CAST(bin AS DOUBLE) / {n_bins} AS threshold,
               sum(n) OVER (ORDER BY bin DESC
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               sum(pos) OVER (ORDER BY bin DESC
                              ROWS UNBOUNDED PRECEDING) AS cum_pos,
               sum(pos) OVER () AS tot_pos
        FROM filled
    )
    SELECT bin, threshold,
           CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CASE WHEN cum_n > 0 THEN
             CAST(floor(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)
                        * 1000000 + 0.5) AS DOUBLE) / 1000000.0
           END AS precision,
           CASE WHEN tot_pos > 0 THEN
             CAST(floor(CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE)
                        * 1000000 + 0.5) AS DOUBLE) / 1000000.0
           END AS recall
    FROM cum
    ORDER BY bin
    """


def calibrated_threshold(
    scored: DataFrame,
    prob_col: str,
    label_col: str,
    target_precision: float,
    n_bins: int = 10,
) -> float:
    """Pick the quality gate's knob from MEASURED data: the LOWEST
    :func:`precision_thresholds` edge whose keep-rule precision meets
    ``target_precision`` — lowest because every lower admissible edge
    keeps strictly more rows (recall is monotone in the threshold), so
    this is the max-recall operating point at the demanded precision.

    The collect is ``n_bins`` rows — bounded model state, same class as
    the IRLS Gram.  Raises ``ValueError`` when no edge qualifies (the
    classifier cannot hit the target on this labeled set — a finding
    the caller must see, not a silent gate-wide-open), and on a
    ``target_precision`` outside (0, 1].
    """
    return calibrated_threshold_from_curve(
        precision_thresholds(scored, prob_col, label_col, n_bins),
        target_precision,
    )


def calibrated_threshold_from_curve(
    curve: DataFrame,
    target_precision: float,
) -> float:
    """:func:`calibrated_threshold`'s selection rule applied to an
    ALREADY-SCORED operating-point curve — the frame
    :func:`precision_thresholds` /
    :func:`~tundradb_spark.streaming.ops.read_precision_thresholds`
    returns (only ``threshold`` and ``precision`` are read).  Factored
    out (r14) so a STREAMING pipeline can re-pick its gate knob from
    the live calibration state table with the identical rule the batch
    recipe deploys — same max-recall-at-target-precision semantics,
    same loud failure when no edge qualifies.  The collect is the
    curve: ``n_bins`` rows, bounded model state.  The target's range is
    validated BEFORE the collect so a bad knob never costs the corpus
    aggregation behind the curve (r14 review)."""
    _validate_target_precision(target_precision)
    return float(
        _pick_operating_point(curve.collect(), target_precision)["threshold"]
    )


def _validate_target_precision(target_precision: float) -> None:
    if not 0.0 < target_precision <= 1.0:
        raise ValueError(
            f"target_precision must be in (0, 1], got {target_precision}"
        )


def _pick_operating_point(rows, target_precision: float):
    """The selection rule over COLLECTED curve rows: the row at the
    lowest threshold whose precision meets the target (max recall at
    the demanded precision).  Returns the full row so callers can also
    report the ACHIEVED precision/recall at the pick (curation_report);
    raises the loud no-qualifying-edge error."""
    _validate_target_precision(target_precision)
    ok = [
        r
        for r in rows
        if r["precision"] is not None
        and r["precision"] >= target_precision
    ]
    if not ok:
        best = max(
            (r["precision"] for r in rows if r["precision"] is not None),
            default=None,
        )
        raise ValueError(
            f"no threshold reaches precision {target_precision} on the"
            f" labeled set (best achievable: {best}) — retrain, lower"
            f" the target, or widen n_bins"
        )
    return min(ok, key=lambda r: r["threshold"])


# ---------------------------------------------------------------------------
# Logistic-regression quality classifier (r12, r11 verdict item 6): the
# CCNet/FineWeb-style learned linear quality filter.  Training is IRLS
# (Newton-Raphson) where each iteration's gradient and Hessian are ADDITIVE
# per-row moments aggregated distributed and solved on the driver — the
# model state (a (d+1)² Gram matrix, d = n_buckets) is the only collect,
# same bounded-model-state class as the k-means centroids and BPE rules.
# No Spark-ML, no SGD, no randomness: β₀ = 0 and a fixed iteration count
# make the fit a deterministic function of the data.
# ---------------------------------------------------------------------------


def _lr_design(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    bigrams: bool,
) -> DataFrame:
    """Sparse design matrix ``(id, bucket, c)``: hashed n-gram bucket
    occurrence counts (importance.hashed_ngram_features — the DSIR
    feature space) plus one intercept row ``bucket = -1, c = 1`` per
    document, so empty-text documents still carry the bias term."""
    from tundradb_spark.pipeline.importance import hashed_ngram_features

    feats = (
        hashed_ngram_features(docs, n_buckets, text_col, id_col, bigrams)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    icpt = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.lit(-1).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("c"),
    )
    return feats.unionByName(icpt)


def lr_train(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    bigrams: bool = True,
    n_iter: int = 4,
    ridge: float = 1.0,
) -> DataFrame:
    """Train an L2-regularized binary logistic regression on hashed
    n-gram features by IRLS; returns ``(bucket, weight)`` with the
    intercept at ``bucket = -1`` — feed to :func:`lr_score`.

    ``label_col`` must be 0/1 (the caller's quality rule — a curated
    "good" set vs the raw crawl in the CCNet recipe); NULL-label or
    NULL-id rows drop.

    Each Newton step solves ``(XᵀWX + λI) δ = Xᵀ(y − p) − λβ`` where
    ``W = diag(p(1−p))``:

    * per-document scores: one broadcast join of the current β against
      the sparse design, one map-side-combined per-doc sum;
    * gradient: one groupBy(bucket) over design × residual;
    * Hessian: the sparse Gram — a per-document self-join of the design
      (fanout k² for a doc with k distinct buckets, shuffled on the
      already-partitioned doc id) into one groupBy(bucket, bucket).

    All three are sums of ``decimal(28,18)`` per-row terms (the house
    order-proof convention), so the fit is bit-deterministic across
    partitionings; the driver solve (numpy, (d+1)²) is the bounded
    model state.  SCALE BOUND: the Gram collect is O((n_buckets+1)²)
    cells — keep ``n_buckets ≤ ~1024`` (the quality-filter regime;
    CCNet's production filter is similarly low-dimensional); the
    corpus-sized work is one design build + 3 aggregations per
    iteration, none of which shuffle document text.
    """
    import numpy as np

    if n_buckets < 2 or n_buckets > 4096:
        raise ValueError(
            f"n_buckets must be in [2, 4096] (the Gram collect is"
            f" O((n_buckets+1)^2)), got {n_buckets}"
        )
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if ridge <= 0:
        raise ValueError(f"ridge must be > 0 (IRLS needs the solve"
                         f" nonsingular), got {ridge}")
    spark = docs.sparkSession
    y = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(label_col).cast("double").alias("__y"),
    ).filter(F.col("__y").isNotNull() & F.col(id_col).isNotNull())
    x = _lr_design(
        docs.filter(
            F.col(label_col).isNotNull() & F.col(id_col).isNotNull()
        ),
        text_col, id_col, n_buckets, bigrams,
    ).persist()
    try:
        d = n_buckets + 1  # + intercept at index 0
        beta = np.zeros(d)

        def _idx(b: int) -> int:
            return 0 if b == -1 else b + 1

        dec = "decimal(28,18)"
        for _ in range(n_iter):
            wdf = spark.createDataFrame(
                [(-1, float(beta[0]))]
                + [(b, float(beta[b + 1])) for b in range(n_buckets)],
                "bucket long, __w double",
            )
            scores = (
                x.join(F.broadcast(wdf), "bucket")
                .groupBy(id_col)
                .agg(
                    F.sum(F.expr(f"cast(__w * c as {dec})")).alias("__z")
                )
                .join(y, id_col)
                .select(
                    id_col,
                    F.expr(
                        "cast(1.0 as double)"
                        " / (cast(1.0 as double)"
                        " + exp(-cast(__z as double)))"
                    ).alias("__p"),
                    "__y",
                )
                .select(
                    id_col,
                    F.expr("__y - __p").alias("__r"),
                    F.expr("greatest(__p * (1.0 - __p),"
                           " cast(1.0e-10 as double))").alias("__wt"),
                )
            )
            grad_rows = (
                x.join(scores, id_col)
                .groupBy("bucket")
                .agg(F.sum(F.expr(f"cast(c * __r as {dec})")).alias("g"))
                .collect()
            )
            xa = x.select(
                F.col(id_col), F.col("bucket").alias("ba"),
                F.col("c").alias("ca"),
            )
            xb = x.select(
                F.col(id_col), F.col("bucket").alias("bb"),
                F.col("c").alias("cb"),
            )
            hess_rows = (
                xa.join(xb, id_col)
                .join(scores.select(id_col, "__wt"), id_col)
                .groupBy("ba", "bb")
                .agg(
                    F.sum(F.expr(f"cast(ca * cb * __wt as {dec})"))
                    .alias("h")
                )
                .collect()
            )
            g = np.zeros(d)
            for r in grad_rows:
                g[_idx(r["bucket"])] = float(r["g"])
            H = np.zeros((d, d))
            for r in hess_rows:
                H[_idx(r["ba"]), _idx(r["bb"])] = float(r["h"])
            beta = beta + np.linalg.solve(
                H + ridge * np.eye(d), g - ridge * beta
            )
    finally:
        x.unpersist()
    rows = [(-1, float(beta[0]))] + [
        (b, float(beta[b + 1])) for b in range(n_buckets)
    ]
    return spark.createDataFrame(rows, "bucket long, weight double")


def lr_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    bigrams: bool = True,
) -> DataFrame:
    """Score documents under a trained (or literal) LR weight table:
    ``(doc_id, n_feats, logit, prob)``.

    ``weights`` is ``(bucket, weight)`` with the intercept at ``-1``
    (:func:`lr_train`'s output, or literals — the oracle-checkable
    deployment shape: like the DSIR ratio table, a scoring run ships
    its weights as data).  Weights are TRUNCATED to ``decimal(20,10)``
    before the per-document sum, so ``logit`` is an exact decimal —
    partition-order-proof and byte-reproducible by the SQL twin
    (:func:`lr_score_sql`); ``prob = round(sigmoid(logit), 6)`` is the
    only transcendental, applied once per document.

    Plan shape: one broadcast join of the ≤(n_buckets+1)-row weight
    table against the sparse design, one map-side-combined per-doc
    sum — document text is never shuffled (the DSIR plan).
    """
    x = _lr_design(docs, text_col, id_col, n_buckets, bigrams)
    w = F.broadcast(
        weights.select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("weight").cast("decimal(20,10)").alias("__w"),
        )
    )
    return (
        x.join(w, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("bucket") >= 0, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_feats"),
            # c cast to decimal(10,0) first: a LONG multiplicand pushes
            # the product past Spark's 38-digit cap and the
            # precision-loss rule silently truncates the scale to 7 —
            # DuckDB keeps 10 (the nb_score/tfidf_scores trap)
            F.sum(
                F.expr(
                    "cast(__w * cast(c as decimal(10,0))"
                    " as decimal(28,10))"
                )
            ).alias("__z"),
        )
        .select(
            id_col,
            "n_feats",
            F.expr("cast(__z as double)").alias("logit"),
            F.expr(
                "round(cast(1.0 as double) / (cast(1.0 as double)"
                " + exp(-cast(__z as double))), 6)"
            ).alias("prob"),
        )
    )


def lr_weight_literals(
    weights: list[tuple[int, float]]
) -> list[tuple[int, str]]:
    """Render float weights as the decimal(20,10) literals Spark's cast
    produces, for embedding in :func:`lr_score_sql`: Spark converts
    double→decimal through the SHORTEST decimal representation with
    HALF-UP ties (``Decimal(str(w))`` + ``ROUND_HALF_UP``), NOT the
    exact binary expansion — quantizing ``Decimal(w)`` directly (exact,
    half-even) diverges at the 10th place and breaks digest parity
    (probed r12)."""
    import decimal

    q = decimal.Decimal("1.0000000000")
    return [
        (b, str(decimal.Decimal(str(w)).quantize(
            q, rounding=decimal.ROUND_HALF_UP)))
        for b, w in weights
    ]


def lr_score_sql(
    table: str,
    weights: list[tuple[int, str]],
    n_buckets: int = 256,
    bigrams: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle reproducing :func:`lr_score` exactly — the same
    hashed n-gram buckets (md5 family), intercept row, decimal(20,10)
    weight truncation, and exact-decimal logit.  ``weights`` are
    ``(bucket, decimal-string)`` literals — render ``lr_train`` output
    through :func:`lr_weight_literals` (shortest-repr half-up, matching
    Spark's double→decimal cast)."""
    from tundradb_spark.pipeline.hashing import hbits_sql

    toks = (
        f"[t for t in string_split_regex(lower({text_col}), '\\s+')"
        f" if t != '']"
    )
    grams = (
        "tk || (CASE WHEN len(tk) > 1 THEN [tk[i] || ' ' || tk[i+1]"
        " for i in generate_series(1, len(tk) - 1)]"
        " ELSE CAST([] AS VARCHAR[]) END)"
        if bigrams else "tk"
    )
    wvals = ", ".join(
        f"({b}, CAST({w} AS DECIMAL(20,10)))" for b, w in weights
    )
    return f"""
    WITH alltk AS (
      SELECT {id_col}, {toks} AS tk FROM {table}
    ),
    feats AS (
      SELECT {id_col},
             ({hbits_sql("gram", 32)}) % {n_buckets} AS bucket,
             count(*) AS c
      FROM (SELECT {id_col}, unnest({grams}) AS gram FROM alltk)
      GROUP BY 1, 2
    ),
    design AS (
      SELECT * FROM feats
      UNION ALL
      SELECT {id_col}, -1 AS bucket, 1 AS c FROM {table}
    ),
    w(bucket, wt) AS (VALUES {wvals}),
    agg AS (
      SELECT {id_col},
             CAST(sum(CASE WHEN bucket >= 0 THEN c ELSE 0 END)
                  AS BIGINT) AS n_feats,
             sum(CAST(wt * c AS DECIMAL(28,10))) AS z
      FROM design JOIN w USING (bucket)
      GROUP BY {id_col}
    )
    SELECT {id_col}, n_feats, CAST(z AS DOUBLE) AS logit,
           round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
                 + exp(-CAST(z AS DOUBLE))), 6) AS prob
    FROM agg
    """


def lr_logit_col(
    weights: list[tuple[int, float | str]],
    text_col: str = "text",
    n_buckets: int = 256,
    bigrams: bool = True,
) -> "Column":
    """The LR logit as ONE stateless column expression — no explode, no
    groupBy, no shuffle: tokens → (optional) bigrams → per-gram hashed
    bucket (``transform``) → decimal fold of literal weights
    (``aggregate``) + intercept.  Pinned equal to :func:`lr_score`'s
    join-based logit (same md5 buckets, same decimal(20,10) weights,
    same exact sum — the fold casts every step back to decimal so the
    result is order-proof like the join path's SUM).

    This is the STREAMING face of the quality filter: a per-row
    projection composes into ``stream_gate_corpus`` (or any narrow
    pipeline stage) with zero state, where the join-based scorer's
    groupBy(doc) would be a stateful streaming aggregation.  Batch
    callers scoring huge corpora can prefer it too — it trades the
    broadcast join for a 256-slot literal array lookup in whole-stage
    codegen.

    ``weights`` as in :func:`lr_score_sql` (intercept at bucket −1;
    floats are rendered through the same shortest-repr half-up
    decimal(20,10) rule Spark's cast applies).
    """
    import decimal as _d

    q = _d.Decimal("1.0000000000")
    table: dict[int, str] = {}
    for b, w in weights:
        table[int(b)] = (
            w if isinstance(w, str)
            else str(_d.Decimal(str(w)).quantize(
                q, rounding=_d.ROUND_HALF_UP))
        )
    icpt = table.get(-1, "0")
    slots = ", ".join(
        f"cast({table.get(b, '0')} as decimal(20,10))"
        for b in range(n_buckets)
    )
    # NULL text folds to the bare intercept (coalesce to an empty token
    # array), matching lr_score's intercept-only row exactly
    toks = (
        f"coalesce(filter(split(lower({text_col}), '\\\\s+'),"
        f" t -> t != ''), cast(array() as array<string>))"
    )
    grams = (
        f"concat(__lrt, case when size(__lrt) > 1 then"
        f" zip_with(slice(__lrt, 1, size(__lrt) - 1),"
        f" slice(__lrt, 2, size(__lrt) - 1),"
        f" (a, b) -> concat(a, ' ', b))"
        f" else cast(array() as array<string>) end)"
        if bigrams else "__lrt"
    )
    # Spark-side h32 (hashing.hbits): conv(hex prefix of md5, 16, 10)
    bucket = (
        f"(cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint))"
        f" % {n_buckets}"
    )
    fold = (
        f"aggregate(transform({grams}, g -> {bucket}),"
        f" cast({icpt} as decimal(28,10)),"
        f" (acc, b) -> cast(acc + element_at(array({slots}),"
        f" cast(b + 1 as int)) as decimal(28,10)))"
    )
    # bind the token array once via a lateral-style nested expression:
    # transform over a 1-element wrapper avoids re-inlining tokenization
    # into every gram reference
    full = (
        f"element_at(transform(array({toks}),"
        f" __lrt -> {fold}), 1)"
    )
    return F.expr(full)


def lr_prob_col(
    weights: list[tuple[int, float | str]],
    text_col: str = "text",
    n_buckets: int = 256,
    bigrams: bool = True,
) -> "Column":
    """``round(sigmoid(lr_logit_col(...)), 6)`` — the inline quality
    probability (see :func:`lr_logit_col`)."""
    logit = lr_logit_col(weights, text_col, n_buckets, bigrams)
    return F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-logit.cast("double"))), 6
    )


def lr_score_inline(
    docs: DataFrame,
    weights: list[tuple[int, float | str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    bigrams: bool = True,
) -> DataFrame:
    """:func:`lr_score`'s output frame ``(id, n_feats, logit, prob)``
    through the zero-shuffle inline fold — one narrow projection, no
    explode, no groupBy, no broadcast join.

    Row-for-row equal to ``lr_score`` on id-keyed corpora (the operator
    contract both scorers share): ``logit``/``prob`` via
    :func:`lr_logit_col` / :func:`lr_prob_col` (pinned bit-equal —
    same md5 buckets, same decimal(20,10) weights, order-proof decimal
    fold), and ``n_feats`` is the total gram count — exactly the
    design matrix's ``sum(c) over bucket >= 0``, since every gram lands
    in some bucket.  ``weights`` as in :func:`lr_score_sql` (literal
    list, intercept at −1); pass ``lr_train`` output through
    ``[(r["bucket"], r["weight"]) for r in w.collect()]`` if needed.

    This is the batch-scoring face of the r13 inline rewrite: the join
    scorer shuffles the exploded design twice (groupBy(id, bucket) +
    groupBy(id)); at corpus scale both exchanges carry one row per
    distinct (doc, gram) — this folds per row inside the scan
    projection instead.
    """
    # same token rule as lr_logit_col: whitespace split of lower(text),
    # empties dropped, NULL text -> empty array (intercept-only row)
    toks = (
        f"coalesce(filter(split(lower({text_col}), '\\\\s+'),"
        f" t -> t != ''), cast(array() as array<string>))"
    )
    n_tok = f"size({toks})"
    n_feats = (
        f"cast({n_tok} + greatest({n_tok} - 1, 0) as long)"
        if bigrams else f"cast({n_tok} as long)"
    )
    logit = lr_logit_col(weights, text_col, n_buckets, bigrams)
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.expr(n_feats).alias("n_feats"),
        logit.cast("double").alias("logit"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-logit.cast("double"))), 6
        ).alias("prob"),
    )
