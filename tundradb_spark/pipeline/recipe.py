"""The composed training-data pipeline — the product the operators exist
for, as one declarative recipe:

    raw docs → PII gate → exact dedup → repetition gate → chunk → sample

Every stage is one of this package's deterministic operators, so the WHOLE
pipeline is a single lazy DataFrame plan: Catalyst fuses the three row-level
gates into the scan projection, the only shuffle is exact-dedup's groupBy,
and the output is reproducible bit-for-bit on any engine (the driver
contract value-checks the full composition end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tundradb_spark.pipeline.dedup import normalized_text
from tundradb_spark.pipeline.sampling import chunk_docs, deterministic_sample
from tundradb_spark.pipeline.text import (
    DEFAULT_PII_PATTERNS,
    bigram_repetition_col,
    tokens,
)


def no_pii_col(text_col: str = "text") -> "F.Column":
    """TRUE iff none of the default PII patterns fires (NULL text →
    NULL, which every ``filter`` drops and :func:`gate_reasons` labels
    ``pii``).  THE canonical PII-gate predicate — prepare_corpus,
    corpus_report, gate_reasons, and the streaming front door
    (``streaming.ops.stream_gate_corpus``) all consume this single
    definition, so a pattern change cannot desynchronize the gates
    (r13 review: the fold previously lived in four copies)."""
    no_pii = None
    for pat in DEFAULT_PII_PATTERNS.values():
        pred = F.regexp_count(F.col(text_col), F.lit(pat)) == 0
        no_pii = pred if no_pii is None else (no_pii & pred)
    return no_pii


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bigram_rep: float = 0.5,
    chunk_tokens: int = 128,
    chunk_overlap: int = 0,
    sample_bp: int = 10000,
    sample_seed: int = 97,
    quality_weights: list | None = None,
    min_quality: float = 0.5,
    n_quality_buckets: int = 256,
    quality_bigrams: bool = True,
    quality_labeled: DataFrame | None = None,
    quality_label_col: str = "label",
    quality_target_precision: float | None = None,
    quality_calibration_bins: int = 10,
) -> DataFrame:
    """Clean → dedup → gate → chunk → sample, returning the chunk rows
    (``doc_id, chunk_idx, n_chunk_tokens, chunk`` + the doc's passthrough
    columns are dropped — chunks are the training unit).

    Stages (all deterministic, all engine-portable):

    1. **PII gate**: drop documents where any default pattern fires.
    2. **Repetition gate**: ``bigram_rep <= max_bigram_rep`` (template/
       boilerplate kill).  Runs before dedup — identical normalized texts
       have identical token lists, so the gate treats every member of a
       dedup group the same and the ordering is semantics-neutral, while
       gated-out docs never pay the dedup shuffle.
    3. **Learned-quality gate** (r12, optional — activates when
       ``quality_weights`` is given, the frozen ``(bucket, weight)``
       table from :func:`~tundradb_spark.pipeline.classify.lr_train`):
       drop documents whose
       :func:`~tundradb_spark.pipeline.classify.lr_prob_col` falls
       below ``min_quality``.  An inline column fold like the other
       gates — it fuses into the same scan projection, and it is the
       IDENTICAL predicate the streaming front door
       (``stream_gate_corpus``) applies, so batch and live ingest admit
       the same documents.  ``quality_bigrams`` must match the feature
       space the weight table was TRAINED with (``lr_train``'s
       ``bigrams`` flag) — a unigram-trained table scored with bigram
       features silently misscores.  **Calibrated knob** (r13, r12
       verdict item 7): pass ``quality_target_precision`` plus a
       ``quality_labeled`` frame (docs with ``quality_label_col``) and
       the gate's threshold is MEASURED instead of hand-set —
       :func:`~tundradb_spark.pipeline.classify.calibrated_threshold`
       scores the labeled set with the SAME inline predicate and picks
       the max-recall edge meeting the precision target (an
       ``n_bins``-row bounded collect at plan-build time; the corpus
       plan itself is unchanged — the measured value substitutes for
       ``min_quality``).  Streaming callers measure once in batch and
       pass the result as ``stream_gate_corpus(min_quality=...)``.
    4. **Exact dedup**: md5(normalized text) groups; only each group's
       minimum-id member survives (broadcast semi-join against the groupBy
       winners — the one shuffle in the plan).
    5. **Chunking**: fixed-token windows with overlap.
    6. **Sampling**: deterministic content-hash downsample to
       ``sample_bp``/10000 of the surviving documents.
    """
    # both row-level gates are inline column predicates, NOT joins back to
    # per-doc score frames — the whole pre-dedup phase is one scan (four
    # scans → two measured 6.6s → ~2s at sf0.1)
    clean = docs.filter(no_pii_col(text_col))

    toked = clean.withColumn("__t", tokens(F.col(text_col)))
    gated = toked.filter(
        bigram_repetition_col("__t") <= max_bigram_rep
    ).drop("__t")
    if quality_target_precision is not None and quality_weights is None:
        raise ValueError(
            "quality_target_precision needs quality_weights (the frozen"
            " lr_train table the gate scores with)"
        )
    if quality_labeled is not None and quality_target_precision is None:
        raise ValueError(
            "quality_labeled was given without quality_target_precision"
            " — the labeled frame would be silently ignored and the gate"
            " would run at the hand-set min_quality; pass the precision"
            " target the threshold should be measured against"
        )
    if quality_weights is not None:
        from tundradb_spark.pipeline.classify import (
            calibrated_threshold,
            lr_prob_col,
        )

        prob = lr_prob_col(
            quality_weights, text_col, n_buckets=n_quality_buckets,
            bigrams=quality_bigrams,
        )
        threshold = float(min_quality)
        if quality_target_precision is not None:
            if quality_labeled is None:
                raise ValueError(
                    "quality_target_precision needs quality_labeled"
                    " (a labeled frame to measure the threshold on)"
                )
            threshold = calibrated_threshold(
                quality_labeled.select(
                    prob.alias("__prob"),
                    F.col(quality_label_col).alias("__label"),
                ),
                "__prob", "__label",
                quality_target_precision,
                n_bins=quality_calibration_bins,
            )
        gated = gated.filter(prob >= F.lit(threshold))

    # dedup winners genuinely need the groupBy round-trip; the winner set
    # is one long per distinct text — broadcastable at any realistic scale
    winners = (
        gated.select(
            F.md5(normalized_text(F.col(text_col))).alias("__h"),
            F.col(id_col).cast("long").alias(id_col),
        )
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    deduped = gated.join(F.broadcast(winners), id_col, "semi")

    sampled = deterministic_sample(deduped, sample_bp, id_col, sample_seed)
    return chunk_docs(
        sampled,
        chunk_tokens=chunk_tokens,
        overlap=chunk_overlap,
        text_col=text_col,
        id_col=id_col,
    )


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-call corpus profile — the numbers a curation run reads FIRST,
    as a single tagged frame ``(metric, value)``:

    - ``n_docs``, ``total_tokens``, ``avg_tokens``
    - ``exact_dup_rate``: fraction of docs that are exact copies of an
      earlier doc (normalized-text hash)
    - ``pii_rate``: fraction of docs with ≥1 default-PII match
    - ``high_rep_rate``: fraction with bigram repetition > 0.5
    - ``mean_quality``: mean of the blended quality score

    Every metric reuses this package's proven operators; the whole report
    is one plan with two shuffles (the dedup groupBy + the global
    aggregate), so running it on 100 TB costs roughly one corpus scan.
    Values are exact-integer ratios / decimal-summed means rounded to 6 —
    engine-reproducible.
    """
    from tundradb_spark.pipeline.text import quality_scores

    t = tokens(F.col(text_col))
    no_pii = no_pii_col(text_col)
    base = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.size(t).alias("__nt"),
        (~no_pii).cast("long").alias("__pii"),
        F.md5(normalized_text(F.col(text_col))).alias("__h"),
        F.col(text_col).alias("__text"),
        t.alias("__t"),
    ).withColumn(
        "__rep", (bigram_repetition_col("__t") > 0.5).cast("long")
    )
    qual = quality_scores(docs, text_col, id_col).select(
        id_col, F.col("quality").alias("__q")
    )
    joined = base.join(qual, id_col)
    from pyspark.sql import Window

    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    flagged = joined.withColumn(
        "__dup", (F.row_number().over(w) > 1).cast("long")
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
        F.sum("__dup").alias("n_dups"),
        F.sum("__pii").alias("n_pii"),
        F.sum("__rep").alias("n_rep"),
        F.sum(F.col("__q").cast("decimal(20,10)")).alias("q_sum"),
    )
    n = F.col("n_docs").cast("double")
    rows = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_docs").alias("metric"),
                    n.alias("value"),
                ),
                F.struct(
                    F.lit("total_tokens").alias("metric"),
                    F.col("total_tokens").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("avg_tokens").alias("metric"),
                    F.round(F.col("total_tokens").cast("double") / n, 6).alias(
                        "value"
                    ),
                ),
                F.struct(
                    F.lit("exact_dup_rate").alias("metric"),
                    F.round(F.col("n_dups").cast("double") / n, 6).alias("value"),
                ),
                F.struct(
                    F.lit("pii_rate").alias("metric"),
                    F.round(F.col("n_pii").cast("double") / n, 6).alias("value"),
                ),
                F.struct(
                    F.lit("high_rep_rate").alias("metric"),
                    F.round(F.col("n_rep").cast("double") / n, 6).alias("value"),
                ),
                F.struct(
                    F.lit("mean_quality").alias("metric"),
                    F.round(
                        (F.col("q_sum") / F.col("n_docs")).cast("double"), 6
                    ).alias("value"),
                ),
            )
        ).alias("m")
    ).select(F.col("m.metric").alias("metric"), F.col("m.value").alias("value"))
    return rows


def gate_reasons(
    docs: DataFrame,
    text_col: str = "text",
    max_bigram_rep: float = 0.5,
    quality_weights: list | None = None,
    min_quality: float = 0.5,
    n_quality_buckets: int = 256,
    quality_bigrams: bool = True,
    _keep_tokens: bool = False,
) -> DataFrame:
    """Per-document FIRST-failing-gate label for :func:`prepare_corpus`'s
    row-level gates — the debugging face of the recipe: every doc tagged
    ``pass`` / ``pii`` / ``repetition`` / ``quality`` using the
    IDENTICAL inline predicates the recipe compiles (same patterns, same
    rounded repetition, same lr_prob_col fold), in the recipe's gate
    order, so ``gate == 'pass'`` is EXACTLY the pre-dedup survivor set
    (test-pinned).

    NULL text dies at the PII gate, matching the recipe (a NULL
    predicate fails a ``filter``); the ``quality`` label only exists
    when ``quality_weights`` is given.  Pure narrow projection — zero
    shuffle, fuses into the scan.

    Output: ``docs.*`` + ``gate`` (string); with ``_keep_tokens`` the
    internal ``__t`` token array survives too (private — the funnel
    aggregates token counts from it instead of re-tokenizing).
    """
    no_pii = no_pii_col(text_col)
    toked = docs.withColumn("__t", tokens(F.col(text_col)))
    gate = F.when(no_pii.isNull() | ~no_pii, F.lit("pii")).when(
        bigram_repetition_col("__t") > max_bigram_rep,
        F.lit("repetition"),
    )
    if quality_weights is not None:
        from tundradb_spark.pipeline.classify import lr_prob_col

        gate = gate.when(
            lr_prob_col(
                quality_weights, text_col, n_buckets=n_quality_buckets,
                bigrams=quality_bigrams,
            ) < F.lit(float(min_quality)),
            F.lit("quality"),
        )
    out = toked.withColumn("gate", gate.otherwise(F.lit("pass")))
    return out if _keep_tokens else out.drop("__t")


def gate_funnel(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    max_bigram_rep: float = 0.5,
    quality_weights: list | None = None,
    min_quality: float = 0.5,
    n_quality_buckets: int = 256,
    quality_bigrams: bool = True,
) -> DataFrame:
    """The gate-attrition funnel — the first table a curation run reads:
    documents and tokens lost at each :func:`prepare_corpus` row-level
    gate, per ``group_col`` (language/source), from ONE corpus scan
    (:func:`gate_reasons` is a narrow projection; this adds a single
    map-side-combined groupBy whose output is ``gates × groups`` rows).

    Output: ``(gate, <group_col>, n_docs, n_tokens)``; ``n_tokens``
    counts house-tokenized tokens (NULL text counts 0).
    """
    r = gate_reasons(
        docs, text_col=text_col, max_bigram_rep=max_bigram_rep,
        quality_weights=quality_weights, min_quality=min_quality,
        n_quality_buckets=n_quality_buckets,
        quality_bigrams=quality_bigrams,
        _keep_tokens=True,  # count from __t — never tokenize twice
    )
    return r.groupBy("gate", group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.coalesce(F.size("__t"), F.lit(0))
        ).cast("long").alias("n_tokens"),
    )


def gate_funnel_sql(
    table: str,
    group_col: str = "lang",
    text_col: str = "text",
    max_bigram_rep: float = 0.5,
    quality_weights: list | None = None,
    min_quality: float | str = 0.5,
    n_quality_buckets: int = 256,
    quality_bigrams: bool = True,
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle reproducing :func:`gate_funnel` exactly (the
    quality branch joins the lr_score_sql probabilities, pinned
    bit-equal to the inline fold; ``quality_bigrams`` mirrors
    :func:`gate_funnel`'s feature-space knob — r14 ADVICE fix: without
    the passthrough a unigram-trained weight table had no matching
    oracle and the SQL twin silently scored with bigram features)."""
    with_block, case_expr, join_clause = _gate_sql_parts(
        table, text_col, max_bigram_rep, quality_weights, min_quality,
        n_quality_buckets, quality_bigrams, id_col,
    )
    return f"""
    {with_block}
    SELECT {case_expr} AS gate,
           t.{group_col},
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(len(__toks), 0)) AS BIGINT) AS n_tokens
    FROM t{join_clause}
    GROUP BY 1, 2
    """


def gate_reasons_sql(
    table: str,
    text_col: str = "text",
    max_bigram_rep: float = 0.5,
    quality_weights: list | None = None,
    min_quality: float | str = 0.5,
    n_quality_buckets: int = 256,
    quality_bigrams: bool = True,
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle reproducing :func:`gate_reasons` exactly (r14):
    the per-doc first-failing-gate label — the same shared gate CASE
    the funnel oracle aggregates (:func:`_gate_sql_parts`), ungrouped.
    Output: ``(id_col, gate)``."""
    with_block, case_expr, join_clause = _gate_sql_parts(
        table, text_col, max_bigram_rep, quality_weights, min_quality,
        n_quality_buckets, quality_bigrams, id_col,
    )
    return f"""
    {with_block}
    SELECT t.{id_col} AS {id_col},
           {case_expr} AS gate
    FROM t{join_clause}
    """


def _gate_sql_parts(
    table: str,
    text_col: str,
    max_bigram_rep: float,
    quality_weights: list | None,
    min_quality: float | str,
    n_quality_buckets: int,
    quality_bigrams: bool,
    id_col: str,
) -> tuple[str, str, str]:
    """The shared SQL fragments behind :func:`gate_funnel_sql` and
    :func:`gate_reasons_sql`: the tokenized-docs WITH block (plus the
    lr_score_sql CTE when a quality gate is active), the first-failing-
    gate CASE expression, and the quality join clause."""
    pii_fail = " OR ".join(
        f"len(regexp_extract_all({text_col}, '{pat}')) > 0"
        for pat in DEFAULT_PII_PATTERNS.values()
    )
    rep = (
        "ROUND(CASE WHEN len(__toks) > 1 THEN 1.0 -"
        " CAST(len(list_distinct([__toks[i] || ' ' || __toks[i + 1]"
        " for i in range(1, len(__toks))])) AS DOUBLE)"
        " / CAST(len(__toks) - 1 AS DOUBLE) ELSE 0.0 END, 6)"
    )
    qual_cte, qual_join, qual_when = "", "", ""
    if quality_weights is not None:
        from tundradb_spark.pipeline.classify import lr_score_sql

        inner = lr_score_sql(
            table, quality_weights, n_buckets=n_quality_buckets,
            bigrams=quality_bigrams, id_col=id_col, text_col=text_col,
        )
        # min_quality may be a SQL expression string (e.g. the pick CTE
        # of a calibrated composition — curation_report_sql) instead of
        # a float literal
        thr_sql = (
            min_quality
            if isinstance(min_quality, str)
            else str(float(min_quality))
        )
        qual_cte = f", scored AS ({inner})"
        qual_join = f" LEFT JOIN scored s ON t.{id_col} = s.{id_col}"
        qual_when = f" WHEN s.prob < {thr_sql} THEN 'quality'"
    with_block = f"""WITH t AS (
        SELECT *,
               [x for x in string_split_regex(lower({text_col}), '\\s+')
                if x != ''] AS __toks
        FROM {table}
    ){qual_cte}"""
    case_expr = f"""CASE
             WHEN ({pii_fail}) IS NULL OR ({pii_fail}) THEN 'pii'
             WHEN {rep} > {max_bigram_rep} THEN 'repetition'{qual_when}
             ELSE 'pass'
           END"""
    return with_block, case_expr, qual_join


def curation_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    max_bigram_rep: float = 0.5,
    quality_weights: list | None = None,
    min_quality: float = 0.5,
    n_quality_buckets: int = 256,
    quality_bigrams: bool = True,
    quality_labeled: DataFrame | None = None,
    quality_label_col: str = "label",
    quality_target_precision: float | None = None,
    quality_calibration_bins: int = 10,
    dup_pairs: DataFrame | None = None,
    split_col: str | None = None,
    pair_src: str = "id_a",
    pair_dst: str = "id_b",
) -> DataFrame:
    """Curation run report v2 (r14, r13 verdict item 6): the ONE
    artifact a 100 TB curation run reads after (or instead of dry-run
    before) :func:`prepare_corpus`, composing the proven r13
    observability operators into a single flat frame
    ``(section, metric, grp, value)``:

    - ``funnel_docs`` / ``funnel_tokens``: per-``(gate, group)``
      attrition from :func:`gate_funnel` — evaluated at the MEASURED
      threshold when a precision target is given, the hand-set
      ``min_quality`` otherwise.
    - ``corpus``: ``n_docs`` / ``total_tokens`` totals (summed from the
      funnel partials — no extra scan).
    - ``quality_gate`` (only with ``quality_target_precision``):
      ``picked_threshold`` plus the ACHIEVED ``precision`` / ``recall``
      at the picked operating point
      (``classify.precision_thresholds``'s curve, the same rows
      :func:`~tundradb_spark.pipeline.classify.calibrated_threshold`
      picks from — one bounded ``n_bins``-row collect).
    - ``dedup``: exact-duplicate cluster stats over the normalized-text
      hash — ``n_dup_groups`` (clusters with >1 member),
      ``max_group_size``, ``dup_doc_rate`` (fraction of docs that are
      a non-canonical copy).
    - ``leakage`` (only with ``dup_pairs`` + ``split_col``): violation
      counts per ordered split channel from
      :func:`~tundradb_spark.pipeline.sampling.split_leakage_summary`
      (``grp = 'train->val'`` etc.).

    Cost, stated: TWO corpus scans (the funnel projection — both
    funnel sections explode from ONE pass; and the dedup hash groupBy,
    which also carries the corpus totals) plus the leakage section's
    two-column ``(id, split)`` projection and ONE scan of the labeled
    frame for the curve — every section is otherwise
    partial-aggregated and model-state- or channel-sized (plan-pinned:
    the full report plan holds <= 3 parquet scans).  Raises ``calibrated_threshold``'s loud error when
    the precision target is unreachable (a report that silently gated
    wide-open would be a defect); driver registry rows wrap this with
    the documented empty-frame totality instead.

    All values are doubles (counts are exact longs rendered as doubles;
    rates/curve points use the house floor-round-to-6) — the schema is
    canonicalizable by contract (no Decimal/Array/Map).
    """
    if (dup_pairs is None) != (split_col is None):
        raise ValueError(
            "leakage section needs BOTH dup_pairs and split_col (got"
            " one without the other — a half-configured audit would be"
            " silently skipped)"
        )
    threshold = float(min_quality)
    qg_rows: list[tuple[str, str, str | None, float]] = []
    if quality_target_precision is not None:
        from tundradb_spark.pipeline.classify import (
            _pick_operating_point,
            lr_prob_col,
            precision_thresholds,
        )

        if quality_weights is None:
            raise ValueError(
                "quality_target_precision needs quality_weights (the"
                " frozen lr_train table the gate scores with)"
            )
        if quality_labeled is None:
            raise ValueError(
                "quality_target_precision needs quality_labeled (a"
                " labeled frame to measure the threshold on)"
            )
        prob = lr_prob_col(
            quality_weights, text_col, n_buckets=n_quality_buckets,
            bigrams=quality_bigrams,
        )
        pick = _pick_operating_point(
            precision_thresholds(
                quality_labeled.select(
                    prob.alias("__prob"),
                    F.col(quality_label_col).alias("__label"),
                ),
                "__prob", "__label", quality_calibration_bins,
            ).collect(),
            quality_target_precision,
        )
        threshold = float(pick["threshold"])
        qg_rows = [
            ("quality_gate", "picked_threshold", None, threshold),
            ("quality_gate", "precision", None, pick["precision"]),
            ("quality_gate", "recall", None, pick["recall"]),
        ]
    elif quality_labeled is not None:
        raise ValueError(
            "quality_labeled was given without quality_target_precision"
            " — pass the precision target the threshold should be"
            " measured against"
        )

    spark = docs.sparkSession
    # ONE funnel pass: each (gate, group) partial explodes into its
    # docs + tokens rows in a single projection — referencing the
    # funnel frame once keeps the plan at ONE corpus scan here (three
    # separate union branches would re-plan the scan per branch;
    # plan-pinned in tests)
    fun = gate_funnel(
        docs, group_col=group_col, text_col=text_col,
        max_bigram_rep=max_bigram_rep,
        quality_weights=quality_weights, min_quality=threshold,
        n_quality_buckets=n_quality_buckets,
        quality_bigrams=quality_bigrams,
    )
    sections = [
        fun.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("funnel_docs").alias("section"),
                        F.col("n_docs").cast("double").alias("value"),
                    ),
                    F.struct(
                        F.lit("funnel_tokens").alias("section"),
                        F.col("n_tokens").cast("double").alias("value"),
                    ),
                )
            ).alias("m"),
            F.col("gate").alias("metric"),
            F.col(group_col).cast("string").alias("grp"),
        ).select(
            F.col("m.section").alias("section"),
            "metric",
            "grp",
            F.col("m.value").alias("value"),
        ),
    ]
    if qg_rows:
        sections.append(
            spark.createDataFrame(
                qg_rows,
                "section string, metric string, grp string, value double",
            )
        )
    # corpus totals ride the dedup scan (sum of group sizes == n_docs;
    # per-group token sums give total_tokens) instead of re-aggregating
    # the funnel — the second and last corpus scan
    groups = (
        docs.select(
            F.md5(normalized_text(F.col(text_col))).alias("__h"),
            F.coalesce(
                F.size(tokens(F.col(text_col))), F.lit(0)
            ).alias("__nt"),
        )
        .groupBy("__h")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum("__nt").alias("__tk"),
        )
    )
    r6 = (
        "cast(floor(cast({num} as double) / cast({den} as double)"
        " * 1000000 + 0.5) as double) / 1000000.0"
    )
    sections.append(
        groups.agg(
            # count, not sum: over an EMPTY corpus sum() yields NULL
            # while the oracle's count(*) FILTER yields 0 (r14 review)
            F.count(F.when(F.col("__c") > 1, 1)).alias("__g"),
            F.max("__c").alias("__m"),
            F.sum(F.col("__c") - 1).alias("__extra"),
            F.sum("__c").alias("__n"),
            F.sum("__tk").alias("__t"),
        ).select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("corpus").alias("section"),
                        F.lit("n_docs").alias("metric"),
                        F.col("__n").cast("double").alias("value"),
                    ),
                    F.struct(
                        F.lit("corpus").alias("section"),
                        F.lit("total_tokens").alias("metric"),
                        F.col("__t").cast("double").alias("value"),
                    ),
                    F.struct(
                        F.lit("dedup").alias("section"),
                        F.lit("n_dup_groups").alias("metric"),
                        F.col("__g").cast("double").alias("value"),
                    ),
                    F.struct(
                        F.lit("dedup").alias("section"),
                        F.lit("max_group_size").alias("metric"),
                        F.col("__m").cast("double").alias("value"),
                    ),
                    F.struct(
                        F.lit("dedup").alias("section"),
                        F.lit("dup_doc_rate").alias("metric"),
                        F.when(
                            F.col("__n") > 0,
                            F.expr(r6.format(num="__extra", den="__n")),
                        ).alias("value"),
                    ),
                )
            ).alias("m")
        ).select(
            F.col("m.section").alias("section"),
            F.col("m.metric").alias("metric"),
            F.lit(None).cast("string").alias("grp"),
            F.col("m.value").alias("value"),
        )
    )
    if dup_pairs is not None:
        from tundradb_spark.pipeline.sampling import split_leakage_summary

        sections.append(
            split_leakage_summary(
                docs, dup_pairs, split_col, id_col, pair_src, pair_dst
            ).select(
                F.lit("leakage").alias("section"),
                F.lit("n_pairs").alias("metric"),
                F.concat_ws(
                    "->", F.col("split_a"), F.col("split_b")
                ).alias("grp"),
                F.col("n_pairs").cast("double").alias("value"),
            )
        )
    out = sections[0]
    for s in sections[1:]:
        out = out.unionByName(s)
    return out


def curation_report_sql(
    table: str,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bigram_rep: float = 0.5,
    quality_weights: list | None = None,
    min_quality: float = 0.5,
    n_quality_buckets: int = 256,
    quality_bigrams: bool = True,
    quality_label_expr: str | None = None,
    quality_target_precision: float | None = None,
    quality_calibration_bins: int = 10,
    pairs_sql: str | None = None,
    split_expr: str | None = None,
) -> str:
    """DuckDB oracle reproducing :func:`curation_report` exactly, as a
    COMPOSITION of the proven fragment oracles: :func:`gate_funnel_sql`
    (with the threshold inlined as the pick CTE when a precision target
    is given), ``classify.precision_thresholds_sql``'s curve + the
    min-qualifying-edge pick, the normalized-hash dedup stats, and a
    leakage-channel roll-up over ``pairs_sql`` (a subquery yielding
    ``id_a, id_b``) against ``split_expr`` (a SQL expression over the
    table's columns — the Spark side's ``withColumn`` twin)."""
    if (pairs_sql is None) != (split_expr is None):
        raise ValueError("pairs_sql and split_expr go together")
    calibrated = quality_target_precision is not None
    if calibrated and (
        quality_weights is None or quality_label_expr is None
    ):
        raise ValueError(
            "a precision target needs quality_weights +"
            " quality_label_expr"
        )
    r6 = (
        "CAST(floor(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)"
        " * 1000000 + 0.5) AS DOUBLE) / 1000000.0"
    )
    ctes = []
    thr: float | str = float(min_quality)
    if calibrated:
        from tundradb_spark.pipeline.classify import (
            lr_score_sql,
            precision_thresholds_sql,
        )

        inner = lr_score_sql(
            table, quality_weights, n_buckets=n_quality_buckets,
            bigrams=quality_bigrams, id_col=id_col, text_col=text_col,
        )
        labeled = (
            f"(SELECT s.prob, CAST({quality_label_expr} AS INT) AS label"
            f" FROM qscored s JOIN {table} d USING ({id_col}))"
        )
        curve = precision_thresholds_sql(
            labeled, "prob", "label", n_bins=quality_calibration_bins
        )
        ctes += [
            f"qscored AS ({inner})",
            f"curve AS ({curve})",
            "pick AS (SELECT min(threshold) AS thr FROM curve"
            f" WHERE precision >= {quality_target_precision})",
        ]
        thr = "(SELECT thr FROM pick)"
    funnel = gate_funnel_sql(
        table, group_col=group_col, text_col=text_col,
        max_bigram_rep=max_bigram_rep,
        quality_weights=quality_weights, min_quality=thr,
        n_quality_buckets=n_quality_buckets,
        quality_bigrams=quality_bigrams, id_col=id_col,
    )
    ctes.append(f"funnel AS ({funnel})")
    ctes.append(
        f"""dgroups AS (
        SELECT md5(regexp_replace(trim(lower({text_col})), '\\s+', ' ',
                   'g')) AS h,
               count(*) AS c,
               sum(coalesce(len([x for x in
                   string_split_regex(lower({text_col}), '\\s+')
                   if x != '']), 0)) AS nt
        FROM {table} GROUP BY 1
    )"""
    )
    branches = [
        f"""SELECT 'funnel_docs' AS section, gate AS metric,
               CAST({group_col} AS VARCHAR) AS grp,
               CAST(n_docs AS DOUBLE) AS value FROM funnel""",
        f"""SELECT 'funnel_tokens', gate, CAST({group_col} AS VARCHAR),
               CAST(n_tokens AS DOUBLE) FROM funnel""",
        """SELECT 'corpus', 'n_docs', NULL,
               CAST(sum(c) AS DOUBLE) FROM dgroups""",
        """SELECT 'corpus', 'total_tokens', NULL,
               CAST(sum(nt) AS DOUBLE) FROM dgroups""",
        """SELECT 'dedup', 'n_dup_groups', NULL,
               CAST(count(*) FILTER (WHERE c > 1) AS DOUBLE)
        FROM dgroups""",
        """SELECT 'dedup', 'max_group_size', NULL,
               CAST(max(c) AS DOUBLE) FROM dgroups""",
        f"""SELECT 'dedup', 'dup_doc_rate', NULL,
               CASE WHEN sum(c) > 0
                    THEN {r6.format(num="sum(c - 1)", den="sum(c)")}
               END
        FROM dgroups""",
    ]
    if calibrated:
        branches += [
            """SELECT 'quality_gate', 'picked_threshold', NULL,
                   (SELECT thr FROM pick)""",
            """SELECT 'quality_gate', 'precision', NULL,
                   (SELECT precision FROM curve
                    WHERE threshold = (SELECT thr FROM pick))""",
            """SELECT 'quality_gate', 'recall', NULL,
                   (SELECT recall FROM curve
                    WHERE threshold = (SELECT thr FROM pick))""",
        ]
    if pairs_sql is not None:
        branches.append(
            f"""SELECT 'leakage', 'n_pairs',
                   sa.sp || '->' || sb.sp,
                   CAST(count(*) AS DOUBLE)
        FROM ({pairs_sql}) p
        JOIN (SELECT {id_col} AS __id, {split_expr} AS sp
              FROM {table} WHERE ({split_expr}) IS NOT NULL) sa
          ON p.id_a = sa.__id
        JOIN (SELECT {id_col} AS __id, {split_expr} AS sp
              FROM {table} WHERE ({split_expr}) IS NOT NULL) sb
          ON p.id_b = sb.__id
        WHERE sa.sp != sb.sp
        GROUP BY 3"""
        )
    body = "\n    UNION ALL\n    ".join(branches)
    cte_block = ",\n    ".join(ctes)
    if calibrated:
        # totality twin of the Spark side's loud error: an unreachable
        # target empties BOTH sides (registry rows catch the ValueError
        # and return the empty frame).  The guard lives INSIDE the WITH
        # scope so the pick CTE is visible to it.
        return (
            f"WITH {cte_block}\n    SELECT * FROM (\n    {body}\n"
            "    ) __r WHERE EXISTS"
            " (SELECT 1 FROM pick WHERE thr IS NOT NULL)"
        )
    return f"WITH {cte_block}\n    {body}"
