"""Cross-corpus decontamination: flag training documents that overlap an
evaluation/benchmark set.

The standard pre-training hygiene step (the reference engine has no
equivalent — capability extension in the SURVEY.md §2 pipeline family):
before training, every document sharing too many token n-grams with a
held-out benchmark is dropped, so eval scores measure generalization, not
memorized test data.

Scale design (100 TB corpus vs ~MB-GB benchmark):

* The benchmark side reduces to its DISTINCT n-gram set once —
  benchmarks are small by definition, so the gram set broadcasts; the
  corpus is NEVER shuffled for the membership probe, only for the one
  per-doc aggregation (map-side combinable count).
* ``broadcast=False`` falls back to a shuffle join keyed on the gram for
  the rare huge-benchmark case — same semantics, same single aggregation.
* All expressions are built-in (split / slice / array_distinct /
  explode) — no Python UDFs; tokenization is materialized once per row
  (the anti-inlining discipline measured in pipeline.text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tundradb_spark.pipeline.text import tokens as _tokens


def _distinct_ngrams(toks: F.Column, n: int) -> F.Column:
    """Distinct space-joined token ``n``-grams of a token-array column."""
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_grams(
    benchmark: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """The benchmark's distinct n-gram universe: one ``gram`` column."""
    toked = benchmark.select(_tokens(F.col(text_col)).alias("toks"))
    return (
        toked.select(F.explode(_distinct_ngrams(F.col("toks"), n)).alias("gram"))
        .distinct()
    )


def contamination_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Per-document benchmark overlap: ``n_grams`` (distinct n-grams),
    ``n_hits`` (of them, how many appear anywhere in the benchmark), and
    ``contamination = n_hits / n_grams`` (0.0 for docs shorter than n
    tokens).  One aggregation shuffle; the benchmark probe side is
    broadcast (or a gram-keyed shuffle join with ``broadcast=False``)."""
    bench = benchmark_grams(
        benchmark, n=n, text_col=bench_text_col or text_col
    ).withColumn("__hit", F.lit(1))
    if broadcast:
        bench = F.broadcast(bench)
    # tokenize in its own projection: passing the computed token
    # expression straight into _distinct_ngrams would inline it into the
    # slice lambda and re-split the text once per n-gram (the
    # char_shingles/ngram_jaccard lesson)
    grams = corpus.select(
        F.col(id_col).cast("long").alias(id_col),
        _tokens(F.col(text_col)).alias("__toks"),
    ).select(
        id_col,
        _distinct_ngrams(F.col("__toks"), n).alias("__grams"),
    ).select(
        id_col,
        F.size("__grams").alias("__n_grams"),
        # explode_outer keeps gram-less (short) docs in the result at 0.0
        F.explode_outer("__grams").alias("gram"),
    )
    joined = grams.join(bench, "gram", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.any_value(F.col("__n_grams")).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.round(
                F.col("n_hits")
                / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
                6,
            ).alias("contamination"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    max_contamination: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Corpus rows whose benchmark overlap is ≤ ``max_contamination``
    (default 0: drop any doc sharing even one n-gram with the benchmark).
    Implemented as an anti-join against the flagged id set, so the corpus
    keeps its full schema and the filter composes with further pipeline
    stages as one lazy plan.  The flagged set's size is data-dependent
    (worst case the whole corpus), so the join is left to AQE — it
    broadcasts when the set turns out small and shuffles when it doesn't."""
    flagged = (
        contamination_scores(
            corpus,
            benchmark,
            n=n,
            text_col=text_col,
            id_col=id_col,
            bench_text_col=bench_text_col,
            broadcast=broadcast,
        )
        .filter(F.col("contamination") > max_contamination)
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")
