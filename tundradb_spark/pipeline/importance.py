"""Data selection via hashed n-gram importance weights (DSIR).

Implements the importance-resampling scoring of Xie et al. 2023 ("Data
Selection for Language Models via Importance Resampling"): represent each
document as a bag of HASHED n-gram features, fit unigram bucket
distributions over a small TARGET corpus (the domain you want more of) and
over the RAW corpus, and score every raw document by the log-likelihood
ratio

    w(x) = Σ_features  ln p_target(bucket) − ln p_raw(bucket)

with Laplace smoothing over the ``n_buckets`` hashed vocabulary.  High-
weight documents look like the target domain; resampling raw data
proportionally to ``w`` shifts the training mixture toward it.

Spark-first plan (same inverted-index shape as ``text.lm_scores``):

1. featurize both corpora: one narrow projection (tokens + adjacent
   bigrams, each md5-bucketed) and an explode — no shuffle yet;
2. two map-side-combined ``groupBy(bucket)`` counts (raw + target) and two
   scalar totals;
3. one bucket-level join of the ≤ ``n_buckets``-row ratio table, BROADCAST
   to the exploded raw features, then one ``groupBy(doc)``.

At 100 TB the only full shuffle is the per-doc aggregation; the ratio
table stays ≤ ``n_buckets`` rows regardless of corpus size, so the
broadcast never grows.  Engine-portability: per-feature log-ratios are
cast to ``decimal(20,10)`` BEFORE the per-doc sum (the ``lm_scores``
discipline), making the aggregation exact, order-independent, and
bit-reproducible by a SQL oracle after the final round(…,6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tundradb_spark.pipeline.hashing import h32
from tundradb_spark.pipeline.text import tokens


def hashed_ngram_features(
    docs: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
) -> DataFrame:
    """``(id, bucket)`` — one row per feature OCCURRENCE: every token and
    (optionally) every adjacent bigram, md5-hashed into ``n_buckets``.

    The token array is materialized in its own projection so the bigram
    ``zip_with`` (a constant number of references) never re-inlines the
    tokenization — the repo's measured anti-inlining discipline."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    base = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        tokens(F.col(text_col)).alias("__t"),
    )
    feats = F.col("__t")
    if bigrams:
        # slice() rejects negative lengths, so the 0/1-token case needs an
        # explicit empty-array branch
        bi = F.when(
            F.size("__t") > 1,
            F.expr(
                "zip_with(slice(__t, 1, size(__t) - 1), "
                "slice(__t, 2, size(__t) - 1), (a, b) -> concat(a, ' ', b))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        feats = F.concat(feats, bi)
    return base.select(
        id_col, F.explode(feats).alias("__gram")
    ).select(id_col, (h32(F.col("__gram")) % n_buckets).alias("bucket"))


def _bucket_counts(feats: DataFrame) -> DataFrame:
    return feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
) -> DataFrame:
    """Per-raw-document importance weight under the hashed n-gram bucket
    model: ``(doc_id, n_feats, dsir_weight)`` where ``dsir_weight`` is the
    summed log-likelihood ratio (rounded to 6).  Documents with zero
    features (empty text) are absent — they carry no evidence either way.
    """
    rf = hashed_ngram_features(raw, n_buckets, text_col, id_col, bigrams)
    tf = hashed_ngram_features(target, n_buckets, text_col, id_col, bigrams)
    rc = _bucket_counts(rf).withColumnRenamed("cnt", "cr")
    tc = _bucket_counts(tf).withColumnRenamed("cnt", "ct")
    r_tot = rc.agg(F.sum("cr").alias("r_total"))
    t_tot = tc.agg(F.sum("ct").alias("t_total"))
    # Laplace smoothing: p(b) = (cnt + 1) / (total + n_buckets); buckets the
    # target never emits still get mass, so every raw feature scores finite
    ratio = (
        rc.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            F.expr(
                f"cast(ln(cast(coalesce(ct, 0) + 1 as double) / "
                f"cast(t_total + {n_buckets} as double)) - "
                f"ln(cast(cr + 1 as double) / "
                f"cast(r_total + {n_buckets} as double)) "
                f"as decimal(20,10))"
            ).alias("__lr"),
        )
    )
    return (
        rf.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("__lr").cast("double"), 6).alias("dsir_weight"),
        )
    )


def importance_resample(
    weighted: DataFrame,
    n_target: int,
    weight_col: str = "dsir_weight",
    id_col: str = "doc_id",
    seed: int = 131,
) -> DataFrame:
    """Deterministic Gumbel-top-k importance resampling — the selection
    step that turns :func:`dsir_weights` into a dataset: drawing the
    ``n_target`` documents with the largest ``w + Gumbel`` keys samples
    WITHOUT replacement with probability proportional to ``exp(w)``
    (the Gumbel-max trick), i.e. exactly the DSIR paper's resampling
    distribution.

    The Gumbel noise is derived from the content hash
    (``-ln(-ln(u))``, ``u = (h32(seed:id)+1) / (2^32+1)`` — strictly
    inside (0,1)), so the drawn set is reproducible on any engine and
    rerun.  Engine-exactness: the noisy key is built decimal-exact from
    the 10-dp truncated ``ln`` values, so ranking ties cannot flip
    (the lm_scores discipline; ties break on id asc).

    Plan: one narrow projection + a global top-``n_target``
    (TakeOrderedAndProject — no full sort).  Output: the input columns
    plus ``gumbel_key`` (rounded)."""
    if n_target < 1:
        raise ValueError(f"n_target must be >= 1, got {n_target}")
    u = (
        h32(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))) + 1
    ).cast("double") / float((1 << 32) + 1)
    key = F.col(weight_col).cast("decimal(20,10)") + F.expr(
        "cast(-ln(-ln(__u)) as decimal(20,10))"
    )
    ranked = weighted.withColumn("__u", u).withColumn("__key", key)
    return (
        ranked.orderBy(F.desc("__key"), F.asc(id_col))
        .limit(n_target)
        .select(
            *[c for c in weighted.columns],
            F.col("__key").cast("double").alias("gumbel_key"),
        )
    )
