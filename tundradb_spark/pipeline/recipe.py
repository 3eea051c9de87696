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


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bigram_rep: float = 0.5,
    chunk_tokens: int = 128,
    chunk_overlap: int = 0,
    sample_bp: int = 10000,
    sample_seed: int = 97,
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
    3. **Exact dedup**: md5(normalized text) groups; only each group's
       minimum-id member survives (broadcast semi-join against the groupBy
       winners — the one shuffle in the plan).
    4. **Chunking**: fixed-token windows with overlap.
    5. **Sampling**: deterministic content-hash downsample to
       ``sample_bp``/10000 of the surviving documents.
    """
    # both row-level gates are inline column predicates, NOT joins back to
    # per-doc score frames — the whole pre-dedup phase is one scan (four
    # scans → two measured 6.6s → ~2s at sf0.1)
    no_pii = None
    for pat in DEFAULT_PII_PATTERNS.values():
        pred = F.regexp_count(F.col(text_col), F.lit(pat)) == 0
        no_pii = pred if no_pii is None else (no_pii & pred)
    clean = docs.filter(no_pii)

    toked = clean.withColumn("__t", tokens(F.col(text_col)))
    gated = toked.filter(
        bigram_repetition_col("__t") <= max_bigram_rep
    ).drop("__t")

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
