"""Deterministic corpus sampling and document chunking — the two
bread-and-butter reshaping steps of a training-data pipeline.

Both are pure narrow projections/explodes over built-in functions: no
shuffle, no RNG state, no driver involvement — a row's fate depends only on
its own content, so any engine (and any rerun, at any parallelism)
reproduces the sample and the chunks exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tundradb_spark.pipeline.hashing import h32
from tundradb_spark.pipeline.text import tokens


def sample_hash_col(id_col: str = "doc_id", seed: int = 97) -> Column:
    """Uniform [0, 10000) bucket from md5(seed || id) — the deterministic
    coin every sampling decision flips."""
    return h32(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))) % 10000


def deterministic_sample(
    docs: DataFrame,
    keep_bp: int,
    id_col: str = "doc_id",
    seed: int = 97,
) -> DataFrame:
    """Keep a deterministic ``keep_bp``/10000 fraction (basis points) of
    rows: a row survives iff its content-derived hash bucket falls below
    the threshold.  Unlike ``df.sample``, the result is stable across
    reruns, partitionings, and engines — the property a reproducible
    training mixture needs — and the predicate pushes to the scan."""
    if not 0 <= keep_bp <= 10000:
        raise ValueError(f"keep_bp must be in [0, 10000], got {keep_bp}")
    return docs.filter(sample_hash_col(id_col, seed) < keep_bp)


def stratified_sample(
    docs: DataFrame,
    keep_bp_by: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 97,
    default_bp: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source-rebalancing
    step of a data mixture: each stratum keeps its own basis-point
    fraction (strata absent from the map keep ``default_bp``)."""
    for v in list(keep_bp_by.values()) + [default_bp]:
        if not 0 <= v <= 10000:
            raise ValueError(f"basis points must be in [0, 10000], got {v}")
    threshold = F.lit(default_bp)
    for stratum, bp in sorted(keep_bp_by.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(bp)
        ).otherwise(threshold)
    return docs.filter(sample_hash_col(id_col, seed) < threshold)


def chunk_docs(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token-count chunks with optional overlap
    — the sequence-preparation step before tokenizer packing.

    Output: ``(doc_id, chunk_idx, n_chunk_tokens, chunk)`` — one row per
    chunk, chunk text re-joined with single spaces (whitespace-normalized,
    matching :func:`tokens`).  JVM-side only: ``sequence`` of start
    offsets → ``explode`` → ``slice`` + ``array_join``; empty docs emit no
    chunks.  At 100 TB this is the shape that parallelizes per document
    with zero shuffle.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    step = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        tokens(F.col(text_col)).alias("__t"),
    ).filter(F.size("__t") > 0)
    starts = f"sequence(1, size(__t), {step})"
    return toks.select(
        id_col,
        "__t",
        F.posexplode(F.expr(starts)).alias("chunk_idx", "__start"),
    ).select(
        id_col,
        "chunk_idx",
        F.expr(f"size(slice(__t, __start, {chunk_tokens}))").alias(
            "n_chunk_tokens"
        ),
        F.expr(f"array_join(slice(__t, __start, {chunk_tokens}), ' ')").alias(
            "chunk"
        ),
    )
