"""Training-data pipeline operators over document / embedding tables.

Beyond the reference's graph-query surface (the reference system has no
data-pipeline operators at all — SURVEY.md §2.5/§2.12), this package adds the
operations a large-scale LLM training-data pipeline needs, built Spark-first:

- :mod:`dedup` — exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-duplicate detection
- :mod:`similarity` — brute-force cosine top-k and LSH-bucketed ANN
- :mod:`text` — language ID, quality scoring, token counting, fingerprinting
- :mod:`multimodal` — binary (image/audio/video) column plumbing with
  Arrow-batched ``mapInPandas`` decode/extract stages (decode itself stubbed;
  the Spark-side schema/partitioning/batching is real)

Every operator is pure DataFrame-in / DataFrame-out, expressed with built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen) — no Python UDFs in
any hot path. All hash-based operators use a portable md5-derived hash so a
DuckDB SQL oracle can reproduce results bit-for-bit (see __spark_entry__).
"""

from tundradb_spark.pipeline.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from tundradb_spark.pipeline.similarity import (
    cosine_scores,
    cosine_topk,
    lsh_ann_topk,
    lsh_signature,
)
from tundradb_spark.pipeline.text import (
    fingerprints,
    lang_confusion,
    lang_id,
    quality_scores,
    token_stats,
    with_tokens,
)

__all__ = [
    "exact_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_dup_pairs",
    "cosine_scores",
    "cosine_topk",
    "lsh_signature",
    "lsh_ann_topk",
    "with_tokens",
    "token_stats",
    "quality_scores",
    "lang_id",
    "lang_confusion",
    "fingerprints",
]
