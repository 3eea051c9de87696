"""Training-data pipeline operators over document / embedding tables.

Beyond the reference's graph-query surface (the reference system has no
data-pipeline operators at all — SURVEY.md §2.5/§2.12), this package adds the
operations a large-scale LLM training-data pipeline needs, built Spark-first:

- :mod:`dedup` — exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-duplicate detection, and :func:`apply_dedup` (the
  corpus materializer: clusters → canonical survivors)
- :mod:`similarity` — brute-force cosine top-k, sign-LSH / IVF / PQ / IVF+PQ
  ANN, each with an on-disk index layer (``index_corpus*``) whose probes
  prune files and read precomputed codes
- :mod:`text` — language ID, quality scoring, token counting,
  fingerprinting, repetition scoring, PII pattern sweeps, unigram-LM fluency
  and the CCNet-style per-language LM quality buckets (``lm_buckets``)
- :mod:`sampling` — deterministic/stratified content-hash sampling,
  fixed-token document chunking, sequence packing, exact/approximate
  token-budget mixture building, and the deterministic global shuffle /
  shard export (:func:`shuffle_shards`, :func:`write_shards`)
- :mod:`sketches` — HyperLogLog distinct counts, Count-Min frequency
  estimates, and Bloom-filter join pruning, all oracle-exact via the
  portable hash family
- :mod:`importance` — DSIR hashed n-gram importance weights (target-domain
  log-likelihood ratios) for importance resampling
- :mod:`classify` — in-engine text classifiers: closed-form multinomial
  Naive Bayes, the r12 IRLS logistic-regression quality filter over hashed
  n-gram features (``lr_train`` / ``lr_score``), reliability-diagram
  calibration bins with a streaming twin, and the r13 calibrated gate
  knob (``precision_thresholds`` — the measured keep-rule
  precision/recall curve at every bin edge — with
  ``calibrated_threshold`` picking the max-recall edge meeting a
  precision target; ``recipe.prepare_corpus`` deploys it via
  ``quality_target_precision``)
- :mod:`recipe` — the composed corpus-prep pipeline (gate → dedup → chunk →
  sample as one lazy plan)
- :mod:`multimodal` — binary (image/audio/video) column plumbing with
  Arrow-batched ``mapInPandas`` decode/extract stages (real decode probes
  PIL at call time; the Spark-side schema/partitioning/batching is real)

Every operator is pure DataFrame-in / DataFrame-out, expressed with built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen) — no Python UDFs in
any hot path. All hash-based operators use a portable md5-derived hash so a
DuckDB SQL oracle can reproduce results bit-for-bit (see __spark_entry__).
"""

from tundradb_spark.pipeline.dedup import (
    apply_dedup,
    corpus_diff,
    corpus_diff_summary,
    row_diff,
    incremental_dup_pairs,
    strip_duplicate_segments,
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from tundradb_spark.pipeline.importance import (
    dsir_weights,
    hashed_ngram_features,
    importance_resample,
)
from tundradb_spark.pipeline.recipe import (
    corpus_report,
    gate_funnel,
    gate_reasons,
    prepare_corpus,
)
from tundradb_spark.pipeline.sampling import (
    chunk_docs,
    deterministic_sample,
    leakage_safe_split,
    split_leakage,
    split_leakage_summary,
    split_corpus,
    mixture_budget_sample,
    mixture_threshold_sample,
    pack_chunks,
    pack_summary,
    shard_summary,
    shuffle_shards,
    stratified_sample,
    weighted_sample_topk,
    write_shards,
)
from tundradb_spark.pipeline.sketches import (
    bloom_build,
    bloom_contains,
    bloom_semi_join,
    cm_build,
    cm_estimate,
    hll_distinct,
    hll_estimate,
    hll_intersect_estimate,
    hll_registers,
)
from tundradb_spark.pipeline.similarity import (
    ann_recall,
    cluster_prune,
    cosine_scores,
    cosine_topk,
    index_corpus,
    index_corpus_ivfpq,
    index_corpus_lsh,
    index_corpus_pq,
    ivf_ann_topk,
    ivf_ann_topk_indexed,
    ivf_train,
    ivfpq_ann_topk_indexed,
    lsh_ann_topk,
    lsh_ann_topk_indexed,
    lsh_signature,
    pq_ann_topk,
    pq_ann_topk_indexed,
    pq_encode,
    random_projection,
)
from tundradb_spark.pipeline.text import (
    build_vocab,
    lm_buckets,
    compression_ratios,
    encode_tokens,
    fingerprints,
    lm_scores_bigram,
    gopher_rules,
    lang_confusion,
    lang_id,
    lm_scores,
    pattern_counts,
    pii_scan,
    quality_scores,
    redact_patterns,
    repetition_scores,
    tfidf_topk_terms,
    token_drift,
    token_drift_score,
    token_stats,
    winnow_fingerprints,
    with_tokens,
)

__all__ = [
    "corpus_diff",
    "corpus_diff_summary",
    "row_diff",
    "exact_dedup",
    "hll_distinct",
    "hll_registers",
    "bloom_build",
    "bloom_contains",
    "bloom_semi_join",
    "corpus_report",
    "gate_funnel",
    "gate_reasons",
    "cm_build",
    "cm_estimate",
    "hll_estimate",
    "hll_intersect_estimate",
    "weighted_sample_topk",
    "shuffle_shards",
    "shard_summary",
    "write_shards",
    "lm_scores_bigram",
    "build_vocab",
    "encode_tokens",
    "apply_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "strip_duplicate_segments",
    "incremental_dup_pairs",
    "embedding_dup_pairs",
    "cosine_scores",
    "cosine_topk",
    "ann_recall",
    "lsh_signature",
    "lsh_ann_topk",
    "lsh_ann_topk_indexed",
    "ivf_ann_topk",
    "ivf_ann_topk_indexed",
    "ivf_train",
    "pq_encode",
    "pq_ann_topk",
    "pq_ann_topk_indexed",
    "ivfpq_ann_topk_indexed",
    "index_corpus",
    "index_corpus_lsh",
    "index_corpus_pq",
    "index_corpus_ivfpq",
    "random_projection",
    "cluster_prune",
    "with_tokens",
    "token_stats",
    "quality_scores",
    "repetition_scores",
    "token_drift",
    "token_drift_score",
    "pattern_counts",
    "pii_scan",
    "redact_patterns",
    "tfidf_topk_terms",
    "lm_scores",
    "lang_id",
    "lang_confusion",
    "fingerprints",
    "winnow_fingerprints",
    "compression_ratios",
    "gopher_rules",
    "chunk_docs",
    "pack_chunks",
    "pack_summary",
    "deterministic_sample",
    "split_corpus",
    "leakage_safe_split",
    "split_leakage",
    "split_leakage_summary",
    "lm_buckets",
    "stratified_sample",
    "mixture_budget_sample",
    "mixture_threshold_sample",
    "dsir_weights",
    "hashed_ngram_features",
    "importance_resample",
    "prepare_corpus",
]
