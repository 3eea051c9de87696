"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine.

The reference system has no data-pipeline operators (SURVEY.md §2.5, §2.12);
these are capability extensions designed for the 100 TB path:

- **exact_dedup** — one hash-shuffle ``groupBy`` with map-side combine; the
  only full pass over the corpus.
- **minhash_lsh_pairs** — per-row signature (narrow), explode to ``bands``
  rows per doc, one shuffle on the band key.  Candidate generation never
  compares all pairs; cost is O(n·bands) + within-bucket pairs.
- **simhash_pairs** — 64→32-bit simhash per row (narrow), banded on byte
  slices of the hash so only same-band docs are joined (pigeonhole: any pair
  within ``max_hamming`` ≤ bands-1 bits shares ≥1 exact band).
- **ngram_jaccard_pairs** — exact verifier, blocked by a caller-supplied
  key (e.g. language).  At full scale run it only on LSH candidates.
- **embedding_dup_pairs** — sign-LSH bucketing (``method='lsh'``) so only
  same-bucket vectors get the exact cosine; ``method='brute'`` is the O(n²)
  baseline for small n / validation.

All operators use only built-in functions (whole-stage codegen, no Python in
the hot path) and the portable md5-derived hash of
:mod:`tundradb_spark.pipeline.hashing`, so a SQL oracle reproduces them
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tundradb_spark.pipeline.hashing import (
    MERSENNE_P,
    char_shingles,
    h32,
    hyperplanes,
    minhash_params,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def normalized_text(col: Column) -> Column:
    """Whitespace-collapsed, trimmed, lowercased text for exact matching."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by md5 of normalized text.

    Returns one row per distinct text: ``dup_hash, keep_id (min id),
    n_copies``.  Scale: a single hash-partitioned groupBy; partial
    aggregation happens map-side, so shuffle volume is one row per distinct
    hash per task, not per document.
    """
    return (
        docs.select(
            F.md5(normalized_text(F.col(text_col))).alias("dup_hash"),
            F.col(id_col).cast("long").alias("_id"),
        )
        .groupBy("dup_hash")
        .agg(
            F.min("_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Per-document MinHash signature over distinct char ``shingle_k``-grams.

    ``sig[j] = min over shingles s of (a_j * h32(s) + b_j) % P`` — a narrow,
    fully codegen'd projection (no shuffle, no UDF).
    """
    params = minhash_params(num_hashes, seed)
    # hash each shingle ONCE (md5 dominates); the universal-hash family is
    # cheap integer arithmetic over the shared base hashes
    hs = F.transform(char_shingles(F.col(text_col), shingle_k), h32)

    def _mh(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE_P)
        )

    sig = F.array(*[_mh(a, b) for a, b in params])
    return docs.select(F.col(id_col).cast("long").alias(id_col), sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding of MinHash signatures.

    Signature is split into ``bands`` bands of ``num_hashes//bands`` rows;
    docs sharing any exact band become a candidate pair.  With b=4, r=3 the
    match-probability curve crosses ~0.63 Jaccard.

    Scale: explode to b rows per doc, shuffle once on (band_idx, band_key);
    within-bucket self-join.  A degenerate bucket (mass-duplicated boilerplate)
    produces quadratic pairs — cap or sample buckets upstream if that bites.
    Returns distinct ``id_a < id_b`` pairs.
    """
    r = num_hashes // bands
    sigs = minhash_signature(docs, text_col, id_col, num_hashes, shingle_k, seed)
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.array_join(F.slice("sig", i * r + 1, r), ",").alias(
                            "band_key"
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _tokens(text_col: Column) -> Column:
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-document ``bits``-bit SimHash over whitespace tokens.

    Bit i of the hash is set iff more than half the tokens have bit i set in
    their h32: ``2 * |{t : h32(t) & 2^i}| > |tokens|``.  Expressed as
    ``bits`` codegen'd array filters — narrow, shuffle-free, and exactly
    reproducible in SQL.
    """
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    hashes = F.transform(toks, h32)

    def _bit_term(i: int) -> Column:
        cnt = F.size(F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << i)) != 0))
        return F.when(cnt * 2 > n, F.lit(1 << i).cast("long")).otherwise(F.lit(0))

    value = None
    for i in range(bits):
        term = _bit_term(i)
        value = term if value is None else value + term
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        n.alias("n_tokens"),
        value.alias("simhash"),
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with SimHash Hamming distance ≤ ``max_hamming``.

    Banding on ``bits // band_bits`` byte slices: any pair within
    ``bands - 1`` differing bits shares at least one exact band
    (pigeonhole), so only same-band docs are joined; the Hamming filter
    (``bit_count(xor)``) then verifies.  Distinct ``id_a < id_b`` pairs with
    their distance.
    """
    bands = bits // band_bits
    assert max_hamming <= bands - 1, "banding misses pairs beyond bands-1 bits"
    sh = simhash(docs, text_col, id_col, bits)
    mask = (1 << band_bits) - 1
    banded = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_idx", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verifier)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = "lang",
) -> DataFrame:
    """Exact token-``n``-gram Jaccard similarity for pairs within a block.

    Jaccard = |A ∩ B| / |A ∪ B| over distinct n-grams.  Blocking
    (``block_col``) keeps the self-join from being all-pairs; at full scale
    feed it LSH candidates instead of a column block.  Output:
    ``id_a < id_b, jaccard`` (exact double, rounded to 6).
    """
    toks = _tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda j: F.concat_ws(
                    " ", *[F.element_at(toks, j + k + 1) for k in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        *([F.col(block_col)] if block_col else []),
        grams.alias("grams"),
    )
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — element order fixed, so the result is the
    same IEEE-754 double in any engine that folds left (DuckDB list_reduce)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def embedding_dup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    method: str = "lsh",
    n_planes: int = 16,
    band_bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate vector pairs with cosine ≥ ``threshold``.

    ``method='lsh'``: sign-LSH bucketing — project on ``n_planes``
    deterministic ±1 hyperplanes, band the sign bits, join only within
    buckets, then verify with exact cosine.  ``method='brute'``: all pairs
    (validation baseline; O(n²), do not use at scale).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(
        F.col(id_col).cast("long").alias(id_col),
        v.alias("v"),
    ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))

    if method == "lsh":
        dim = len(emb.select(vec_col).first()[0])
        planes = hyperplanes(n_planes, dim, seed)
        sig = None
        for p, plane in enumerate(planes):
            proj = _dot(F.col("v"), F.array(*[F.lit(c) for c in plane]))
            bit = F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
            sig = bit if sig is None else sig + bit
        base = base.withColumn("sig", sig)
        bands = n_planes // band_bits
        mask = (1 << band_bits) - 1
        banded = base.select(
            id_col,
            "v",
            "norm",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band_idx"),
                            F.shiftright("sig", i * band_bits)
                            .bitwiseAND(F.lit(mask))
                            .alias("band_key"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("band"),
        ).select(id_col, "v", "norm", "band.band_idx", "band.band_key")
        a = banded.alias("a")
        b = banded.alias("b")
        joined = a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
    else:
        a = base.alias("a")
        b = base.alias("b")
        joined = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))

    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
