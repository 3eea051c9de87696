"""Distributed sketches: HyperLogLog distinct counts and Bloom-filter
join pruning.

Capability extensions over the reference (which has no approximate
analytics — SURVEY.md §2.5 covers exact aggregation only): at 100 TB,
``COUNT(DISTINCT url)`` per group is a full shuffle of every distinct key,
and a semi-join against a mid-size key set shuffles the entire big side.
Both sketches cut that to constant state per group / per filter.

Engine-portability is the design constraint (same discipline as
``hashing.py``): every sketch is built from the portable md5 hash family,
with EXACT integer arithmetic everywhere order-independence matters —
per-bucket registers are integer maxes, the HLL harmonic sum is an integer
sum of powers of two, the Bloom bitmap is an integer bit_or — so a DuckDB
oracle reproduces every output bit-for-bit (the only floats are a fixed
sequence of IEEE-754 ops on exact integers, rounded at the end).

Reference parity anchor: the reference's aggregation surface is
``src/core/aggregations.cpp`` (COUNT/SUM/MIN/MAX/AVG); these sketches are
the scale path those exact aggregates need at 1000 executors.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from tundradb_spark.pipeline.hashing import (
    MERSENNE_P,
    h32,
    h32_sql,
    hbits,
    hbits_sql,
    minhash_params,
)

#: hash bits consumed by the HLL sketch: p bucket bits + (48-p) register bits
HLL_HASH_BITS = 48


def _hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant (Flajolet et al. 2007)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = 9,
) -> DataFrame:
    """Per-(group, bucket) HLL registers: ``max(rho)`` over the keys that
    hash into the bucket.

    This is the MERGEABLE form: registers from disjoint partitions (or
    disjoint corpora) union by taking the per-bucket max — exactly what
    ``groupBy(group, bucket).max()`` computes, so Spark's map-side partial
    aggregation IS the sketch merge and the shuffle carries at most
    ``m = 2**p`` rows per group regardless of input size.

    rho (the register value) is the 1-based position of the leftmost 1-bit
    in the (48-p) remainder bits — computed with ``bin()`` string length,
    which Spark and DuckDB define identically (minimal binary
    representation, ``bin(0) = '0'``), so no floating-point ``log2``.
    """
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    rbits = HLL_HASH_BITS - p
    h = hbits(F.col(key_col).cast("string"), HLL_HASH_BITS)
    bucket = F.shiftright(h, rbits)
    rem = h.bitwiseAND(F.lit((1 << rbits) - 1))
    rho = F.when(rem > 0, F.lit(rbits) + 1 - F.length(F.bin(rem))).otherwise(
        F.lit(rbits + 1)
    )
    return (
        df.select(F.col(group_col), bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = 9,
) -> DataFrame:
    """Per-group approximate distinct count of ``key_col`` via a
    deterministic HyperLogLog (p bucket bits, 2**p registers).

    Why not ``approx_count_distinct``: Spark's built-in HLL++ is the right
    production call, but its estimates are engine-specific (dense/sparse
    encodings, bias tables), so no external oracle can verify them.  This
    sketch trades ~1% accuracy (no bias table) for bit-exact
    reproducibility in any engine with md5 + bin() — the estimator itself
    stays textbook Flajolet: harmonic mean of ``2^-M_j`` with the
    linear-counting small-range correction.

    Exactness discipline: the harmonic sum is computed as the INTEGER
    ``S = sum(2^(cap - M_j))`` (cap = 48-p+1; every term and the sum fit a
    long exactly), so partition order cannot perturb it; the only floating
    ops are one literal-by-integer division (and ``ln`` in the small-range
    branch), rounded to 4 decimals.

    Output: ``group_col, n_buckets, est_distinct``.
    """
    regs = hll_registers(df, key_col, group_col, p)
    return hll_estimate(regs, group_col, p)


def hll_estimate(regs: DataFrame, group_col: str, p: int = 9) -> DataFrame:
    """Flajolet estimator over a ``(group, bucket, m_reg)`` register frame
    — shared by the batch sketch and the streaming epoch-merge reader
    (streaming.ops.read_hll_distinct), so the formula exists once."""
    m = 1 << p
    rbits = HLL_HASH_BITS - p
    cap = rbits + 1
    # alpha * m^2 * 2^cap, evaluated once in Python → identical literal
    numer = float(_hll_alpha(m) * m * m * (1 << cap))
    per_group = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        # F.shiftleft only takes a literal shift; the per-register shift
        # needs the SQL form (still codegen'd integer math)
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {cap} - m_reg)")).alias("s0"),
    )
    v = F.lit(m) - F.col("n_buckets")  # empty buckets (register 0)
    s = F.col("s0") + v.cast("long") * F.lit(1 << cap)
    raw = F.lit(numer) / s.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        group_col,
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.round(est, 4).alias("est_distinct"),
    )


def hll_registers_sql(
    table: str,
    key_expr: str,
    group_expr: str,
    p: int = 9,
    group_alias: str = "grp",
    where: str = "",
) -> str:
    """SQL subquery producing :func:`hll_registers`'s
    ``(group, bucket, m_reg)`` frame — the composable unit
    :func:`hll_sql` and the intersection oracle both build on."""
    rbits = HLL_HASH_BITS - p
    h = hbits_sql(f"CAST({key_expr} AS VARCHAR)", HLL_HASH_BITS)
    w = f"WHERE {where}" if where else ""
    return f"""
  SELECT {group_alias}, h >> {rbits} AS bucket,
         MAX(CASE WHEN (h & {(1 << rbits) - 1}) > 0
                  THEN {rbits} + 1 - length(bin(h & {(1 << rbits) - 1}))
                  ELSE {rbits + 1} END) AS m_reg
  FROM (SELECT {group_expr} AS {group_alias}, {h} AS h FROM {table} {w})
  GROUP BY {group_alias}, bucket"""


def hll_estimate_sql(
    regs_ref: str,
    p: int = 9,
    group_alias: str = "grp",
) -> str:
    """SQL reproducing :func:`hll_estimate` over a register relation
    (a CTE name or parenthesized subquery) — outputs
    ``(group, n_buckets, est_distinct)``."""
    m = 1 << p
    rbits = HLL_HASH_BITS - p
    cap = rbits + 1
    numer = repr(float(_hll_alpha(m) * m * m * (1 << cap)))
    raw = (
        f"{numer} / CAST(s0 + ({m} - n_buckets) *"
        f" (CAST(1 AS BIGINT) << {cap}) AS DOUBLE)"
    )
    return f"""
SELECT {group_alias}, CAST(n_buckets AS BIGINT) AS n_buckets,
       round(CASE WHEN {raw} <= {repr(2.5 * m)}
                   AND ({m} - n_buckets) > 0
                  THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - n_buckets AS DOUBLE))
                  ELSE {raw}
             END, 4) AS est_distinct
FROM (
  SELECT {group_alias}, COUNT(*) AS n_buckets,
         SUM(CAST(1 AS BIGINT) << ({cap} - m_reg)) AS s0
  FROM {regs_ref} GROUP BY {group_alias}
)"""


def hll_sql(
    table: str,
    key_expr: str,
    group_expr: str,
    p: int = 9,
    group_alias: str = "grp",
) -> str:
    """DuckDB oracle reproducing :func:`hll_distinct` bit-for-bit.

    Kept adjacent to the Spark builder so the two formulas can only drift
    in review, not silently."""
    regs = hll_registers_sql(table, key_expr, group_expr, p, group_alias)
    return hll_estimate_sql("(" + regs + "\n)", p, group_alias)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

#: 32-bit words keep every mask positive in a signed 64-bit long on any engine
BLOOM_WORD_BITS = 32


def bloom_fpp(n: int, m_bits: int, k: int) -> float:
    """Expected false-positive probability ``(1 - e^(-k n / m))^k``."""
    return (1.0 - math.exp(-k * n / m_bits)) ** k


def _bloom_positions(key: Column, m_bits: int, k: int, seed: int) -> list[Column]:
    """k portable bit positions for ``key`` (universal hashes over h32).

    Callers MUST pass an already-materialized hash column (not an
    expression) as ``key`` is referenced k times — the anti-inlining
    discipline (see ``bigram_repetition_col``): passing raw md5 math here
    would re-run it per position."""
    return [
        ((key * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P) % F.lit(m_bits))
        for a, b in minhash_params(k, seed=seed)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 65536,
    k: int = 5,
    seed: int = 101,
) -> list[int]:
    """Build a Bloom filter over ``key_col`` as a list of
    ``m_bits / 32`` 32-bit words (driver-side, bounded: 65536 bits = 2048
    longs, 16 KB — a literal small enough to embed in any plan).

    Distributed build: positions are exploded and OR-folded per word with
    map-side partial aggregation, so the shuffle carries at most
    ``m_bits/32`` rows no matter how many keys — the same mergeable-
    register shape as :func:`hll_registers`.
    """
    if m_bits % BLOOM_WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {BLOOM_WORD_BITS}")
    n_words = m_bits // BLOOM_WORD_BITS
    hashed = df.select(h32(F.col(key_col).cast("string")).alias("__h"))
    pos = F.explode(F.array(*_bloom_positions(F.col("__h"), m_bits, k, seed)))
    words = (
        hashed.select(pos.alias("pos"))
        .select(
            F.expr(f"cast(pos div {BLOOM_WORD_BITS} as int)").alias("word"),
            F.expr(
                f"shiftleft(cast(1 as bigint), pos % {BLOOM_WORD_BITS})"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    out = [0] * n_words
    for row in words:
        out[row["word"]] = row["bits"]
    return out


def bloom_contains_sql(
    key_sql: str, words: list[int], m_bits: int, k: int = 5, seed: int = 101
) -> str:
    """Spark-SQL membership predicate against a built filter — pure
    codegen'd arithmetic on a literal array: no join, no shuffle, no UDF.

    ``key_sql`` is a SQL expression (usually a column name).  The md5
    appears once per probe position textually, but whole-stage codegen's
    subexpression elimination evaluates it once per row (deterministic
    expression, same stage)."""
    h = (
        f"cast(conv(substring(md5(cast({key_sql} as string)), 1, 8), 16, 10) "
        "as bigint)"
    )
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    checks = []
    for a, b in minhash_params(k, seed=seed):
        pos = f"((({h}) * {a}L + {b}L) % {MERSENNE_P}L) % {m_bits}L"
        checks.append(
            f"(element_at({arr}, cast(({pos}) div {BLOOM_WORD_BITS} as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(({pos}) % {BLOOM_WORD_BITS}"
            " as int))) != 0"
        )
    return " AND ".join(checks)


def bloom_contains(
    key_sql: str, words: list[int], m_bits: int, k: int = 5, seed: int = 101
) -> Column:
    """Column form of :func:`bloom_contains_sql`."""
    return F.expr(bloom_contains_sql(key_sql, words, m_bits, k, seed))


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = 65536,
    k: int = 5,
    seed: int = 101,
) -> DataFrame:
    """Semi-join ``big`` against ``small``'s keys with a Bloom prefilter:
    EXACT results (the final semi join removes false positives), but the
    big side is filtered down BEFORE the join's shuffle by a literal
    bitmap predicate evaluated inside the scan's codegen stage.

    When it matters: ``small`` too big to broadcast but its key set fits a
    few KB of Bloom bits — at 100 TB the alternative is shuffling the
    entire big side on the join key.  Only the fpp fraction of
    non-matching rows reaches the
    shuffle (fpp(4096 keys, 65536 bits, k=5) ≈ 0.0014 — see
    :func:`bloom_fpp`).  Spark's runtime bloom join —
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` — does this
    automatically for shuffle joins; the explicit operator covers plans
    AQE won't rewrite and makes the pruning testable.
    """
    words = bloom_build(small, on, m_bits=m_bits, k=k, seed=seed)
    pre = big.filter(bloom_contains(f"`{on}`", words, m_bits, k, seed))
    return pre.join(small.select(on).distinct(), on, "left_semi")


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def cm_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    seed: int = 211,
) -> DataFrame:
    """Count-Min sketch of ``key_col``'s frequency distribution: ``d``
    hash rows × ``w`` counters (Cormode & Muthukrishnan 2005).  The
    frequency-estimation twin of the HLL sketch: O(d·w) state regardless
    of key cardinality, estimates overcount by at most ``2n/w`` with
    probability ``1 − 2^−d`` and NEVER undercount.

    Same mergeable-register shape as :func:`hll_registers`: counters sum,
    so map-side partial aggregation is the sketch merge and the shuffle
    carries at most ``d·w`` rows; two sketches (or two epochs of a
    stream — streaming.ops.stream_cm_counts) union by adding counters.

    Returns ``(row_idx, col_idx, cnt)`` — only occupied cells.
    """
    if d < 1 or w < 1:
        raise ValueError(f"d and w must be >= 1, got d={d}, w={w}")
    h = h32(F.col(key_col).cast("string"))
    hashed = df.select(h.alias("__h"))
    cells = hashed.select(
        F.posexplode(
            F.array(
                *[
                    ((F.col("__h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P))
                    % F.lit(w)
                    for a, b in minhash_params(d, seed=seed)
                ]
            )
        ).alias("row_idx", "col_idx")
    )
    return cells.groupBy("row_idx", "col_idx").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    seed: int = 211,
) -> DataFrame:
    """Frequency estimates for ``keys`` against a :func:`cm_build` sketch:
    ``min`` over the d probed counters (0 if any probed cell is empty —
    the key was never seen).  One broadcastable join of ``|keys|·d`` probe
    rows against the d·w-cell sketch; never an undercount, overcount
    bounded by the sketch width.

    Returns ``(key_col, est_count)``.
    """
    h = h32(F.col(key_col).cast("string"))
    probes = keys.select(F.col(key_col), h.alias("__h")).select(
        key_col,
        F.posexplode(
            F.array(
                *[
                    ((F.col("__h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P))
                    % F.lit(w)
                    for a, b in minhash_params(d, seed=seed)
                ]
            )
        ).alias("row_idx", "col_idx"),
    )
    joined = probes.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
        .select(key_col, F.col("est_count").cast("long").alias("est_count"))
    )


def cm_sql(
    table: str,
    key_expr: str,
    probe_table: str,
    probe_key_expr: str,
    key_alias: str,
    d: int = 4,
    w: int = 1024,
    seed: int = 211,
) -> str:
    """DuckDB oracle reproducing :func:`cm_build` + :func:`cm_estimate`
    end-to-end (build the sketch from ``table``, probe every key of
    ``probe_table``) — kept beside the builders so the three hash
    pipelines can only drift in review."""
    params = minhash_params(d, seed=seed)
    h = h32_sql(f"CAST({key_expr} AS VARCHAR)")
    ph = h32_sql(f"CAST({probe_key_expr} AS VARCHAR)")
    build_rows = " UNION ALL ".join(
        f"SELECT {i} AS row_idx, (({h}) * {a} + {b}) % {MERSENNE_P} % {w}"
        f" AS col_idx FROM {table}"
        for i, (a, b) in enumerate(params)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {probe_key_expr} AS k, {i} AS row_idx,"
        f" (({ph}) * {a} + {b}) % {MERSENNE_P} % {w} AS col_idx"
        f" FROM {probe_table}"
        for i, (a, b) in enumerate(params)
    )
    return f"""
WITH cells AS ({build_rows}),
sketch AS (
  SELECT row_idx, col_idx, count(*) AS cnt FROM cells
  GROUP BY row_idx, col_idx
),
probes AS ({probe_rows})
SELECT p.k AS {key_alias},
       CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est_count
FROM probes p LEFT JOIN sketch s
  ON p.row_idx = s.row_idx AND p.col_idx = s.col_idx
GROUP BY p.k
"""


def hll_intersect_estimate(
    regs_a: DataFrame, regs_b: DataFrame, group_col: str, p: int = 9
) -> DataFrame:
    """Per-group distinct-overlap estimates between two sketched corpora
    by inclusion-exclusion: ``|A∩B| ≈ |A| + |B| − |A∪B|``, where the union
    sketch is the per-bucket register max (exactly :func:`hll_registers`'s
    merge) — the corpus-overlap sizing question (how contaminated is B by
    A?) answered from two constant-size sketches, no key exchange.

    Estimate error compounds (three estimates), so treat small
    intersections as "below sketch resolution" — the standard HLL
    inclusion-exclusion caveat; clamped at ≥ 0.

    Output: ``group_col, est_a, est_b, est_union, est_intersect``.
    """
    est_a = hll_estimate(regs_a, group_col, p).select(
        group_col, F.col("est_distinct").alias("est_a")
    )
    est_b = hll_estimate(regs_b, group_col, p).select(
        group_col, F.col("est_distinct").alias("est_b")
    )
    union_regs = (
        regs_a.unionByName(regs_b)
        .groupBy(group_col, "bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    est_u = hll_estimate(union_regs, group_col, p).select(
        group_col, F.col("est_distinct").alias("est_union")
    )
    return (
        est_a.join(est_b, group_col, "outer")
        .join(est_u, group_col, "outer")
        .select(
            group_col,
            F.coalesce("est_a", F.lit(0.0)).alias("est_a"),
            F.coalesce("est_b", F.lit(0.0)).alias("est_b"),
            F.coalesce("est_union", F.lit(0.0)).alias("est_union"),
            F.round(
                F.greatest(
                    F.coalesce("est_a", F.lit(0.0))
                    + F.coalesce("est_b", F.lit(0.0))
                    - F.coalesce("est_union", F.lit(0.0)),
                    F.lit(0.0),
                ),
                4,
            ).alias("est_intersect"),
        )
    )
