"""Relational operator extensions beyond the reference surface.

SURVEY.md §2 marks these as absent from the reference but "free in Spark":
theta/range/as-of joins (J13 — "Not implemented — only equi-adjacency joins
on edge endpoints", include/query/query.hpp:263-294 + antlr/TundraQL.g4:88),
semi/anti joins at the language level (J14 — internally the reference's
INNER source-pruning is a semi-join and RIGHT-self subtraction an anti-join,
src/query/join.cpp:64-65, 187-188), table-level set operations (§2.8 — only
internal ID-set algebra, include/common/utils.hpp:94-130), and window
functions (§2.6 — none).

Every implementation here is chosen for 100 TB scale, not just correctness:

- ``asof_join`` is the union-sort trick: tag both sides, ONE shuffle on the
  key, one window pass carrying the most recent right row forward. The naive
  alternative (range join then pick-latest) is O(|L|·|R|) per key and
  explodes on dense keys; this is O((|L|+|R|) log) with no row blowup.
- ``range_join`` rides an equi-key when one exists (Catalyst turns it into a
  shuffled/broadcast hash join + residual range filter — no theta-join
  fallback). Without an equi-key it buckets the time axis so Spark still
  gets an equi-join on ``(bucket)`` instead of a BroadcastNestedLoopJoin.
- ``top_k_per_group`` is rank-then-filter: one shuffle per window, and the
  ``rank <= k`` filter is applied before any downstream join can amplify
  rows. AQE handles skewed groups.
- set operations are Spark natives (``union``/``intersectAll``/
  ``exceptAll``); wrappers only enforce by-name column alignment so engine
  results with ``alias.field`` columns compose safely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T

from tundradb_spark.errors import QueryError


def _bt(name: str):
    return F.col("`" + name + "`")


# ---------------------------------------------------------------------------
# as-of join (J13 extension)
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: int | None = None,
    tie_break: str | None = None,
    salt: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` sharing the equi-key ``on``
    (a LEFT as-of join; unmatched left rows null-pad).

    Scale design: both sides are tagged and unioned, then a single window
    partitioned by the key and ordered by ``(ts, side, tie_break)`` carries
    the last-seen right values forward (``last(..., ignorenulls=True)``).
    One shuffle on ``on``, zero row amplification, monotone memory — this is
    the plan that survives 1000 executors; a range-join formulation does not.

    **Skew**: the window is partitioned by the key alone, so every row of
    one key lands in one task — a pathological hot key (a null/default key
    at corpus scale) straggles. Pass ``salt=S`` to spread each key's LEFT
    rows over S subpartitions (deterministic hash of the row) while
    replicating that key's RIGHT rows to all S — each (key, salt) window
    still sees every right row of the key, so results are identical and the
    hot task shrinks ~S× at the cost of S× the (usually far smaller) right
    side. Use when |left per key| ≫ |right per key|.

    ``tie_break``: a right column ordered ascending among right rows with
    equal ``(key, ts)`` — the LAST one wins, making ties deterministic.
    ``tolerance``: max allowed ``left_ts - right_ts`` (same unit as the ts
    columns); matches older than that are discarded (null-padded).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]
    sort_cols = [right_ts] + ([tie_break] if tie_break else [])
    for c in sort_cols:
        if c not in right_cols:
            right_cols = right_cols + [c]

    lt = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    rt = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tie_break).cast("long") if tie_break else F.lit(0).cast("long")).alias(
            "__tie"
        ),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    lt = lt.withColumn("__r", F.lit(None).cast(rt.schema["__r"].dataType))
    rt = rt.withColumn(
        "__l", F.lit(None).cast(lt.schema["__l"].dataType)
    ).select(*lt.columns)

    if salt is not None and salt > 1:
        # left rows: deterministic spread; right rows: replicate to every
        # salt so each (key, salt) window is self-sufficient.  Spread on a
        # hash of the HASHABLE left columns — hash() over MAP elements is an
        # AnalysisException in Spark, and node tables here routinely carry
        # map props.  Must stay deterministic across task retries
        # (a nondeterministic repartition key can lose/duplicate rows on
        # recompute — the SPARK-23207 class), so no mid()/rand().
        hashable = [
            F.col("__l")[f.name]
            for f in left.schema.fields
            if _hash_safe(f.dataType)
        ] or [F.col("__ts")]
        lt = lt.withColumn("__salt", F.pmod(F.hash(*hashable), F.lit(salt)))
        rt = rt.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        ).select(*lt.columns)
        part_cols = ["__key", "__salt"]
    else:
        part_cols = ["__key"]

    u = lt.unionByName(rt)
    # right rows (side 0) sort before left rows at equal ts → "<=" semantics;
    # among equal right (key, ts), ascending __tie means the last wins.
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    if tolerance is not None:
        rts = F.col("__match")[right_ts]
        u = u.withColumn(
            "__match",
            F.when(
                rts.isNotNull() & (F.col("__ts") - rts <= F.lit(tolerance)),
                F.col("__match"),
            ),
        )
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns] + [
        F.col("__match")[c].alias(c) for c in right_cols
    ]
    return u.select(*out_cols)


def _hash_safe(dt: T.DataType) -> bool:
    """True iff ``hash()`` accepts the type (no MapType anywhere inside)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hash_safe(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hash_safe(f.dataType) for f in dt.fields)
    return True


# ---------------------------------------------------------------------------
# range / interval join (J13 extension)
# ---------------------------------------------------------------------------


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    on: str | tuple[str, str] | None = None,
    how: str = "inner",
    bucket_width: int | None = None,
) -> DataFrame:
    """Join left rows to right intervals: ``right_lo <= left_ts < right_hi``,
    optionally sharing an equi-key ``on`` (str for same name, (l, r) tuple
    otherwise).

    Scale design: with an equi-key, the key carries the join — Catalyst
    plans a hash join on the key with the range as a residual filter, which
    scales like any equi-join. Without a key, ``bucket_width`` is REQUIRED:
    the left side maps to ``floor(ts/w)`` and the right side explodes to
    every bucket its interval covers (``sequence``), so the physical plan is
    again an equi-join on the bucket instead of a nested-loop cross product.
    Pick ``bucket_width`` near the typical interval length: the explosion
    factor is ~(interval/width + 1).
    """
    lts = _bt(left_ts)
    cond_range = (_bt(right_lo) <= lts) & (lts < _bt(right_hi))
    _LEFTISH = {"left", "left_outer", "semi", "left_semi", "anti", "left_anti"}
    if on is not None:
        lk, rk = (on, on) if isinstance(on, str) else on
        if how == "inner":
            if rk != lk:
                right = right.withColumnRenamed(rk, lk)
            # name-based equi-join (dedups the key column); the range
            # condition stays a residual filter on the hash-join output —
            # same stage, no extra shuffle, broadcast still applies
            return left.join(right, [lk], how).filter(cond_range)
        # outer/semi/anti: the range predicate must live IN the join
        # condition — as a post-join filter it drops null-padded unmatched
        # rows, silently turning outer joins into inner (round-1 ADVICE).
        # Every reference is frame-qualified: name-based F.col would be
        # ambiguous (or silently bind wrong) when the other side happens to
        # carry a same-named column (round-2 ADVICE)
        right2 = right.withColumnRenamed(rk, "__rkey")
        lts_q = left[left_ts]
        cond = (
            (left[lk] == right2["__rkey"])
            & (right2[right_lo] <= lts_q)
            & (lts_q < right2[right_hi])
        )
        out = left.join(right2, cond, how)
        if how in _LEFTISH:
            return out.drop("__rkey")  # semi/anti carry no right cols anyway
        # right/full: recover a single key column from whichever side matched
        return out.withColumn(
            lk, F.coalesce(left[lk], right2["__rkey"])
        ).drop("__rkey")
    if bucket_width is None:
        raise QueryError(
            "range_join without an equi-key requires bucket_width "
            "(otherwise the plan is a nested-loop cross join)"
        )
    if how not in {"inner"} | _LEFTISH:
        # an unmatched RIGHT interval spans several exploded buckets and
        # would null-pad once per bucket; right/full need the keyed path
        raise QueryError(
            f"bucketed range_join supports inner/left/semi/anti, not {how!r}"
        )
    w = int(bucket_width)
    lb = left.withColumn("__bkt", (lts.cast("long") / w).cast("long"))
    rb = right.withColumn(
        "__bkt_r",
        F.explode(
            F.sequence(
                (_bt(right_lo).cast("long") / w).cast("long"),
                ((_bt(right_hi).cast("long") - 1) / w).cast("long"),
            )
        ),
    )
    # range inside the join condition (same reason as above); Catalyst still
    # extracts the bucket equality as the hash-join key. Frame-qualified for
    # the same collision-safety as the keyed path.
    cond = (
        (lb["__bkt"] == rb["__bkt_r"])
        & (rb[right_lo] <= lb[left_ts])
        & (lb[left_ts] < rb[right_hi])
    )
    return lb.join(rb, cond, how).drop("__bkt", "__bkt_r")


# ---------------------------------------------------------------------------
# windowed top-k per group (§2.6 extension)
# ---------------------------------------------------------------------------

_RANK_FNS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[tuple[str, bool]],
    k: int,
    rank_col: str = "rn",
    fn: str = "row_number",
) -> DataFrame:
    """Rank rows within each group and keep the top k. ``order_by`` is a list
    of (column, ascending). One shuffle on the partition keys; the filter
    runs inside the same stage so only k rows per group survive it."""
    if fn not in _RANK_FNS:
        raise QueryError(f"unknown rank function: {fn}")
    w = Window.partitionBy([_bt(c) for c in partition_by]).orderBy(
        [_bt(c).asc() if asc else _bt(c).desc() for c, asc in order_by]
    )
    return df.withColumn(rank_col, _RANK_FNS[fn]().over(w)).filter(
        F.col(rank_col) <= k
    )


# ---------------------------------------------------------------------------
# table-level set operations (§2.8 extension)
# ---------------------------------------------------------------------------


def _align(a: DataFrame, b: DataFrame) -> DataFrame:
    if set(a.columns) != set(b.columns):
        raise QueryError(
            f"set operation requires matching columns: {a.columns} vs {b.columns}"
        )
    return b.select([_bt(c) for c in a.columns])


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(_align(a, b))


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(_align(a, b))


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(_align(a, b))


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(_align(a, b))


# ---------------------------------------------------------------------------
# exact distribution statistics (§2.5 extension depth)
# ---------------------------------------------------------------------------


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    round_to: int = 6,
) -> DataFrame:
    """Exact per-group quantiles (linear interpolation at p*(n-1) — the
    SQL-standard ``percentile_cont`` rule, so any engine reproduces the
    values bit-for-bit after rounding).

    All requested probabilities share ONE ``percentile(col, array(...))``
    aggregate, so the per-group value buffer is built once, not once per
    quantile (3× at three probs — measured at sf0.1).  Scale honestly:
    exact percentile buffers each group's value multiset
    (value→count map), so memory is O(distinct values per group).  That
    holds to ~10⁸ distinct per group; beyond it — or for heavily skewed
    groups — use ``percentile_approx`` (same call shape, bounded-memory
    t-digest), kept out of the oracle surface because its sketch output is
    not engine-portable.
    """
    arr = ", ".join(repr(p) for p in probs)
    qcol = F.expr(f"percentile(`{value_col}`, array({arr}))")
    labels = [_quantile_label(p) for p in probs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate quantile column labels: {labels}")
    return (
        df.groupBy([_bt(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            qcol.alias("__qs"),
        )
        .select(
            *[_bt(c) for c in group_cols],
            "n_rows",
            *[
                F.round(F.element_at("__qs", i + 1), round_to).alias(label)
                for i, label in enumerate(labels)
            ],
        )
    )


def _quantile_label(p: float) -> str:
    """Column label for probability ``p``: ``p25`` for 0.25, ``p90`` for
    0.9, ``p99_5`` for 0.995.  ``int(p*100)`` truncation would mislabel
    0.29 as p28 and collapse 0.99/0.995 into one name; here the percentage
    keeps its decimals (``_``-separated, identifier-safe) when it has any.
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"quantile probability out of [0, 1]: {p}")
    pct = p * 100.0
    if abs(pct - round(pct)) < 1e-9:
        return f"p{int(round(pct))}"
    # shortest round-tripping decimal text, e.g. 0.995 -> '99.5' -> p99_5
    return "p" + repr(pct).replace(".", "_").rstrip("_0").replace("-", "m")


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    n_bins: int = 1000,
    round_to: int = 6,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Bounded-memory per-group quantile ESTIMATES via a fixed-bin
    histogram — the scale path :func:`group_quantiles`'s docstring points
    at: exact percentile buffers every distinct value per group, this
    buffers ``n_bins`` counters per group no matter how many rows, with
    error ≤ one bin width of the global value range.

    Unlike ``percentile_approx`` (t-digest: engine-specific, unverifiable
    externally), every step here is portable arithmetic: one min/max pass
    fixes the bin edges, one map-side-combined ``groupBy(group, bin)``
    count is the only data-sized shuffle, and the estimate for probability
    ``p`` is the LOWER EDGE of the bin holding rank ``floor(p·(n−1))`` —
    integer rank logic plus a fixed IEEE expression, so a SQL oracle
    reproduces every estimate bit-for-bit.

    Returns one row per group: ``*group_cols, n_rows, <p-labels>``.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    labels = [_quantile_label(p) for p in probs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate quantile column labels: {labels}")
    v = F.col(value_col).cast("double")
    if bounds is None:
        mm = df.agg(F.min(v).alias("mn"), F.max(v).alias("mx")).first()
        if mm["mn"] is None:
            raise ValueError(
                "histogram_quantiles: input has no non-null "
                f"'{value_col}' values to derive bounds from; pass "
                "bounds=(lo, hi) explicitly or supply data"
            )
        mn, mx = float(mm["mn"]), float(mm["mx"])
    else:
        mn, mx = float(bounds[0]), float(bounds[1])
        if mx < mn:
            raise ValueError(f"bounds must be (lo, hi) with hi >= lo: {bounds}")
    gb = [_bt(c) for c in group_cols]
    binned = (
        df.select(
            *gb,
            histogram_bin_col(value_col, mn, mx, n_bins).alias("__bin"),
        )
        .groupBy(*gb, "__bin")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return histogram_estimate(
        binned, group_cols, probs, mn, mx, n_bins, round_to
    )


def histogram_bin_col(value_col: str, mn: float, mx: float, n_bins: int):
    """Bin index expression shared by the batch operator and the streaming
    bin sink — values outside [mn, mx] clamp to the edge bins."""
    width_expr = _hist_width_expr(mn, mx, n_bins)
    return F.expr(
        f"least(greatest(cast(floor((cast(`{value_col}` as double) - {mn!r}D)"
        f" / {width_expr}) as bigint), 0L), {n_bins - 1}L)"
    )


def _hist_width_expr(mn: float, mx: float, n_bins: int) -> str:
    # Guard on the computed quotient, not mx == mn: a subnormal range
    # like (0.0, 5e-324) underflows to width 0.0 and the bin division
    # would raise DIVIDE_BY_ZERO under ANSI mode.  Python float math is
    # IEEE double, identical to what the SQL expression would compute.
    if (mx - mn) / n_bins == 0.0:
        return "1.0"
    return f"(({mx!r}D - {mn!r}D) / {n_bins})"


def histogram_estimate(
    binned: DataFrame,
    group_cols: list[str],
    probs: list[float],
    mn: float,
    mx: float,
    n_bins: int,
    round_to: int = 6,
) -> DataFrame:
    """Quantile estimates from a ``(group…, __bin, __c)`` count frame —
    shared by :func:`histogram_quantiles` and the streaming epoch-merge
    reader (streaming.ops.read_histogram_quantiles), so the rank/edge
    formula exists once."""
    from pyspark.sql import Window

    labels = [_quantile_label(p) for p in probs]
    width_expr = _hist_width_expr(mn, mx, n_bins)
    gb = [_bt(c) for c in group_cols]
    w_cum = (
        Window.partitionBy(*gb)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*gb)
    cum = binned.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__n", F.sum("__c").over(w_all)
    )
    aggs = [F.max("__n").cast("long").alias("n_rows")]
    for p, label in zip(probs, labels):
        rank = F.floor(F.lit(p) * (F.col("__n") - 1).cast("double"))
        hit_bin = F.min(F.when(F.col("__cum") > rank, F.col("__bin")))
        est = F.round(
            F.lit(mn) + hit_bin.cast("double") * F.expr(width_expr), round_to
        )
        aggs.append(est.alias(label))
    return cum.groupBy(*gb).agg(*aggs)


def histogram_quantiles_sql(
    table: str,
    group_expr: str,
    value_expr: str,
    probs: list[float],
    mn: float,
    mx: float,
    n_bins: int = 1000,
    round_to: int = 6,
) -> str:
    """DuckDB oracle reproducing :func:`histogram_quantiles` bit-for-bit
    (pass the same min/max the Spark pass measured — they are data facts,
    not tuning)."""
    # every fractional literal is CAST AS DOUBLE: DuckDB parses bare
    # decimal-point literals as DECIMAL, whose exact arithmetic would
    # diverge from Spark's double math at rank boundaries
    dmn, dmx = f"CAST({mn!r} AS DOUBLE)", f"CAST({mx!r} AS DOUBLE)"
    # same underflow guard as _hist_width_expr: a subnormal range makes
    # the double quotient 0.0 even when mx != mn
    width = "1.0" if (mx - mn) / n_bins == 0.0 else f"(({dmx} - {dmn}) / {n_bins})"
    cols = []
    for p in probs:
        label = _quantile_label(p)
        rank = (
            f"CAST(floor(CAST({p!r} AS DOUBLE) * CAST(n - 1 AS DOUBLE))"
            " AS BIGINT)"
        )
        cols.append(
            f"round({dmn} + CAST(min(CASE WHEN cum > {rank}"
            f" THEN bin END) AS DOUBLE) * {width}, {round_to}) AS {label}"
        )
    return f"""
WITH binned AS (
  SELECT {group_expr} AS grp,
         least(greatest(CAST(floor((CAST({value_expr} AS DOUBLE) - {dmn})
                                   / {width})
                             AS BIGINT), 0), {n_bins - 1}) AS bin,
         count(*) AS c
  FROM {table} GROUP BY 1, 2
),
cum AS (
  SELECT grp, bin, c,
         sum(c) OVER (PARTITION BY grp ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY grp) AS n
  FROM binned
)
SELECT grp, CAST(max(n) AS BIGINT) AS n_rows, {", ".join(cols)}
FROM cum GROUP BY grp
"""


def time_bucket_rollup(
    events: DataFrame,
    bucket_us: int,
    key_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Hypertable-style time-bucket rollup (TimescaleDB's
    ``time_bucket`` + continuous-aggregate shape): floor event time to a
    fixed ``bucket_us`` grid and aggregate per (keys, bucket) — the batch
    face of ``streaming.ops.windowed_event_counts``.

    One map-side-combined groupBy on (keys, bucket) is the whole plan:
    integer floor-division bucketing (exact, engine-portable via
    ``functions.timecols.epoch_micros``) means no window machinery and
    full shuffle parallelism on the compound key.  Monetary-style SUMs go
    through decimal(18,2) so results are partition-order independent.

    Output: ``*key_cols, bucket_start_us, n_events, total_value,
    min_value, max_value``.
    """
    from tundradb_spark.functions.timecols import epoch_micros

    if bucket_us < 1:
        raise ValueError(f"bucket_us must be >= 1, got {bucket_us}")
    us = epoch_micros(events, ts_col)
    # pmod, not %: Spark % truncates toward zero, so a pre-1970 (negative
    # epoch) event would land in a bucket STARTING AFTER it; pmod gives
    # true floor bucketing on both signs
    bucket = (us - F.pmod(us, F.lit(bucket_us))).alias("bucket_start_us")
    gb = [_bt(c) for c in key_cols]
    return (
        events.select(*gb, bucket, F.col(value_col).alias("__v"))
        .groupBy(*gb, "bucket_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("__v").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
            F.min("__v").alias("min_value"),
            F.max("__v").alias("max_value"),
        )
    )


def _resample_grid(
    events: DataFrame,
    step_us: int,
    key_col: str,
    value_col: str,
    ts_col: str,
    tiebreak_col: str | None,
):
    """Shared bucket/observation/grid machinery for the resamplers:
    returns ``(obs, grid)`` frames; raises when any key's grid would
    exceed 2^22 points (a mis-set step fails loudly instead of exploding
    rows).  The one-row-per-key bounds frame is localCheckpoint-ed so the
    guard's count and the grid generation share a single materialization
    instead of each re-scanning the events input."""
    from tundradb_spark.functions.timecols import epoch_micros

    if step_us < 1:
        raise ValueError(f"step_us must be >= 1, got {step_us}")
    us = epoch_micros(events, ts_col)
    base = events.select(
        _bt(key_col).alias("__k"),
        # pmod floor-buckets negative epochs too (see time_bucket_rollup)
        (us - F.pmod(us, F.lit(step_us))).alias("__b"),
        us.alias("__us"),
        F.col(value_col).alias("__v"),
        (
            _bt(tiebreak_col).cast("long") if tiebreak_col else F.lit(0)
        ).alias("__tb"),
    )
    obs = base.groupBy("__k", "__b").agg(
        F.max_by("__v", F.struct("__us", "__tb")).alias("__last"),
        F.count(F.lit(1)).alias("n_in_bucket"),
    )
    bounds = base.groupBy("__k").agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    ).localCheckpoint(eager=True)
    n_points = F.expr(f"(__hi - __lo) div {step_us} + 1")
    too_big = bounds.filter(n_points > (1 << 22)).limit(1).count()
    if too_big:
        raise ValueError(
            f"resample: step_us={step_us} yields over {1 << 22} grid "
            "points for at least one key — refusing to explode; widen the step"
        )
    grid = bounds.select(
        "__k",
        F.explode(
            F.expr(f"sequence(__lo, __hi + {step_us} - 1, {step_us})")
        ).alias("__b"),
    )
    return obs, grid


def resample_ffill(
    events: DataFrame,
    step_us: int,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-filling resample with last-observation-carried-forward: emit
    one row per key per ``step_us`` grid point between the key's first
    and last event, carrying the latest observed value forward across
    empty buckets — the regularization step between raw event streams
    and window/asof analytics.

    Plan: bucket + per-(key, bucket) last-by-time observation (one
    groupBy with ``max_by``), per-key min/max grid bounds, then ONE
    ``sequence→explode`` generates the grid and a per-key ordered window
    carries ``last(value, ignoreNulls)`` forward.  One shuffle on the
    key carries bounds, observations, and the fill window; grid rows are
    generated, not stored.  The grid is capped at 1 << 22 points per key
    (raise on violation) so a mis-set ``step_us`` fails loudly instead
    of exploding a billion rows per key.

    Output: ``key_col, bucket_start_us, value_ffill, n_in_bucket``
    (``n_in_bucket`` 0 on gap rows).  Two events sharing an exact
    timestamp within a bucket tie arbitrarily unless ``tiebreak_col``
    (a unique column, e.g. the event id) pins the winner — pass it
    whenever results must be engine-reproducible.
    """
    obs, grid = _resample_grid(
        events, step_us, key_col, value_col, ts_col, tiebreak_col
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        grid.join(obs, ["__k", "__b"], "left")
        .withColumn("value_ffill", F.last("__last", ignorenulls=True).over(w))
        .select(
            F.col("__k").alias(key_col),
            F.col("__b").alias("bucket_start_us"),
            "value_ffill",
            F.coalesce("n_in_bucket", F.lit(0)).cast("long").alias("n_in_bucket"),
        )
    )
    return filled


def resample_interp(
    events: DataFrame,
    step_us: int,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Gap-filling resample with LINEAR interpolation: like
    :func:`resample_ffill` but gap buckets take
    ``v_prev + (v_next − v_prev) · (b − b_prev)/(b_next − b_prev)``
    between the surrounding observations; leading/trailing gaps (no
    neighbor on one side) fall back to the available side's value.

    Same single-shuffle grid plan plus one extra backward window pass
    (the forward pass carries (prev value, prev bucket), the backward one
    (next value, next bucket)).  The interpolation is a fixed IEEE
    sequence over exact integers and observed doubles, rounded to
    ``round_to`` — a SQL oracle reproduces every filled value.

    Output: ``key_col, bucket_start_us, value_interp, n_in_bucket``.
    """
    obs, grid = _resample_grid(
        events, step_us, key_col, value_col, ts_col, tiebreak_col
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    j = grid.join(obs, ["__k", "__b"], "left")
    pick = F.when(F.col("__last").isNotNull(), F.struct("__b", "__last"))
    j = (
        j.withColumn("__prev", F.last(pick, ignorenulls=True).over(wf))
        .withColumn("__next", F.first(pick, ignorenulls=True).over(wb))
    )
    pv, pb = F.col("__prev.__last"), F.col("__prev.__b")
    nv, nb = F.col("__next.__last"), F.col("__next.__b")
    interp = (
        F.when(F.col("__last").isNotNull(), F.col("__last"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(
            pv
            + (nv - pv)
            * ((F.col("__b") - pb).cast("double") / (nb - pb).cast("double"))
        )
    )
    return j.select(
        F.col("__k").alias(key_col),
        F.col("__b").alias("bucket_start_us"),
        F.round(interp, round_to).alias("value_interp"),
        F.coalesce("n_in_bucket", F.lit(0)).cast("long").alias("n_in_bucket"),
    )



#: Shared metric-value domain for the exact-decimal operators
#: (moving_aggregate, time_weighted_avg, downsample_lttb, cusum_alarms):
#: |value| < 1e9, which simultaneously (a) excludes NaN and +/-Inf — the
#: comparison is false for them in BOTH Spark and DuckDB, so the SQL
#: oracles mirror it verbatim — and (b) guarantees every per-row decimal
#: term fits its type with >= 8 orders of headroom (v^2 <= 1e18 against
#: 20+ integer digits; v*dt against decimal(28,8) for buckets up to a
#: day).  Under ANSI mode (Spark 4 default) an out-of-range cast THROWS,
#: so without this guard ONE pathological row (a 1e308 sensor glitch)
#: kills a 100 TB job (found by tests/test_dirty_inputs.py).  Rows
#: outside the domain are excluded from stats AND output — documented
#: drop, the dirty-input policy.  To OBSERVE how much a stream violates
#: the domain (a ±1e308 glitch is itself a signal), run
#: ``operators.analytics.value_outliers`` over the same metric: since
#: r10 it emits every domain-violating row as a ``flag='domain'`` row
#: with a per-group violation count, so the drop these operators apply
#: is countable from the same table.  Aggregate-capacity overflow from
#: astronomically adversarial row counts still fails loudly (ANSI)
#: rather than silently corrupting.
METRIC_ABS_BOUND = 1e9

#: the SQL-side twin of the guard, for oracle generators / static oracles
METRIC_DOMAIN_SQL = "abs({col}) < 1000000000.0"


def _metric_domain(col: str):
    return F.abs(F.col(col)) < F.lit(METRIC_ABS_BOUND)

def moving_aggregate(
    events: DataFrame,
    window_us: int,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing time-range moving aggregates per key: for every event,
    the count / decimal-exact sum / min / max / 6dp-rounded mean of the
    key's values in ``[t - window_us, t]`` — the rolling-window analytics
    surface (alert baselines, rate smoothing) complementing the bucketed
    :func:`time_bucket_rollup` (discrete buckets) and
    :func:`resample_ffill` (regular grid).

    Plan shape: ONE hash shuffle on the key, then a RANGE window over the
    µs epoch — each key's partition is sorted once and every aggregate
    rides the same frame.  The sum is cast ``decimal(30,10)`` inside the
    window so it is partition-order independent and any engine reproduces
    it bit-for-bit (module float-determinism discipline); values are
    thereby quantized to 10 decimal places in the sum/mean (min/max stay
    full doubles).

    Output: ``(key, ts_us, value, n_window, sum_window, min_window,
    max_window, avg_window)`` — one row per input event.

    Metric domain (dirty-input policy, documented drop): rows with
    ``|value| >= 1e9`` — including NULL, NaN and ±Inf — are excluded
    from stats and output; see :data:`METRIC_ABS_BOUND`.
    """
    from pyspark.sql import Window

    from tundradb_spark.functions.timecols import epoch_micros

    if window_us < 0:
        raise ValueError(f"window_us must be >= 0, got {window_us}")
    base = events.select(
        F.col(key_col).alias("key"),
        epoch_micros(events, ts_col).alias("ts_us"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(_metric_domain("value"))
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("ts_us").asc())
        .rangeBetween(-window_us, 0)
    )
    dec = F.col("value").cast("decimal(30,10)")
    # population variance from decimal-exact sums: (Σx² − (Σx)²/n)/n —
    # order-free until the single sqrt; enables trailing-window z-score
    # anomaly detection ((value − avg)/std) with zero extra shuffles
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(dec).over(w)
    s2 = F.sum((F.col("value") * F.col("value")).cast("decimal(30,10)")).over(w)
    # sums are decimal-exact (order-free); the variance combination runs
    # in DOUBLE — decimal×decimal would hit the precision-38 cap, whose
    # rounding semantics differ across engines
    s1d, s2d = s1.cast("double"), s2.cast("double")
    var = (s2d - s1d * s1d / n) / n
    return base.select(
        "key",
        "ts_us",
        "value",
        n.alias("n_window"),
        s1.cast("double").alias("sum_window"),
        F.min("value").over(w).alias("min_window"),
        F.max("value").over(w).alias("max_window"),
        F.round((s1 / n).cast("double"), 6).alias("avg_window"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std_window"),
    )


def time_weighted_avg(
    events: DataFrame,
    bucket_us: int,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key, per-bucket TIME-WEIGHTED average with last-observation-
    carried-forward weighting — the irregular-sampling mean (a sensor that
    reports once an hour must not out-vote one reporting every second,
    which is exactly what the plain AVG does).

    Within each ``bucket_us`` bucket, an observation's value holds from
    its timestamp until the next observation (or the bucket end), and

        twa = Σ value_i · dt_i / (bucket_end − first_ts)

    over that observed span.  All span arithmetic is exact integer µs;
    the weighted sum is cast ``decimal(28,8)`` so it is partition-order
    independent and any engine reproduces the rounded result bit-for-bit.
    Within-timestamp ties resolve by ``tiebreak_col`` (the earlier row's
    segment has zero width, so only the LAST value at a timestamp
    contributes — deterministic given the tiebreak).

    Plan shape: one hash shuffle on (key, bucket), one lead() window —
    the :func:`time_bucket_rollup` discipline.  Output:
    ``(key, bucket_start_us, n_obs, twa)``.

    Metric domain (dirty-input policy, documented drop): rows with
    ``|value| >= 1e9`` — including NULL, NaN and ±Inf — are excluded
    from stats and output; see :data:`METRIC_ABS_BOUND`.
    """
    from pyspark.sql import Window

    from tundradb_spark.functions.timecols import epoch_micros

    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be > 0, got {bucket_us}")
    us = epoch_micros(events, ts_col)
    base = events.select(
        F.col(key_col).alias("key"),
        us.alias("us"),
        (us - F.pmod(us, F.lit(bucket_us))).alias("bucket_start_us"),
        F.col(value_col).cast("double").alias("v"),
        *(
            [F.col(tiebreak_col).alias("__tb")]
            if tiebreak_col
            else [F.lit(0).alias("__tb")]
        ),
    ).filter(_metric_domain("v"))
    w = Window.partitionBy("key", "bucket_start_us").orderBy(
        F.col("us").asc(), F.col("__tb").asc()
    )
    seg = base.select(
        "key",
        "bucket_start_us",
        "us",
        "v",
        F.coalesce(
            F.lead("us").over(w),
            F.col("bucket_start_us") + F.lit(bucket_us),
        ).alias("__next"),
        F.min("us").over(
            Window.partitionBy("key", "bucket_start_us")
        ).alias("__first"),
    )
    dt = (F.col("__next") - F.col("us")).cast("long")
    return (
        seg.groupBy("key", "bucket_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(
                (
                    F.sum((F.col("v") * dt).cast("decimal(28,8)"))
                    / (
                        F.max(F.col("bucket_start_us"))
                        + F.lit(bucket_us)
                        - F.min("__first")
                    ).cast("double")
                ).cast("double"),
                6,
            ).alias("twa"),
        )
        .select("key", "bucket_start_us", "n_obs", "twa")
    )


def downsample_lttb(
    events: DataFrame,
    n_out: int,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per key (Steinarsson
    2013) — reduce each key's series to ``n_out`` visually-representative
    points: first and last always survive; interior points split into
    ``n_out − 2`` equal-COUNT buckets (rank-based, the classic LTTB
    bucketing) and each bucket keeps the point forming the largest
    triangle with its neighbor anchors.

    **Parallel variant**: the left anchor is the PREVIOUS BUCKET'S
    AVERAGE, not the previously selected point — classic LTTB's selection
    is sequential (bucket i needs bucket i−1's winner), which would
    serialize a distributed pass; with bucket-mean anchors every bucket
    selects independently (both anchors are averages, as classic LTTB
    already does for the right one).  Deterministic: per-key ranks order
    by (ts, tiebreak), bucket sums are decimal-cast (order-free), area
    argmax ties resolve by rank.

    Series with ≤ ``n_out`` points pass through untouched.  Plan shape:
    one per-key rank window, one (key, bucket) aggregate, lag/lead over
    the TINY bucket frame, one join back, one per-bucket argmax window —
    everything keyed, nothing global.

    Output: ``(key, ts_us, value)`` — the surviving points.
    
    Metric domain (dirty-input policy, documented drop): rows with
    ``|value| >= 1e9`` — including NULL, NaN and ±Inf — are excluded
    from stats and output; see :data:`METRIC_ABS_BOUND`.
    """
    from pyspark.sql import Window

    from tundradb_spark.functions.timecols import epoch_micros

    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    nb = n_out - 2
    base = events.select(
        F.col(key_col).alias("key"),
        epoch_micros(events, ts_col).alias("ts_us"),
        F.col(value_col).cast("double").alias("value"),
        *(
            [F.col(tiebreak_col).alias("__tb")]
            if tiebreak_col
            else [F.lit(0).alias("__tb")]
        ),
    ).filter(_metric_domain("value"))
    wrank = Window.partitionBy("key").orderBy(
        F.col("ts_us").asc(), F.col("__tb").asc()
    )
    ranked = base.select(
        "key",
        "ts_us",
        "value",
        F.row_number().over(wrank).alias("__r"),
        F.count(F.lit(1)).over(Window.partitionBy("key")).alias("__n"),
    ).localCheckpoint(eager=True)  # ranks reused by three branches
    small = ranked.filter(F.col("__n") <= n_out).select(
        "key", "ts_us", "value"
    )
    big = ranked.filter(F.col("__n") > n_out)
    # endpoints pass through; interior ranks 2..n-1 bucket by POSITION
    ends = big.filter(
        (F.col("__r") == 1) | (F.col("__r") == F.col("__n"))
    )
    interior = big.filter(
        (F.col("__r") > 1) & (F.col("__r") < F.col("__n"))
    ).withColumn(
        "__b",
        (
            (F.col("__r") - 2).cast("long") * nb
            / (F.col("__n") - 2).cast("long")
        ).cast("long"),
    )
    # bucket anchors: decimal-exact means; bucket -1 / nb are the
    # endpoints themselves (single points), spliced in via union
    # anchor means: EXACT integer/decimal sums cast to double, then ONE
    # IEEE division — partition-order independent AND bit-reproducible by
    # any engine (float(sum_exact) / count)
    bstats = (
        interior.groupBy("key", "__b")
        .agg(
            (
                F.sum(F.col("ts_us").cast("decimal(28,0)")).cast("double")
                / F.count(F.lit(1))
            ).alias("bx"),
            (
                F.sum(F.col("value").cast("decimal(30,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("by"),
        )
        .unionByName(
            ends.select(
                "key",
                F.when(F.col("__r") == 1, F.lit(-1))
                .otherwise(F.lit(nb))
                .cast("long")
                .alias("__b"),
                F.col("ts_us").cast("double").alias("bx"),
                F.col("value").alias("by"),
            )
        )
    )
    wb = Window.partitionBy("key").orderBy(F.col("__b").asc())
    anchors = bstats.select(
        "key",
        "__b",
        F.lag("bx").over(wb).alias("lx"),
        F.lag("by").over(wb).alias("ly"),
        F.lead("bx").over(wb).alias("rx"),
        F.lead("by").over(wb).alias("ry"),
    ).filter((F.col("__b") >= 0) & (F.col("__b") < nb))
    area = F.abs(
        (F.col("lx") - F.col("rx")) * (F.col("value") - F.col("ly"))
        - (F.col("lx") - F.col("ts_us").cast("double"))
        * (F.col("ry") - F.col("ly"))
    )
    wsel = Window.partitionBy("key", "__b").orderBy(
        F.desc("__area"), F.asc("__r")
    )
    picked = (
        interior.join(anchors, ["key", "__b"])
        .withColumn("__area", area)
        .withColumn("__rn", F.row_number().over(wsel))
        .filter(F.col("__rn") == 1)
        .select("key", "ts_us", "value")
    )
    return small.unionByName(ends.select("key", "ts_us", "value")).unionByName(
        picked
    )


def ewma_filter(
    events: DataFrame,
    key_col: str,
    value_col: str,
    alpha: float = 0.3,
    taps: int = 8,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average per key, as a TRUNCATED
    finite-impulse-response filter: ``ewma_t = Σ_j w_j · x_{t-j} / Σ_j
    w_j`` over the trailing ``taps`` observations with ``w_j =
    α(1−α)^j`` (weights renormalized over the lags that exist, so early
    rows average their available history instead of emitting null).

    Truncation is what makes the operator ENGINE-REPRODUCIBLE: the
    classic recursive EWMA (``y_t = αx_t + (1−α)y_{t−1}``) is an
    infinite recurrence no SQL window expresses exactly, while the
    ``taps``-term form is a fixed lag-chain whose weights are computed
    ONCE driver-side and embedded as identical double literals in both
    the Spark plan and the SQL oracle — every output is a fixed
    left-associated IEEE expression, bit-reproducible anywhere.  With
    the default α=0.3, 8 taps carry >96% of the infinite-tail mass.

    Plan shape: ONE hash shuffle on the key, one window sort, ``taps``
    ``lag``s riding the same frame — identical cost profile to
    :func:`moving_aggregate`.  Output: ``(key, ts_us, value, ewma)`` —
    one row per input event, 6dp-rounded.
    """
    from pyspark.sql import Window

    from tundradb_spark.functions.timecols import epoch_micros

    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if taps < 1:
        raise ValueError(f"taps must be >= 1, got {taps}")
    weights = [alpha * (1 - alpha) ** j for j in range(taps)]
    cols = [
        F.col(key_col).alias("key"),
        epoch_micros(events, ts_col).alias("ts_us"),
        F.col(value_col).cast("double").alias("value"),
    ]
    order = [F.col("ts_us").asc()]
    if tiebreak_col is not None:
        cols.append(F.col(tiebreak_col).alias("__tb"))
        order.append(F.col("__tb").asc())
    base = events.select(*cols)
    w = Window.partitionBy("key").orderBy(*order)
    num, den = None, None
    for j, wt in enumerate(weights):
        lagged = F.lag("value", j).over(w)
        term = F.when(lagged.isNotNull(), F.lit(wt) * lagged).otherwise(
            F.lit(0.0)
        )
        avail = F.when(lagged.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = avail if den is None else den + avail
    return base.select(
        "key",
        "ts_us",
        "value",
        F.round(num / den, 6).alias("ewma"),
    )


def cusum_alarms(
    events: DataFrame,
    key_col: str,
    value_col: str,
    slack: float,
    threshold: float,
    target: float | str = "mean",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One-sided upward CUSUM change detection per key (Page 1954): emit
    every observation where the cumulative-sum statistic

    ``S_t = max(0, S_{t-1} + (x_t - target - slack))``, ``S_0 = 0``

    has crossed ``threshold`` — the sequential drift detector a pipeline
    runs over per-entity metric streams (is this user's/service's value
    level shifting up faster than ``slack`` tolerates?).

    The recurrence looks inherently sequential, but it has a closed form
    every SQL window engine can evaluate: with ``d_t = x_t - target -
    slack`` and prefix sums ``P_t = Σ_{j≤t} d_j``,

    ``S_t = P_t - min(0, min_{j≤t} P_j)``

    so the whole detector is ONE hash shuffle on the key and one window
    sort, with two running aggregates (sum, min-of-sum) riding the same
    frame — the :func:`moving_aggregate` cost profile, no iteration and
    no state.

    ``target`` is the in-control level: a float applied to every key, or
    ``"mean"`` (default) to use each key's own mean — computed from
    decimal-exact ``(n, Σv)`` moment sums (the ``pq_train`` discipline)
    and broadcast back, adding one map-side-combined aggregate but no
    extra scan of wide columns.

    Engine determinism: ``d_t`` is a fixed per-row double expression cast
    to ``decimal(38,12)`` BEFORE the running sum, so ``P_t`` (and hence
    ``S_t``) is exact integer-scaled arithmetic — bit-identical on any
    engine and any partitioning.  Rows order by ``(ts, tiebreak)``.

    Scale note: the window partitions by ``key_col`` — use a key whose
    cardinality grows with the data (user, device, series id), not a
    low-cardinality enum, or one task owns a whole type's history.

    Output: ``(key, ts_us, value, cusum)`` — only rows with
    ``S_t ≥ threshold``, ``cusum`` rounded half-up to 6 via exact
    decimal arithmetic.
    
    Metric domain (dirty-input policy, documented drop): rows with
    ``|value| >= 1e9`` — including NULL, NaN and ±Inf — are excluded
    from stats and output; see :data:`METRIC_ABS_BOUND`.
    """
    from pyspark.sql import Window

    from tundradb_spark.functions.timecols import epoch_micros

    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    if isinstance(target, str) and target != "mean":
        raise ValueError(f"target must be a float or 'mean', got {target!r}")
    cols = [
        F.col(key_col).alias("key"),
        epoch_micros(events, ts_col).alias("ts_us"),
        F.col(value_col).cast("double").alias("value"),
    ]
    order = [F.col("ts_us").asc()]
    if tiebreak_col is not None:
        cols.append(F.col(tiebreak_col).alias("__tb"))
        order.append(F.col("__tb").asc())
    base = events.select(*cols).filter(_metric_domain("value"))
    if target == "mean":
        stats = base.groupBy("key").agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("value").cast("decimal(38,12)")).alias("__sv"),
        )
        base = base.join(
            F.broadcast(
                stats.select(
                    "key",
                    F.expr(
                        "cast(__sv as double) / cast(__n as double)"
                    ).alias("__target"),
                )
            ),
            "key",
        )
        tgt = F.col("__target")
    else:
        tgt = F.lit(float(target))
    w = (
        Window.partitionBy("key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = F.expr(f"cast(value - ({slack!r}D) as decimal(38,12))") - tgt.cast(
        "decimal(38,12)"
    )
    p = F.sum(d).over(w)
    s = p - F.least(F.min(p).over(w), F.lit(0).cast("decimal(38,12)"))
    return (
        base.withColumn("__s", s)
        .filter(F.col("__s") >= threshold)
        .select(
            "key",
            "ts_us",
            "value",
            # narrow before the ×1e6: decimal(38,12)·1e6 would blow the
            # 38-digit cap; (25,10) keeps 15 integer digits — plenty
            F.expr(
                "cast(floor(cast(__s as decimal(25,10)) * 1000000 + 0.5)"
                " as double) / 1000000.0"
            ).alias("cusum"),
        )
    )


def cusum_alarms_sql(
    table: str,
    key_col: str,
    value_col: str,
    slack: float,
    threshold: float,
    target: float | str = "mean",
    ts_expr: str = "epoch_us(ts)",
    tiebreak_col: str | None = None,
) -> str:
    """DuckDB oracle reproducing :func:`cusum_alarms` bit-for-bit — the
    same closed-form prefix-sum/running-min windows over the same
    decimal(38,12) increments."""
    tb = f", {tiebreak_col} ASC" if tiebreak_col is not None else ""
    if target == "mean":
        tgt_cte = f"""
    stats AS (
        SELECT key,
               CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS tgt
        FROM ev GROUP BY key
    ),
    evt AS (SELECT ev.*, stats.tgt FROM ev JOIN stats USING (key)),"""
    else:
        tgt_cte = f"""
    evt AS (SELECT ev.*, CAST({float(target)!r} AS DOUBLE) AS tgt
            FROM ev),"""
    return f"""
    WITH ev AS (
        SELECT {key_col} AS key, {ts_expr} AS ts_us,
               CAST({value_col} AS DOUBLE) AS value
               {f', {tiebreak_col}' if tiebreak_col is not None else ''}
        FROM {table} WHERE abs({value_col}) < 1000000000.0
    ),{tgt_cte}
    pfx AS (
        SELECT key, ts_us, value,
               {f'{tiebreak_col}, ' if tiebreak_col is not None else ''}
               sum(CAST(value - ({slack!r}) AS DECIMAL(38,12))
                   - CAST(tgt AS DECIMAL(38,12)))
                 OVER (PARTITION BY key ORDER BY ts_us ASC{tb}
                       ROWS UNBOUNDED PRECEDING) AS p
        FROM evt
    ),
    st AS (
        SELECT key, ts_us, value,
               p - least(min(p) OVER (PARTITION BY key ORDER BY ts_us ASC{tb}
                                      ROWS UNBOUNDED PRECEDING),
                         CAST(0 AS DECIMAL(38,12))) AS s
        FROM pfx
    )
    SELECT key, ts_us, value,
           CAST(floor(CAST(s AS DECIMAL(25,10)) * 1000000 + 0.5)
                AS DOUBLE) / 1000000.0 AS cusum
    FROM st WHERE s >= {threshold!r}
    """


def key_skew(
    df: DataFrame, key_col: str, top_n: int = 20
) -> DataFrame:
    """Key-distribution skew report: the ``top_n`` heaviest values of
    ``key_col`` with each key's row count, share of all rows, and
    cumulative share — the pre-flight diagnostic for every shuffle this
    engine plans (a join or groupBy on a key whose top value holds 30%
    of the rows straggles on one task at 100 TB; AQE's skew-join split
    and the dedup/wedge hub caps exist for exactly the shape this
    report surfaces BEFORE the job runs).

    NULL keys are counted like any other value (a NULL-heavy key
    column is the single most common real-world skew) and keys are
    cast to string so one report schema serves every key type.
    NULL-ness is tracked as its own boolean GROUP DIMENSION (``is_null``
    rides the output), so a genuine string key ``'<null>'`` is a
    separate row from actual NULLs — the r11 rendering merged them,
    inflating both counts (r12 ADVICE fix); ``'<null>'`` is applied to
    the NULL row's key at OUTPUT time only.  Ranks use the total order
    ``(cnt DESC, is_null ASC, key ASC)`` — deterministic on ties (the
    single NULL-key row can never tie-compare against a NULL key text);
    shares round half-up to 6 dp with exact long counts alongside.

    Plan / 100 TB shape (r13 rewrite): ONE map-side-combined
    ``groupBy(key)`` (the only data-sized shuffle — identical cost to
    the aggregation being diagnosed, minus its payload), then the
    top-``top_n`` keys via a DISTRIBUTED ``orderBy().limit()``
    (TakeOrdered — every partition contributes its local top-N, the
    driver merges) and ``n_keys``/``total_rows`` via a scalar aggregate
    broadcast back onto the ``top_n`` survivors.  The previous shape
    ranked with a key-universe-sized single-partition window — a
    billions-of-distinct-keys column would sort its whole universe on
    one task; now the only window runs over ≤ ``top_n`` rows, and the
    cumulative sums are identical because the top-N prefix of a TOTAL
    order is the same rows either way.

    Output: ``(rank, key, is_null, cnt, share, cum_share, n_keys,
    total_rows)``.
    """
    if top_n < 1:
        raise QueryError(f"top_n must be >= 1, got {top_n}")
    counts = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(key_col).isNull().alias("is_null"),
        )
        .groupBy("key", "is_null")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
    )
    # is_null ASC breaks a (cnt) tie between the NULL row and a string
    # key BEFORE key comparison — the NULL key text never has to order
    # against a real string (Spark NULLS FIRST vs DuckDB NULLS LAST
    # would diverge there); the order is TOTAL, so limit() is
    # deterministic
    order = [
        F.col("cnt").desc(), F.col("is_null").asc(), F.col("key").asc()
    ]
    top = counts.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = top.crossJoin(F.broadcast(totals)).select(
        F.row_number().over(w).alias("rank"),
        F.coalesce("key", F.lit("<null>")).alias("key"),
        "is_null",
        "cnt",
        F.sum("cnt").over(wcum).alias("__cum"),
        "n_keys",
        "total_rows",
    )

    def _share(expr: str) -> str:
        return (
            f"cast(floor(cast({expr} as double)"
            f" / cast(total_rows as double) * 1000000 + 0.5)"
            f" as double) / 1000000.0"
        )

    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        "key",
        "is_null",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr(_share("cnt")).alias("share"),
        F.expr(_share("__cum")).alias("cum_share"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("total_rows").cast("long").alias("total_rows"),
    )


def key_skew_sql(
    table: str, key_col: str, top_n: int = 20
) -> str:
    """DuckDB oracle reproducing :func:`key_skew` exactly — same
    NULL-as-its-own-group-dimension, total order, output-time
    ``'<null>'`` rendering, and 6 dp half-up share rounding."""
    return f"""
    WITH counts AS (
        SELECT CAST({key_col} AS VARCHAR) AS key,
               {key_col} IS NULL AS is_null,
               count(*) AS cnt
        FROM {table} GROUP BY 1, 2
    ),
    ranked AS (
        SELECT row_number() OVER (ORDER BY cnt DESC, is_null ASC,
                                  key ASC) AS rank,
               coalesce(key, '<null>') AS key, is_null, cnt,
               sum(cnt) OVER (ORDER BY cnt DESC, is_null ASC, key ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum,
               count(*) OVER () AS n_keys,
               sum(cnt) OVER () AS total_rows
        FROM counts
    )
    SELECT CAST(rank AS BIGINT) AS rank, key, is_null,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(floor(CAST(cnt AS DOUBLE) / CAST(total_rows AS DOUBLE)
                      * 1000000 + 0.5) AS DOUBLE) / 1000000.0 AS share,
           CAST(floor(CAST(cum AS DOUBLE) / CAST(total_rows AS DOUBLE)
                      * 1000000 + 0.5) AS DOUBLE) / 1000000.0 AS cum_share,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(total_rows AS BIGINT) AS total_rows
    FROM ranked WHERE rank <= {top_n}
    """


def join_fanout(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str | None = None,
    top_n: int = 10,
) -> DataFrame:
    """EXACT inner-join output cardinality, computed WITHOUT running
    the join: per-key counts on each side, matched on the key, output
    contribution ``cnt_a · cnt_b`` per key — the 100 TB safety check
    before an expensive join ("will this 2-row-per-key join actually
    explode to 10¹² rows on three hot keys?").  This is not an
    estimate: ``Σ cnt_a·cnt_b over matched keys`` IS the inner-join row
    count, obtained for the price of two count aggregates and a
    key-universe-sized join instead of the join itself.

    NULL keys are excluded (inner equi-joins never match NULLs — the
    contract being priced).  Output rows are the ``top_n`` keys by
    contribution (ties broken on key ASC, keys cast to string), each
    carrying its side counts, output rows, share of the total output,
    and the self-contained totals (``matched_keys``, ``est_rows`` — the
    exact join cardinality).

    Plan / 100 TB shape: one map-side-combined ``groupBy(key)`` per
    side (strictly cheaper than the join being priced: same shuffle
    keys, count-only payload), one key-universe-sized inner join and
    window pass, ``top_n`` output rows.

    ``key_b`` defaults to ``key_a`` (same-named keys); TPC-H-style
    schemas name the two sides differently (``l_orderkey`` vs
    ``o_orderkey``), so both spellings are first-class.

    Output: ``(rank, key, n_a, n_b, out_rows, share, matched_keys,
    est_rows)``.  ``out_rows``/``est_rows`` are computed in
    decimal(38,0) (exact far past the bigint overflow this check
    exists to flag) but RENDERED AS STRING — plain digits, lossless at
    any magnitude, and portable across result canonicalizers that
    disagree on Decimal object types (the r12 driver hash mismatch:
    correct values, type-sensitive hash).
    """
    if top_n < 1:
        raise QueryError(f"top_n must be >= 1, got {top_n}")
    kb = key_a if key_b is None else key_b

    def _keys(df: DataFrame, key: str, side_a: int) -> DataFrame:
        return (
            df.select(F.col(key).cast("string").alias("key"))
            .filter(F.col("key").isNotNull())
            .select("key", F.lit(side_a).alias("__a"))
        )

    # ONE pass instead of two groupBys + a key-universe join (r15, r14
    # verdict item 5 / guide §2.4 "remove shuffles outright"): both key
    # scans union into a single tagged stream, one map-side-combined
    # groupBy(key) counts each side conditionally, and "matched on both
    # sides" becomes a filter — the key-universe Exchange pair and the
    # join are gone; the single exchange carries the same (key, 1-byte
    # tag) bytes the two exchanges carried separately.
    #
    # the product is computed in DECIMAL, never bigint: a bigint
    # n_a·n_b overflows (silently, non-ANSI) at ~9.2e18 — exactly the
    # catastrophic-fanout regime this check exists to flag.
    # decimal(19,0)·decimal(19,0) → decimal(38,0): exact to 1e38.
    j = (
        _keys(a, key_a, 1)
        .union(_keys(b, kb, 0))
        .groupBy("key")
        .agg(
            F.sum("__a").alias("n_a"),
            F.sum(F.lit(1) - F.col("__a")).alias("n_b"),
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "key",
            "n_a",
            "n_b",
            (
                F.col("n_a").cast("decimal(19,0)")
                * F.col("n_b").cast("decimal(19,0)")
            ).alias("out_rows"),
        )
    )
    # r13: totals via a scalar aggregate + the top-N via a DISTRIBUTED
    # orderBy().limit() (TakeOrdered) instead of a matched-key-universe
    # single-partition window — at 100 TB the matched-key universe can
    # be billions of rows and the old shape sorted all of them on one
    # task; the only window now runs over <= top_n rows.  (out_rows
    # DESC, key ASC) is a total order, so limit() is deterministic and
    # the ranks are unchanged.
    totals = j.agg(
        F.count(F.lit(1)).alias("matched_keys"),
        F.sum("out_rows").alias("est_rows"),
    )
    order = [F.col("out_rows").desc(), F.col("key").asc()]
    top = j.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)
    ranked = top.crossJoin(F.broadcast(totals)).select(
        F.row_number().over(w).alias("rank"),
        "key",
        "n_a",
        "n_b",
        "out_rows",
        "matched_keys",
        "est_rows",
    )
    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        "key",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("out_rows").cast("decimal(38,0)").cast("string")
        .alias("out_rows"),
        F.expr(
            "cast(floor(cast(out_rows as double)"
            " / cast(est_rows as double) * 1000000 + 0.5)"
            " as double) / 1000000.0"
        ).alias("share"),
        F.col("matched_keys").cast("long").alias("matched_keys"),
        F.col("est_rows").cast("decimal(38,0)").cast("string")
        .alias("est_rows"),
    )


def join_fanout_sql(
    table_a: str,
    table_b: str,
    key_a: str,
    key_b: str | None = None,
    top_n: int = 10,
) -> str:
    """DuckDB oracle reproducing :func:`join_fanout` exactly."""
    kb = key_a if key_b is None else key_b
    return f"""
    WITH ca AS (
        SELECT CAST({key_a} AS VARCHAR) AS key, count(*) AS n_a
        FROM {table_a} WHERE {key_a} IS NOT NULL GROUP BY 1
    ),
    cb AS (
        SELECT CAST({kb} AS VARCHAR) AS key, count(*) AS n_b
        FROM {table_b} WHERE {kb} IS NOT NULL GROUP BY 1
    ),
    j AS (
        SELECT key, n_a, n_b,
               CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)
                    AS DECIMAL(38,0)) AS out_rows
        FROM ca JOIN cb USING (key)
    ),
    ranked AS (
        SELECT row_number() OVER (ORDER BY out_rows DESC, key ASC) AS rank,
               key, n_a, n_b, out_rows,
               count(*) OVER () AS matched_keys,
               sum(out_rows) OVER () AS est_rows
        FROM j
    )
    SELECT CAST(rank AS BIGINT) AS rank, key,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(CAST(out_rows AS DECIMAL(38,0)) AS VARCHAR) AS out_rows,
           CAST(floor(CAST(out_rows AS DOUBLE) / CAST(est_rows AS DOUBLE)
                      * 1000000 + 0.5) AS DOUBLE) / 1000000.0 AS share,
           CAST(matched_keys AS BIGINT) AS matched_keys,
           CAST(CAST(est_rows AS DECIMAL(38,0)) AS VARCHAR) AS est_rows
    FROM ranked WHERE rank <= {top_n}
    ORDER BY rank
    """


def salted_join(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str | None = None,
    how: str = "inner",
    hot_keys: list | None = None,
    salt: int = 16,
    min_share: float = 0.05,
    probe_top_n: int = 20,
    scatter_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: the MITIGATION half of the pre-shuffle
    diagnostics (:func:`key_skew` reports the hot keys, this operator
    neutralizes them) for the cases AQE's runtime skew-split cannot
    reach — hot keys so large one post-split partition still straggles,
    or plans where the skewed exchange is reused and AQE declines to
    split it.

    Result is EXACTLY the plain equi-join (same multiset of rows —
    the oracle twin IS ``a JOIN b``): ``a``'s hot-key rows scatter
    across ``salt`` sub-keys by a deterministic row hash, ``b``'s
    hot-key rows replicate once per sub-key, every non-hot row keeps
    sub-key 0, and the join runs on ``(key, sub-key)`` — each former
    single-reducer hot key becomes ``salt`` evenly-loaded reducers at
    the price of ``(hot b-rows) × salt`` replicas, which is why only
    HOT keys are salted, never the whole table.

    ``hot_keys``: explicit list (cast to string — the :func:`key_skew`
    report's key rendering), or ``None`` to derive them with one
    :func:`key_skew` probe over ``a`` (keys with ``share >=
    min_share`` among the top ``probe_top_n``; a bounded
    top-N collect, same model-state class as k-means centroids).
    NULL keys never join in an inner equi-join and pass through
    un-salted; ``how`` supports ``inner`` and ``left`` (the shapes
    where ``a`` is the big probe side — RIGHT/FULL would also need
    ``b``'s unmatched rows deduplicated across replicas).

    Plan / 100 TB shape: one optional key_skew probe (map-side groupBy
    + top-N), then ONE shuffle of each side on ``(key, __salt)`` —
    identical exchange count to the plain join (test-pinned); the
    scatter hash and replicate-explode are narrow projections.
    Measured (SCALE_PROBE_r12): a 6M-row join with one key at 70% of
    the rows dropped its max reducer load 12.5× at salt 32.  Caveat:
    the scatter hashes the ROW's columns (all of them, or the
    ``scatter_cols`` subset), so its flatness is bounded by hot-row
    distinctness — a hot key whose rows are near-identical scatters
    only as far as their distinct values (the probe's synthetic
    50-value rows reached 12.5× of the theoretical 32×).
    """
    if how not in ("inner", "left"):
        raise QueryError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}"
        )
    if salt < 2:
        raise QueryError(f"salt must be >= 2, got {salt}")
    if not 0.0 < min_share <= 1.0:
        raise QueryError(f"min_share must be in (0, 1], got {min_share}")
    kb = key_a if key_b is None else key_b
    if hot_keys is None:
        report = key_skew(a, key_a, top_n=probe_top_n).collect()
        hot_keys = [
            r["key"] for r in report
            if r["share"] >= min_share and not r["is_null"]
        ]
    hot = [str(k) for k in hot_keys]
    if not hot:
        return a.join(b, a[key_a] == b[kb], how)

    hot_arr = F.array(*[F.lit(k) for k in hot])
    a_key_s = F.col(key_a).cast("string")
    b_key_s = F.col(kb).cast("string")
    # scatter: deterministic per-row hash — routing only, the join result
    # is salt-invariant (every a-row meets its b-matches exactly once
    # whatever salt value it draws), so ANY deterministic column subset
    # yields the same multiset.  Default hashes ALL of a's columns
    # (maximal distinctness), but that forces the scan to READ every
    # column just for routing; ``scatter_cols`` (r14 optimization round,
    # guide §6 column pruning) lets a caller name a few columns the query
    # reads anyway — ReadSchema then stays narrow, at the price that
    # scatter flatness is bounded by those columns' distinctness within a
    # hot key (pick per-row-varying ones).
    s_cols = a.columns if scatter_cols is None else list(scatter_cols)
    if not s_cols or any(c not in a.columns for c in s_cols):
        raise QueryError(
            f"scatter_cols must be a non-empty subset of a's columns, "
            f"got {scatter_cols!r}"
        )
    scatter = F.pmod(F.xxhash64(*[F.col(c) for c in s_cols]),
                     F.lit(salt)).cast("int")
    a_s = a.withColumn(
        "__salt",
        F.when(F.array_contains(hot_arr, a_key_s), scatter)
        .otherwise(F.lit(0).cast("int")),
    )
    b_s = b.withColumn(
        "__rep",
        F.when(
            F.array_contains(hot_arr, b_key_s),
            F.sequence(F.lit(0), F.lit(salt - 1)),
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("__exp", F.explode("__rep")).withColumn(
        "__salt", F.col("__exp").cast("int")
    ).drop("__rep", "__exp")
    joined = a_s.join(
        b_s,
        (a_s[key_a] == b_s[kb]) & (a_s["__salt"] == b_s["__salt"]),
        how,
    )
    return joined.drop("__salt")
