"""Property-based tests (hypothesis): engine operators vs brute-force Python
references on randomized small inputs.  Complements the example-based suites
the way the reference's randomized benchmark setup complements its unit
tests (SURVEY.md §5) — each property is the operator's DEFINITION, so any
counterexample is a real bug, not a fixture artifact.

Spark jobs are slow per-example, so examples are capped low and each
property folds many assertions into one DataFrame round-trip.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import rows_set
from tundradb_spark.operators.relational import asof_join
from tundradb_spark.streaming.ops import session_window_agg

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_key = st.sampled_from(["a", "b"])
_ts = st.integers(min_value=0, max_value=50)


@settings(**_SETTINGS)
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_key, _ts), min_size=0, max_size=12),
    salt=st.sampled_from([None, 3]),
)
def test_asof_join_matches_bruteforce(spark, left, right, salt):
    """For every left row: the matched right ts is the max right ts <= left
    ts within the key (None when no such row) — the as-of definition."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, t long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, float(t)) for k, t in right], "k string, qt long, px double"
    )
    out = asof_join(
        ldf, rdf, on="k", left_ts="t", right_ts="qt", salt=salt
    )
    got = {r["lid"]: r["qt"] for r in out.collect()}
    assert len(got) == len(left)  # no row loss or amplification
    for i, (k, t) in enumerate(left):
        cand = [rt for rk, rt in right if rk == k and rt <= t]
        assert got[i] == (max(cand) if cand else None), (k, t, right)


@settings(**_SETTINGS)
@given(
    events=st.lists(
        st.tuples(st.sampled_from([1, 2]), st.integers(0, 120)),
        min_size=1,
        max_size=15,
    ),
    gap_s=st.sampled_from([10, 30]),
)
def test_session_window_agg_matches_gap_rule(spark, events, gap_s):
    """Sessions = maximal runs where consecutive (sorted) event gaps are
    <= gap (Spark's session_window merges windows sharing a boundary: an
    event EXACTLY gap after the last still joins — probed empirically, and
    hypothesis found the boundary in round 4); output start/end/count per
    session match the brute-force split."""
    df = spark.createDataFrame(
        [(u, t * 1_000_000, 1.0) for u, t in events],
        "user_id long, ts_us long, value double",
    ).selectExpr(
        "user_id", "timestamp_micros(ts_us) AS ts", "value"
    )
    out = rows_set(
        session_window_agg(df, gap=f"{gap_s} seconds"),
        "user_id",
        "session_start_us",
        "session_end_us",
        "n_events",
    )

    expect = set()
    for u in {u for u, _ in events}:
        ts = sorted(t for uu, t in events if uu == u)
        runs: list[list[int]] = [[ts[0]]]
        for prev, cur in zip(ts, ts[1:]):
            if cur - prev > gap_s:
                runs.append([cur])
            else:
                runs[-1].append(cur)
        for run in runs:
            expect.add(
                (u, run[0] * 1_000_000, run[-1] * 1_000_000, len(run))
            )
    assert out == expect, (events, gap_s)


@settings(**_SETTINGS)
@given(
    sizes=st.lists(st.integers(0, 5), min_size=1, max_size=6),
    first=st.integers(0, 1000),
)
def test_contiguous_id_assignment_is_permutation(spark, sizes, first):
    """bulk-ingest id assignment: over any partitioning, assigned ids are
    exactly first..first+n-1 with no gaps or dups, and each partition gets a
    consecutive block."""
    from tundradb_spark.database import _zip_with_contiguous_ids

    n = sum(sizes)
    rows = [(f"r{i}",) for i in range(n)]
    df = spark.createDataFrame(rows or [("empty",)], "payload string")
    if n == 0:
        return
    df = df.repartition(len(sizes))
    out, counted = _zip_with_contiguous_ids(df, lambda k: first, "id")
    assert counted == n  # the size pass IS the returned row count
    ids = sorted(r["id"] for r in out.collect())
    assert ids == list(range(first, first + n))


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "x", "longtoken"]),
        min_size=1,
        max_size=40,
    ),
    chunk=st.integers(1, 12),
)
def test_chunking_partitions_document(spark, words, chunk):
    """With overlap=0, chunks PARTITION the token stream: sizes sum to
    n_tokens, indexes are 0..k-1, and re-joining chunks in index order
    reconstructs the whitespace-normalized document exactly."""
    from tundradb_spark.pipeline.sampling import chunk_docs

    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    rows = sorted(
        (r.chunk_idx, r.n_chunk_tokens, r.chunk)
        for r in chunk_docs(df, chunk_tokens=chunk, overlap=0).collect()
    )
    assert [i for i, _, _ in rows] == list(range(len(rows)))
    assert sum(n for _, n, _ in rows) == len(words)
    assert all(n == chunk for _, n, _ in rows[:-1])  # only tail is short
    assert " ".join(c for _, _, c in rows) == " ".join(words)
