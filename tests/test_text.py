"""Retrieval-fusion operators (pipeline.text.rrf_fuse): semantics on
hand-built rankings plus a DuckDB oracle cross-check."""

import math

import pytest




class TestRrfFuse:
    """r10: reciprocal-rank fusion — rank-only combination of two
    rankers, engine-reproducible via total-order ranks and a fixed
    two-term addition."""

    def _rank(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, doc_id long, score double"
        )

    def test_fusion_by_hand(self, spark):
        from tundradb_spark.pipeline.text import rrf_fuse

        # q1: ranker A orders (10, 11, 12); ranker B orders (12, 10)
        a = self._rank(spark, [(1, 10, 9.0), (1, 11, 5.0), (1, 12, 1.0)])
        b = self._rank(spark, [(1, 12, 0.9), (1, 10, 0.1)])
        got = {
            r["doc_id"]: (r["rrf_score"], r["fused_rank"])
            for r in rrf_fuse(a, b, k=60).collect()
        }
        rnd = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        assert got[10] == (rnd(1 / 61 + 1 / 62), 1)
        assert got[12] == (rnd(1 / 63 + 1 / 61), 2)
        assert got[11] == (rnd(1 / 62), 3)  # absent from B: one term

    def test_score_scales_ignored(self, spark):
        from tundradb_spark.pipeline.text import rrf_fuse

        a = self._rank(spark, [(1, 10, 1e9), (1, 11, 1e-9)])
        a2 = self._rank(spark, [(1, 10, 0.2), (1, 11, 0.1)])
        b = self._rank(spark, [(1, 11, 7.0)])
        r1 = sorted(map(tuple, rrf_fuse(a, b).collect()))
        r2 = sorted(map(tuple, rrf_fuse(a2, b).collect()))
        assert r1 == r2  # only ranks matter

    def test_ties_break_on_doc_id(self, spark):
        from tundradb_spark.pipeline.text import rrf_fuse

        a = self._rank(spark, [(1, 20, 5.0), (1, 10, 5.0)])
        b = self._rank(spark, [(1, 20, 5.0), (1, 10, 5.0)])
        got = {r["doc_id"]: r["fused_rank"]
               for r in rrf_fuse(a, b).collect()}
        assert got == {10: 1, 20: 2}

    def test_top_n_and_validation(self, spark):
        from tundradb_spark.pipeline.text import rrf_fuse

        a = self._rank(spark, [(1, i, float(-i)) for i in range(5)])
        b = self._rank(spark, [])
        assert rrf_fuse(a, b, top_n=2).count() == 2
        with pytest.raises(ValueError):
            rrf_fuse(a, b, k=0)

    def test_matches_sql_oracle(self, spark):
        import duckdb

        from tundradb_spark.pipeline.text import rrf_fuse, rrf_fuse_sql

        rows_a = [(q, d, float((q * 7 + d * 13) % 31))
                  for q in (1, 2) for d in range(8)]
        rows_b = [(q, d, float((q * 11 + d * 3) % 17))
                  for q in (1, 2) for d in range(4, 12)]
        a, b = self._rank(spark, rows_a), self._rank(spark, rows_b)
        got = sorted(map(tuple, rrf_fuse(a, b, k=60, top_n=5).collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE ta (query_id BIGINT, doc_id BIGINT, score DOUBLE)")
        con.execute("CREATE TABLE tb (query_id BIGINT, doc_id BIGINT, score DOUBLE)")
        con.executemany("INSERT INTO ta VALUES (?, ?, ?)", rows_a)
        con.executemany("INSERT INTO tb VALUES (?, ?, ?)", rows_b)
        want = sorted(map(tuple, con.execute(rrf_fuse_sql(
            "SELECT * FROM ta", "SELECT * FROM tb", k=60, top_n=5
        )).fetchall()))
        assert got == want


def test_rrf_rejects_duplicate_ranking_rows(spark):
    """The duplicate-(query, doc) precondition still fails LOUDLY, but at
    execution time from inside the fused plan (raise_error under a window
    count), not via an eager call-time collect (r10 verdict item 4)."""
    from tundradb_spark.pipeline.text import rrf_fuse

    dup = spark.createDataFrame(
        [(1, 10, 5.0), (1, 10, 4.0)],
        "query_id long, doc_id long, score double",
    )
    clean = spark.createDataFrame(
        [(1, 11, 1.0)], "query_id long, doc_id long, score double"
    )
    fused = rrf_fuse(dup, clean)  # construction itself must not raise
    with pytest.raises(Exception, match="duplicate"):
        fused.collect()


def test_rrf_fuse_is_lazy_zero_jobs_at_call_time(spark):
    """rrf_fuse is a pure plan transformation: constructing the fused
    DataFrame triggers ZERO Spark jobs (r10 verdict item 4 — the eager
    precondition check used to re-run each ranker's full upstream plan
    twice per call).  Verified with a job group: any job submitted while
    the group is active would land in it."""
    from tundradb_spark.pipeline.text import rrf_fuse

    sc = spark.sparkContext
    a = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 4.0)],
        "query_id long, doc_id long, score double",
    )
    b = spark.createDataFrame(
        [(1, 11, 9.0), (1, 12, 1.0)],
        "query_id long, doc_id long, score double",
    )
    group = "rrf-lazy-probe"
    sc.setJobGroup(group, "assert rrf_fuse construction is job-free")
    try:
        fused = rrf_fuse(a, b, k=60, top_n=5)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup(None, None)
    assert jobs == [], f"rrf_fuse construction ran Spark jobs: {jobs}"
    # and the plan still executes correctly afterwards
    assert fused.count() == 3


class TestVocabCoverage:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_curve_by_hand(self, spark):
        from tundradb_spark.pipeline.text import vocab_coverage

        # counts: a=4, b=2, c=1 (total 7); ranks a,b,c
        docs = self._docs(spark, ["a a b", "A b c a"])
        got = {
            r["n_vocab"]: (r["n_types"], r["covered_tokens"],
                           r["total_tokens"], r["coverage"])
            for r in vocab_coverage(docs, sizes=[1, 2, 10]).collect()
        }
        rnd = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        assert got[1] == (1, 4, 7, rnd(4 / 7))
        assert got[2] == (2, 6, 7, rnd(6 / 7))
        assert got[10] == (3, 7, 7, 1.0)  # clamps at the type universe

    def test_rank_ties_break_on_token(self, spark):
        from tundradb_spark.pipeline.text import vocab_coverage

        # b and a both count 2: rank order (count desc, token asc) → a first
        docs = self._docs(spark, ["b a b a c"])
        got = {r["n_vocab"]: r["covered_tokens"]
               for r in vocab_coverage(docs, sizes=[1]).collect()}
        assert got[1] == 2  # 'a' covers its 2 occurrences

    def test_matches_sql_oracle(self, spark):
        import duckdb

        from tundradb_spark.pipeline.text import (
            vocab_coverage,
            vocab_coverage_sql,
        )

        texts = [
            (0, "the cat sat on the mat"),
            (1, "the dog ate the cat food"),
            (2, "  spaced   out   tokens  "),
        ]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        got = sorted(map(tuple, vocab_coverage(
            docs, sizes=[1, 3, 100]).collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", texts)
        want = sorted(map(tuple, con.execute(
            vocab_coverage_sql("t", sizes=[1, 3, 100])).fetchall()))
        assert got == want

    def test_validation(self, spark):
        from tundradb_spark.pipeline.text import vocab_coverage

        with pytest.raises(ValueError):
            vocab_coverage(self._docs(spark, ["x"]), sizes=[])
