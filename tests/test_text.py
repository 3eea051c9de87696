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


class TestTokenDrift:
    """r11: corpus-composition drift — token-level JSD / TV / new-token
    mass between two snapshots."""

    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_identical_corpora_score_zero(self, spark):
        from tundradb_spark.pipeline.text import token_drift

        docs = self._docs(spark, ["a b c", "b c d", "a a"])
        r = token_drift(docs, docs).collect()[0]
        assert (r["jsd"], r["tv"], r["new_mass"], r["new_types"]) == (
            0.0, 0.0, 0.0, 0)
        assert r["n_ref"] == r["n_cur"] == 8
        assert r["shared_types"] == r["types_ref"] == 4

    def test_hand_computed_shift(self, spark):
        from tundradb_spark.pipeline.text import token_drift

        # ref: a x3, b x1; cur: a x2, c x2 (c is NEW)
        ref = self._docs(spark, ["a a a b"])
        cur = self._docs(spark, ["a a c c"])
        r = token_drift(ref, cur).collect()[0]
        p = {"a": 0.75, "b": 0.25, "c": 0.0}
        q = {"a": 0.5, "b": 0.0, "c": 0.5}
        jsd = sum(
            0.5 * (
                (p[t] * math.log(p[t] / ((p[t] + q[t]) / 2)) if p[t] else 0)
                + (q[t] * math.log(q[t] / ((p[t] + q[t]) / 2)) if q[t] else 0)
            )
            for t in p
        )
        tv = sum(0.5 * abs(q[t] - p[t]) for t in p)
        rnd = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        assert (r["jsd"], r["tv"], r["new_mass"]) == (
            rnd(jsd), rnd(tv), 0.5)
        assert (r["types_ref"], r["types_cur"], r["shared_types"],
                r["new_types"]) == (2, 2, 1, 1)

    def test_tokenization_shared_with_token_counts(self, spark):
        from tundradb_spark.pipeline.text import token_drift

        # case-folding + whitespace split + empty-token drop: "A  a\tb"
        # and "a a b" are the same distribution
        ref = self._docs(spark, ["A  a\tb"])
        cur = self._docs(spark, ["a a b"])
        r = token_drift(ref, cur).collect()[0]
        assert (r["jsd"], r["tv"]) == (0.0, 0.0)

    def test_empty_sides(self, spark):
        import math

        from tundradb_spark.pipeline.text import token_drift

        # an empty side is maximally drifted by the formula itself (no
        # special case): the one-sided JSD halves sum to ln(2)/2 and TV
        # to 1/2 — the documented degenerate-snapshot convention
        rnd = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        docs = self._docs(spark, ["a b"])
        empty = self._docs(spark, [])
        r = token_drift(docs, empty).collect()[0]
        assert (r["n_cur"], r["types_cur"], r["new_mass"]) == (0, 0, 0.0)
        assert (r["jsd"], r["tv"]) == (rnd(math.log(2) / 2), 0.5)
        # everything in cur is new when ref is empty
        r2 = token_drift(empty, docs).collect()[0]
        assert (r2["n_ref"], r2["new_types"], r2["new_mass"]) == (0, 2, 1.0)
        assert (r2["jsd"], r2["tv"]) == (rnd(math.log(2) / 2), 0.5)

    def test_null_and_whitespace_texts_drop(self, spark):
        from tundradb_spark.pipeline.text import token_drift

        ref = self._docs(spark, ["a b", None, "   ", "\t\n"])
        cur = self._docs(spark, ["a b"])
        r = token_drift(ref, cur).collect()[0]
        assert (r["n_ref"], r["jsd"], r["tv"]) == (2, 0.0, 0.0)

    def test_dirty_texts_survive(self, spark):
        from tundradb_spark.pipeline.text import token_drift

        ref = self._docs(
            spark, ["🎉 中文 a", "x" * 50_000, None, "a  a"])
        cur = self._docs(spark, ["🎉 a a 中文", "x" * 50_000])
        r = token_drift(ref, cur).collect()[0]
        # same multiset both sides (emoji, CJK, kilo-char tokens all
        # count once each plus a's) → only distribution masses differ
        assert (r["types_ref"], r["types_cur"], r["new_types"]) == (4, 4, 0)
        assert r["new_mass"] == 0.0 and r["tv"] > 0.0


def test_rrf_duplicate_null_doc_rows_still_raise(spark):
    """r11 review: the lazy lag-based guard must treat NULL doc ids as
    equal (the r10 eager groupBy check did) — two (query, NULL) rows
    raise; a single NULL row does not false-positive on its NULL lag."""
    from tundradb_spark.pipeline.text import rrf_fuse

    clean = spark.createDataFrame(
        [(1, 11, 1.0)], "query_id long, doc_id long, score double")
    dup_null = spark.createDataFrame(
        [(1, None, 5.0), (1, None, 4.0)],
        "query_id long, doc_id long, score double")
    with pytest.raises(Exception, match="duplicate"):
        rrf_fuse(dup_null, clean).collect()
    one_null = spark.createDataFrame(
        [(1, None, 5.0), (1, 10, 4.0)],
        "query_id long, doc_id long, score double")
    assert rrf_fuse(one_null, clean).count() == 3


class TestLmBuckets:
    """r12: CCNet-style per-group LM quality terciles."""

    def test_buckets_partition_each_group(self, spark):
        from tundradb_spark.pipeline.text import lm_buckets

        # varying common/rare token mixes so within-group scores differ
        docs = spark.createDataFrame(
            [(i, " ".join(["common"] * (9 - i) + [f"rare{i}"]), "en")
             for i in range(9)]
            + [(100 + i, " ".join(["mot"] * (6 - i) + [f"x{i}"] * (i + 1)),
                "fr")
               for i in range(6)],
            "doc_id long, text string, lang string",
        )
        out = lm_buckets(docs).collect()
        assert len(out) == 15
        by_lang = {}
        for r in out:
            by_lang.setdefault(r["lang"], []).append(r["bucket"])
        # every group has all three labels nowhere near-empty and the
        # head docs score >= tail docs within the group
        for lang, buckets in by_lang.items():
            assert set(buckets) <= {"head", "middle", "tail"}
            assert "head" in buckets and "tail" in buckets
        scores = {(r["lang"], r["bucket"]): r["lm_logprob"] for r in out}
        for lang in by_lang:
            if (lang, "head") in scores and (lang, "tail") in scores:
                head_min = min(r["lm_logprob"] for r in out
                               if r["lang"] == lang
                               and r["bucket"] == "head")
                tail_max = max(r["lm_logprob"] for r in out
                               if r["lang"] == lang
                               and r["bucket"] == "tail")
                assert head_min >= tail_max

    def test_null_group_buckets_within_itself(self, spark):
        from tundradb_spark.pipeline.text import lm_buckets

        docs = spark.createDataFrame(
            [(1, "alpha beta", None), (2, "alpha alpha", None),
             (3, "beta gamma delta", None), (4, "solo", "en")],
            "doc_id long, text string, lang string",
        )
        out = {r["doc_id"]: (r["lang"], r["bucket"])
               for r in lm_buckets(docs).collect()}
        assert len(out) == 4
        assert all(out[d][0] is None for d in (1, 2, 3))
        assert out[4] == ("en", "head")  # single-doc group: q == score

    def test_zero_token_docs_are_absent(self, spark):
        # empty/NULL text carries no fluency evidence — absent, like
        # the DSIR convention (documented on the operator)
        from tundradb_spark.pipeline.text import lm_buckets

        docs = spark.createDataFrame(
            [(1, "alpha beta", "en"), (2, "", "en"), (3, None, "en")],
            "doc_id long, text string, lang string",
        )
        assert [r["doc_id"] for r in lm_buckets(docs).collect()] == [1]

    def test_validation(self, spark):
        from tundradb_spark.pipeline.text import lm_buckets, lm_buckets_sql

        docs = spark.createDataFrame(
            [(1, "a", "en")], "doc_id long, text string, lang string")
        import pytest as _pt

        with _pt.raises(ValueError):
            lm_buckets(docs, cuts=(0.5, 0.5))
        with _pt.raises(ValueError):
            lm_buckets_sql(cuts=(0.0, 0.5))
