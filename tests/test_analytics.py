"""Event-sequence analytics (operators.analytics) + neighborhood link
prediction (graphs.algorithms.link_prediction): semantics on hand-built
fixtures where every expected value is derivable by eye."""

import math

import pytest

from tests.conftest import rows_set


US = 1_000_000  # µs per second


def _ev(spark, rows):
    # (user, t_seconds, type) → long-nanos ts column (the driver tables'
    # physical representation under nanosAsLong)
    return spark.createDataFrame(
        [(u, t * US * 1000, et) for u, t, et in rows],
        "user_id long, ts long, event_type string",
    )


class TestFunnel:
    def test_ordered_min_chaining(self, spark):
        from tundradb_spark.operators.analytics import funnel

        rows = [
            # u1 completes A→B→C in order
            (1, 10, "A"), (1, 20, "B"), (1, 30, "C"),
            # u2: B only BEFORE A — step 2 must not count (ordering), and
            # the later C cannot rescue it (C needs a completed B first)
            (2, 5, "B"), (2, 10, "A"), (2, 30, "C"),
            # u3: A only
            (3, 10, "A"),
            # u4: never enters the funnel (no A)
            (4, 10, "B"), (4, 20, "C"),
        ]
        got = {
            r["step"]: (r["step_idx"], r["n_users"], r["conversion"])
            for r in funnel(_ev(spark, rows), ["A", "B", "C"]).collect()
        }
        assert got["A"] == (1, 3, 1.0)
        # step B: only u1 has B strictly after A
        assert got["B"] == (2, 1, pytest.approx(1 / 3, abs=1e-6))
        assert got["C"] == (3, 1, pytest.approx(1 / 3, abs=1e-6))

    def test_window_anchored_at_entry(self, spark):
        from tundradb_spark.operators.analytics import funnel

        rows = [
            (1, 0, "A"), (1, 5, "B"),      # inside the window
            (2, 0, "A"), (2, 100, "B"),    # outside
        ]
        got = {
            r["step"]: r["n_users"]
            for r in funnel(
                _ev(spark, rows), ["A", "B"], within_us=10 * US
            ).collect()
        }
        assert got == {"A": 2, "B": 1}

    def test_strictly_after_not_simultaneous(self, spark):
        from tundradb_spark.operators.analytics import funnel

        rows = [(1, 10, "A"), (1, 10, "B")]  # same instant: not "after"
        got = {
            r["step"]: r["n_users"]
            for r in funnel(_ev(spark, rows), ["A", "B"]).collect()
        }
        assert got == {"A": 1, "B": 0}

    def test_validation(self, spark):
        from tundradb_spark.operators.analytics import funnel

        with pytest.raises(ValueError):
            funnel(_ev(spark, [(1, 1, "A")]), [])


class TestCohortRetention:
    def test_daily_cohorts(self, spark):
        from tundradb_spark.operators.analytics import cohort_retention

        day = 86_400
        rows = [
            # cohort day 0: u1 active days 0,1,2; u2 active days 0,2
            (1, 10, "x"), (1, day + 10, "x"), (1, 2 * day + 10, "x"),
            (2, 20, "x"), (2, 2 * day + 20, "x"),
            # cohort day 1: u3 active day 1 only
            (3, day + 30, "x"),
        ]
        got = rows_set(
            cohort_retention(
                _ev(spark, rows), period_us=day * US
            ),
            "cohort", "period_offset", "n_users", "retention",
        )
        assert got == {
            (0, 0, 2, 1.0),
            (0, 1, 1, 0.5),
            (0, 2, 2, 1.0),
            (1, 0, 1, 1.0),
        }

    def test_max_offset_and_validation(self, spark):
        from tundradb_spark.operators.analytics import cohort_retention

        day = 86_400
        rows = [(1, 10, "x"), (1, 5 * day, "x")]
        got = cohort_retention(
            _ev(spark, rows), period_us=day * US, max_offset=3
        ).collect()
        assert {r["period_offset"] for r in got} == {0}
        with pytest.raises(ValueError):
            cohort_retention(_ev(spark, rows), period_us=0)


class TestLinkPrediction:
    def test_star_graph_scores(self, spark):
        from tundradb_spark.graphs.algorithms import link_prediction

        # star: 2 connects 1,3,4 → all leaf pairs share only vertex 2
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (2, 4)], "id_a long, id_b long"
        )
        w = round(1.0 / math.log(3.0), 6)
        got = sorted(map(tuple, link_prediction(edges).collect()))
        assert got == [(1, 3, 1, w), (1, 4, 1, w), (3, 4, 1, w)]

    def test_existing_edges_excluded(self, spark):
        from tundradb_spark.graphs.algorithms import link_prediction

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (2, 4), (1, 3)], "id_a long, id_b long"
        )
        got = {(r["id_a"], r["id_b"]) for r in link_prediction(edges).collect()}
        assert (1, 3) not in got and (1, 4) in got

    def test_multi_common_neighbors_sum(self, spark):
        from tundradb_spark.graphs.algorithms import link_prediction

        # 1 and 4 share middles 2 (deg 2) and 3 (deg 3): AA = 1/ln2 + 1/ln3
        edges = spark.createDataFrame(
            [(1, 2), (2, 4), (1, 3), (3, 4), (3, 5)],
            "id_a long, id_b long",
        )
        got = {
            (r["id_a"], r["id_b"]): (r["common_neighbors"], r["adamic_adar"])
            for r in link_prediction(edges).collect()
        }
        aa = round(1.0 / math.log(2.0) + 1.0 / math.log(3.0), 6)
        assert got[(1, 4)] == (2, pytest.approx(aa, abs=2e-6))

    def test_max_degree_drops_hub_middles(self, spark):
        from tundradb_spark.graphs.algorithms import link_prediction

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (2, 4)], "id_a long, id_b long"
        )
        assert link_prediction(edges, max_degree=2).count() == 0
        with pytest.raises(ValueError):
            link_prediction(edges, min_common=0)


def test_analytics_plans_no_nested_loop(spark):
    from tundradb_spark.plans import audit
    import __spark_entry__ as entry

    SF = "/root/testdata/sf0.001"
    # seated OR parked — plan pins survive the driver-window rotation
    qs = {**entry.queries(), **entry.parked_queries()}
    for name in ("q_funnel", "q_cohort_retention", "q_link_prediction"):
        audit.assert_no_nested_loop(qs[name](spark, SF))


class TestValueOutliers:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )

    def test_z_scores_by_hand(self, spark):
        from tundradb_spark.operators.analytics import value_outliers

        # group A: mean 2, var (0+0+0+0+100)/5 − 4 = 16, std 4 →
        # z(10) = 2.0 (kept at threshold), z(0) = −0.5 (dropped)
        rows = [(i, "A", 0.0) for i in range(4)] + [(4, "A", 10.0)]
        got = value_outliers(
            self._ev(spark, rows), z_threshold=2.0
        ).collect()
        assert [(r["event_id"], r["n_group"], r["z"]) for r in got] == [
            (4, 5, 2.0)
        ]

    def test_zero_variance_and_null_excluded(self, spark):
        from tundradb_spark.operators.analytics import value_outliers

        rows = [(1, "B", 7.0), (2, "B", 7.0), (3, "B", None)]
        assert (
            value_outliers(self._ev(spark, rows), z_threshold=1.0).count()
            == 0
        )

    def test_negative_tail_caught(self, spark):
        from tundradb_spark.operators.analytics import value_outliers

        rows = [(i, "A", 0.0) for i in range(4)] + [(4, "A", -10.0)]
        got = value_outliers(
            self._ev(spark, rows), z_threshold=2.0
        ).collect()
        assert [(r["event_id"], r["z"]) for r in got] == [(4, -2.0)]

    def test_validation(self, spark):
        from tundradb_spark.operators.analytics import value_outliers

        with pytest.raises(ValueError):
            value_outliers(self._ev(spark, [(1, "A", 1.0)]), z_threshold=0)

    def test_domain_violations_are_flagged_not_dropped(self, spark):
        from tundradb_spark.operators.analytics import value_outliers

        # group A: normal outlier math over the in-domain rows, PLUS two
        # glitch rows (1e308 and inf) surfaced as flag='domain' with the
        # per-group violation count; group C is ALL glitches — its
        # domain rows must still appear (n_group=0 stats path)
        rows = (
            [(i, "A", 0.0) for i in range(4)]
            + [(4, "A", 10.0), (5, "A", 1e308), (6, "A", float("inf"))]
            + [(7, "C", -1e308)]
        )
        got = {
            r["event_id"]: r
            for r in value_outliers(
                self._ev(spark, rows), z_threshold=2.0
            ).collect()
        }
        assert got[4]["flag"] == "outlier" and got[4]["z"] == 2.0
        assert got[4]["n_group"] == 5  # stats exclude the glitches
        assert got[5]["flag"] == "domain" and got[5]["value"] == 1e308
        assert got[5]["n_group"] == 2 and got[5]["z"] is None
        assert got[6]["value"] is None  # inf: no portable representation
        assert got[7]["flag"] == "domain" and got[7]["n_group"] == 1
        assert set(got) == {4, 5, 6, 7}


class TestMarkovTransitions:
    def _ev(self, spark, rows):
        # (user, t_seconds, event_id, type) → long-nanos ts
        return spark.createDataFrame(
            [(u, t * US * 1000, i, et) for u, t, i, et in rows],
            "user_id long, ts long, event_id long, event_type string",
        )

    def test_counts_and_probs_by_hand(self, spark):
        from tundradb_spark.operators.analytics import markov_transitions

        ev = self._ev(spark, [
            # u1: A B A B → A→B ×2, B→A ×1
            (1, 10, 1, "A"), (1, 20, 2, "B"),
            (1, 30, 3, "A"), (1, 40, 4, "B"),
            # u2: A C → A→C ×1; singleton u3 contributes nothing
            (2, 10, 5, "A"), (2, 20, 6, "C"),
            (3, 10, 7, "B"),
        ])
        got = {
            (r.src, r.dst): (r.n_transitions, r.n_from_src, r.prob)
            for r in markov_transitions(ev).collect()
        }
        assert got == {
            ("A", "B"): (2, 3, pytest.approx(2 / 3, abs=2e-6)),
            ("A", "C"): (1, 3, pytest.approx(1 / 3, abs=2e-6)),
            ("B", "A"): (1, 1, 1.0),
        }

    def test_tiebreak_orders_same_ts(self, spark):
        from tundradb_spark.operators.analytics import markov_transitions

        # same timestamp: event_id decides A-then-B, not B-then-A
        ev = self._ev(spark, [(1, 10, 1, "A"), (1, 10, 2, "B")])
        rows = markov_transitions(ev).collect()
        assert len(rows) == 1
        assert (rows[0].src, rows[0].dst) == ("A", "B")

    def test_min_count_keeps_full_denominator(self, spark):
        from tundradb_spark.operators.analytics import markov_transitions

        # A→B ×2, A→C ×1: pruning C must not inflate A→B's prob
        ev = self._ev(spark, [
            (1, 10, 1, "A"), (1, 20, 2, "B"),
            (2, 10, 3, "A"), (2, 20, 4, "B"),
            (3, 10, 5, "A"), (3, 20, 6, "C"),
        ])
        rows = markov_transitions(ev, min_count=2).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.src, r.dst, r.n_transitions, r.n_from_src) == ("A", "B", 2, 3)
        assert r.prob == pytest.approx(2 / 3, abs=2e-6)

    def test_validation(self, spark):
        from tundradb_spark.operators.analytics import markov_transitions

        with pytest.raises(ValueError, match="min_count"):
            markov_transitions(self._ev(spark, []), min_count=0)


class TestNeighborhoodSimilarity:
    def _g(self, spark, edges):
        return spark.createDataFrame(edges, "id_a long, id_b long")

    def test_jaccard_on_cycle(self, spark):
        from tundradb_spark.graphs.algorithms import neighborhood_similarity

        # 4-cycle 1-2-3-4-1: opposite corners share BOTH neighbors
        g = self._g(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        got = {
            (r["id_a"], r["id_b"]): (r["common_neighbors"], r["jaccard"])
            for r in neighborhood_similarity(g).collect()
        }
        assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}

    def test_adjacent_pairs_and_exclusion(self, spark):
        from tundradb_spark.graphs.algorithms import neighborhood_similarity

        # cycle + diagonal 1-3: now (1,3) is adjacent with J = 2/(3+3-2)
        g = self._g(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
        inc = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in neighborhood_similarity(g).collect()
        }
        assert inc[(1, 3)] == 0.5
        exc = neighborhood_similarity(g, include_adjacent=False)
        assert (1, 3) not in {
            (r["id_a"], r["id_b"]) for r in exc.collect()
        }

    def test_hub_normalization_beats_adamic_on_unions(self, spark):
        from tundradb_spark.graphs.algorithms import neighborhood_similarity

        # hub 100 connects to everyone; leaf pair (1,2) shares ONLY the
        # hub — union-normalized similarity must be small (1 / (1+1-... ))
        edges = [(100, i) for i in range(1, 6)] + [(1, 50), (2, 60)]
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in neighborhood_similarity(self._g(spark, edges)).collect()
        }
        # leaves 3,4: deg 1 each, share hub: J = 1/(1+1-1) = 1.0
        assert got[(3, 4)] == 1.0
        # 1 and 2 have an extra private neighbor each: J = 1/(2+2-1)
        assert got[(1, 2)] == round(1 / 3, 6)

    def test_input_validation(self, spark):
        from tundradb_spark.graphs.algorithms import neighborhood_similarity

        with pytest.raises(ValueError):
            neighborhood_similarity(self._g(spark, [(1, 2)]), min_common=0)


class TestEventNgrams:
    def test_trigram_counts_and_support(self, spark):
        from tundradb_spark.operators.analytics import event_ngrams

        rows = [
            (1, 1, "A"), (1, 2, "B"), (1, 3, "C"), (1, 4, "B"), (1, 5, "C"),
            (2, 1, "A"), (2, 2, "B"), (2, 3, "C"),
        ]
        got = {
            r["gram"]: (r["n_occurrences"], r["n_users"])
            for r in event_ngrams(_ev(spark, rows), n=3).collect()
        }
        assert got == {
            "A>B>C": (2, 2),
            "B>C>B": (1, 1),
            "C>B>C": (1, 1),
        }

    def test_min_count_and_topn_are_deterministic(self, spark):
        from tundradb_spark.operators.analytics import event_ngrams

        rows = [
            (1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "B"),
            (2, 1, "B"), (2, 2, "A"), (2, 3, "B"),
        ]
        out = event_ngrams(_ev(spark, rows), n=2, min_count=2, top_n=2).collect()
        # A>B occurs 2x (u1) + 1x (u2) = 3; B>A occurs 1+1 = 2
        assert [(r["gram"], r["n_occurrences"], r["n_users"]) for r in out] == [
            ("A>B", 3, 2), ("B>A", 2, 2),
        ]

    def test_tiebreak_orders_equal_timestamps(self, spark):
        from tundradb_spark.operators.analytics import event_ngrams

        df = spark.createDataFrame(
            [(1, 1_000, "B", 2), (1, 1_000, "A", 1)],
            "user_id long, ts long, event_type string, event_id long",
        )
        got = event_ngrams(df, n=2, tiebreak_col="event_id").collect()
        assert [(r["gram"],) for r in got] == [("A>B",)]

    def test_null_type_poisons_its_windows(self, spark):
        """r10 (ADVICE item 1): a NULL event type must contribute NO
        gram from any window containing it — concat_ws would otherwise
        collapse (A, NULL, C) into the string 'A>C', indistinguishable
        from a real bigram and divergent from the SQL oracle's ||
        chain."""
        from tundradb_spark.operators.analytics import event_ngrams

        rows = [(1, 1, "A"), (1, 2, None), (1, 3, "C"), (1, 4, "D")]
        got = {
            r["gram"] for r in event_ngrams(_ev(spark, rows), n=2).collect()
        }
        # A>NULL and NULL>C gone entirely (NOT folded into 'A>C');
        # only the clean window survives
        assert got == {"C>D"}
        assert (
            event_ngrams(_ev(spark, rows), n=3).count() == 0
        )  # every trigram window touches the NULL

    def test_n_must_be_at_least_two(self, spark):
        from tundradb_spark.operators.analytics import event_ngrams

        with pytest.raises(ValueError):
            event_ngrams(_ev(spark, [(1, 1, "A")]), n=1)


class TestRobustOutliers:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )

    def test_mad_by_hand(self, spark):
        from tundradb_spark.operators.analytics import robust_outliers

        # A: [1,2,3,4,100] → median 3, devs [2,1,0,1,97] → MAD 1,
        # scale 1.4826 → score(100) = 97/1.4826 ≈ 65.43 (only flag at 3.5)
        rows = [(i, "A", float(v)) for i, v in enumerate([1, 2, 3, 4, 100], 1)]
        got = robust_outliers(self._ev(spark, rows), k=3.5).collect()
        assert [(r["event_id"], r["n_group"], r["flag"]) for r in got] == [
            (5, 5, "outlier")
        ]
        expected = math.floor(97 / 1.4826 * 1e6 + 0.5) / 1e6
        assert got[0]["score"] == expected

    def test_even_count_median_is_rank_average(self, spark):
        from tundradb_spark.operators.analytics import robust_outliers

        # [1,2,3,4] → median (2+3)/2 = 2.5, devs [1.5,.5,.5,1.5] →
        # MAD (0.5+1.5)/2 = 1.0; at k=1: |1.5|/1.4826 ≈ 1.012 flags the
        # two extremes, 0.5/1.4826 ≈ 0.337 keeps the middles
        rows = [(i, "A", float(i)) for i in range(1, 5)]
        got = sorted(
            r["event_id"]
            for r in robust_outliers(self._ev(spark, rows), k=1.0).collect()
        )
        assert got == [1, 4]

    def test_robust_where_zscore_is_masked(self, spark):
        from tundradb_spark.operators.analytics import (
            robust_outliers,
            value_outliers,
        )

        # [1..9, 50]: one huge value inflates σ so the z-score at 3.0
        # misses 50 (z ≈ 2.95), while median/MAD (5.5, 2.5) flag it at
        # 44.5/3.7065 ≈ 12.0 — the masking failure MAD exists for
        rows = [(i, "A", float(v)) for i, v in enumerate(list(range(1, 10)) + [50], 1)]
        ev = self._ev(spark, rows)
        assert value_outliers(ev, z_threshold=3.0).count() == 0
        got = robust_outliers(ev, k=3.5).collect()
        assert [(r["event_id"], r["flag"]) for r in got] == [(10, "outlier")]
        assert got[0]["score"] == math.floor(44.5 / (2.5 * 1.4826) * 1e6 + 0.5) / 1e6

    def test_zero_mad_produces_no_outliers(self, spark):
        from tundradb_spark.operators.analytics import robust_outliers

        # over half the group identical → MAD 0 → scores undefined
        rows = [(1, "B", 7.0), (2, "B", 7.0), (3, "B", 7.0), (4, "B", 100.0)]
        assert robust_outliers(self._ev(spark, rows), k=1.0).count() == 0

    def test_domain_violations_are_flagged_not_dropped(self, spark):
        from tundradb_spark.operators.analytics import robust_outliers

        # A: [0,0,1,10] → med 0.5, MAD 0.5 → 10 flags at 3.5; the 1e308
        # and inf glitches surface as flag='domain' (inf value → NULL);
        # group C is ALL glitches and must still surface
        rows = (
            [(1, "A", 0.0), (2, "A", 0.0), (3, "A", 1.0), (4, "A", 10.0)]
            + [(5, "A", 1e308), (6, "A", float("inf"))]
            + [(7, "C", -1e308), (8, "A", None)]
        )
        got = {
            r["event_id"]: r
            for r in robust_outliers(self._ev(spark, rows), k=3.5).collect()
        }
        assert got[4]["flag"] == "outlier" and got[4]["n_group"] == 4
        assert got[4]["score"] == math.floor(9.5 / (0.5 * 1.4826) * 1e6 + 0.5) / 1e6
        assert got[5]["flag"] == "domain" and got[5]["value"] == 1e308
        assert got[5]["n_group"] == 2 and got[5]["score"] is None
        assert got[6]["value"] is None
        assert got[7]["flag"] == "domain" and got[7]["n_group"] == 1
        assert set(got) == {4, 5, 6, 7}

    def test_validation(self, spark):
        from tundradb_spark.operators.analytics import robust_outliers

        with pytest.raises(ValueError):
            robust_outliers(self._ev(spark, [(1, "A", 1.0)]), k=0)


class TestEventCooccurrence:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string"
        )

    def test_counts_support_lift_by_hand(self, spark):
        from tundradb_spark.operators.analytics import event_cooccurrence

        # u1:{A,B,C} u2:{A,B} u3:{A}; N=3, n_A=3 n_B=2 n_C=1
        rows = [(1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"), (3, "A")]
        got = {
            (r["type_a"], r["type_b"]): (
                r["n_users_both"], r["support"], r["lift"]
            )
            for r in event_cooccurrence(self._ev(spark, rows)).collect()
        }
        assert got[("A", "B")] == (2, 0.666667, 1.0)   # (2·3)/(3·2)
        assert got[("A", "C")] == (1, 0.333333, 1.0)   # (1·3)/(3·1)
        assert got[("B", "C")] == (1, 0.333333, 1.5)   # (1·3)/(2·1)
        assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}

    def test_duplicates_collapse_and_min_users(self, spark):
        from tundradb_spark.operators.analytics import event_cooccurrence

        rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A")]
        got = event_cooccurrence(self._ev(spark, rows), min_users=2).collect()
        assert [(r["type_a"], r["type_b"], r["n_users_both"]) for r in got] == [
            ("A", "B", 2)
        ]

    def test_lift_above_one_for_correlated_pair(self, spark):
        from tundradb_spark.operators.analytics import event_cooccurrence

        # A and B always together, C separate → lift(A,B) = 2·3/(2·2) = 1.5
        rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "C")]
        got = {
            (r["type_a"], r["type_b"]): r["lift"]
            for r in event_cooccurrence(self._ev(spark, rows)).collect()
        }
        assert got == {("A", "B"): 1.5}

    def test_max_types_per_user_drops_bots(self, spark):
        from tundradb_spark.operators.analytics import event_cooccurrence

        # u9 touches 4 types (a crawler); cap 3 removes it from counts
        rows = [(1, "A"), (1, "B"), (9, "A"), (9, "B"), (9, "C"), (9, "D")]
        got = event_cooccurrence(
            self._ev(spark, rows), max_types_per_user=3
        ).collect()
        assert [(r["type_a"], r["type_b"], r["n_users_both"], r["support"])
                for r in got] == [("A", "B", 1, 1.0)]

    def test_top_n_total_order(self, spark):
        from tundradb_spark.operators.analytics import event_cooccurrence

        rows = [(1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B")]
        got = event_cooccurrence(self._ev(spark, rows), top_n=2).collect()
        assert [(r["type_a"], r["type_b"]) for r in got] == [
            ("A", "B"), ("A", "C")
        ]

    def test_validation(self, spark):
        from tundradb_spark.operators.analytics import event_cooccurrence

        with pytest.raises(ValueError):
            event_cooccurrence(self._ev(spark, [(1, "A")]), min_users=0)


class TestWinsorize:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )

    def test_clip_bounds_by_hand(self, spark):
        from tundradb_spark.operators.analytics import winsorize

        # [1..10], p=(0.2, 0.8) → ranks ceil(2)=2, ceil(8)=8 → band [2, 8]
        rows = [(i, "A", float(i)) for i in range(1, 11)]
        got = {
            r["event_id"]: (r["clipped"], r["flag"])
            for r in winsorize(
                self._ev(spark, rows), p_lo=0.2, p_hi=0.8
            ).collect()
        }
        assert got[1] == (2.0, "clipped")
        assert got[2] == (2.0, "kept")     # at the bound: inside
        assert got[5] == (5.0, "kept")
        assert got[8] == (8.0, "kept")
        assert got[9] == (9.0, "clipped") or got[9] == (8.0, "clipped")
        assert got[9] == (8.0, "clipped")
        assert got[10] == (8.0, "clipped")
        assert len(got) == 10  # row count preserved

    def test_full_band_clips_nothing(self, spark):
        from tundradb_spark.operators.analytics import winsorize

        rows = [(i, "A", float(v)) for i, v in enumerate([3, 1, 2], 1)]
        got = winsorize(self._ev(spark, rows), p_lo=0.0, p_hi=1.0).collect()
        assert all(r["flag"] == "kept" and r["clipped"] == r["value"]
                   for r in got)

    def test_domain_rows_pass_through_unclipped(self, spark):
        from tundradb_spark.operators.analytics import winsorize

        # the 1e308 glitch must NOT become the upper clip bound, and
        # must come back flagged, not repaired
        rows = [(i, "A", float(i)) for i in range(1, 11)] + [
            (11, "A", 1e308), (12, "A", float("inf")), (13, "A", None),
        ]
        got = {
            r["event_id"]: r
            for r in winsorize(
                self._ev(spark, rows), p_lo=0.2, p_hi=0.8
            ).collect()
        }
        assert got[10]["clipped"] == 8.0  # bound from in-domain rows only
        assert got[11]["flag"] == "domain" and got[11]["clipped"] is None
        assert got[11]["value"] == 1e308
        assert got[12]["value"] is None  # inf: no portable representation
        assert 13 not in got and len(got) == 12

    def test_tiny_group_single_rank(self, spark):
        from tundradb_spark.operators.analytics import winsorize

        # n=1: both ranks = 1 → band collapses to the single value
        rows = [(1, "B", 42.0)]
        got = winsorize(self._ev(spark, rows), p_lo=0.25, p_hi=0.75).collect()
        assert [(r["clipped"], r["flag"]) for r in got] == [(42.0, "kept")]

    def test_validation(self, spark):
        from tundradb_spark.operators.analytics import winsorize

        with pytest.raises(ValueError):
            winsorize(self._ev(spark, [(1, "A", 1.0)]), p_lo=0.9, p_hi=0.1)


class TestBenfordDeviation:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_type string, value double"
        )

    @staticmethod
    def _expect(obs):
        # the operator's own formula, re-evaluated in Python with the
        # same injected log10(1+1/d) literals and d=1..9 order
        P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
        n = sum(obs.values())
        chi2 = sum(
            (obs.get(d, 0) - n * P[d]) ** 2 / (n * P[d])
            for d in range(1, 10)
        )
        devs = {d: abs(obs.get(d, 0) / n - P[d]) for d in range(1, 10)}
        wd = min(d for d in range(1, 10) if devs[d] == max(devs.values()))
        rnd = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        return n, rnd(chi2), wd, rnd(max(devs.values()))

    def test_chi2_by_hand(self, spark):
        from tundradb_spark.operators.analytics import benford_deviation

        obs = {1: 30, 2: 18, 3: 12, 4: 10, 5: 8, 6: 7, 7: 6, 8: 5, 9: 4}
        rows = [
            ("A", float(d * 100 + j)) for d, c in obs.items() for j in range(c)
        ]
        got = benford_deviation(self._ev(spark, rows), min_n=50).collect()
        n, chi2, wd, wdev = self._expect(obs)
        assert [(r["event_type"], r["n"], r["excluded"], r["chi2"],
                 r["worst_digit"], r["worst_dev"]) for r in got] == [
            ("A", n, 0, chi2, wd, wdev)
        ]

    def test_fabricated_group_scores_worse(self, spark):
        from tundradb_spark.operators.analytics import benford_deviation

        # A ~Benford-ish, B constant-injected (every value starts with 5)
        obs = {1: 30, 2: 18, 3: 12, 4: 10, 5: 8, 6: 7, 7: 6, 8: 5, 9: 4}
        rows = [
            ("A", float(d * 100 + j)) for d, c in obs.items() for j in range(c)
        ] + [("B", 500.0 + j) for j in range(100)]
        got = {
            r["event_type"]: r
            for r in benford_deviation(
                self._ev(spark, rows), min_n=50
            ).collect()
        }
        assert got["B"]["chi2"] > 10 * got["A"]["chi2"]
        assert got["B"]["worst_digit"] == 5

    def test_exclusions_counted_and_first_digit_of_abs(self, spark):
        from tundradb_spark.operators.analytics import benford_deviation

        # negatives take |v|'s first digit; sub-1, 1e308 and inf are
        # excluded but COUNTED; NULL drops silently
        rows = (
            [("A", float(v)) for v in range(10, 15)]
            + [("A", -37.5), ("A", 0.5), ("A", 1e308),
               ("A", float("inf")), ("A", None)]
        )
        got = benford_deviation(self._ev(spark, rows), min_n=1).collect()
        r = got[0]
        assert (r["n"], r["excluded"]) == (6, 3)

    def test_min_n_gates_small_groups(self, spark):
        from tundradb_spark.operators.analytics import benford_deviation

        rows = [("A", 10.0), ("A", 20.0)]
        assert benford_deviation(self._ev(spark, rows), min_n=3).count() == 0
        with pytest.raises(ValueError):
            benford_deviation(self._ev(spark, rows), min_n=0)


class TestDistributionDrift:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_type string, value double"
        )

    KW = dict(bounds=(0.0, 10.0), n_bins=5, min_n=1)

    def test_identical_sides_score_zero(self, spark):
        from tundradb_spark.operators.analytics import distribution_drift

        rows = [("A", float(v)) for v in (1, 3, 5, 7, 9, 2, 4)]
        ref, cur = self._ev(spark, rows), self._ev(spark, rows)
        got = distribution_drift(ref, cur, **self.KW).collect()
        assert [(r["event_type"], r["psi"], r["jsd"], r["tv"])
                for r in got] == [("A", 0.0, 0.0, 0.0)]

    def test_hand_computed_shift(self, spark):
        import math

        from tundradb_spark.operators.analytics import distribution_drift

        # ref: all mass in bin 0 ([0,2)); cur: half bin 0, half bin 4
        ref = self._ev(spark, [("A", 1.0)] * 4)
        cur = self._ev(spark, [("A", 1.0), ("A", 1.0),
                               ("A", 9.0), ("A", 9.0)])
        r = distribution_drift(ref, cur, **self.KW).collect()[0]
        eps = 1e-6
        # bin 0: pr=1, pc=0.5; bin 4: pr=0 (->eps), pc=0.5
        psi = (0.5 - 1.0) * math.log(0.5 / 1.0) + (0.5 - eps) * math.log(
            0.5 / eps
        )
        jsd = 0.5 * (
            1.0 * math.log(1.0 / 0.75) + 0.5 * math.log(0.5 / 0.75)
        ) + 0.5 * (0.5 * math.log(0.5 / 0.25))
        rnd = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        assert (r["psi"], r["jsd"], r["tv"]) == (
            rnd(psi), rnd(jsd), rnd(0.5),
        )
        assert (r["n_ref"], r["n_cur"]) == (4, 4)

    def test_bigger_shift_scores_bigger(self, spark):
        from tundradb_spark.operators.analytics import distribution_drift

        ref = self._ev(spark, [("A", float(v % 10)) for v in range(100)])
        small = self._ev(
            spark, [("A", float((v % 10) * 0.8 + 1)) for v in range(100)]
        )
        large = self._ev(spark, [("A", 9.5)] * 100)
        kw = dict(bounds=(0.0, 10.0), n_bins=10, min_n=1)
        s = distribution_drift(ref, small, **kw).collect()[0]
        g = distribution_drift(ref, large, **kw).collect()[0]
        assert 0 < s["psi"] < g["psi"]
        assert 0 < s["jsd"] < g["jsd"] <= math.log(2) + 1e-9
        assert 0 < s["tv"] < g["tv"] <= 1.0

    def test_domain_rows_counted_not_binned(self, spark):
        from tundradb_spark.operators.analytics import distribution_drift

        ref = self._ev(spark, [("A", 1.0)] * 3 + [("A", float("nan"))])
        cur = self._ev(
            spark,
            [("A", 1.0)] * 3
            + [("A", float("inf")), ("A", -1e300), ("A", None)],
        )
        r = distribution_drift(ref, cur, **self.KW).collect()[0]
        # NULL drops silently; NaN/±Inf/huge count as excluded
        assert (r["n_ref"], r["excluded_ref"]) == (3, 1)
        assert (r["n_cur"], r["excluded_cur"]) == (3, 2)
        assert (r["psi"], r["jsd"], r["tv"]) == (0.0, 0.0, 0.0)

    def test_out_of_band_clamps_to_edge_bins(self, spark):
        from tundradb_spark.operators.analytics import distribution_drift

        # -5 clamps into bin 0, 100 into bin 4 — same grid both sides
        ref = self._ev(spark, [("A", -5.0), ("A", 100.0)])
        cur = self._ev(spark, [("A", 0.5), ("A", 9.9)])
        r = distribution_drift(ref, cur, **self.KW).collect()[0]
        assert (r["psi"], r["jsd"], r["tv"]) == (0.0, 0.0, 0.0)

    def test_min_n_gates_each_side(self, spark):
        from tundradb_spark.operators.analytics import distribution_drift

        big = self._ev(spark, [("A", 1.0)] * 10)
        small = self._ev(spark, [("A", 1.0)] * 3)
        kw = dict(bounds=(0.0, 10.0), n_bins=5, min_n=5)
        assert distribution_drift(big, small, **kw).count() == 0
        assert distribution_drift(small, big, **kw).count() == 0
        assert distribution_drift(big, big, **kw).count() == 1

    def test_group_missing_one_side_surfaces_flagged(self, spark):
        # r12 ADVICE fix: total disappearance/appearance is the
        # strongest drift signal — it must surface, not silently drop
        from tundradb_spark.operators.analytics import distribution_drift

        ref = self._ev(spark, [("A", 1.0), ("B", 2.0)])
        cur = self._ev(spark, [("A", 1.0), ("C", 3.0)])
        got = {r["event_type"]: r
               for r in distribution_drift(ref, cur, **self.KW).collect()}
        assert set(got) == {"A", "B", "C"}
        assert got["A"]["status"] == "ok" and got["A"]["psi"] == 0.0
        b = got["B"]
        assert (b["status"], b["n_ref"], b["n_cur"], b["psi"]) == (
            "ref_only", 1, None, None)
        c = got["C"]
        assert (c["status"], c["n_ref"], c["n_cur"], c["jsd"]) == (
            "cur_only", None, 1, None)
        # below-min_n on a PRESENT side still drops (documented gate)
        kw = dict(bounds=(0.0, 10.0), n_bins=5, min_n=5)
        both = distribution_drift(ref, cur, **kw).collect()
        assert {r["event_type"]: r["status"] for r in both} == {
            "B": "ref_only", "C": "cur_only"}

    def test_validation(self, spark):
        from tundradb_spark.operators.analytics import distribution_drift

        ev = self._ev(spark, [("A", 1.0)])
        with pytest.raises(ValueError):
            distribution_drift(ev, ev, bounds=(5.0, 5.0))
        with pytest.raises(ValueError):
            distribution_drift(ev, ev, bounds=(0.0, 2e9))
        with pytest.raises(ValueError):
            distribution_drift(ev, ev, n_bins=0)
        with pytest.raises(ValueError):
            distribution_drift(ev, ev, min_n=0)
        with pytest.raises(ValueError):
            distribution_drift(ev, ev, min_n=1, eps=0.0)


class TestValueTrend:
    """r11: per-group OLS trend over time — closed form from five
    additive moments."""

    SCHEMA = "event_type string, value double, ts long"
    DAY_NS = 86_400 * 1_000_000_000

    def _ev(self, spark, rows):
        # ts in NANOS (integer ts columns are raw ns per epoch_micros)
        return spark.createDataFrame(rows, self.SCHEMA)

    def test_perfect_line_by_hand(self, spark):
        from tundradb_spark.operators.analytics import value_trend

        # y = 10 + 2·(days): slope 2/day, intercept 10, r² = 1
        rows = [("A", 10.0 + 2.0 * d, d * self.DAY_NS) for d in range(5)]
        r = value_trend(self._ev(spark, rows), epoch_us=0,
                        min_n=1).collect()[0]
        assert (r["event_type"], r["n"], r["excluded"]) == ("A", 5, 0)
        assert (r["slope_per_day"], r["intercept"], r["r2"]) == (
            2.0, 10.0, 1.0)

    def test_constant_value_zero_slope_null_r2(self, spark):
        from tundradb_spark.operators.analytics import value_trend

        rows = [("A", 7.0, d * self.DAY_NS) for d in range(4)]
        r = value_trend(self._ev(spark, rows), epoch_us=0,
                        min_n=1).collect()[0]
        assert (r["slope_per_day"], r["intercept"], r["r2"]) == (
            0.0, 7.0, None)

    def test_single_timestamp_degenerate(self, spark):
        from tundradb_spark.operators.analytics import value_trend

        rows = [("A", 1.0, 0), ("A", 2.0, 0), ("A", 3.0, 0)]
        r = value_trend(self._ev(spark, rows), epoch_us=0,
                        min_n=1).collect()[0]
        # x variance 0: no fit, row still visible
        assert (r["n"], r["slope_per_day"], r["intercept"], r["r2"]) == (
            3, None, None, None)

    def test_domain_rows_excluded_not_fitted(self, spark):
        from tundradb_spark.operators.analytics import value_trend

        good = [("A", 10.0 + 2.0 * d, d * self.DAY_NS) for d in range(5)]
        rows = good + [
            ("A", float("nan"), 1 * self.DAY_NS),
            ("A", 1e300, 2 * self.DAY_NS),
            ("A", None, 3 * self.DAY_NS),       # drops silently
            ("A", 5.0, None),                    # NULL ts drops silently
        ]
        r = value_trend(self._ev(spark, rows), epoch_us=0,
                        min_n=1).collect()[0]
        assert (r["n"], r["excluded"]) == (5, 2)
        assert (r["slope_per_day"], r["intercept"], r["r2"]) == (
            2.0, 10.0, 1.0)

    def test_min_n_gate_and_validation(self, spark):
        from tundradb_spark.operators.analytics import value_trend

        rows = [("A", 1.0, 0), ("A", 2.0, self.DAY_NS)]
        assert value_trend(self._ev(spark, rows), epoch_us=0,
                           min_n=3).count() == 0
        with pytest.raises(ValueError):
            value_trend(self._ev(spark, rows), epoch_us=0, min_n=0)

    def test_moment_overflow_raises_not_silent_null(self, spark):
        # r12 ADVICE fix: a NULL decimal moment with n>0 means the
        # capacity bound n·max(x²,y²,|xy|) < 1e26 was exceeded
        # (non-ANSI Spark NULLs the sum) — the fit must FAIL loudly,
        # never report a silently NULL slope for the biggest groups
        from pyspark.errors import SparkRuntimeException
        from tundradb_spark.operators.analytics import trend_score

        stats = spark.createDataFrame(
            [("A", 10, 0, None, None, None, None, None,
              0.0, 1.0, 0.0, 1.0)],
            "event_type string, n_group long, __ndom long,"
            " __sx decimal(38,12), __sy decimal(38,12),"
            " __sxx decimal(38,12), __syy decimal(38,12),"
            " __sxy decimal(38,12), __minx double, __maxx double,"
            " __miny double, __maxy double",
        )
        with pytest.raises(SparkRuntimeException, match="overflow"):
            trend_score(stats, "event_type", min_n=1).collect()

    def test_noisy_line_r2_below_one(self, spark):
        from tundradb_spark.operators.analytics import value_trend

        rows = [
            ("A", 10.0 + 2.0 * d + (1.0 if d % 2 else -1.0),
             d * self.DAY_NS)
            for d in range(10)
        ]
        r = value_trend(self._ev(spark, rows), epoch_us=0,
                        min_n=1).collect()[0]
        assert 0.0 < r["r2"] < 1.0
        assert abs(r["slope_per_day"] - 2.0) < 0.2

    def test_large_single_timestamp_is_degenerate_not_noise(self, spark):
        from tundradb_spark.operators.analytics import value_trend

        # r11 review: 1000 rows sharing ONE timestamp far from the
        # epoch — the double moment chain's n·Σx² − (Σx)² lands on
        # rounding noise (measured +256.0 → slope −168.75/day before
        # the exact extent guard); the fit must be NULL, not noise
        ts_ns = 1_234_567_891_234_567_000  # ~39 years of seconds
        rows = [("A", 10.0 + (i % 7), ts_ns) for i in range(1000)]
        r = value_trend(self._ev(spark, rows), epoch_us=0,
                        min_n=1).collect()[0]
        assert (r["n"], r["slope_per_day"], r["intercept"], r["r2"]) == (
            1000, None, None, None)

    def test_constant_value_awkward_magnitudes_exact_zero(self, spark):
        from tundradb_spark.operators.analytics import value_trend

        # constant y at an awkward float with large x: slope must be
        # EXACTLY 0.0 and intercept exactly the constant (extent
        # override), not the moment chain's ~1e-9 residue
        rows = [("A", 0.30000000000000004, d * self.DAY_NS + 123_456_789)
                for d in range(9)]
        r = value_trend(self._ev(spark, rows), epoch_us=0,
                        min_n=1).collect()[0]
        assert (r["slope_per_day"], r["intercept"], r["r2"]) == (
            0.0, 0.3, None)
