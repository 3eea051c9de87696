"""Dirty-input hardening: at 100 TB every pathological document exists —
NULL text, empty strings, whitespace-only, control characters, emoji,
CJK, combining marks, kilo-token words.  Every text-facing operator must
process such a corpus WITHOUT raising and return one well-formed row per
surviving input (no operator may silently drop ids it didn't document
dropping).

These are crash/contract tests, not value tests — exact values for clean
inputs live in the per-operator suites.
"""

import pytest


DIRTY = [
    (0, None),
    (1, ""),
    (2, "   \t\n  "),
    (3, "normal clean text with several plain words"),
    (4, "emoji 🎉🎊 and é́ combining marks mixed in"),
    (5, "中文文本没有空格分词"),
    (6, "ctrl\x01chars\x02embedded\x03here"),
    (7, "x" * 5000),                      # one kilo-token "word"
    (8, "dup dup dup dup dup dup dup"),   # degenerate repetition
]
#: ids the operators are DOCUMENTED to drop: NULL text rows
NULLISH = {0}


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(DIRTY, "doc_id long, text string").cache()


def _ids(df, col="doc_id"):
    return {r[col] for r in df.select(col).collect()}


class TestTextOpsSurviveDirtyInput:
    def test_token_stats(self, spark, dirty):
        from tundradb_spark.pipeline.text import token_stats

        out = token_stats(dirty, group_col="doc_id").collect()
        assert len(out) == len(DIRTY)  # NULL text still yields a row
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["total_tokens"] == 0 and by_id[2]["total_tokens"] == 0

    def test_quality_and_gopher(self, spark, dirty):
        from tundradb_spark.pipeline.text import gopher_rules, quality_scores

        assert len(quality_scores(dirty).collect()) == len(DIRTY)
        assert len(gopher_rules(dirty).collect()) == len(DIRTY)

    def test_lang_id_and_fingerprints(self, spark, dirty):
        from tundradb_spark.pipeline.text import fingerprints, lang_id

        assert len(lang_id(dirty).collect()) == len(DIRTY)
        assert len(fingerprints(dirty).collect()) == len(DIRTY)

    def test_lm_and_repetition(self, spark, dirty):
        from tundradb_spark.pipeline.text import (
            lm_scores,
            repetition_scores,
        )

        # token-exploding ops see only rows WITH tokens; they must not
        # raise and must cover every tokenful doc
        lm_ids = _ids(lm_scores(dirty))
        assert {3, 4, 5, 6, 7, 8} <= lm_ids
        assert len(repetition_scores(dirty).collect()) >= 6

    def test_vocab_encode_bpe(self, spark, dirty):
        from tundradb_spark.pipeline.text import (
            bpe_segment,
            build_vocab,
            encode_tokens,
        )

        vocab = build_vocab(dirty)
        assert vocab.count() > 0
        assert encode_tokens(dirty, vocab=vocab).count() > 0
        assert bpe_segment(dirty, n_merges=2).count() > 0


class TestDedupOpsSurviveDirtyInput:
    def test_exact_and_soft(self, spark, dirty):
        from tundradb_spark.pipeline.dedup import (
            exact_dedup,
            soft_dedup_weights,
        )

        groups = exact_dedup(dirty)
        assert _ids(groups, "keep_id") <= set(range(len(DIRTY)))
        soft = soft_dedup_weights(dirty, k=3)
        assert _ids(soft) == set(range(len(DIRTY))) - NULLISH

    def test_minhash_simhash_ngram(self, spark, dirty):
        from tundradb_spark.pipeline.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_pairs,
        )

        # pair miners: no crash; pairs (if any) reference real ids
        universe = set(range(len(DIRTY)))
        for pairs in (
            minhash_lsh_pairs(dirty),
            simhash_pairs(dirty),
            ngram_jaccard_pairs(dirty, block_col=None),
        ):
            for r in pairs.collect():
                assert r["id_a"] in universe and r["id_b"] in universe

    def test_spans_and_fuzzy(self, spark, dirty):
        from tundradb_spark.pipeline.dedup import (
            exact_substring_spans,
            fuzzy_string_pairs,
            strip_duplicate_spans,
        )

        spans = exact_substring_spans(dirty, k=3)
        spans.collect()  # no raise
        assert strip_duplicate_spans(dirty, k=3).count() > 0
        fuzzy_string_pairs(dirty, "text", id_col="doc_id").collect()

    def test_chunking_and_cdc(self, spark, dirty):
        from tundradb_spark.pipeline.sampling import cdc_chunks, chunk_docs

        chunks = chunk_docs(dirty, chunk_tokens=4)
        assert _ids(chunks) <= set(range(len(DIRTY)))
        cdc = cdc_chunks(dirty)
        cdc.collect()  # no raise on null/empty/unicode

    def test_recall_gauge_full_and_sampled(self, spark, dirty):
        """r11: the gauge (and its hash-coin sampled mode) over the dirty
        corpus.  NULL text drops from the digest mine (md5(NULL) is
        NULL); '' and whitespace-only normalize to DIFFERENT digests
        ('' vs ' ' — trim strips spaces only, in Spark AND DuckDB, so
        the \\t\\n row keeps a one-space residue; engine parity holds
        because the oracle uses the same expression shape).  The
        all-dirty truth set is therefore empty and the gauge still
        returns its one summary row (NULL counts, not a crash).  With
        one planted verbatim copy of the clean row, recall snaps to 1.0
        over the dirty neighbors."""
        from pyspark.sql import functions as F
        from tundradb_spark.pipeline.dedup import recall_gauge

        kw = dict(num_hashes=12, bands=4, shingle_k=5)
        row = recall_gauge(dirty, **kw).collect()[0]
        assert row["n_true"] is None  # no exact dups among dirty rows
        planted = dirty.unionAll(
            dirty.filter(F.col("doc_id") == 3).select(
                (F.col("doc_id") + 100).alias("doc_id"), "text"
            )
        )
        row2 = recall_gauge(planted, **kw).collect()[0]
        assert (row2["n_true"], row2["recall"]) == (1, 1.0)
        sampled = recall_gauge(planted, sample_fraction=0.5, **kw).collect()
        assert len(sampled) == 1  # still exactly one summary row


DIRTY_EVENTS = [
    # (event_id, user_id, ts_ns, event_type, value)
    (0, None, 1_000_000_000, "view", 1.0),        # NULL user
    (1, 1, None, "view", 2.0),                    # NULL ts
    (2, 1, 2_000_000_000, None, 3.0),             # NULL type
    (3, 1, 3_000_000_000, "view", None),          # NULL value
    (4, 2, 4_000_000_000, "", 5.0),               # empty type
    (5, 2, 4_000_000_000, "🎉", 6.0),            # emoji type, equal ts
    (6, 2, 4_000_000_000, "中文", 7.0),           # CJK type, equal ts
    (7, 3, 5_000_000_000, "x" * 2000, -1e308),    # kilo-char type, huge neg
    (8, 3, 6_000_000_000, "view", float("nan")),  # NaN value
]


@pytest.fixture(scope="module")
def dirty_events(spark):
    return spark.createDataFrame(
        DIRTY_EVENTS,
        "event_id long, user_id long, ts long, event_type string, "
        "value double",
    ).cache()


class TestAnalyticsSurviveDirtyEvents:
    """r9: the analytics family over pathological event streams — NULL
    keys/timestamps/types/values, empty and kilo-char types, equal-ts
    collisions, NaN and extreme values.  Crash/contract tests; exact
    values live in test_analytics.py."""

    def test_funnel(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import funnel

        out = funnel(dirty_events, ["view", "🎉"], within_us=10**9).collect()
        assert len(out) == 2  # one row per step, whatever the input

    def test_cohort_retention(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import cohort_retention

        assert cohort_retention(dirty_events, period_us=10**6).count() >= 1

    def test_outliers_surface_domain_violations(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import value_outliers

        # r10: the metric-domain guard no longer hides the glitch rows —
        # the -1e308 and NaN events come back as flag='domain' rows with
        # a visible per-group violation count (NULL values still carry
        # no metric and are dropped)
        out = value_outliers(dirty_events, z_threshold=0.5).collect()
        dom = {r["event_id"]: r for r in out if r["flag"] == "domain"}
        assert set(dom) == {7, 8}
        assert dom[7]["value"] == -1e308  # finite glitch passes through
        assert dom[7]["n_group"] == 1 and dom[7]["z"] is None
        assert dom[8]["value"] is None  # NaN has no portable hash
        assert dom[8]["n_group"] == 1
        assert all(r["flag"] == "outlier" for r in out if r["event_id"] not in (7, 8))

    def test_markov(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import markov_transitions

        out = markov_transitions(dirty_events).collect()
        assert all(r["n_transitions"] >= 1 for r in out)

    def test_event_ngrams(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import event_ngrams

        out = event_ngrams(
            dirty_events, n=2, tiebreak_col="event_id"
        ).collect()
        # grams build over whatever types exist, including emoji/CJK
        assert all(r["n_occurrences"] >= 1 for r in out)

    def test_cusum(self, spark, dirty_events):
        from tundradb_spark.operators.relational import cusum_alarms

        cusum_alarms(
            dirty_events, "user_id", "value", slack=0.0, threshold=1.0,
            tiebreak_col="event_id",
        ).collect()

    def test_neighborhood_similarity_degenerates(self, spark):
        from tundradb_spark.graphs.algorithms import neighborhood_similarity

        g = spark.createDataFrame(
            [(1, 1), (2, 3), (None, 4)], "id_a long, id_b long"
        )
        # self-loop filtered, NULL endpoint flows through least/greatest
        # as a NULL pair and never fabricates a wedge
        out = neighborhood_similarity(g).collect()
        assert out == []

    def test_time_series_family_survives_extremes(self, spark, dirty_events):
        """moving_aggregate / time_weighted_avg / downsample_lttb share
        the METRIC_ABS_BOUND domain: a 1e308 glitch row is excluded (not
        a job-killing ANSI decimal-cast error), everything else flows."""
        from tundradb_spark.operators.relational import (
            downsample_lttb,
            moving_aggregate,
            time_weighted_avg,
        )

        moving_aggregate(
            dirty_events, 10**9, "user_id", "value"
        ).collect()
        time_weighted_avg(
            dirty_events, 10**9, "user_id", "value",
            tiebreak_col="event_id",
        ).collect()
        downsample_lttb(
            dirty_events, 4, "user_id", "value", tiebreak_col="event_id"
        ).collect()


class TestR10AnalyticsSurviveDirtyEvents:
    """r10: the new metric/affinity operators over the same pathological
    stream — crash/contract tests; exact values live in
    test_analytics.py."""

    def test_robust_outliers_surface_domain(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import robust_outliers

        out = robust_outliers(dirty_events, k=0.5).collect()
        dom = {r["event_id"]: r for r in out if r["flag"] == "domain"}
        assert set(dom) == {7, 8}
        assert dom[7]["value"] == -1e308 and dom[7]["score"] is None
        assert dom[8]["value"] is None  # NaN: no portable hash

    def test_winsorize_never_clips_to_glitch(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import winsorize

        out = {r["event_id"]: r for r in winsorize(
            dirty_events, p_lo=0.0, p_hi=1.0).collect()}
        # glitches flagged, not repaired — and never the bound
        assert out[7]["flag"] == "domain" and out[7]["clipped"] is None
        assert out[8]["flag"] == "domain"
        # every in-domain row survives with a finite clipped value
        for i, r in out.items():
            if r["flag"] != "domain":
                assert r["clipped"] is not None and abs(r["clipped"]) < 1e9
        assert 3 not in out  # NULL value carries no metric

    def test_benford_counts_exclusions(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import benford_deviation

        out = benford_deviation(dirty_events, min_n=1).collect()
        by_g = {r["event_type"]: r for r in out}
        # the kilo-char group's only value is the -1e308 glitch:
        # excluded=1, and with n=0 the group is min_n-gated out
        assert "x" * 2000 not in by_g
        # 'view' group: values 1.0, 2.0 in-domain; NaN excluded; NULL dropped
        v = by_g["view"]
        assert (v["n"], v["excluded"]) == (2, 1)

    def test_cooccurrence_drops_null_keys(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import event_cooccurrence

        out = event_cooccurrence(dirty_events).collect()
        # NULL user (id 0) and NULL type (id 2) contribute nothing;
        # u2's three types pair among themselves
        for r in out:
            assert r["type_a"] is not None and r["type_b"] is not None
        pairs = {(r["type_a"], r["type_b"]) for r in out}
        assert ("", "中文") in pairs and ("", "🎉") in pairs

    def test_distribution_drift_survives_glitches(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import distribution_drift

        out = distribution_drift(
            dirty_events, dirty_events,
            bounds=(0.0, 10.0), n_bins=5, min_n=1,
        ).collect()
        by_g = {r["event_type"]: r for r in out}
        # same frame both sides → zero drift everywhere it scores;
        # NULL type is a group like any other (r12: the presence join
        # is null-safe, so the two sides' NULL groups MATCH instead of
        # mis-reporting as one ref_only + one cur_only pair)
        for r in out:
            assert r["status"] == "ok"
            assert (r["psi"], r["jsd"], r["tv"]) == (0.0, 0.0, 0.0)
        assert None in by_g and by_g[None]["status"] == "ok"
        # 'view': 1.0, 2.0 in-domain; NaN excluded; NULL value dropped
        v = by_g["view"]
        assert (v["n_ref"], v["excluded_ref"]) == (2, 1)
        # kilo-char group: only the -1e308 glitch → n=0, min_n-gated out
        assert "x" * 2000 not in by_g
        # emoji/CJK/empty types score like any group
        assert {"", "🎉", "中文"} <= set(by_g)


class TestCorpusDiffSurvivesDirtyDocs:
    """r11: corpus_diff over pathological snapshots — NULL/empty/
    kilo-char texts, emoji, NULL-safe change detection."""

    SCHEMA = "doc_id long, text string"

    def test_dirty_texts(self, spark):
        from tundradb_spark.pipeline.dedup import corpus_diff

        old = spark.createDataFrame(
            [(1, None), (2, ""), (3, "x" * 50_000), (4, "🎉 中文")],
            self.SCHEMA,
        )
        new = spark.createDataFrame(
            [(1, ""), (2, ""), (3, "x" * 50_000), (4, "🎉 中文!")],
            self.SCHEMA,
        )
        got = {r["doc_id"]: r["status"] for r in corpus_diff(
            old, new, include_unchanged=True).collect()}
        # NULL→'' is a CHANGE (null-safe compare, not digest-NULL
        # confusion); identical kilo-char and emoji texts are unchanged
        assert got == {"1": "changed", "2": "unchanged",
                       "3": "unchanged", "4": "changed"}

    def test_value_trend_survives_glitches(self, spark, dirty_events):
        from tundradb_spark.operators.analytics import value_trend

        out = value_trend(dirty_events, epoch_us=0, min_n=1).collect()
        by_g = {r["event_type"]: r for r in out}
        # kilo-char group: only the -1e308 glitch → n=0, gated out
        assert "x" * 2000 not in by_g
        # 'view': 1.0 (ts 1s) and 2.0 (NULL ts drops) → n=1; NaN excluded
        v = by_g["view"]
        assert (v["n"], v["excluded"]) == (1, 1)
        # single in-domain point: no fit, visible row
        assert v["slope_per_day"] is None and v["r2"] is None
