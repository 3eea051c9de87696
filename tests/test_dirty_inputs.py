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
