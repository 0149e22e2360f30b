"""Context-window chunking (functions/text.py::token_chunks)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.functions.text import token_chunks


def _chunks(spark, text, chunk_tokens=8, overlap=2):
    df = spark.createDataFrame([(text,)], "text string").select(
        F.explode(token_chunks(F.col("text"), chunk_tokens, overlap)).alias("c")
    )
    return [
        (r["c"]["chunk_id"], r["c"]["chunk"], r["c"]["n_tokens"])
        for r in df.collect()
    ]


def test_short_doc_is_one_chunk(spark):
    out = _chunks(spark, "a b c")
    assert out == [(0, "a b c", 3)]


def test_windows_overlap_and_cover(spark):
    words = [f"w{i}" for i in range(20)]
    out = _chunks(spark, " ".join(words), chunk_tokens=8, overlap=2)
    # stride 6: starts 0, 6, 12 — ceil((20-2)/6) = 3 chunks
    assert [c[0] for c in out] == [0, 1, 2]
    assert out[0][1].split() == words[0:8]
    assert out[1][1].split() == words[6:14]
    assert out[2][1].split() == words[12:20]
    assert [c[2] for c in out] == [8, 8, 8]
    # every token appears in some chunk; consecutive chunks share `overlap`
    covered = set()
    for _, chunk, _ in out:
        covered.update(chunk.split())
    assert covered == set(words)
    assert out[0][1].split()[-2:] == out[1][1].split()[:2]


def test_remainder_window_is_short(spark):
    words = [f"w{i}" for i in range(23)]
    out = _chunks(spark, " ".join(words), chunk_tokens=8, overlap=2)
    # starts 0, 6, 12, 18 — the last window holds only 5 tokens
    assert len(out) == 4
    assert out[-1][1].split() == words[18:23]
    assert out[-1][2] == 5


def test_exact_multiple_has_no_empty_tail(spark):
    # n=14, stride 6: ceil((14-2)/6) = 2 — a start at 12 would add only
    # already-covered tokens
    words = [f"w{i}" for i in range(14)]
    out = _chunks(spark, " ".join(words), chunk_tokens=8, overlap=2)
    assert len(out) == 2
    assert out[-1][1].split() == words[6:14]


def test_bad_overlap_raises(spark):
    with pytest.raises(ValueError, match="overlap"):
        token_chunks(F.col("text"), chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError, match="overlap"):
        token_chunks(F.col("text"), chunk_tokens=8, overlap=-1)


class TestRepetitionFeatures:
    def _feats(self, spark, text):
        from kafka_connect_plugins_spark.functions.text import repetition_features

        feats = repetition_features(F.col("text"))
        row = (
            spark.createDataFrame([(text,)], "text string")
            .select(*[v.alias(k) for k, v in feats.items()])
            .first()
        )
        return row.asDict()

    def test_degenerate_repetition(self, spark):
        # "a a a a": 4 tokens 1 distinct -> 0.75; bigrams ["a a"]x3 -> 2/3;
        # trigrams ["a a a"]x2 -> 0.5
        f = self._feats(spark, "a a a a")
        assert f == {
            "dup_token_frac": 0.75,
            "dup_bigram_frac": 0.6667,
            "dup_trigram_frac": 0.5,
        }

    def test_all_distinct_is_zero(self, spark):
        f = self._feats(spark, "a b c d")
        assert f == {
            "dup_token_frac": 0.0,
            "dup_bigram_frac": 0.0,
            "dup_trigram_frac": 0.0,
        }

    def test_too_short_for_ngram_is_zero_not_null(self, spark):
        f = self._feats(spark, "solo")
        assert f == {
            "dup_token_frac": 0.0,
            "dup_bigram_frac": 0.0,
            "dup_trigram_frac": 0.0,
        }
