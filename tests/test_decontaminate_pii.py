"""Eval-set n-gram decontamination (operators/neardup.py) and PII
detect/scrub (functions/text.py)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.functions.text import pii_features, scrub_pii
from kafka_connect_plugins_spark.operators.neardup import decontaminate_ngrams


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontaminate:
    def test_flags_only_overlapping_docs(self, spark):
        train = _docs(
            spark,
            [
                (1, "alpha beta gamma delta epsilon"),  # contains eval 4-gram
                (2, "zeta eta theta iota kappa"),  # clean
                (3, "x alpha beta gamma delta y"),  # overlap mid-document
            ],
        )
        ev = _docs(spark, [(100, "alpha beta gamma delta")])
        out = {
            r["doc_id"]: r.asDict()
            for r in decontaminate_ngrams(train, ev, "doc_id", "text", n=4).collect()
        }
        assert set(out) == {1, 3}
        assert out[1]["n_contaminated"] == 1
        assert out[1]["n_grams"] == 2  # 5 tokens -> two 4-grams
        assert out[1]["contam_frac"] == 0.5
        assert out[3]["n_contaminated"] == 1

    def test_short_docs_cannot_match(self, spark):
        train = _docs(spark, [(1, "alpha beta gamma")])  # < n tokens
        ev = _docs(spark, [(100, "alpha beta gamma delta")])
        assert decontaminate_ngrams(train, ev, "doc_id", "text", n=4).count() == 0

    def test_duplicate_grams_count_once(self, spark):
        # the eval gram appears twice in the train doc; per-doc distinct
        # grams mean it is counted once
        train = _docs(spark, [(1, "a b c d a b c d")])
        ev = _docs(spark, [(100, "a b c d")])
        row = decontaminate_ngrams(train, ev, "doc_id", "text", n=4).collect()
        assert len(row) == 1
        # distinct grams of the train doc: "a b c d", "b c d a", "c d a b",
        # "d a b c" -> 4; one matches
        assert row[0]["n_grams"] == 4
        assert row[0]["n_contaminated"] == 1

    def test_n_below_one_rejected(self, spark):
        d = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError):
            decontaminate_ngrams(d, d, "doc_id", "text", n=0)

    def test_shuffle_join_variant_matches(self, spark):
        train = _docs(
            spark,
            [(i, f"w{i} alpha beta gamma delta w{i+1}") for i in range(10)],
        )
        ev = _docs(spark, [(100, "alpha beta gamma delta")])
        a = decontaminate_ngrams(train, ev, "doc_id", "text", n=4)
        b = decontaminate_ngrams(
            train, ev, "doc_id", "text", n=4, broadcast_eval=False
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestPii:
    def _one(self, spark, text):
        df = spark.createDataFrame([(text,)], "text string")
        feats = pii_features(F.col("text"))
        row = df.select(
            feats["n_emails"].alias("e"),
            feats["n_phones"].alias("p"),
            scrub_pii(F.col("text")).alias("t"),
        ).first()
        return row["e"], row["p"], row["t"]

    def test_email_detected_and_masked(self, spark):
        e, p, t = self._one(spark, "mail me at jo.doe+x@sub.example.org today")
        assert (e, p) == (1, 0)
        assert t == "mail me at <EMAIL> today"

    def test_phone_detected_and_masked(self, spark):
        e, p, t = self._one(spark, "call +1-555-0042 now")
        assert (e, p) == (0, 1)
        assert t == "call <PHONE> now"

    def test_multiple_spans(self, spark):
        e, p, t = self._one(spark, "a@b.co or c@d.io or +44-201-3344")
        assert (e, p) == (2, 1)
        assert t == "<EMAIL> or <EMAIL> or <PHONE>"

    def test_clean_text_untouched(self, spark):
        e, p, t = self._one(spark, "no pii here, just words")
        assert (e, p) == (0, 0)
        assert t == "no pii here, just words"
