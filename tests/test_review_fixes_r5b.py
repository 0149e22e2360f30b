"""Second round-5 review battery: as-of tiebreak type fidelity, replication
ledger ids keyed on the full source path, and the wire adapters' dead-letter
contract (invalid rows expose ONLY ``_corrupt_record``)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_plugins_spark.operators.asof_join import (
    asof_join,
    asof_join_bucketed,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


class TestAsofTiebreakTypes:
    """The tiebreak must order on the RAW column type. The old double cast
    collapsed long LSNs above 2^53 (nondeterministic winner) and turned a
    string tiebreak into all-NULLs (silently disabled)."""

    def _sides(self, spark, tb_type, tb_lo, tb_hi):
        left = spark.createDataFrame(
            [("k", _ts("2024-01-02T00:00:00"))], "k string, ts timestamp"
        )
        right = spark.createDataFrame(
            [("k", _ts("2024-01-01T00:00:00"), tb_lo, "lo"),
             ("k", _ts("2024-01-01T00:00:00"), tb_hi, "hi")],
            f"k string, ts timestamp, v {tb_type}, tag string",
        )
        return left, right

    def test_long_tiebreak_above_2_53_is_exact(self, spark):
        lo, hi = (1 << 53), (1 << 53) + 1  # identical as doubles
        left, right = self._sides(spark, "long", lo, hi)
        for fn in (asof_join, asof_join_bucketed):
            out = fn(left, right, "k", "k", "ts", "ts", tiebreak="v").collect()
            assert len(out) == 1
            assert out[0]["r_tag"] == "hi", fn.__name__  # greatest wins

    def test_string_tiebreak_orders_lexically(self, spark):
        left, right = self._sides(spark, "string", "v001", "v002")
        for fn in (asof_join, asof_join_bucketed):
            out = fn(left, right, "k", "k", "ts", "ts", tiebreak="v").collect()
            assert len(out) == 1
            assert out[0]["r_tag"] == "hi", fn.__name__

    def test_forward_keeps_smallest_long_tiebreak(self, spark):
        lo, hi = (1 << 53), (1 << 53) + 1
        left = spark.createDataFrame(
            [("k", _ts("2023-12-31T00:00:00"))], "k string, ts timestamp"
        )
        right = spark.createDataFrame(
            [("k", _ts("2024-01-01T00:00:00"), lo, "lo"),
             ("k", _ts("2024-01-01T00:00:00"), hi, "hi")],
            "k string, ts timestamp, v long, tag string",
        )
        out = asof_join(
            left, right, "k", "k", "ts", "ts",
            direction="forward", tiebreak="v",
        ).collect()
        assert out[0]["r_tag"] == "lo"


class TestReplicationStreamIdPath:
    def test_same_basename_different_parent_distinct_ids(self, spark, tmp_path):
        from kafka_connect_plugins_spark.plans.lake_table import LakeTable
        from kafka_connect_plugins_spark.plans.replication import (
            replication_stream_id,
        )

        a = LakeTable.create(
            spark, str(tmp_path / "region1" / "orders"),
            key_columns=["repo", "path"], num_buckets=2,
        )
        b = LakeTable.create(
            spark, str(tmp_path / "region2" / "orders"),
            key_columns=["repo", "path"], num_buckets=2,
        )
        ia, ib = replication_stream_id(a), replication_stream_id(b)
        assert ia != ib  # one replica fed by both must keep two ledgers
        assert replication_stream_id(a) == ia  # stable across calls


ROW_T = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("content", T.StringType()),
])


class TestDeadLetterContract:
    def test_debezium_unknown_op_nulls_everything_but_corrupt(self, spark):
        from kafka_connect_plugins_spark.sources.cdc_formats import (
            debezium_to_merge_source,
        )

        good = json.dumps({
            "op": "c", "ts_ms": 5,
            "after": {"repo": "r", "path": "p", "content": "x"},
            "source": {"lsn": 9},
        })
        truncate = json.dumps({"op": "t", "ts_ms": 7, "source": {"lsn": 11}})
        df = spark.createDataFrame([(good,), (truncate,)], "value string")
        out = debezium_to_merge_source(
            df, ROW_T, ["repo", "path"], keep_corrupt=True
        ).collect()
        by_corrupt = {r["_corrupt_record"] is not None: r for r in out}
        bad, ok = by_corrupt[True], by_corrupt[False]
        # a consumer that merges without filtering must not see a phantom
        # live row at a real LSN
        assert bad["_lsn"] is None and bad["_tombstone"] is None
        assert bad["repo"] is None and bad["content"] is None
        assert bad["_corrupt_record"] == truncate
        assert ok["_lsn"] == 9 and ok["_tombstone"] is False
        assert ok["repo"] == "r" and ok["_corrupt_record"] is None

    def test_debezium_drop_mode_still_filters(self, spark):
        from kafka_connect_plugins_spark.sources.cdc_formats import (
            debezium_to_merge_source,
        )

        truncate = json.dumps({"op": "t", "ts_ms": 7})
        df = spark.createDataFrame([(truncate,)], "value string")
        assert (
            debezium_to_merge_source(df, ROW_T, ["repo", "path"]).count() == 0
        )

    def test_mongo_drop_nulls_everything_but_corrupt(self, spark):
        from kafka_connect_plugins_spark.sources.cdc_formats import (
            mongo_changestream_to_merge_source,
        )

        doc_t = T.StructType([
            T.StructField("_id", T.StringType()),
            T.StructField("content", T.StringType()),
        ])
        good = json.dumps({
            "operationType": "insert",
            "clusterTime": {"$timestamp": {"t": 1, "i": 2}},
            "fullDocument": {"_id": "a", "content": "x"},
        })
        drop = json.dumps({
            "operationType": "drop",
            "clusterTime": {"$timestamp": {"t": 3, "i": 4}},
        })
        df = spark.createDataFrame([(good,), (drop,)], "value string")
        out = mongo_changestream_to_merge_source(
            df, doc_t, keep_corrupt=True
        ).collect()
        by_corrupt = {r["_corrupt_record"] is not None: r for r in out}
        bad, ok = by_corrupt[True], by_corrupt[False]
        assert bad["_lsn"] is None and bad["_tombstone"] is None
        assert bad["_id"] is None
        assert ok["_lsn"] == (1 << 32) + 2 and ok["_id"] == "a"


class TestSamplingNullKeys:
    def test_hash_split_null_key_gets_null_label(self, spark):
        from kafka_connect_plugins_spark.functions.sampling import hash_split

        df = spark.createDataFrame([("a",), (None,)], "k string")
        out = {r["k"]: r["s"] for r in df.select(
            "k", hash_split(F.col("k"),
                            {"train": 0.98, "val": 0.01, "test": 0.01}).alias("s")
        ).collect()}
        assert out["a"] in ("train", "val", "test")
        # pre-fix: every null-key row silently landed in the LAST (1%) split
        assert out[None] is None

    def test_deterministic_sample_null_key_is_false_not_null(self, spark):
        from kafka_connect_plugins_spark.functions.sampling import (
            deterministic_sample,
        )

        df = spark.createDataFrame([("a",), (None,)], "k string")
        rows = df.select(
            "k", deterministic_sample(F.col("k"), 0.5).alias("s")
        ).collect()
        by_k = {r["k"]: r["s"] for r in rows}
        assert by_k[None] is False  # not NULL: ~s must also see the row
        assert isinstance(by_k["a"], bool)


class TestBlankTextTokens:
    def test_ws_tokens_blank_is_empty(self, spark):
        from kafka_connect_plugins_spark.functions.text import (
            quality_features,
            ws_tokens,
        )

        df = spark.createDataFrame(
            [("", ), ("   ",), ("a  b",)], "text string"
        )
        toks = {r["text"]: r["t"] for r in df.select(
            "text", ws_tokens(F.col("text")).alias("t")).collect()}
        assert toks[""] == [] and toks["   "] == []
        assert toks["a  b"] == ["a", "b"]
        q = df.select("text", *[
            c.alias(n) for n, c in quality_features(F.col("text")).items()
        ]).collect()
        by_t = {r["text"]: r for r in q}
        # pre-fix: blank docs read n_tokens=1, uniq_ratio=1.0
        assert by_t[""]["n_tokens"] == 0 and by_t[""]["uniq_ratio"] == 0.0
        # mean token len from the tokens themselves, not separator math
        assert by_t["a  b"]["mean_token_len"] == 1.0


class TestOutboxPlaceholderEveryOccurrence:
    def test_replacement_substitutes_all(self, spark):
        from pyspark.sql import types as TT
        from kafka_connect_plugins_spark.operators.outbox_router import (
            OutboxEventRouter,
        )

        df = spark.createDataFrame(
            [((("order", "42", '{"x":1}'),))],
            TT.StructType([TT.StructField("value", TT.StructType([
                TT.StructField("aggregatetype", TT.StringType()),
                TT.StructField("aggregateid", TT.StringType()),
                TT.StructField("payload", TT.StringType()),
            ]))]),
        )
        r = OutboxEventRouter({
            "route.topic.replacement":
                "${routedByValue}.events.${routedByValue}",
        }).apply(df).collect()[0]
        # Debezium's EventRouter substitutes EVERY occurrence; pre-fix the
        # second stayed as the literal placeholder text
        assert r["topic"] == "order.events.order"
