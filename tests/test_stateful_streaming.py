"""Watermarked windowed aggregation + applyInPandasWithState LSN dedup.

SURVEY.md maps the reference's stateless SMT chain onto Spark; these two
operators cover the stateful-streaming half of the engine's surface:
windowed event-time aggregation with late-data tolerance, and a custom
stateful operator whose per-key state survives across microbatches via the
checkpointed state store.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import types as T

from kafka_connect_plugins_spark.envelope import envelope_schema
from kafka_connect_plugins_spark.streaming.stateful import (
    streaming_lww_dedup,
    windowed_event_counts,
)

VAL_T = T.StructType([T.StructField("x", T.LongType())])


def _env_rows(spark, rows):
    # (topic, partition, offset, ts_ms, key, headers, value)
    return spark.createDataFrame(rows, envelope_schema(VAL_T))


class TestWindowedCounts:
    def test_batch_tumbling_counts(self, spark):
        base = 1_700_000_000_000
        rows = [
            ("a", 0, 1, base + 10_000, "k", None, (1,)),
            ("a", 0, 2, base + 50_000, "k", None, (2,)),
            ("a", 0, 3, base + 70_000, "k", None, (3,)),  # second window
            ("b", 0, 4, base + 20_000, "k", None, (4,)),
        ]
        out = windowed_event_counts(_env_rows(spark, rows), window="1 minute")
        got = {(r["topic"], r["window_start"].second + r["window_start"].minute * 60): r["n_events"]
               for r in out.collect()}
        counts = sorted(
            (r["topic"], r["n_events"]) for r in out.collect()
        )
        assert counts == [("a", 1), ("a", 2), ("b", 1)]
        assert len(got) == 3

    def test_streaming_drops_late_beyond_watermark(self, spark, tmp_path):
        """Two microbatches through a real stream: a row older than the
        watermark after batch 1's max event time must not create/extend a
        window in batch 2's output."""
        base = 1_700_000_000_000
        src = str(tmp_path / "src")
        out_rows = []

        def sink(df, epoch):
            out_rows.extend(df.collect())

        b1 = [("a", 0, 1, base + 10_000, "k", None, (1,)),
              ("a", 0, 2, base + 600_000, "k", None, (2,))]  # advances watermark to ~8min
        _env_rows(spark, b1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(envelope_schema(VAL_T)).parquet(src)
        counts = windowed_event_counts(stream, window="1 minute", watermark="2 minutes")
        q = (counts.writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

        # batch 2: one fresh row + one very late row (inside batch-1's first window)
        b2 = [("a", 0, 3, base + 660_000, "k", None, (3,)),
              ("a", 0, 4, base + 20_000, "k", None, (4,))]  # LATE: watermark has passed
        _env_rows(spark, b2).write.mode("append").parquet(src)
        q = (counts.writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

        # Append mode emits only windows finalized below the watermark; the
        # late offset-4 row must not appear anywhere.
        total = sum(r["n_events"] for r in out_rows)
        assert total <= 3  # never counts the late row
        windows = {(r["window_start"], r["n_events"]) for r in out_rows}
        # the base+10s window closed with exactly 1 event (late row excluded)
        assert any(n == 1 for _w, n in windows)


class TestStreamingLwwDedup:
    def test_state_survives_across_microbatches(self, spark, tmp_path):
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        seen = []

        def sink(df, epoch):
            seen.extend((r["key"], r["offset"]) for r in df.collect())

        def run():
            stream = spark.readStream.schema(envelope_schema(VAL_T)).parquet(src)
            dd = streaming_lww_dedup(stream, key_cols=["key"], lsn_col="offset")
            q = (dd.writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(180)
            assert q.exception() is None

        b1 = [("t", 0, 5, 1, "k1", None, (1,)),
              ("t", 0, 3, 2, "k1", None, (2,)),   # stale within batch (sorted: 3 then 5 -> both emit? no: sorted asc -> 3 emits then 5 emits)
              ("t", 0, 7, 3, "k2", None, (3,))]
        _env_rows(spark, b1).write.mode("append").parquet(src)
        run()
        first = sorted(seen)
        # within-batch: sorted by LSN, both 3 and 5 pass for k1 (monotone)
        assert first == [("k1", 3), ("k1", 5), ("k2", 7)]

        seen.clear()
        b2 = [("t", 0, 5, 4, "k1", None, (4,)),   # replay of LSN 5 -> dropped by STATE
              ("t", 0, 4, 5, "k1", None, (5,)),   # stale vs state watermark 5 -> dropped
              ("t", 0, 9, 6, "k1", None, (6,)),   # fresh -> emitted
              ("t", 0, 7, 7, "k2", None, (7,))]   # replay -> dropped
        _env_rows(spark, b2).write.mode("append").parquet(src)
        run()
        assert sorted(seen) == [("k1", 9)]


class TestSessionCounts:
    def test_batch_sessionization(self, spark):
        from kafka_connect_plugins_spark.streaming.stateful import session_event_counts

        base = 1_700_000_000_000
        rows = [
            # topic a: 3 events within 60s gaps -> ONE session...
            ("a", 0, 1, base, "k", None, (1,)),
            ("a", 0, 2, base + 50_000, "k", None, (2,)),
            ("a", 0, 3, base + 100_000, "k", None, (3,)),
            # ...a gap of EXACTLY 60s: touching [ts, ts+gap) intervals
            # merge, so this still extends the same session...
            ("a", 0, 4, base + 160_000, "k", None, (4,)),
            # ...and a gap strictly over 60s finally closes it
            ("a", 0, 5, base + 220_001, "k", None, (5,)),
            # topic b: one lone event -> singleton session
            ("b", 0, 6, base + 10_000, "k", None, (6,)),
        ]
        out = session_event_counts(_env_rows(spark, rows), gap="1 minute")
        got = sorted(
            (r["topic"], r["n_events"],
             int(r["session_end"].timestamp() - r["session_start"].timestamp()))
            for r in out.collect()
        )
        # session interval = union of [ts, ts+gap): the 4-event session
        # spans 160s of events + 60s gap = 220s; singletons span the gap
        assert got == [("a", 1, 60), ("a", 4, 220), ("b", 1, 60)]

    def test_streaming_matches_batch(self, spark, tmp_path):
        """availableNow replay through a real stream (session windows REQUIRE
        a watermark in streaming mode) collapses to the same session set the
        batch path computes once all sessions close below the watermark."""
        from kafka_connect_plugins_spark.streaming.stateful import session_event_counts

        base = 1_700_000_000_000
        rows = [
            ("a", 0, 1, base, "k", None, (1,)),
            ("a", 0, 2, base + 30_000, "k", None, (2,)),
            ("a", 0, 3, base + 200_000, "k", None, (3,)),  # new session
            # sentinel far in the future: pushes the watermark past every
            # real session so append mode emits them all
            ("z", 0, 9, base + 10_000_000, "k", None, (9,)),
        ]
        batch = {
            (r["topic"], r["session_start"], r["n_events"])
            for r in session_event_counts(_env_rows(spark, rows), gap="1 minute").collect()
        }
        src = str(tmp_path / "src")
        _env_rows(spark, rows).write.parquet(src)
        stream = spark.readStream.schema(envelope_schema(VAL_T)).parquet(src)
        out_rows = []
        q = (session_event_counts(stream, gap="1 minute", watermark="2 minutes")
             .writeStream.foreachBatch(lambda df, _e: out_rows.extend(df.collect()))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        streamed = {(r["topic"], r["session_start"], r["n_events"]) for r in out_rows}
        # every session closed below the sentinel-advanced watermark matches
        assert streamed <= batch
        assert {(t, n) for t, _s, n in streamed} >= {("a", 2), ("a", 1)}
