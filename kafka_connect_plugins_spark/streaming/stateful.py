"""Event-time windowed aggregation and custom stateful streaming operators.

The reference's SMT chain is stateless per record (SURVEY.md §2); everything
stateful in its deployments lives in the sinks. A Spark-native engine gets
two more tools, used here for the CDC stream's operational surface:

- **Watermarked windowed aggregation** (`windowed_event_counts`): per-topic
  event-time throughput, tolerating late events up to the watermark — the
  streaming analogue of the per-epoch lineage metrics, computed by Spark's
  own incremental state store rather than driver-side bookkeeping.
- **`applyInPandasWithState` custom stateful operator**
  (`streaming_lww_dedup`): per-key LSN high-watermark dedup across
  microbatches. The batch merge already tolerates replays (the epoch guard
  and LWW make them no-ops), but suppressing already-seen LSNs *upstream*
  keeps a replayed/poorly-deduplicated source (Kafka at-least-once
  redelivery) from paying full merge cost for stale events. State is one
  long per key, Arrow-batched per group — no per-row Python crossings.

Both are plan-level operators over the standard envelope; they compose with
the Stage chain like any other transformation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    timestamp_col: str = "timestamp",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) per-topic event counts with
    late-data tolerance.

    ``timestamp_col`` is the envelope's epoch-millis event time. Events later
    than the watermark are dropped by the state store (bounded state at
    100 TB: the store holds only open windows per topic; a sliding window
    multiplies state by window/slide). Works on batch DataFrames too
    (watermark is a no-op there), so the same query serves replay validation.
    """
    ts = (F.col(timestamp_col) / F.lit(1000.0)).cast("timestamp").alias("__ts")
    with_ts = events.select(F.col("topic"), ts)
    if events.isStreaming:
        with_ts = with_ts.withWatermark("__ts", watermark)
    win = (
        F.window(F.col("__ts"), window, slide) if slide else F.window(F.col("__ts"), window)
    )
    return (
        with_ts.groupBy(win.alias("window"), F.col("topic"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "topic",
            "n_events",
        )
    )


def session_event_counts(
    events: DataFrame,
    gap: str = "1 minute",
    watermark: str = "2 minutes",
    timestamp_col: str = "timestamp",
) -> DataFrame:
    """Event-time SESSION windows per topic: consecutive events closer than
    ``gap`` merge into one session; a quiet period of at least ``gap``
    closes it. The missing third window shape next to tumbling/sliding
    (``windowed_event_counts``) — the reference is stateless per record
    (README.md:5-23 lists only per-record SMTs), so sessionization is an
    engine addition for the activity-analytics queries a CDC tail feeds.

    ``F.session_window`` keys state by (topic, open session) — bounded by
    live sessions, not history, and the watermark evicts closed sessions in
    streaming mode (where Spark REQUIRES a watermark for session windows).
    Batch replay runs the identical plan minus the watermark, so the same
    function serves the oracle-gated validation query. Session end is
    ``last event + gap`` (Spark's convention: a session's interval is the
    union of per-event ``[ts, ts+gap)`` intervals, and TOUCHING intervals
    merge — a new session starts only when the inter-event gap STRICTLY
    exceeds ``gap``; verified at equality in tests).
    """
    ts = (F.col(timestamp_col) / F.lit(1000.0)).cast("timestamp").alias("__ts")
    with_ts = events.select(F.col("topic"), ts)
    if events.isStreaming:
        with_ts = with_ts.withWatermark("__ts", watermark)
    return (
        with_ts.groupBy(F.session_window(F.col("__ts"), gap).alias("session"), F.col("topic"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "topic",
            "n_events",
        )
    )


_STATE_SCHEMA = T.StructType([T.StructField("max_lsn", T.LongType())])


def streaming_lww_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    lsn_col: str = "offset",
    idle_ttl_ms: int | None = None,
) -> DataFrame:
    """Suppress events at-or-below each key's LSN high watermark.

    Custom stateful operator via ``applyInPandasWithState``: for every key
    group the state is ONE long (the highest LSN emitted so far); a
    microbatch's rows are sorted by LSN and only those strictly above the
    running watermark pass. Re-delivered and out-of-order-stale events are
    dropped *before* the merge scan pays for them.

    Semantics note: this is per-key *monotone LSN* dedup, not windowed
    dropDuplicates — state is O(keys) longs, never a set of seen IDs, so it
    holds at 10^9 keys (state store scales horizontally with shuffle
    partitions; checkpointed with the query).

    ``idle_ttl_ms`` bounds the state for UNBOUNDED key spaces (UUID keys,
    one-shot paths): a key idle for that long has its watermark dropped via
    processing-time timeout, so the store tracks only the working set
    instead of growing monotonically. Eviction is SAFE here, not lossy: an
    evicted key's next event passes unconditionally (its watermark is
    forgotten), and the downstream LWW merge — which orders on the LSN
    itself — is the correctness backstop for any stale event the filter no
    longer recognizes. The TTL therefore trades a little duplicate
    *suppression* (bandwidth), never correctness. Default ``None`` keeps
    watermarks forever — right for closed key sets like a repo table.

    The TTL needs a RECURRING trigger (``processingTime``/continuous):
    processing-time timeouts cannot fire under ``availableNow``/``once`` —
    measured on Spark 4.1: the engine keeps scheduling empty catch-up
    batches and the query never terminates. Leave ``idle_ttl_ms=None`` for
    drain-style runs.
    """
    keys = list(key_cols) if key_cols else ["key"]
    out_schema = events.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_ttl_ms is not None and state.hasTimedOut:
            # idle-key eviction: drop the watermark; emit nothing
            state.remove()
            return
        max_lsn = state.get[0] if state.exists else None
        for pdf in pdfs:
            # keep='last' drops in-chunk duplicate deliveries of the same
            # LSN — without it, copies arriving within one chunk all pass
            # (each is strictly above the PRIOR watermark), violating the
            # "suppress already-seen LSNs" contract when used standalone.
            pdf = pdf.sort_values(lsn_col, kind="stable").drop_duplicates(
                subset=[lsn_col], keep="last"
            )
            if max_lsn is not None:
                pdf = pdf[pdf[lsn_col] > max_lsn]
            if len(pdf):
                max_lsn = int(pdf[lsn_col].iloc[-1])
                yield pdf
        if max_lsn is not None:
            state.update((max_lsn,))
            if idle_ttl_ms is not None:
                # re-arm the idle clock on every batch that touches the key
                state.setTimeoutDuration(idle_ttl_ms)

    return events.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


__all__ = [
    "windowed_event_counts",
    "streaming_lww_dedup",
]
