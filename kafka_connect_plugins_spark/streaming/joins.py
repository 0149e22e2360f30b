"""Watermarked stream-stream joins (Structured Streaming).

The reference's sink-side transforms never join two live streams — that
work happens downstream in the warehouse (`/root/reference/README.md:58`).
A Spark-native CDC engine can do it in-flight: Structured Streaming's
stream-stream join keeps both sides' unmatched rows in state and, given a
watermark on each side plus an event-time bound relating them, evicts
state as the watermarks advance — so state stays O(join-window × rate),
never O(stream history). Without BOTH constraints Spark either refuses the
join (outer) or keeps state forever (inner) — this wrapper makes the safe
shape the only expressible one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    watermark: str = "10 minutes",
    lower: str = "0 seconds",
    upper: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on ``keys`` with a bounded time window.

    A right row matches a left row when ``right_time`` lies in
    ``[left_time + lower, left_time + upper]``. Both sides get a
    ``watermark`` delay; with the interval bound this lets the engine drop
    buffered rows once they can no longer match (state eviction), which is
    what makes the join runnable indefinitely. ``how`` may be ``inner``,
    ``leftOuter``, or ``rightOuter`` (outer joins REQUIRE exactly this
    watermark+bound shape — Spark rejects them otherwise).

    Output columns: keys + left non-key columns + right non-key columns
    (right's renamed with a ``right_`` prefix on collision). One shuffle
    per side on the keys; co-partition upstream if both sources are
    already keyed.
    """
    if how not in ("inner", "leftOuter", "rightOuter"):
        raise ValueError(f"unsupported join type {how!r}")
    if left_time not in left.columns or right_time not in right.columns:
        raise ValueError("time columns must exist on their own side")
    l_cols = set(left.columns)
    renames = {
        c: f"right_{c}" for c in right.columns if c in l_cols and c not in keys
    }
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_time = renames.get(right_time, right_time)
    lw = left.withWatermark(left_time, watermark)
    rw = r.withWatermark(r_time, watermark)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (lw[k] == rw[k])
    cond = (
        cond
        & (rw[r_time] >= F.expr(f"{left_time} + interval {lower}"))
        & (rw[r_time] <= F.expr(f"{left_time} + interval {upper}"))
    )
    joined = lw.join(rw, on=cond, how=how)
    # One key column per name, NULL-proof for outer joins: an unmatched
    # right row under rightOuter carries its key only in rw[k] (lw[k] is
    # NULL), so dropping the right copy would emit a keyless row — coalesce
    # the two sides instead (equal whenever both matched).
    return joined.select(
        *[F.coalesce(lw[k], rw[k]).alias(k) for k in keys],
        *[lw[c] for c in left.columns if c not in keys],
        *[rw[c] for c in r.columns if c not in keys],
    )
