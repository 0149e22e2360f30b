"""Interval (range) join: pair each left row with every right interval
that contains its timestamp — ``right.start <= left.ts < right.end`` —
without the nested-loop plan Spark falls back to for inequality joins.

Spark plans a raw ``ON key = key AND ts >= start AND ts < end`` join as
BroadcastNestedLoopJoin (fine only when one side broadcasts) or a sort-
merge join on the key alone with a post-filter — per-key quadratic when
keys are hot. The scale path here is TIME-BUCKETING, the same trick
streaming engines use for interval joins:

1. Each right interval is EXPLODED to the sequence of fixed-width buckets
   it overlaps (``sequence(bucket(start), bucket(end'), bucket_width)``,
   where ``end'`` is the last instant the half-open interval can touch).
2. Each left row carries its single bucket.
3. Equi-join on ``(key, bucket)`` — a plain hash shuffle — then refine
   with the exact range predicate.

No dedup pass is needed: a right interval appears once per bucket and a
left row owns exactly ONE bucket, so each qualifying (left, right) pair
meets exactly once — the refine filter is the last step, not a distinct.

Cost model: right-side amplification = ceil(interval span / bucket width)
+ 1, so ``bucket`` should be chosen near the TYPICAL interval length;
left side is never amplified. Both sides shuffle once on (key, bucket) —
at 10^11 rows the bucket dimension also spreads a hot key across
partitions, which the key-only sort-merge plan cannot do.

The reference has no joins at all (SURVEY §2.2); this and
``operators/asof_join.py`` are the two time-join shapes its downstream
analytical consumers (Redshift/ClickHouse per README.md:5,38) would run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _bucket_floor(col: Column, width: str) -> Column:
    """Start of the fixed ``width`` bucket containing ``col`` (epoch-aligned,
    same convention as F.window)."""
    return F.window(col, width).getField("start")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    *,
    bucket: str = "7 days",
    prefix: str = "r_",
) -> DataFrame:
    """Inner interval join (see module docstring). Output: all left columns
    plus every right column renamed ``{prefix}{col}``; one row per
    qualifying (left row, right interval) pair. Intervals are half-open
    ``[start, end)``; rows with NULL or inverted intervals match nothing.
    """
    iv = f"interval {bucket}"
    r_cols = [F.col(c).alias(f"{prefix}{c}") for c in right.columns]
    r = right.filter(
        F.col(right_start).isNotNull()
        & F.col(right_end).isNotNull()
        & (F.col(right_start) < F.col(right_end))
    ).select(
        F.col(right_on).alias("__k"),
        F.col(right_start).alias("__s"),
        F.col(right_end).alias("__e"),
        F.struct(*r_cols).alias("__r"),
    )
    # Last bucket the half-open interval can touch: the one holding the
    # greatest instant < end. Microsecond resolution makes "end - 1us"
    # exact for timestamp columns (Spark timestamps ARE microseconds).
    r = r.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                _bucket_floor(F.col("__s"), bucket),
                _bucket_floor(F.col("__e") - F.expr("interval 1 microsecond"), bucket),
                F.expr(iv),
            )
        ),
    )
    l = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__t"),
        _bucket_floor(F.col(left_ts), bucket).alias("__bkt"),
    )
    joined = l.join(r, ["__k", "__bkt"]).filter(
        (F.col("__t") >= F.col("__s")) & (F.col("__t") < F.col("__e"))
    )
    sel = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    sel += [F.col(f"__r.{prefix}{c}").alias(f"{prefix}{c}") for c in right.columns]
    return joined.select(*sel)
