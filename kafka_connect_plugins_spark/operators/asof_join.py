"""Point-in-time (as-of) join: each left row picks the single most recent
right row at-or-before its timestamp (``direction="backward"``), or the
earliest at-or-after it (``"forward"``).

The reference's pipelines resolve "what did this entity look like when the
event happened?" by relying on the sink's upsert-by-key (latest state only
— ClickHouseFlattenTransformer.kt:46-57 ``is_deleted`` + ReplacingMergeTree
design); an analytics engine needs the time-correct generalization, which
Spark has no built-in operator for. This is the composition path (a) from
the design rules: declarative union + window, no UDFs, no per-row Python.

Physical strategy — ``asof_join`` (simple):

1. Tag left rows 1 and right rows 0, project both onto a common shape
   ``(key, ts, tag, payload: struct | null, left: struct | null)``.
2. One shuffle: ``Window.partitionBy(key).orderBy(ts, tag[, tiebreak])``
   with ``last(payload, ignorenulls=True)`` over UNBOUNDED PRECEDING —
   every left row carries forward the latest right payload at-or-before
   it (right rows sort before left rows at equal ``ts``, so an exact-tie
   right row IS visible to the left row, matching DuckDB/pandas
   ``merge_asof(allow_exact_matches=True)``).
3. Keep tag-1 rows; ``how="inner"`` drops carries that are NULL,
   ``how="left"`` keeps them as NULL columns.

Cost: ONE hash shuffle of left+right on the key (plus in-partition sort) —
no join explosion, no range cross-product. The known failure mode at 10^11
rows is KEY SKEW: one hot key becomes one task's sort. ``asof_join_bucketed``
is the skew path: it windows within ``(key, time_bucket)`` partitions —
bounded task size regardless of key heat — and carries state across bucket
boundaries with a narrow per-(key, bucket) seed pass (last right payload per
bucket, cumulatively carried by a window over the tiny key×bucket table,
then injected as a synthetic pre-dawn row into each bucket's partition).
Two shuffles on (key, bucket) + one narrow window on key.

Determinism: if the right side can hold several rows at the same
``(key, ts)``, pass ``tiebreak=`` (backward keeps the greatest tiebreak,
forward the smallest) or pre-dedup — otherwise the winner is whatever row
the sort visits last.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_bucketed"]


def _common_shape(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str | None,
):
    """Project both sides onto the union shape; returns (unioned, payload_t)."""
    payload_cols = [c for c in right.columns]
    right_payload = F.struct(*[F.col(c) for c in payload_cols])
    payload_t = right.select(right_payload.alias("p")).schema["p"].dataType
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    left_t = left.select(left_struct.alias("l")).schema["l"].dataType

    # The tiebreak orders RIGHT rows among themselves at an equal
    # (key, ts) — left rows never compete on it (their relative order
    # within the tag-1 group cannot change which right payload each one
    # carries), so the left side contributes a NULL placeholder OF THE
    # RIGHT COLUMN'S OWN TYPE. Casting to double here would silently
    # break the determinism guarantee the parameter exists for: long
    # LSNs above 2^53 collapse to one double, and a string tiebreak
    # casts to NULL for every row, disabling it with no error.
    if tiebreak:
        tb_t = right.schema[tiebreak].dataType
        tb_col_r = F.col(tiebreak)
    else:
        tb_t = "int"
        tb_col_r = F.lit(0)
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        tb_col_r.alias("__tb"),
        right_payload.alias("__payload"),
        F.lit(None).cast(left_t).alias("__left"),
    )
    l = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(tb_t).alias("__tb"),
        F.lit(None).cast(payload_t).alias("__payload"),
        left_struct.alias("__left"),
    )
    return r.unionByName(l), payload_t


def _emit(
    carried: DataFrame,
    left_cols: list[str],
    right: DataFrame,
    prefix: str,
    how: str,
) -> DataFrame:
    out = carried.filter(F.col("__tag") == 1)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    sel: list[Column] = [F.col(f"__left.{c}").alias(c) for c in left_cols]
    sel += [F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right.columns]
    return out.select(*sel)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    how: str = "left",
    tiebreak: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """As-of join; one shuffle on the key. See module docstring.

    Output: all ``left`` columns, plus every ``right`` column renamed
    ``{prefix}{col}`` (NULL where unmatched and ``how="left"``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    unioned, _ = _common_shape(
        left, right, left_on, right_on, left_ts, right_ts, tiebreak
    )
    if direction == "backward":
        order = [F.asc("__t"), F.asc("__tag"), F.asc("__tb")]
    else:  # traverse from the future: the last right row seen at-or-after
        # a left row is the nearest one; among ts-ties the SMALLEST tiebreak
        order = [F.desc("__t"), F.asc("__tag"), F.desc("__tb")]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    return _emit(carried, left.columns, right, prefix, how)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    *,
    bucket: str = "30 days",
    how: str = "left",
    tiebreak: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Skew-resistant backward as-of join: window within ``(key, bucket)``
    so no single task ever sorts more than one key×bucket of rows, with a
    narrow cross-bucket seed carry. Semantically identical to
    ``asof_join(direction="backward")`` (property-tested).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    unioned, _ = _common_shape(
        left, right, left_on, right_on, left_ts, right_ts, tiebreak
    )
    b = F.window("__t", bucket).getField("start").alias("__b")
    unioned = unioned.withColumn("__b", b)

    # Narrow pass: last right payload of every (key, bucket) — grouped over
    # BOTH sides so buckets holding only left rows still get a seed row
    # (their __last is NULL and the cumulative window below carries the
    # previous buckets' payload across the gap). The partial agg collapses
    # each bucket map-side, so this shuffle moves ~one row per touched
    # (key, bucket); the window then runs over that TINY key×bucket table.
    # max_by orders ONLY on (ts, tiebreak) — the payload stays out of the
    # comparison, so unorderable payload columns (maps) work here exactly
    # as they do in the unbucketed path; ties beyond (ts, tiebreak) are
    # left to aggregation order on both paths. max_by skips rows whose
    # ordering key is NULL, which is what the tag filter produces.
    per_bucket = unioned.groupBy("__k", "__b").agg(
        F.max_by(
            F.col("__payload"),
            F.when(F.col("__tag") == 0, F.struct("__t", "__tb")),
        ).alias("__last")
    )
    wk = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        per_bucket.withColumn("__seed", F.last("__last", ignorenulls=True).over(wk))
        .filter(F.col("__seed").isNotNull())
        .select(
            "__k",
            "__b",
            F.lit(0).alias("__tag"),
            # seeds sort first on NULL __t0 regardless; the placeholder
            # only has to match the union type of the raw tiebreak column
            F.lit(None).cast(unioned.schema["__tb"].dataType).alias("__tb"),
            F.col("__seed").alias("__payload"),
            F.lit(None).cast(unioned.schema["__left"].dataType).alias("__left"),
            F.lit(None).cast("timestamp").alias("__t0"),
        )
    )
    # Seed rows sort before everything in their bucket (NULLS FIRST on ts).
    seeded = unioned.select(
        "__k", "__b", "__tag", "__tb", "__payload", "__left",
        F.col("__t").alias("__t0"),
    ).unionByName(seeds)
    wb = (
        Window.partitionBy("__k", "__b")
        .orderBy(F.asc_nulls_first("__t0"), F.asc("__tag"), F.asc("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = seeded.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(wb)
    )
    return _emit(carried, left.columns, right, prefix, how)
