"""Plan-time parallelism guard for compute-heavy map stages.

A parquet scan partitions by bytes (``spark.sql.files.maxPartitionBytes``),
which is right when cost ∝ bytes. The heavy per-row operators here (sha2
shingling, simhash bit-majority, cosine math, Arrow-batched feature UDFs)
cost orders of magnitude more CPU per byte than a scan, so a small file —
one row group, one task — serializes the whole job. ``spread`` widens such
inputs to the session's default parallelism *only when the scan is narrower
than that*; at production scale (thousands of input splits) the condition is
false and no shuffle is added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    ``defaultParallelism``) iff its current plan yields fewer partitions.

    The check happens once at plan time on the driver; the repartition is a
    round-robin exchange of the (small, by precondition) input — cents of
    shuffle to unlock full-cluster compute on the stages above it.

    Batch-only probe: ``.rdd`` cannot be evaluated on a streaming DataFrame
    (and reports the pre-AQE count for shuffle-fed inputs), so streaming
    inputs pass through unchanged — micro-batch parallelism is governed by
    the source's own partitioning (e.g. Kafka topic partitions).
    """
    if df.isStreaming:
        return df
    # `is None`, not truthiness: an explicit min_partitions=0 means "no
    # minimum" and must stay a no-op, not fall through to the default
    target = int(
        df.sparkSession.sparkContext.defaultParallelism
        if min_partitions is None
        else min_partitions
    )
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
