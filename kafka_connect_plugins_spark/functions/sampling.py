"""Deterministic, engine-portable sampling and dataset-split assignment.

A training-data pipeline needs sampling that is (a) reproducible across
runs, (b) independent of partitioning/row order, and (c) auditable by a
different engine. ``df.sample()`` gives none of these (seeded per
partition, reshuffles change membership). These helpers derive membership
purely from a hash of the row's OWN key, so the same row lands in the same
split on any cluster size, any engine — Spark's ``md5`` and DuckDB's
``md5`` agree byte-for-byte, which is what lets the driver oracle-check
the split.

The hash is the first 8 hex digits of ``md5(cast(key as string))`` read as
a uniform draw in [0, 1): u = int(hex, 16) / 2^32. md5 is cryptographic,
so u is uniform and independent of key structure (sequential ids included)
— unlike ``xxhash64 % N`` folklore, this also survives adversarial key
patterns, and md5 exists in every SQL engine that might audit the split.

Map-only: a filter/projection on the scan, no shuffle, no RNG state. At
10^11 rows this is exactly as scalable as the scan itself, and the split
is stable under repartition/backfill/late data by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["hash_uniform", "deterministic_sample", "hash_split"]

_DENOM = float(2**32)


def hash_uniform(key: Column | str) -> Column:
    """Uniform [0, 1) draw derived deterministically from ``key``.

    ``conv`` parses the first 8 md5 hex digits as an unsigned 32-bit int;
    dividing by 2^32 yields a double with 32 uniform bits — plenty for
    split fractions down to ~1e-6.
    """
    col = F.col(key) if isinstance(key, str) else key
    hex8 = F.substring(F.md5(col.cast("string")), 1, 8)
    return F.conv(hex8, 16, 10).cast("double") / F.lit(_DENOM)


def deterministic_sample(key: Column | str, fraction: float) -> Column:
    """Boolean Column: row is in the ``fraction`` sample. Same rows selected
    on every engine, cluster size, and run.

    NULL keys are never sampled (``False``, not NULL — a three-valued
    NULL would silently vanish from both ``filter(c)`` and
    ``filter(~c)``). A row with no key has no stable identity to sample
    by; surface it, don't draw for it."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return F.coalesce(hash_uniform(key) < F.lit(fraction), F.lit(False))


def hash_split(
    key: Column | str,
    weights: dict[str, float],
) -> Column:
    """String Column assigning each row to one named split.

    ``weights`` maps label -> weight (normalized internally; iteration
    order defines the cumulative intervals, so pass an ordered dict —
    e.g. ``{"train": 0.98, "val": 0.01, "test": 0.01}``). Every NON-NULL
    key gets exactly one label; boundaries are half-open so splits are
    disjoint and exhaustive. NULL keys get a NULL label — hash(NULL) is
    NULL, and letting the when-chain's ``otherwise`` swallow it would
    silently dump every null-key row into the LAST (usually smallest,
    usually eval) split. Filter or impute null keys explicitly upstream.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError(f"weights must sum to > 0, got {total}")
    u = hash_uniform(key)
    labels = list(weights)
    expr: Column | None = None
    cum = 0.0
    for label in labels[:-1]:
        cum += weights[label] / total
        cond = u < F.lit(cum)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = F.lit(labels[-1])
    assigned = last if expr is None else expr.otherwise(last)
    return F.when(u.isNotNull(), assigned)
