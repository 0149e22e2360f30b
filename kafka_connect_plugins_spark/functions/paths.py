"""Dot-notation nested-field access.

Reference: ``SoftDeleteToTombstoneTransformer.kt:49-55`` resolves a
``a.b.c`` path by walking nested Structs, returning null if any intermediate
struct is null/absent. Spark's nested column access has exactly these
null-propagation semantics, so the walk happens at plan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_path_col(root: str, path: str) -> Column:
    """Column for ``root.path.to.field``; null-safe through nested structs."""
    col = F.col(root)
    for part in path.split("."):
        col = col.getField(part)
    return col


def dot_path_type(df: DataFrame, root: str, path: str) -> T.DataType | None:
    """Plan-time type of ``root.path.to.field`` in ``df``'s schema, or
    ``None`` where the path does not resolve — the ONE schema walk that
    both the exists-check and type lookups build on."""
    try:
        dtype: T.DataType = df.schema[root].dataType
    except KeyError:
        return None
    for part in path.split("."):
        if not isinstance(dtype, T.StructType) or part not in dtype.fieldNames():
            return None
        dtype = dtype[part].dataType
    return dtype


def dot_path_exists(df: DataFrame, root: str, path: str) -> bool:
    """Plan-time check that the dot path resolves in ``df``'s schema."""
    return dot_path_type(df, root, path) is not None
