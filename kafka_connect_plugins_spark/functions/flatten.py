"""Plan-time nested-payload flattening.

The reference flattens per record by recursive dispatch over the Connect
schema (RedShiftComplexDataTypeTransformer.kt:57-117 and
ClickHouseFlattenTransformer.kt:96-159), memoizing the source→target schema
translation in a 16-entry LRU (RedShiftComplexDataTypeTransformer.kt:35,
182-198). In Spark the same recursion runs ONCE, on the driver, over
``df.schema`` — producing a flat projection that whole-stage codegen executes
columnarly. The memoization cache is unnecessary: Catalyst resolves the plan
a single time.

Two modes, matching the two flatteners:

- ``redshift``: ARRAY and MAP values are serialized to canonical JSON strings;
  a null array renders as ``"[]"`` and a null map as ``"{}"``
  (RedShiftComplexDataTypeTransformer.kt:121-140). Every field forced
  nullable (:189).
- ``clickhouse``: ARRAY and MAP keep their native Spark types
  (ClickHouseFlattenTransformer.kt:116-132, 145-159).

Flattened names join the path with ``_`` (`body.email` → `body_email`,
RedShiftComplexDataTypeTransformer.kt:69-75). Field defaults (carried in our
schema registry or in StructField metadata under key ``"default"``) are
applied with ``coalesce`` — the Spark expression of the reference's
default-value propagation (:91-98, 155-157).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUPPORTED_LEAVES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.BooleanType,
    T.StringType,
    T.BinaryType,
)


class UnsupportedTypeError(TypeError):
    """Raised for types outside the reference's supported set.

    Mirrors the ``else -> DataException`` arm at
    RedShiftComplexDataTypeTransformer.kt:113-116 (DECIMAL / DATE / TIME /
    INTERVAL are deliberately unsupported).
    """


def _field_default(
    field: T.StructField,
    defaults: dict[str, Any],
    flat_name: str,
    parent_default: dict[str, Any] | None = None,
) -> Any:
    """Default for a leaf, by precedence: flat override > own metadata >
    the enclosing struct's default value for this field.

    The last arm is the reference's parent-struct default propagation
    (RedShiftComplexDataTypeTransformer.kt:91-98): when a missing nested
    field has no default of its own, its value comes from the parent
    struct's default (fixture employee-data.employees-value-v1.avsc:258-261,
    ``metadata.service`` -> "Default-Service").
    """
    if flat_name in defaults:
        return defaults[flat_name]
    meta = field.metadata or {}
    if meta.get("default") is not None:
        return meta["default"]
    if parent_default and field.name in parent_default:
        return parent_default[field.name]
    return None


def flatten_columns(
    value_type: T.StructType,
    mode: str = "redshift",
    value_col: str = "value",
    defaults: dict[str, Any] | None = None,
    sep: str = "_",
) -> list[Column]:
    """Build the flat projection for a payload struct.

    Returns one aliased Column per flattened leaf, in schema order (depth-first,
    matching the reference's recursive field order).
    """
    if mode not in ("redshift", "clickhouse"):
        raise ValueError(f"unknown flatten mode: {mode!r}")
    defaults = defaults or {}
    out: list[Column] = []
    _walk(
        F.col(value_col), value_type, prefix="", mode=mode, defaults=defaults,
        sep=sep, out=out, parent_default=None,
    )
    return out


def _walk(
    parent: Column,
    struct_type: T.StructType,
    prefix: str,
    mode: str,
    defaults: dict[str, Any],
    sep: str,
    out: list[Column],
    parent_default: dict[str, Any] | None = None,
) -> None:
    for field in struct_type.fields:
        flat_name = f"{prefix}{sep}{field.name}" if prefix else field.name
        col = parent.getField(field.name)
        dtype = field.dataType
        if isinstance(dtype, T.StructType):
            # A struct field's own default (a dict of per-child values) — or
            # its share of OUR parent's default — becomes the children's
            # parent_default (RedShiftComplexDataTypeTransformer.kt:91-98).
            meta = field.metadata or {}
            child_default = meta.get("default")
            if child_default is None and parent_default:
                child_default = parent_default.get(field.name)
            if not isinstance(child_default, dict):
                child_default = None
            _walk(col, dtype, flat_name, mode, defaults, sep, out, child_default)
        elif isinstance(dtype, T.ArrayType):
            if mode == "redshift":
                out.append(F.coalesce(F.to_json(col), F.lit("[]")).alias(flat_name))
            else:
                out.append(col.alias(flat_name))
        elif isinstance(dtype, T.MapType):
            if mode == "redshift":
                out.append(F.coalesce(F.to_json(col), F.lit("{}")).alias(flat_name))
            else:
                out.append(col.alias(flat_name))
        elif isinstance(dtype, _SUPPORTED_LEAVES):
            default = _field_default(field, defaults, flat_name, parent_default)
            if default is not None:
                col = F.coalesce(col, F.lit(default).cast(dtype))
            out.append(col.alias(flat_name))
        else:
            raise UnsupportedTypeError(
                f"field {flat_name!r}: type {dtype.simpleString()} is not supported "
                "(matching the reference's DataException for DECIMAL/DATE/TIME/INTERVAL)"
            )
