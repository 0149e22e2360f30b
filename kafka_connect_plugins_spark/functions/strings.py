"""String primitives with reference-exact semantics."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unquote_both_ends(col: Column) -> Column:
    """Strip exactly one pair of surrounding double quotes from a string.

    Reference: ``UnquoteRecordKey.kt:25`` uses Kotlin ``removeSurrounding("\"")``
    — the quote is removed only when it is present at BOTH ends and the string
    is at least 2 chars long; a single leading or trailing quote is preserved
    (UnquoteRecordKeyTest.kt:66-98). A naive ``regexp_replace('^"|"$', '')``
    would wrongly strip lone quotes, so this is expressed as a guarded
    substring. ``startswith``/``endswith`` (UTF8String prefix checks) replace
    the equivalent ``rlike`` — this runs per record on the CDC hot path and
    a JVM regex Matcher showed up at ~16% of epoch CPU in thread-dump
    profiles.
    """
    is_surrounded = (
        (F.length(col) >= 2) & col.startswith('"') & col.endswith('"')
    )
    stripped = col.substr(F.lit(2), F.length(col) - 2)
    return F.when(is_surrounded, stripped).otherwise(col)


def hex_of_utf8(col: Column) -> Column:
    """Lowercase hex encoding of the UTF-8 bytes of a string.

    Reference: ``JsonToHexTransformer.kt:76-79`` formats each byte as "%02x"
    (lowercase). Spark's ``hex`` yields uppercase, hence the ``lower``.
    """
    return F.lower(F.hex(col.cast("binary")))


def stringify_any(col: Column, dtype=None) -> Column:
    """Serialize a record key of ANY type into a string.

    Reference: ``RedShiftComplexDataTypeTransformer.kt:206-208`` stringifies
    whatever key the record carries into ``topic_key``. For Spark types:
    strings pass through, complex types (struct/map/array — Debezium-style
    composite keys) render as canonical JSON, binary as lowercase hex, and
    scalars via ``cast(string)``. Pass the column's ``DataType`` to pick the
    serialization at plan time.
    """
    from pyspark.sql import types as T

    if isinstance(dtype, (T.StructType, T.MapType, T.ArrayType)):
        return F.to_json(col)
    if isinstance(dtype, T.BinaryType):
        return F.lower(F.hex(col))
    return col.cast("string")
