"""Field redaction / drop / masking over the record value.

The RedactFields-equivalent stage: the reference's reshaping transforms
redact by projection (SlackIntegrationPayloadTransformer.kt:116-128 emits a
fixed 8-field schema, silently dropping everything else in the source
document); Kafka Connect's public built-ins (ReplaceField's exclude-list,
MaskField's null/literal masking) define the generic contract. Here the
stage rewrites the nested ``value`` struct at PLAN TIME with
``Column.dropFields`` / ``withField`` — a pure projection that Catalyst
fuses into the scan; no per-row Python, no shuffle.

Modes per configured dot path:

- ``drop``  — remove the field from the struct (ReplaceField exclude)
- ``null``  — keep the field, null its value (MaskField with null)
- ``hash``  — replace a string field with its sha256 hex (pseudonymization:
  equal inputs stay joinable, raw PII never lands in the lake)
- ``fixed`` — replace with a fixed literal (MaskField with replacement)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_plugins_spark.config import ConfigDef, ConfigException
from kafka_connect_plugins_spark.functions.paths import dot_path_col, dot_path_exists
from kafka_connect_plugins_spark.operators.base import Stage

_MODES = ("drop", "null", "hash", "fixed")


def _path_type(df: DataFrame, root: str, path: str) -> T.DataType:
    dtype: T.DataType = df.schema[root].dataType
    for part in path.split("."):
        dtype = dtype[part].dataType  # type: ignore[index]
    return dtype


class RedactFields(Stage):
    """Drop / null / hash / fixed-mask fields at dot paths inside ``value``."""

    config_def = (
        ConfigDef()
        .define("fields", str, "comma-separated dot paths to redact")
        .define("mode", str, "drop | null | hash | fixed", default="drop")
        .define("replacement", str, "literal for mode=fixed", default="***")
        .define("value.column", str, "column holding the record value", default="value")
    )

    def configure(self, config: dict[str, Any]) -> None:
        self.fields = [f.strip() for f in config["fields"].split(",") if f.strip()]
        if not self.fields:
            raise ConfigException("'fields' must name at least one dot path")
        self.mode = config["mode"]
        if self.mode not in _MODES:
            raise ConfigException(f"'mode' must be one of {_MODES}, got {self.mode!r}")
        self.replacement = config["replacement"]
        self.value_column = config["value.column"]

    def _masked(self, df: DataFrame, path: str) -> Column:
        current = dot_path_col(self.value_column, path)
        if self.mode == "null":
            return F.lit(None).cast(_path_type(df, self.value_column, path))
        if self.mode == "hash":
            return F.when(current.isNotNull(), F.sha2(current.cast("string"), 256))
        return F.when(current.isNotNull(), F.lit(self.replacement))  # fixed

    def apply(self, df: DataFrame) -> DataFrame:
        value = F.col(self.value_column)
        rewritten = value
        for path in self.fields:
            # Missing paths are a no-op, matching the reference's tolerant
            # extract-and-skip posture (SoftDeleteToTombstoneTransformer.kt:49-55).
            if not dot_path_exists(df, self.value_column, path):
                continue
            if self.mode == "drop":
                rewritten = rewritten.dropFields(path)
            else:
                rewritten = rewritten.withField(path, self._masked(df, path))
        # Tombstones (null value) stay null: withField/dropFields on a null
        # struct yields null, so no special-casing is needed.
        return df.withColumn(self.value_column, rewritten)
