"""Avro-style schema-evolution registry for change streams.

The reference resolves schema evolution implicitly: a new value schema is an
LRU-cache miss that rebuilds the target schema (RedShiftComplexDataType
Transformer.kt:35,182-198), and its v1/v2 fixtures resolve by union-by-field-
presence with defaults (metadata_service -> "Default-Service" when absent,
RedShiftComplexDataTypeTransformerTest.kt:105; SURVEY.md §1.3). This module
makes that policy explicit and durable: a per-stream, versioned registry of
StructType schemas with Avro resolution rules —

- **add-only widening**: new fields register as nullable additions; removing
  a field never shrinks the registered schema (old readers keep working)
- **type stability**: changing a field's type is incompatible and raises
- **defaults**: per-field default values (the Connect ``Schema`` default
  slot, which Spark's StructField lacks) applied at materialization via
  ``coalesce``

:class:`~kafka_connect_plugins_spark.plans.lake_table.LakeTable` enforces the
same rules on the TABLE side at merge time; the registry is the STREAM-side
contract, letting producers validate compatibility before any data moves
(Iceberg's ``ALTER TABLE ADD COLUMN`` happens at registration, not mid-merge).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_plugins_spark.plans.lake_table import SchemaEvolutionError


@dataclass(frozen=True)
class RegisteredSchema:
    stream: str
    version: int
    schema: T.StructType
    defaults: dict[str, Any]


class SchemaRegistry:
    """File-backed registry: one JSON document per (stream, version)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------------
    def _stream_dir(self, stream: str) -> str:
        return os.path.join(self.root, stream.replace("/", "__"))

    def versions(self, stream: str) -> list[int]:
        d = self._stream_dir(stream)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(name[1:-5]) for name in os.listdir(d) if name.startswith("v") and name.endswith(".json")
        )

    def latest(self, stream: str) -> RegisteredSchema | None:
        vs = self.versions(stream)
        return self.get(stream, vs[-1]) if vs else None

    def get(self, stream: str, version: int) -> RegisteredSchema:
        with open(os.path.join(self._stream_dir(stream), f"v{version}.json")) as f:
            doc = json.load(f)
        return RegisteredSchema(
            stream=stream,
            version=version,
            schema=T.StructType.fromJson(doc["schema"]),
            defaults=doc.get("defaults", {}),
        )

    # ------------------------------------------------------------------
    def check_compatible(
        self, current: T.StructType | None, incoming: T.StructType
    ) -> list[str]:
        """Avro-resolution check; returns newly added field names or raises."""
        if current is None:
            return [f.name for f in incoming.fields]
        by_name = {f.name: f for f in current.fields}
        added = []
        for f in incoming.fields:
            if f.name in by_name:
                if by_name[f.name].dataType != f.dataType:
                    raise SchemaEvolutionError(
                        f"stream field {f.name!r}: registered "
                        f"{by_name[f.name].dataType.simpleString()}, incoming "
                        f"{f.dataType.simpleString()} — only additive evolution is allowed"
                    )
            else:
                added.append(f.name)
        return added

    def register(
        self,
        stream: str,
        incoming: T.StructType,
        defaults: dict[str, Any] | None = None,
    ) -> RegisteredSchema:
        """Register (or widen) a stream schema; idempotent on no change."""
        latest = self.latest(stream)
        current = latest.schema if latest else None
        added = self.check_compatible(current, incoming)
        merged_defaults = {**(latest.defaults if latest else {}), **(defaults or {})}
        if latest and not added and merged_defaults == latest.defaults:
            return latest  # no evolution — same version (the LRU-hit path)
        fields = list(current.fields) if current else []
        names = {f.name for f in fields}
        for f in incoming.fields:
            if f.name not in names:
                # Avro add-only: new fields land nullable regardless of source
                fields.append(T.StructField(f.name, f.dataType, True, f.metadata))
        version = (latest.version + 1) if latest else 1
        doc = {
            "stream": stream,
            "version": version,
            "schema": json.loads(T.StructType(fields).json()),
            "defaults": merged_defaults,
        }
        d = self._stream_dir(stream)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"v{version}.json"), "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        return self.get(stream, version)

    # ------------------------------------------------------------------
    def conform(self, df: DataFrame, registered: RegisteredSchema) -> DataFrame:
        """Project ``df`` to the registered schema: missing fields become
        their default (or null), extra columns are preserved after the
        registered ones (they are what the NEXT register() will widen with).

        Pure projection — Catalyst prunes and fuses it; nothing moves.
        """
        cols = []
        for f in registered.schema.fields:
            if f.name in df.columns:
                c = F.col(f.name)
                if f.name in registered.defaults:
                    c = F.coalesce(c, F.lit(registered.defaults[f.name]).cast(f.dataType))
                cols.append(c.alias(f.name))
            else:
                default = registered.defaults.get(f.name)
                cols.append(F.lit(default).cast(f.dataType).alias(f.name))
        known = {f.name for f in registered.schema.fields}
        cols += [F.col(c) for c in df.columns if c not in known]
        return df.select(*cols)
