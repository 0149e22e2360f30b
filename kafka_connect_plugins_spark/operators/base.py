"""Stage abstraction: the Spark analogue of Connect's ``Transformation<R>``.

The reference's extension surface is the Transformation interface —
``configure(Map) / apply(record) -> record? / config() / close()`` — with
stages chained by declarative connector config
(/root/reference/README.md:26-31: ``"transforms": "A,B", "transforms.A.type":
<class>, "transforms.A.<prop>": ...``). Here a Stage is configured once on
the driver and ``apply`` maps a whole DataFrame to a DataFrame: record-at-a-
time dispatch becomes a plan fragment that Catalyst fuses into whole-stage
codegen. "Return null to drop the record" becomes a ``filter``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import DataFrame

from kafka_connect_plugins_spark.config import ConfigDef, ConfigException

_REGISTRY: dict[str, type["Stage"]] = {}


class Stage(ABC):
    """One transform stage over the change-event DataFrame."""

    config_def: ConfigDef = ConfigDef()

    def __init__(self, props: dict[str, Any] | None = None):
        self.config = self.config_def.parse(props)
        self.configure(self.config)

    def configure(self, config: dict[str, Any]) -> None:  # noqa: B027
        """Hook for subclasses; config is already validated/coerced."""

    @abstractmethod
    def apply(self, df: DataFrame) -> DataFrame:
        """Transform the stream. Must be a pure plan transformation."""

    def invalid_condition(self, df: DataFrame):
        """Predicate (Column) matching rows this stage would fail on, or None.

        The dead-letter contract: a stage that can raise on bad rows (the
        reference wraps such failures per record with payload-context logging
        — RedShiftComplexDataTypeTransformer.kt:47-55,
        JsonToHexTransformer.kt:63-71) declares the failure predicate here so
        :meth:`Pipeline.apply_with_dlq` can quarantine those rows instead of
        killing the task (Connect's ``errors.tolerance=all`` +
        ``errors.deadletterqueue.topic.name``).
        """
        return None

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        _REGISTRY[cls.__name__] = cls


def stage(name: str, props: dict[str, Any] | None = None) -> Stage:
    """Instantiate a registered stage by class name (Connect's ``type`` key)."""
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise ConfigException(f"Unknown stage type {name!r}; known: {sorted(_REGISTRY)}") from None
    return cls(props)


def registry() -> dict[str, type[Stage]]:
    return dict(_REGISTRY)


class Pipeline:
    """An ordered chain of stages, built from Connect-style flat config.

    ``from_connect_config`` accepts the reference's exact wire format::

        {"transforms": "unquote,tombstone",
         "transforms.unquote.type": "UnquoteRecordKey",
         "transforms.tombstone.type": "SoftDeleteToTombstone",
         "transforms.tombstone.field": "body.deleted_at"}
    """

    def __init__(self, stages: list[Stage]):
        self.stages = list(stages)

    @classmethod
    def from_connect_config(
        cls, props: dict[str, Any], providers: dict[str, Any] | None = None
    ) -> "Pipeline":
        from kafka_connect_plugins_spark.config import resolve_config_providers

        # Worker-side indirect-config resolution (${env:...}, ${file:...})
        # happens once, before any stage parses its keys — Connect's order.
        props = resolve_config_providers(props, providers)
        order = [s.strip() for s in str(props.get("transforms", "")).split(",") if s.strip()]
        stages: list[Stage] = []
        for alias in order:
            prefix = f"transforms.{alias}."
            sub = {
                k[len(prefix):]: v
                for k, v in props.items()
                if k.startswith(prefix) and k != f"{prefix}type"
            }
            type_name = props.get(f"{prefix}type")
            if not type_name:
                raise ConfigException(f"Missing 'transforms.{alias}.type'")
            stages.append(stage(str(type_name).rsplit(".", 1)[-1], sub))
        return cls(stages)

    def apply(self, df: DataFrame) -> DataFrame:
        for s in self.stages:
            df = s.apply(df)
        return df

    def apply_with_dlq(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Run the chain with Connect's ``errors.tolerance=all`` semantics.

        Returns ``(good, dead_letters)``. Before each stage runs, rows
        matching the stage's :meth:`Stage.invalid_condition` are diverted to
        the dead-letter DataFrame — each row exactly as the failing stage
        would have seen it, plus ``_dlq_stage`` (the failing stage's class
        name, Connect's ``__connect.errors.class`` header analogue). The
        chain itself then runs only on clean rows, so expression-level
        ``raise_error`` guards never fire.

        Plan shape: each diversion is a predicate filter fused into the scan
        (no shuffle added); the DLQ side is a union of filtered scans that
        only materializes if the caller writes it.
        """
        from pyspark.sql import functions as F

        df0 = df
        dlq_parts: list[DataFrame] = []
        for s in self.stages:
            cond = s.invalid_condition(df)
            if cond is not None:
                bad = F.coalesce(cond, F.lit(False))
                dlq_parts.append(
                    df.filter(bad).withColumn("_dlq_stage", F.lit(type(s).__name__))
                )
                df = df.filter(~bad)
            df = s.apply(df)
        if dlq_parts:
            dlq = dlq_parts[0]
            for part in dlq_parts[1:]:
                dlq = dlq.unionByName(part, allowMissingColumns=True)
        else:
            dlq = df0.filter(F.lit(False)).withColumn("_dlq_stage", F.lit(None).cast("string"))
        return df, dlq
