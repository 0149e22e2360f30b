"""Declarative stage configuration, mirroring Kafka Connect's ``ConfigDef``.

The reference configures each transform once via ``configure(Map<String,?>)``
(e.g. /root/reference/src/main/kotlin/com/cultureamp/kafka/connect/plugins/
transforms/ModifyPartition.kt:15-26 defines a ConfigDef with required
``header.key`` and ``number.partitions`` and parses it through SimpleConfig).
We keep the same declarative surface: a ``ConfigDef`` of typed, documented
keys, validated once on the driver when the stage is built — never per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


class ConfigException(ValueError):
    """Invalid or missing stage configuration (mirrors Connect's ConfigException)."""


_UNSET = object()


@dataclass(frozen=True)
class ConfigKey:
    name: str
    type: type
    doc: str = ""
    default: Any = _UNSET

    @property
    def required(self) -> bool:
        return self.default is _UNSET


@dataclass
class ConfigDef:
    keys: list[ConfigKey] = field(default_factory=list)

    def define(self, name: str, type_: type, doc: str = "", default: Any = _UNSET) -> "ConfigDef":
        self.keys.append(ConfigKey(name, type_, doc, default))
        return self

    def parse(self, props: dict[str, Any] | None) -> dict[str, Any]:
        props = dict(props or {})
        out: dict[str, Any] = {}
        for key in self.keys:
            if key.name in props:
                raw = props.pop(key.name)
                out[key.name] = _coerce(key, raw)
            elif key.required:
                raise ConfigException(f"Missing required configuration '{key.name}'")
            else:
                out[key.name] = key.default
        if props:
            unknown = ", ".join(sorted(props))
            raise ConfigException(f"Unknown configuration key(s): {unknown}")
        return out


def _coerce(key: ConfigKey, raw: Any) -> Any:
    if key.type is bool:
        if isinstance(raw, bool):
            return raw
        if isinstance(raw, str) and raw.lower() in ("true", "false"):
            return raw.lower() == "true"
        raise ConfigException(f"Config '{key.name}' expects a boolean, got {raw!r}")
    if key.type is int:
        if isinstance(raw, bool):
            raise ConfigException(f"Config '{key.name}' expects an int, got {raw!r}")
        try:
            return int(raw)
        except (TypeError, ValueError):
            raise ConfigException(f"Config '{key.name}' expects an int, got {raw!r}") from None
    if key.type is str:
        if not isinstance(raw, str):
            raise ConfigException(f"Config '{key.name}' expects a string, got {raw!r}")
        return raw
    return raw
