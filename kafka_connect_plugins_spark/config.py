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


# ----------------------------------------------------------------------
# Config-provider resolution (Kafka Connect's ${provider:path:key} syntax)
# ----------------------------------------------------------------------
#
# The reference ships alongside Connect config providers (README.md:3 "plugins
# ... that complement the built-in transformations, config providers, and
# connectors"; the deployment Dockerfile pulls an AWS config-provider jar,
# README.md:185-187). The public contract is Kafka's ConfigProvider interface:
# config values may embed ``${provider:path:key}`` placeholders that the
# worker resolves before configuring the transform chain. We implement the
# two built-in providers that need no external service — ``env`` (EnvVar
# ConfigProvider: ``${env::VAR}`` or ``${env:VAR}``) and ``file``
# (FileConfigProvider: ``${file:/path.properties:key}``) — plus a hook for
# custom providers (e.g. a secrets manager on a real cluster).

import os
import re

_PLACEHOLDER = re.compile(r"\$\{([^:}]+):([^:}]*):?([^}]*)\}")


def _env_provider(path: str, key: str) -> str:
    name = key or path  # ${env::VAR} and ${env:VAR} both accepted
    if name not in os.environ:
        raise ConfigException(f"env config provider: variable {name!r} is not set")
    return os.environ[name]


def _file_provider(path: str, key: str) -> str:
    try:
        with open(path) as f:
            lines = f.read().splitlines()
    except OSError as exc:
        raise ConfigException(f"file config provider: cannot read {path!r}: {exc}") from None
    for line in lines:
        line = line.strip()
        if not line or line.startswith(("#", "!")):
            continue
        k, sep, v = line.partition("=")
        if sep and k.strip() == key:
            return v.strip()
    raise ConfigException(f"file config provider: key {key!r} not found in {path!r}")


DEFAULT_PROVIDERS = {"env": _env_provider, "file": _file_provider}


def resolve_config_providers(
    props: dict[str, Any], providers: dict[str, Any] | None = None
) -> dict[str, Any]:
    """Resolve ``${provider:path:key}`` placeholders in a flat config map.

    Mirrors Connect's worker-side indirect-config resolution: applied once,
    driver-side, before any stage is built. Unknown provider names raise
    (matching Connect's fail-fast) — a typo must not silently configure a
    stage with the literal placeholder.
    """
    table = {**DEFAULT_PROVIDERS, **(providers or {})}

    def sub(m: re.Match) -> str:
        name, path, key = m.group(1), m.group(2), m.group(3)
        if name not in table:
            raise ConfigException(f"Unknown config provider {name!r} in {m.group(0)!r}")
        return str(table[name](path, key))

    return {
        k: _PLACEHOLDER.sub(sub, v) if isinstance(v, str) else v for k, v in props.items()
    }


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
