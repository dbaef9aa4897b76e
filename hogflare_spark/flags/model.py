"""Feature-flag config model.

Mirrors /root/reference/src/feature_flags.rs:70-147: both accepted JSON
shapes (`{"flags": [...]}` or a bare array, feature_flags.rs:28-37), the
filter schema (`operator` with `op` alias, `type`/`group_type` source
selection), flag/condition/variant rollout fields, and payload precedence
inputs.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass
class PropertyFilter:
    key: str
    value: Any
    property_type: str | None = None  # "person" (default) | "group"
    group_type: str | None = None
    operator: str | None = None  # default "eq"

    @classmethod
    def from_dict(cls, d: dict) -> "PropertyFilter":
        return cls(
            key=d["key"],
            value=d.get("value"),
            property_type=d.get("type"),
            group_type=d.get("group_type"),
            operator=d.get("operator", d.get("op")),
        )


@dataclass
class FlagVariant:
    key: str
    rollout_percentage: float = 0.0
    payload: Any = None

    @classmethod
    def from_dict(cls, d: dict) -> "FlagVariant":
        return cls(
            key=d["key"],
            rollout_percentage=float(d.get("rollout_percentage", 0.0)),
            payload=d.get("payload"),
        )


@dataclass
class FlagCondition:
    properties: list[PropertyFilter] = field(default_factory=list)
    rollout_percentage: float | None = None
    variants: list[FlagVariant] = field(default_factory=list)
    variant: str | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "FlagCondition":
        return cls(
            properties=[PropertyFilter.from_dict(p) for p in d.get("properties", [])],
            rollout_percentage=(
                float(d["rollout_percentage"])
                if d.get("rollout_percentage") is not None
                else None
            ),
            variants=[FlagVariant.from_dict(v) for v in d.get("variants", [])],
            variant=d.get("variant"),
        )


@dataclass
class FlagDefinition:
    key: str
    id: int | None = None
    version: int | None = None
    description: str | None = None
    active: bool = True
    flag_type: str = "boolean"  # boolean | multivariate
    rollout_percentage: float | None = None
    variants: list[FlagVariant] = field(default_factory=list)
    payload: Any = None
    variant_payloads: dict[str, Any] = field(default_factory=dict)
    conditions: list[FlagCondition] = field(default_factory=list)
    group_type: str | None = None
    evaluation_environments: list[str] | None = None
    salt: str | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "FlagDefinition":
        return cls(
            key=d["key"],
            id=d.get("id"),
            version=d.get("version"),
            description=d.get("description"),
            active=d.get("active", True),
            flag_type=d.get("type", "boolean"),
            rollout_percentage=(
                float(d["rollout_percentage"])
                if d.get("rollout_percentage") is not None
                else None
            ),
            variants=[FlagVariant.from_dict(v) for v in d.get("variants", [])],
            payload=d.get("payload"),
            variant_payloads=dict(d.get("variant_payloads", {})),
            conditions=[FlagCondition.from_dict(c) for c in d.get("conditions", [])],
            group_type=d.get("group_type"),
            evaluation_environments=d.get("evaluation_environments"),
            salt=d.get("salt"),
        )

    @property
    def effective_salt(self) -> str:
        return self.salt if self.salt is not None else self.key

    def variant_payload_map(self) -> dict[str, Any]:
        """variant-level payload overrides the variant_payloads map
        (feature_flags.rs:231-237)."""
        payloads = dict(self.variant_payloads)
        for v in self.variants:
            if v.payload is not None:
                payloads[v.key] = v.payload
        return payloads


def parse_flag_config(raw: str) -> list[FlagDefinition]:
    trimmed = raw.strip()
    parsed = json.loads(trimmed)
    if isinstance(parsed, list):
        return [FlagDefinition.from_dict(d) for d in parsed]
    return [FlagDefinition.from_dict(d) for d in parsed.get("flags", [])]


def flag_matches_environment(flag: FlagDefinition, envs: set[str] | None) -> bool:
    """feature_flags.rs:474-479: empty/absent list matches everything."""
    if envs is None:
        return True
    if not flag.evaluation_environments:
        return True
    return any(e in envs for e in flag.evaluation_environments)
