"""Exact pure-Python flag evaluator — the semantic reference kernel.

Behavioral mirror of /root/reference/src/feature_flags.rs:219-614:
rollout bucketing (sha1 first-8-bytes BE u64 % 100), ordered condition
matching, missing-property ⇒ false for EVERY operator (including is_not /
not_in), value coercion (string↔number with f64-epsilon equality,
bool parsing), variant walks over cumulative rollouts, payload precedence,
and reason codes.

The Spark expression compiler (compiler.py) is validated against this
kernel; /decide-style single evaluations use it directly.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass
from typing import Any

from hogflare_spark.flags.model import (
    FlagCondition,
    FlagDefinition,
    PropertyFilter,
    flag_matches_environment,
)

F64_EPSILON = 2.220446049250313e-16


@dataclass
class FlagContext:
    distinct_id: str
    person_properties: dict
    groups: dict[str, str]
    group_properties: dict[str, dict]


@dataclass
class FlagResult:
    key: str
    value: Any  # True / False / variant string
    payload: Any
    active: bool
    reason: str
    condition_index: int | None
    flag_id: int | None = None
    flag_version: int | None = None
    flag_description: str | None = None


def bucket_for(salt: str, hash_id: str) -> float:
    """sha1(salt ":" hash_id) first 8 bytes as big-endian u64, % 100
    (feature_flags.rs:392-402)."""
    digest = hashlib.sha1(f"{salt}:{hash_id}".encode()).digest()
    return float(int.from_bytes(digest[:8], "big") % 100)


def json_equal(a, b) -> bool:
    """serde_json Value equality: bool ≠ number, int == float by value."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(json_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(json_equal(v, b[k]) for k, v in a.items())
    return a == b


def coerce_number(value) -> float | None:
    """feature_flags.rs:594-601."""
    if isinstance(value, bool):
        return 1.0 if value else 0.0
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, str):
        try:
            return float(value.strip())
        except ValueError:
            return None
    return None


def coerce_bool(value) -> bool | None:
    """feature_flags.rs:603-614. Note floats never coerce (serde as_i64)."""
    if isinstance(value, bool):
        return value
    if isinstance(value, int):
        return value != 0
    if isinstance(value, float):
        return None
    if isinstance(value, str):
        t = value.strip().lower()
        if t in ("true", "1", "yes"):
            return True
        if t in ("false", "0", "no"):
            return False
    return None


def values_equal(actual, expected) -> bool:
    """feature_flags.rs:530-544: raw equality, numeric ε, bool coercion."""
    if json_equal(actual, expected):
        return True
    an, en = coerce_number(actual), coerce_number(expected)
    if an is not None and en is not None:
        return abs(an - en) < F64_EPSILON
    ab, eb = coerce_bool(actual), coerce_bool(expected)
    if ab is not None and eb is not None:
        return ab == eb
    return False


_SENTINEL = object()


def property_matches(f: PropertyFilter, ctx: FlagContext) -> bool:
    """feature_flags.rs:481-528. Missing property ⇒ false for every op."""
    ptype = f.property_type or "person"
    op = f.operator or "eq"
    if ptype == "group":
        if f.group_type is None:
            return False
        props = ctx.group_properties.get(f.group_type)
        if props is None:
            return False
        actual = props.get(f.key, _SENTINEL)
    else:
        actual = ctx.person_properties.get(f.key, _SENTINEL)

    if op == "is_set":
        return actual is not _SENTINEL and actual is not None
    if actual is _SENTINEL:
        return False

    if op == "is_not":
        return not values_equal(actual, f.value)
    if op in ("in", "not_in"):
        if not isinstance(f.value, list):
            return False
        found = any(values_equal(actual, item) for item in f.value)
        return found if op == "in" else not found
    if op == "contains":
        if isinstance(actual, str) and isinstance(f.value, str):
            return f.value in actual
        if isinstance(actual, list):
            return any(values_equal(item, f.value) for item in actual)
        return False
    if op == "regex":
        if not isinstance(actual, str) or not isinstance(f.value, str):
            return False
        try:
            return re.search(f.value, actual) is not None
        except re.error:
            return False
    if op in ("gt", "gte", "lt", "lte"):
        an, en = coerce_number(actual), coerce_number(f.value)
        if an is None or en is None:
            return False
        return {"gt": an > en, "gte": an >= en, "lt": an < en, "lte": an <= en}[op]
    return values_equal(actual, f.value)


def pick_variant(variants, salt: str, hash_id: str) -> str | None:
    """feature_flags.rs:371-390."""
    if not variants:
        return None
    bucket = bucket_for(salt, hash_id)
    cumulative = 0.0
    for v in variants:
        cumulative += max(v.rollout_percentage, 0.0)
        if bucket < min(cumulative, 100.0):
            return v.key
    return None


def _resolve_hash_id(flag: FlagDefinition, ctx: FlagContext) -> str | None:
    if flag.group_type is not None:
        return ctx.groups.get(flag.group_type)
    return ctx.distinct_id


def _evaluate_condition(
    flag: FlagDefinition,
    condition: FlagCondition,
    ctx: FlagContext,
    payloads: dict,
    condition_index: int | None,
) -> FlagResult:
    def build(value, payload, reason):
        return FlagResult(
            key=flag.key,
            value=value,
            payload=payload,
            active=flag.active,
            reason=reason,
            condition_index=condition_index,
            flag_id=flag.id,
            flag_version=flag.version,
            flag_description=flag.description,
        )

    hash_id = _resolve_hash_id(flag, ctx)
    if hash_id is None:
        return build(False, None, "no_match")

    rollout = (
        condition.rollout_percentage
        if condition.rollout_percentage is not None
        else flag.rollout_percentage if flag.rollout_percentage is not None else 100.0
    )
    salt = flag.effective_salt
    bucket = bucket_for(salt, hash_id)
    if not bucket < min(max(rollout, 0.0), 100.0):
        return build(False, None, "out_of_rollout")

    variants = condition.variants if condition.variants else flag.variants
    if flag.flag_type == "multivariate" or variants:
        if condition.variant is not None:
            return build(condition.variant, payloads.get(condition.variant), "match")
        selected = pick_variant(variants, salt, hash_id)
        if selected is not None:
            return build(selected, payloads.get(selected), "match")

    return build(True, flag.payload, "match")


def evaluate_flag(flag: FlagDefinition, ctx: FlagContext) -> FlagResult:
    """feature_flags.rs:219-267."""
    if not flag.active:
        return FlagResult(
            key=flag.key,
            value=False,
            payload=None,
            active=False,
            reason="disabled",
            condition_index=None,
            flag_id=flag.id,
            flag_version=flag.version,
            flag_description=flag.description,
        )

    payloads = flag.variant_payload_map()

    if flag.conditions:
        for index, condition in enumerate(flag.conditions):
            if all(property_matches(p, ctx) for p in condition.properties):
                return _evaluate_condition(flag, condition, ctx, payloads, index)
        return FlagResult(
            key=flag.key,
            value=False,
            payload=None,
            active=True,
            reason="no_match",
            condition_index=None,
            flag_id=flag.id,
            flag_version=flag.version,
            flag_description=flag.description,
        )

    return _evaluate_condition(
        flag,
        FlagCondition(
            properties=[],
            rollout_percentage=flag.rollout_percentage,
            variants=flag.variants,
            variant=None,
        ),
        ctx,
        payloads,
        None,
    )


def evaluate_flags(
    flags: list[FlagDefinition],
    ctx: FlagContext,
    flag_keys: set[str] | None = None,
    evaluation_environments: set[str] | None = None,
) -> list[FlagResult]:
    """feature_flags.rs:43-67."""
    results = []
    for flag in flags:
        if flag_keys is not None and flag.key not in flag_keys:
            continue
        if not flag_matches_environment(flag, evaluation_environments):
            continue
        results.append(evaluate_flag(flag, ctx))
    return results
