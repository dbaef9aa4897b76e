"""Flag config → compiled Spark Column expressions (batch evaluation).

The Spark-native flag path: every flag compiles once (driver-side, from
broadcast-sized config) into pure Column expressions over a context
DataFrame, so evaluating ALL flags for ALL persons is a single
whole-stage-codegen'd projection — no UDFs, no Python in the hot path,
something the reference (one context per HTTP request) cannot do.

Context DataFrame columns:
- distinct_id  string
- person_properties  string (JSON object)
- groups  map<string,string>  (group_type → group_key)
- group_properties  string (JSON: {group_type: {props}})

Parity targets (/root/reference/src/feature_flags.rs):
- bucket (392-402): sha1 first-8-bytes-BE-u64 % 100, bit-exact in SQL as
  pmod(cast(conv(substr(sha1(concat(salt,':',id)),1,16),16,10)
  as decimal(20,0)), 100) — conv's unsigned-64 path validated against a
  hashlib oracle (tests/test_flags.py)
- missing property ⇒ false for every operator (481-528): every filter is
  wrapped in coalesce(..., false) with an explicit presence guard
- coercion (530-614): numeric via try_variant_get(..., 'double') (same
  trim/parse/bool→1 behavior as coerce_number), bool via an exact
  true/1/yes|false/0/no when-chain, ε-equality at f64::EPSILON

Known edges (documented divergences): Java vs Rust regex dialect;
object/array-valued filter equality relies on JSON-text normalization;
keys containing JSON-path metacharacters.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from hogflare_spark.flags.kernel import F64_EPSILON, coerce_bool, coerce_number
from hogflare_spark.flags.model import FlagCondition, FlagDefinition, PropertyFilter

_FALSE = F.lit(False)

# Compiled per-flag struct arrays, keyed by (lane, dataclass repr of the
# selected flag list). Compiling a flag set is pure driver-side Column
# construction — hundreds of py4j round-trips for the condition trees
# and sha1 rollout expressions, measured 0.9-1.5 s per call at r12
# (guide §7.3: it showed up as a "nothing is running" gap before every
# flag gate's first job). The Column trees are immutable and reference
# inputs only by NAME (`distinct_id`, `_merged_props`, the variant
# helper columns), so one compiled array serves any persons/contexts
# frame with those columns; FlagDefinition is a dataclass, so repr is a
# content fingerprint and re-parsed configs hit the same entry.
_COMPILED_CACHE: dict = {}


def _compiled_structs(
    lane: str, selected: list, ctx: "_Ctx", ctx_key: tuple = ()
) -> Column:
    key = (lane, ctx_key, repr(selected))
    out = _COMPILED_CACHE.get(key)
    if out is None:
        out = F.array(
            *[
                F.struct(
                    F.lit(f.key).alias("flag_key"),
                    compile_flag(f, ctx).alias("res"),
                )
                for f in selected
            ]
        )
        _COMPILED_CACHE[key] = out
    return out


def bucket_expr(salt: str, hash_id: Column) -> Column:
    """Bit-exact sha1 rollout bucket as a double Column."""
    h = F.sha1(F.concat(F.lit(salt), F.lit(":"), hash_id))
    u64 = F.conv(F.substring(h, 1, 16), 16, 10).cast("decimal(20,0)")
    return F.pmod(u64, F.lit(100)).cast("double")


def _json_path(*parts: str) -> str:
    out = "$"
    for p in parts:
        if re.match(r"^[A-Za-z0-9_$\-]+$", p):
            out += f".{p}"
        else:
            out += "['" + p.replace("'", "\\'") + "']"
    return out


class _Ctx:
    """Bound context columns + per-filter value accessors."""

    def __init__(
        self,
        distinct_id: Column,
        person_properties: Column,
        groups: Column,
        group_properties: Column,
    ):
        self.distinct_id = distinct_id
        self.person_variant = F.parse_json(F.coalesce(person_properties, F.lit("{}")))
        self.groups = groups
        self.group_variant = F.parse_json(F.coalesce(group_properties, F.lit("{}")))

    def actual(self, f: PropertyFilter) -> tuple[Column, Column, Column]:
        """(raw_json_text, as_double, as_string) of the filter's target value.

        raw is NULL when the key is missing OR its value is JSON null —
        matching the kernel's missing ⇒ false treatment (is_set also
        rejects null, feature_flags.rs:498).
        """
        if (f.property_type or "person") == "group":
            if f.group_type is None:
                # group filter without group_type never matches (481-490)
                null = F.lit(None).cast("string")
                return null, F.lit(None).cast("double"), null
            path = _json_path(f.group_type, f.key)
            src = self.group_variant
        else:
            path = _json_path(f.key)
            src = self.person_variant
        var = F.try_variant_get(src, path, "variant")
        raw = F.nullif(F.to_json(var), F.lit("null"))
        num = F.when(raw.isNotNull(), F.try_variant_get(src, path, "double"))
        s = F.when(raw.startswith('"'), F.try_variant_get(src, path, "string"))
        return raw, num, s


def _bool_expr(raw: Column, s: Column) -> Column:
    """coerce_bool as a Column (true/1/yes | false/0/no; ints; no floats)."""
    lowered = F.lower(F.trim(s))
    return (
        F.when(raw == "true", F.lit(True))
        .when(raw == "false", F.lit(False))
        .when(raw.rlike(r"^-?\d+$"), raw.cast("long") != 0)
        .when(lowered.isin("true", "1", "yes"), F.lit(True))
        .when(lowered.isin("false", "0", "no"), F.lit(False))
    )


def _eq_expr(raw: Column, num: Column, s: Column, expected) -> Column:
    """values_equal(actual, expected) with expected known at compile time."""
    clauses = [raw == F.lit(json.dumps(expected, ensure_ascii=False, separators=(",", ":")))]
    en = coerce_number(expected)
    if en is not None:
        clauses.append(F.abs(num - F.lit(en)) < F.lit(F64_EPSILON))
    eb = coerce_bool(expected)
    if eb is not None:
        b = _bool_expr(raw, s)
        clauses.append(b == F.lit(eb))
    out = clauses[0]
    for c in clauses[1:]:
        out = out | c
    return F.coalesce(out, _FALSE)


def _item_eq_expr(item: Column, expected) -> Column:
    """values_equal for array membership where the array collapsed to
    array<string> (contains-on-array path)."""
    clauses = [item == F.lit(expected if isinstance(expected, str) else json.dumps(expected))]
    en = coerce_number(expected)
    if en is not None:
        clauses.append(F.abs(F.try_cast(item, "double") - F.lit(en)) < F.lit(F64_EPSILON))
    eb = coerce_bool(expected)
    if eb is not None:
        clauses.append(
            F.when(item == "true", F.lit(True)).when(item == "false", F.lit(False))
            == F.lit(eb)
        )
    out = clauses[0]
    for c in clauses[1:]:
        out = out | c
    return F.coalesce(out, _FALSE)


def compile_filter(f: PropertyFilter, ctx: _Ctx) -> Column:
    """One PropertyFilter → boolean Column (missing ⇒ false)."""
    raw, num, s = ctx.actual(f)
    op = f.operator or "eq"

    if op == "is_set":
        return raw.isNotNull()

    present = raw.isNotNull()

    if op == "is_not":
        return F.coalesce(present & ~_eq_expr(raw, num, s, f.value), _FALSE)
    if op in ("in", "not_in"):
        if not isinstance(f.value, list):
            return _FALSE
        found = _FALSE
        for item in f.value:
            found = found | _eq_expr(raw, num, s, item)
        return F.coalesce(present & (found if op == "in" else ~found), _FALSE)
    if op == "contains":
        is_array = raw.startswith("[")
        arr = F.from_json(raw, "array<string>")
        array_hit = F.exists(arr, lambda x: _item_eq_expr(x, f.value))
        if isinstance(f.value, str):
            string_hit = s.contains(F.lit(f.value))
            return F.coalesce(
                F.when(is_array, array_hit).otherwise(string_hit), _FALSE
            )
        return F.coalesce(F.when(is_array, array_hit), _FALSE)
    if op == "regex":
        if not isinstance(f.value, str):
            return _FALSE
        try:
            re.compile(f.value)
        except re.error:
            return _FALSE
        # Java regex `find` semantics == Rust is_match (unanchored search)
        return F.coalesce(s.rlike(f.value), _FALSE)
    if op in ("gt", "gte", "lt", "lte"):
        en = coerce_number(f.value)
        if en is None:
            return _FALSE
        cmp = {
            "gt": num > F.lit(en),
            "gte": num >= F.lit(en),
            "lt": num < F.lit(en),
            "lte": num <= F.lit(en),
        }[op]
        return F.coalesce(cmp, _FALSE)
    return _eq_expr(raw, num, s, f.value)


_RESULT_FIELDS = ("value", "payload", "reason", "condition_index")


def _result(value: Column, payload: Column, reason: str, condition_index) -> Column:
    return F.struct(
        value.alias("value"),
        payload.alias("payload"),
        F.lit(reason).alias("reason"),
        F.lit(condition_index).cast("int").alias("condition_index"),
    )


def _jlit(value) -> Column:
    return F.lit(json.dumps(value, ensure_ascii=False, separators=(",", ":")))


def _null_str() -> Column:
    return F.lit(None).cast("string")


def compile_condition(
    flag: FlagDefinition,
    condition: FlagCondition,
    ctx: _Ctx,
    payloads: dict,
    condition_index,
) -> Column:
    """evaluate_condition (feature_flags.rs:268-351) as a nested CASE."""
    if flag.group_type is not None:
        hash_id = F.element_at(ctx.groups, F.lit(flag.group_type))
    else:
        hash_id = ctx.distinct_id

    rollout = (
        condition.rollout_percentage
        if condition.rollout_percentage is not None
        else flag.rollout_percentage if flag.rollout_percentage is not None else 100.0
    )
    salt = flag.effective_salt
    bucket = bucket_expr(salt, hash_id)
    # constant-fold the rollout gate (r12): pmod(u64, 100) < 100 is a
    # tautology and < 0 a contradiction, but Catalyst cannot prove it
    # through sha1 — at 100%/0% rollout (the overwhelmingly common
    # config) the per-row sha1 + decimal conv work is pure waste, and it
    # ran once per (person x flag x condition) in the batch read path.
    # Bit-identical to the kernel: bucket_for() ∈ [0, 100) always.
    r_clamped = min(max(rollout, 0.0), 100.0)
    if r_clamped >= 100.0:
        allowed = F.lit(True)
    elif r_clamped <= 0.0:
        allowed = F.lit(False)
    else:
        allowed = bucket < F.lit(r_clamped)

    variants = condition.variants if condition.variants else flag.variants

    # variant pick: ordered whens over cumulative thresholds (371-390)
    def variant_result() -> Column:
        if condition.variant is not None:
            payload = payloads.get(condition.variant)
            return _result(
                _jlit(condition.variant),
                _jlit(payload) if payload is not None else _null_str(),
                "match",
                condition_index,
            )
        expr = None
        cumulative = 0.0
        for v in variants:
            cumulative += max(v.rollout_percentage, 0.0)
            payload = payloads.get(v.key)
            res = _result(
                _jlit(v.key),
                _jlit(payload) if payload is not None else _null_str(),
                "match",
                condition_index,
            )
            cum_clamped = min(cumulative, 100.0)
            if cum_clamped >= 100.0:
                cond = F.lit(True)  # same tautology fold as `allowed`
            elif cum_clamped <= 0.0:
                cond = F.lit(False)
            else:
                cond = bucket < F.lit(cum_clamped)
            expr = F.when(cond, res) if expr is None else expr.when(cond, res)
        fallthrough = _result(
            _jlit(True),
            _jlit(flag.payload) if flag.payload is not None else _null_str(),
            "match",
            condition_index,
        )
        return expr.otherwise(fallthrough) if expr is not None else fallthrough

    if flag.flag_type == "multivariate" or variants:
        matched = variant_result()
    else:
        matched = _result(
            _jlit(True),
            _jlit(flag.payload) if flag.payload is not None else _null_str(),
            "match",
            condition_index,
        )

    no_match = _result(_jlit(False), _null_str(), "no_match", condition_index)
    out_of_rollout = _result(_jlit(False), _null_str(), "out_of_rollout", condition_index)

    return (
        F.when(hash_id.isNull(), no_match)
        .when(allowed, matched)
        .otherwise(out_of_rollout)
    )


def compile_flag(flag: FlagDefinition, ctx: _Ctx) -> Column:
    """evaluate_flag (feature_flags.rs:219-267) as one Column
    (struct<value,payload,reason,condition_index>, JSON-encoded value)."""
    if not flag.active:
        return _result(_jlit(False), _null_str(), "disabled", None)

    payloads = flag.variant_payload_map()

    if flag.conditions:
        expr = None
        for index, condition in enumerate(flag.conditions):
            match_expr = F.lit(True)
            for p in condition.properties:
                match_expr = match_expr & compile_filter(p, ctx)
            branch = compile_condition(flag, condition, ctx, payloads, index)
            expr = (
                F.when(match_expr, branch)
                if expr is None
                else expr.when(match_expr, branch)
            )
        return expr.otherwise(_result(_jlit(False), _null_str(), "no_match", None))

    return compile_condition(
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


class _MapCtx(_Ctx):
    """Person-properties accessor reading the person STORE's map column
    directly — no JSON assembly, no parse_json, no per-filter variant
    walk (r12: the variant accessors were ~70% of the person-scale read
    path's cost; this lane measures ~4x faster on the same flag set).

    Envelope: map values are COMPACT-JSON-encoded value strings — what
    the person store writes (json.dumps with ',':' separators) — so the
    raw text equals the variant path's to_json(variant) for every value
    the store can hold. A quoted string containing a backslash escape is
    outside the lane's envelope and raises loudly instead of decoding
    wrong (the _escape_json_str discipline; the kernel twin remains the
    oracle for exotic input). Group filters evaluate against an empty
    group context — a persons-table read carries no groups — matching
    the kernel's group-filter-without-context ⇒ no-match rule."""

    def __init__(self, distinct_id: Column, merged_map: Column):
        self.distinct_id = distinct_id
        self.m = merged_map
        self.groups = F.create_map().cast("map<string,string>")
        self.group_variant = F.parse_json(F.lit("{}"))

    def actual(self, f: PropertyFilter) -> tuple[Column, Column, Column]:
        if (f.property_type or "person") == "group":
            null = F.lit(None).cast("string")
            return null, F.lit(None).cast("double"), null
        raw = F.nullif(F.element_at(self.m, F.lit(f.key)), F.lit("null"))
        quoted = raw.startswith('"')
        inner = F.substring(raw, F.lit(2), F.length(raw) - F.lit(2))
        s = F.when(
            quoted,
            F.when(
                raw.contains("\\"),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "flags map lane: escaped JSON string outside "
                            f"the envelope for key {f.key!r}: "
                        ),
                        raw,
                    )
                ),
            ).otherwise(inner),
        )
        # variant-cast parity: bool → 1.0/0.0, JSON number → itself,
        # JSON string → trimmed numeric coercion (SQL cast trims), and
        # arrays/objects/invalid → NULL via try_cast
        num = (
            F.when(raw == "true", F.lit(1.0))
            .when(raw == "false", F.lit(0.0))
            .when(quoted, s.try_cast("double"))
            .otherwise(raw.try_cast("double"))
        )
        return raw, num, s


def evaluate_flags_maps(
    persons,
    flags: list[FlagDefinition],
    flag_keys: set[str] | None = None,
    evaluation_environments: set[str] | None = None,
    id_col: str = "distinct_id",
    properties_col: str = "properties",
    set_once_col: str = "properties_set_once",
):
    """Person-STORE-native batch flag evaluation: one row per
    (person, flag), computed straight off the store's
    (properties, properties_set_once) MAP columns — the set/set_once
    merge (properties win, NULL maps behave as {}) and every property
    access are map operations in whole-stage codegen; no JSON text is
    ever assembled or parsed. Output columns: every input column plus
    flag_key, value (JSON text), payload (JSON text), reason,
    condition_index — identical to evaluate_flags_df, which remains the
    lane for callers holding a JSON person_properties blob."""
    from hogflare_spark.flags.model import flag_matches_environment

    empty = F.create_map().cast("map<string,string>")
    props = F.coalesce(F.col(properties_col), empty)
    once = F.coalesce(F.col(set_once_col), empty)
    merged = F.map_concat(
        props,
        F.map_filter(
            once, lambda k, v: ~F.array_contains(F.map_keys(props), k)
        ),
    )
    out_cols = persons.columns
    # one projected merge per row, shared by every compiled filter
    ctxed = persons.withColumn("_merged_props", merged)
    ctx = _MapCtx(F.col(id_col), F.col("_merged_props"))
    selected = [
        f
        for f in flags
        if (flag_keys is None or f.key in flag_keys)
        and flag_matches_environment(f, evaluation_environments)
    ]
    if not selected:
        return ctxed.limit(0).select(
            *out_cols,
            F.lit(None).cast("string").alias("flag_key"),
            F.lit(None).cast("string").alias("value"),
            F.lit(None).cast("string").alias("payload"),
            F.lit(None).cast("string").alias("reason"),
            F.lit(None).cast("int").alias("condition_index"),
        )
    structs = _compiled_structs("maps", selected, ctx, (id_col,))
    exploded = ctxed.withColumn("_flag", F.explode(structs))
    return exploded.select(
        *out_cols,
        F.col("_flag.flag_key").alias("flag_key"),
        F.col("_flag.res.value").alias("value"),
        F.col("_flag.res.payload").alias("payload"),
        F.col("_flag.res.reason").alias("reason"),
        F.col("_flag.res.condition_index").alias("condition_index"),
    )


def evaluate_flags_df(
    contexts,
    flags: list[FlagDefinition],
    flag_keys: set[str] | None = None,
    evaluation_environments: set[str] | None = None,
):
    """Context DataFrame → long-format results: one row per (context, flag).

    Output columns: every input column, plus flag_key, value (JSON text),
    payload (JSON text), reason, condition_index.
    """
    from hogflare_spark.flags.model import flag_matches_environment

    # Parse the JSON context blobs to VARIANT once per row, as real
    # projected columns: every compiled filter references the SAME
    # attribute instead of carrying its own parse_json(...) tree, so the
    # Jackson parse happens once per row rather than once per property
    # access across all flags (codegen CSE doesn't reach across the
    # exploded per-flag struct branches). The helper columns are dropped
    # from the output via out_cols.
    out_cols = contexts.columns
    contexts = contexts.withColumns(
        {
            "_person_variant": F.parse_json(
                F.coalesce(F.col("person_properties"), F.lit("{}"))
            ),
            "_group_variant": F.parse_json(
                F.coalesce(F.col("group_properties"), F.lit("{}"))
            ),
        }
    )
    ctx = _Ctx(
        F.col("distinct_id"),
        F.col("person_properties"),
        F.col("groups"),
        F.col("group_properties"),
    )
    ctx.person_variant = F.col("_person_variant")
    ctx.group_variant = F.col("_group_variant")
    selected = [
        f
        for f in flags
        if (flag_keys is None or f.key in flag_keys)
        and flag_matches_environment(f, evaluation_environments)
    ]
    if not selected:
        return contexts.limit(0).select(
            *out_cols,
            F.lit(None).cast("string").alias("flag_key"),
            F.lit(None).cast("string").alias("value"),
            F.lit(None).cast("string").alias("payload"),
            F.lit(None).cast("string").alias("reason"),
            F.lit(None).cast("int").alias("condition_index"),
        )

    structs = _compiled_structs("df", selected, ctx)
    exploded = contexts.withColumn("_flag", F.explode(structs))
    return exploded.select(
        *out_cols,
        F.col("_flag.flag_key").alias("flag_key"),
        F.col("_flag.res.value").alias("value"),
        F.col("_flag.res.payload").alias("payload"),
        F.col("_flag.res.reason").alias("reason"),
        F.col("_flag.res.condition_index").alias("condition_index"),
    )
