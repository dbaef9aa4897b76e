"""Differential tests for the JVM fast-path group fold (group_fast.py):
fold_group_state(fast_path=True) must match the Python replay
byte-for-byte — eligible cells via expressions, ineligible via fallback."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from hogflare_spark.operators.group_state import fold_group_state
from hogflare_spark.operators.normalize import decode_normalize_requests


def _raw(bodies, endpoint="capture"):
    rows = []
    for i, b in enumerate(bodies):
        ep = b.pop("__endpoint", endpoint)
        rows.append(Row(request_seq=i, endpoint=ep, body=json.dumps(b)))
    return rows


def _gi(gtype, gkey, props):
    return {
        "__endpoint": "groupidentify",
        "group_type": gtype,
        "group_key": gkey,
        "properties": props,
    }


def _cap(did, groups=None, gset=None):
    props = {}
    if groups:
        props["$groups"] = groups
    if gset:
        props["$group_set"] = gset
    return {"event": "ev", "distinct_id": did, "properties": props}


def _both(spark, bodies):
    cmds = decode_normalize_requests(spark.createDataFrame(_raw(bodies)))
    rf, gf = fold_group_state(cmds, fast_path=True)
    rs, gs = fold_group_state(cmds, fast_path=False)
    return (
        sorted(tuple(r) for r in rf.collect()),
        sorted(tuple(r) for r in gf.collect()),
        sorted(tuple(r) for r in rs.collect()),
        sorted(tuple(r) for r in gs.collect()),
    )


def _assert_identical(spark, bodies):
    rf, gf, rs, gs = _both(spark, bodies)
    assert rf == rs
    assert gf == gs


def test_lww_hydration_and_echo_match_kernel(spark):
    _assert_identical(
        spark,
        [
            _gi("org", "acme", {"plan": "free", "seats": 1}),
            _cap("u1", groups={"org": "acme"}),  # hydrates current state
            _gi("org", "acme", {"plan": "pro"}),  # LWW overwrite
            _cap("u2", groups={"org": "acme"}, gset={"org": {"seats": 9}}),
            _gi("org", "other", None),  # gi_lookup on absent record
            _cap("u3", groups={"org": "ghost"}),  # lookup, absent
            _gi("team", "t1", {}),  # empty-object update: creates, version 1
            _cap("u4", groups={"team": "t1"}),  # hydrates '{}'
        ],
    )


def test_ineligible_payloads_fall_back_identically(spark):
    _assert_identical(
        spark,
        [
            _gi("org", "a", {"rate": 1.5}),  # float → fallback
            _gi("org", "b", {"cfg": {"deep": 1}}),  # nested → fallback
            _gi("org", "c", {"name": 'quo"ted'}),  # escape → fallback
            _gi("org", "d", {"n": 12345678901234567890}),  # >int64 → fallback
            _gi("org", "e", {"ok": 1}),  # eligible cell coexists
            _cap("u", groups={"org": "a"}),
        ],
    )


def test_eligible_cells_take_jvm_path(spark, monkeypatch):
    from hogflare_spark.operators import person_state

    # FOLD_PIN hides the fold subtree behind a Scan ExistingRDD; disable
    # it so the executed plan shows which engine ran
    monkeypatch.setattr(person_state, "FOLD_PIN", False)
    cmds = decode_normalize_requests(
        spark.createDataFrame(_raw([_gi("org", "a", {"k": 1})]))
    )
    results, groups = fold_group_state(cmds, fast_path=True)
    # the eligibility flag pass checkpoints the ops frame, hiding the
    # upstream decode/derive MapInPandas passes; the Python replay is
    # itself a MapInPandas stream now, so its absence proves the JVM
    # branch ran alone
    plan = groups._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    rows = groups.collect()
    assert len(rows) == 1 and rows[0]["version"] == 1
    res = results.collect()
    assert len(res) == 1 and res[0]["props"] == '{"k":1}' and res[0]["echo"]


_GTYPES = ["org", "team"]
_GKEYS = ["a", "b"]
_PKEYS = ["k1", "k2"]

_group_op = st.one_of(
    st.fixed_dictionaries(
        {
            "op": st.just("gi"),
            "gtype": st.sampled_from(_GTYPES),
            "gkey": st.sampled_from(_GKEYS),
            "props": st.one_of(
                st.none(),
                st.dictionaries(
                    st.sampled_from(_PKEYS), st.integers(0, 9), max_size=2
                ),
            ),
        }
    ),
    st.fixed_dictionaries(
        {
            "op": st.just("cap"),
            "gtype": st.sampled_from(_GTYPES),
            "gkey": st.sampled_from(_GKEYS),
            "gset": st.one_of(
                st.none(),
                st.dictionaries(
                    st.sampled_from(_PKEYS), st.integers(0, 9), min_size=1, max_size=2
                ),
            ),
        }
    ),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_group_op, min_size=1, max_size=10))
def test_fast_group_fold_property_matches_replay(spark, ops):
    """Randomized differential: for arbitrary gi/capture interleavings the
    forced-JVM group fold must equal the Python replay byte-for-byte on
    both hydration results and the final groups table."""
    bodies = []
    for o in ops:
        if o["op"] == "gi":
            bodies.append(_gi(o["gtype"], o["gkey"], o["props"]))
        else:
            gset = {o["gtype"]: o["gset"]} if o["gset"] is not None else None
            bodies.append(_cap("u", groups={o["gtype"]: o["gkey"]}, gset=gset))
    rf, gf, rs, gs = _both(spark, bodies)
    assert rf == rs, f"results diverged for ops={ops}"
    assert gf == gs, f"groups table diverged for ops={ops}"
