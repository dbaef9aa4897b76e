"""Differential tests for the JVM fast-path person fold (person_fast.py):
fold_person_state(fast_path=True) must be byte-identical to the Python
kernel replay (fast_path=False) on every input — eligible inputs via the
expression pipeline, ineligible ones via automatic fallback — and
genuinely eligible inputs must actually take the JVM path (no
FlatMapGroupsInPandas in the executed plan)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from hogflare_spark.operators.normalize import decode_normalize_requests
from hogflare_spark.operators.person_state import fold_person_state


def _raw(bodies):
    return [
        Row(request_seq=i, endpoint="capture", body=json.dumps(b))
        for i, b in enumerate(bodies)
    ]


def _capture(did, props=None, ts=None):
    b = {"event": "ev", "distinct_id": did}
    if props is not None:
        b["properties"] = props
    if ts is not None:
        b["timestamp"] = ts
    return b


def _both(spark, bodies):
    cmds = decode_normalize_requests(spark.createDataFrame(_raw(bodies)))
    snap_f, per_f = fold_person_state(cmds, team_id=7, fast_path=True)
    snap_s, per_s = fold_person_state(cmds, team_id=7, fast_path=False)
    return (
        sorted(tuple(r) for r in snap_f.collect()),
        sorted(tuple(r) for r in per_f.collect()),
        sorted(tuple(r) for r in snap_s.collect()),
        sorted(tuple(r) for r in per_s.collect()),
    )


def _assert_identical(spark, bodies):
    snap_f, per_f, snap_s, per_s = _both(spark, bodies)
    assert snap_f == snap_s
    assert per_f == per_s


def test_scalar_interleavings_match_kernel(spark):
    _assert_identical(
        spark,
        [
            _capture("u1", {"$set": {"a": 1, "b": "x"}}),
            _capture("u1", {"$set_once": {"a": 9, "c": True}}),
            _capture("u1", {"$unset": ["a"]}),
            _capture("u1", {"$set": {"a": 2}}),  # re-set after unset → end of dict
            _capture("u1", {"$set_once": {"d": None}}),
            _capture("u2", {"$set": {"z": "last"}, "$unset": ["z"]}),  # same-op unset wins
            _capture("u2", {"$set_once": {"z": 5}}),  # sticks: segment is empty
            _capture("u3", {}),  # ensure only: version 0, empty maps
            _capture("u1", {"$set": {"b": "y"}}),
        ],
    )


def test_set_once_blocked_by_earlier_set(spark):
    _assert_identical(
        spark,
        [
            _capture("u", {"$set": {"k": 1}}),
            _capture("u", {"$set_once": {"k": 99}}),  # blocked: k in properties
            _capture("u", {"$unset": ["k"]}),
            _capture("u", {"$set_once": {"k": 42}}),  # sticks after unset
            _capture("u", {"$set": {"k": 7}}),  # set wins on read; once survives in map
        ],
    )


def test_timestamps_and_string_values(spark):
    _assert_identical(
        spark,
        [
            _capture("u", {"$set": {"s": "hello world", "n": 0}}, ts="2024-03-01T10:00:00Z"),
            _capture("u", {"$set": {"s": "with, commas:and colons"}}, ts="2024-03-01 11:30:00"),
            _capture("u", {"$set_once": {"t": "x"}}, ts="2024-03-01T12:00:00+02:00"),
        ],
    )


def test_ineligible_payloads_fall_back_identically(spark):
    # floats, nested containers, unicode, quotes/backslashes → slow path;
    # outputs must STILL match the kernel exactly
    _assert_identical(
        spark,
        [
            _capture("u1", {"$set": {"f": 1.5}}),
            _capture("u2", {"$set": {"o": {"nested": 1}}}),
            _capture("u3", {"$set": {"a": [1, 2]}}),
            _capture("u4", {"$set": {"q": 'quo"te'}}),
            _capture("u5", {"$set": {"u": "ünïcode"}}),
            _capture("u6", {"$set": {"big": 12345678901234567890}}),
        ],
    )


def test_quoted_distinct_id_falls_back_identically(spark):
    # a literal '"' in distinct_id survives JSON decoding as a plain char
    # (the update-text guard never sees it) — it must be routed to the
    # Python replay, never spliced raw into the distinct_ids JSON array
    _assert_identical(
        spark,
        [
            _capture('a"b'),  # ensure-only: update is null, worst case
            _capture('a"b', {"$set": {"k": 1}}),
            _capture('plain', {"$set": {"k": 2}}),  # stays fast-eligible
        ],
    )
    # and the replay result is the real id, not corrupted JSON
    cmds = decode_normalize_requests(
        spark.createDataFrame(_raw([_capture('a"b')]))
    )
    _, persons = fold_person_state(cmds, fast_path=True)
    row = persons.collect()[0]
    ids = row["distinct_ids"]
    assert (json.loads(ids) if isinstance(ids, str) else list(ids)) == ['a"b']


def test_alias_components_fall_back_and_match(spark):
    bodies = [
        _capture("a", {"$set": {"k": 1}}),
        {"event": "ev", "distinct_id": "b", "properties": {"$set": {"k": 2}}},
    ]
    raw = _raw(bodies) + [
        Row(
            request_seq=2,
            endpoint="alias",
            body=json.dumps({"distinct_id": "a", "alias": "b"}),
        ),
        Row(
            request_seq=3,
            endpoint="capture",
            body=json.dumps(_capture("c", {"$set": {"k": 3}})),
        ),
    ]
    cmds = decode_normalize_requests(spark.createDataFrame(raw))
    snap_f, per_f = fold_person_state(cmds, fast_path=True)
    snap_s, per_s = fold_person_state(cmds, fast_path=False)
    assert sorted(tuple(r) for r in per_f.collect()) == sorted(
        tuple(r) for r in per_s.collect()
    )
    assert sorted(tuple(r) for r in snap_f.collect()) == sorted(
        tuple(r) for r in snap_s.collect()
    )


def test_eligible_input_takes_jvm_path(spark, monkeypatch):
    from hogflare_spark.operators import person_state

    # FOLD_PIN hides the fold subtree behind a Scan ExistingRDD; disable
    # it so the executed plan shows which engine ran
    monkeypatch.setattr(person_state, "FOLD_PIN", False)
    # pin commands: decode is itself a MapInPandas pass, and the Python
    # replay fallback is now a MapInPandas stream — the checkpoint hides
    # decode so the assertion sees only the fold engine
    cmds = decode_normalize_requests(
        spark.createDataFrame(_raw([_capture("u", {"$set": {"a": 1}})]))
    ).localCheckpoint(eager=True)
    snapshots, persons = fold_person_state(cmds, fast_path=True)
    # all ops eligible → the Python fallback branch is skipped entirely:
    # no MapInPandas (Python replay) anywhere in the fold plan
    plan = persons._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    rows = persons.collect()
    assert len(rows) == 1 and rows[0]["version"] == 1

    # snapshot JSON matches the kernel's compact serialization
    snap = snapshots.collect()[0]
    assert snap["person_properties"] == '{"a":1}'


@pytest.mark.parametrize("n_users", [5])
def test_fast_path_key_ordering_matches_dict_semantics(spark, n_users):
    # dict order: re-set after unset moves the key to the end
    bodies = []
    for u in range(n_users):
        d = f"user{u}"
        bodies += [
            _capture(d, {"$set": {"k1": 1, "k2": 2}}),
            _capture(d, {"$unset": ["k1"]}),
            _capture(d, {"$set": {"k1": 3}}),
        ]
    snap_f, per_f, snap_s, per_s = _both(spark, bodies)
    assert snap_f == snap_s
    assert per_f == per_s
    # serialized order is k2 then k1 (kernel: pop+reinsert appends)
    cmds = decode_normalize_requests(spark.createDataFrame(_raw(bodies)))
    snapshots, _ = fold_person_state(cmds, fast_path=True)
    last = (
        snapshots.orderBy("request_seq").collect()[-1]["person_properties"]
    )
    assert last == '{"k2":2,"k1":3}'


def test_synth_time_piecewise_matches_python_kernel(spark):
    """The compressed synthetic-time tail (sf1+ scale ids) must stay in
    datetime range, stay strictly monotonic across the boundary, and
    match the JVM twin bit-for-bit."""
    from pyspark.sql import functions as F

    from hogflare_spark.operators.person_fast import synth_time_expr
    from hogflare_spark.operators.person_store import (
        SYNTH_COMPRESS_AFTER,
        synthetic_time,
    )

    seqs = [
        0,
        946_684_800_000,
        SYNTH_COMPRESS_AFTER - 1,
        SYNTH_COMPRESS_AFTER,
        SYNTH_COMPRESS_AFTER + 1,
        9 * 10**14,  # the sf1-probe regime that used to overflow
        2 * 10**17,  # event ids ~2e11
    ]
    py = [synthetic_time(s) for s in seqs]
    assert all(a < b for a, b in zip(py, py[1:]))  # strictly monotonic
    rows = (
        spark.createDataFrame([(s,) for s in seqs], "seq long")
        .select(synth_time_expr(F.col("seq")).alias("t"))
        .collect()
    )
    jvm = [r["t"].replace(tzinfo=py[0].tzinfo) for r in rows]
    assert jvm == py
