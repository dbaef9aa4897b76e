"""Mega-component routing: auto mode keeps the Python replay for normal
identity components / group cells, but routes components whose op count
reaches person_state.MEGA_COMPONENT_MIN_OPS to the JVM expression folds —
the replay buffers a component's entire op list as one pandas frame, so a
single hot key with millions of ops would otherwise be one OOM-able task
(the reference never meets this: one Durable Object per person,
/root/reference/src/persons.rs:863-961 — a distributed batch fold must).
"""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from hogflare_spark.operators import person_state
from hogflare_spark.operators.group_state import fold_group_state
from hogflare_spark.operators.normalize import decode_normalize_requests
from hogflare_spark.operators.person_state import fold_person_state


def _raw(bodies, endpoint="capture", start_seq=0):
    return [
        Row(request_seq=start_seq + i, endpoint=endpoint, body=json.dumps(b))
        for i, b in enumerate(bodies)
    ]


def _mixed_commands(spark):
    """One hot eligible id (30 ops), one hot INELIGIBLE id (float values,
    25 ops), an aliased pair, and small singletons."""
    bodies = []
    for i in range(30):
        bodies.append({"event": "e", "distinct_id": "hot", "properties": {"$set": {"k": i}}})
    for i in range(25):
        bodies.append(
            {"event": "e", "distinct_id": "hotf", "properties": {"$set": {"f": i + 0.5}}}
        )
    for u in range(4):
        bodies.append(
            {"event": "e", "distinct_id": f"small{u}", "properties": {"$set": {"a": u}}}
        )
    raw = _raw(bodies)
    raw += [
        Row(
            request_seq=len(raw),
            endpoint="alias",
            body=json.dumps({"distinct_id": "small0", "alias": "small1"}),
        )
    ]
    return decode_normalize_requests(spark.createDataFrame(raw))


def test_person_auto_routes_hot_component_and_matches_replay(spark, monkeypatch):
    monkeypatch.setattr(person_state, "MEGA_COMPONENT_MIN_OPS", 20)
    cmds = _mixed_commands(spark)
    snap_a, per_a = fold_person_state(cmds, team_id=7, fast_path="auto")
    snap_s, per_s = fold_person_state(cmds, team_id=7, fast_path=False)
    assert sorted(tuple(r) for r in snap_a.collect()) == sorted(
        tuple(r) for r in snap_s.collect()
    )
    assert sorted(tuple(r) for r in per_a.collect()) == sorted(
        tuple(r) for r in per_s.collect()
    )


def test_person_auto_all_hot_eligible_takes_jvm_path(spark, monkeypatch):
    monkeypatch.setattr(person_state, "MEGA_COMPONENT_MIN_OPS", 10)
    # FOLD_PIN hides the fold subtree behind a Scan ExistingRDD; disable
    # it so the executed plan shows which engine ran
    monkeypatch.setattr(person_state, "FOLD_PIN", False)
    bodies = [
        {"event": "e", "distinct_id": "hot", "properties": {"$set": {"k": i}}}
        for i in range(12)
    ]
    # pin commands: decode itself is a MapInPandas pass, and the Python
    # replay is now a MapInPandas stream too — the checkpoint hides
    # decode so the assertion sees only the fold engine
    cmds = decode_normalize_requests(
        spark.createDataFrame(_raw(bodies))
    ).localCheckpoint(eager=True)
    _, persons = fold_person_state(cmds, fast_path="auto")
    plan = persons._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    rows = persons.collect()
    assert len(rows) == 1 and rows[0]["version"] == 12


def test_person_auto_small_batch_skips_flag_pass(spark, monkeypatch):
    # below MEGA_COMPONENT_MIN_OPS/2 commands no component can be mega:
    # auto degenerates to the plain replay (single MapInPandas stream)
    monkeypatch.setattr(person_state, "FOLD_PIN", False)
    bodies = [
        {"event": "e", "distinct_id": "u", "properties": {"$set": {"k": 1}}}
    ]
    cmds = decode_normalize_requests(
        spark.createDataFrame(_raw(bodies))
    ).localCheckpoint(eager=True)
    _, persons = fold_person_state(cmds, fast_path="auto")
    plan = persons._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def _group_commands(spark):
    rows = []
    seq = 0
    for i in range(30):  # hot cell: 60 ops (update + lookup per command)
        rows.append(
            Row(
                request_seq=seq,
                item_index=0,
                timestamp=None,
                groups=json.dumps({"company": "hot"}),
                group_updates=json.dumps(
                    [
                        {
                            "group_type": "company",
                            "group_key": "hot",
                            "properties": {"p": i},
                        }
                    ]
                ),
                group_identify=None,
            )
        )
        seq += 1
    for u in range(3):  # small cells
        rows.append(
            Row(
                request_seq=seq,
                item_index=0,
                timestamp=None,
                groups=json.dumps({"team": f"t{u}"}),
                group_updates=json.dumps(
                    [
                        {
                            "group_type": "team",
                            "group_key": f"t{u}",
                            "properties": {"q": u},
                        }
                    ]
                ),
                group_identify=None,
            )
        )
        seq += 1
    return spark.createDataFrame(
        rows,
        "request_seq long, item_index long, timestamp string, groups string, "
        "group_updates string, group_identify string",
    )


def test_group_auto_routes_hot_cell_and_matches_replay(spark, monkeypatch):
    monkeypatch.setattr(person_state, "MEGA_COMPONENT_MIN_OPS", 40)
    cmds = _group_commands(spark)
    res_a, grp_a = fold_group_state(cmds, fast_path="auto")
    res_s, grp_s = fold_group_state(cmds, fast_path=False)
    assert sorted(tuple(r) for r in res_a.collect()) == sorted(
        tuple(r) for r in res_s.collect()
    )

    def _g(df):
        return sorted(
            (r["group_type"], r["group_key"], r["version"], sorted(r["properties"].items()))
            for r in df.collect()
        )

    assert _g(grp_a) == _g(grp_s)


def test_hot_key_million_ops_default_settings(spark):
    """The verdict's synthetic hot-key scenario: one distinct_id with 1M
    ops among normal traffic, folded with DEFAULT settings. The replay
    would buffer all 1M ops of the hot component in one pandas frame;
    the mega routing must instead stream it through the JVM fold (no
    FlatMapGroupsInPandas task ever sees the hot component)."""
    n_hot = 1_000_000
    hot = spark.range(n_hot).select(
        F.col("id").alias("request_seq"),
        F.lit(0).cast("long").alias("item_index"),
        F.lit(None).cast("string").alias("alias"),
        F.lit("0").alias("skip_person"),
        F.lit(None).cast("string").alias("anon_distinct_id"),
        F.lit("hot").alias("distinct_id"),
        F.concat(
            F.lit('{"distinct_id": "hot", "set": {"k": '),
            (F.col("id") % 1000).cast("string"),
            F.lit('}, "set_once": {}, "unset": []}'),
        ).alias("person_update"),
        F.lit(None).cast("string").alias("timestamp"),
    )
    normal = spark.range(n_hot, n_hot + 50).select(
        F.col("id").alias("request_seq"),
        F.lit(0).cast("long").alias("item_index"),
        F.lit(None).cast("string").alias("alias"),
        F.lit("0").alias("skip_person"),
        F.lit(None).cast("string").alias("anon_distinct_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("distinct_id"),
        F.concat(
            F.lit('{"distinct_id": "u'),
            F.col("id").cast("string"),
            F.lit('", "set": {"a": 1}, "set_once": {}, "unset": []}'),
        ).alias("person_update"),
        F.lit(None).cast("string").alias("timestamp"),
    )
    cmds = hot.unionByName(normal)
    snapshots, persons = fold_person_state(cmds, team_id=1, fast_path="auto")
    by_id = {r["canonical_id"]: r for r in persons.collect()}
    assert len(by_id) == 51
    hot_rec = by_id["hot"]
    assert hot_rec["version"] == n_hot
    # last write wins: k = (n_hot-1) % 1000, JSON-encoded map value
    assert json.loads(hot_rec["properties"]["k"]) == (n_hot - 1) % 1000
    assert snapshots.count() == n_hot + 50
