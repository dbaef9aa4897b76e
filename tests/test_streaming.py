"""Structured Streaming tests: incremental foreachBatch ingest equals the
batch fold over the same input; per-key stateful operator; watermarked
windowed aggregation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _write_batch(landing_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")
    os.replace(tmp, path)


def _capture(seq: int, distinct_id: str, props: dict | None = None) -> dict:
    body = {"event": "ev", "distinct_id": distinct_id}
    if props:
        body["properties"] = props
    return {"request_seq": seq, "endpoint": "capture", "body": json.dumps(body)}


def _alias(seq: int, distinct_id: str, alias: str) -> dict:
    return {
        "request_seq": seq,
        "endpoint": "alias",
        "body": json.dumps({"distinct_id": distinct_id, "alias": alias}),
    }


BATCH1 = [
    _capture(1, "anon-1", {"$set": {"plan": "free"}}),
    _capture(2, "anon-2", {"$set": {"team": "red"}, "$set_once": {"first": "a"}}),
]
BATCH2 = [
    # cross-micro-batch identity merge: user-1 absorbs anon-1's record
    _alias(3, "user-1", "anon-1"),
    _capture(4, "user-1", {"$set": {"plan": "pro"}}),
    _capture(5, "anon-2", {"$set_once": {"first": "b"}, "$unset": ["team"]}),
]


def test_streaming_ingest_matches_batch_fold(spark, tmp_path):
    from hogflare_spark.operators.ingest import ingest_raw_requests
    from hogflare_spark.streaming.ingest_stream import (
        StreamingIngestJob,
        read_request_stream,
    )

    landing = str(tmp_path / "landing")
    warehouse = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")

    job = StreamingIngestJob(warehouse)

    _write_batch(landing, "b1.json", BATCH1)
    job.run_available_now(read_request_stream(spark, landing), ckpt)
    _write_batch(landing, "b2.json", BATCH2)
    job.run_available_now(read_request_stream(spark, landing), ckpt)

    stream_persons = {
        r["canonical_id"]: r for r in job.read_persons(spark).collect()
    }

    batch_raw = spark.createDataFrame(
        [Row(request_seq=r["request_seq"], endpoint=r["endpoint"], body=r["body"])
         for r in BATCH1 + BATCH2]
    )
    batch_persons = {
        r["canonical_id"]: r
        for r in ingest_raw_requests(batch_raw)["persons"].collect()
    }

    assert set(stream_persons) == set(batch_persons)
    for cid, want in batch_persons.items():
        got = stream_persons[cid]
        assert sorted(got["distinct_ids"]) == sorted(want["distinct_ids"]), cid
        assert got["properties"] == want["properties"], cid
        assert got["properties_set_once"] == want["properties_set_once"], cid
        assert got["version"] == want["version"], cid

    # the merged identity: user-1 canonical, plan=pro, both distinct_ids
    merged = stream_persons["user-1"]
    assert json.loads(merged["properties"]["plan"]) == "pro"
    assert set(merged["distinct_ids"]) == {"user-1", "anon-1"}
    # anon-2's $set_once first=a survived batch2's first=b; team unset
    a2 = stream_persons["anon-2"]
    assert json.loads(a2["properties_set_once"]["first"]) == "a"
    assert "team" not in a2["properties"]

    # events landed date-partitioned, one row per item
    events = spark.read.parquet(os.path.join(warehouse, "events"))
    assert events.count() == len(BATCH1 + BATCH2)
    assert "event_date" in events.columns


def _identify(seq: int, distinct_id: str, props: dict | None = None,
              anon: str | None = None) -> dict:
    body: dict = {"distinct_id": distinct_id}
    if props:
        body["properties"] = props
    if anon:
        body["$anon_distinct_id"] = anon
    return {"request_seq": seq, "endpoint": "identify", "body": json.dumps(body)}


# The reference DO e2e scenario (reference tests/persons_do.rs:22-99:
# identify $set/$set_once → capture $set → alias absorbs anon), extended
# with a second merge chain, an identify auto-alias, and an $unset.
CHAOS_OPS = [
    _capture(1, "anon-1", {"$set": {"plan": "free"}}),
    _identify(2, "person-1", {"$set": {"email": "person1@example.com"},
                              "$set_once": {"created_at": "2024-01-01"}}),
    _capture(3, "anon-1", {"$set": {"theme": "dark"}}),
    _alias(4, "person-1", "anon-1"),
    _capture(5, "person-1", {"$set": {"plan": "pro"}}),
    _identify(6, "person-2", {"$set": {"email": "p2@example.com"}}, anon="anon-2"),
    _capture(7, "anon-2", {"$set_once": {"src": "ad"}}),
    _capture(8, "person-2", {"$unset": ["email"]}),
    _capture(9, "anon-3", {"$set": {"solo": True}}),
]

# batch-boundary splits: all-at-once, one-op-per-batch, and two uneven
# cuts that place each merge op at a batch edge (before/after its anon's
# captures) — the orderings that broke the reference's DO serialization
# are the ones worth replaying here.
CHAOS_SPLITS = [
    [9],
    [1] * 9,
    [3, 1, 1, 4],
    [1, 4, 2, 2],
]


def test_streaming_chaos_batch_splits_match_batch_fold(spark, tmp_path):
    """VERDICT r1 item 10: whatever micro-batch boundaries the stream
    commits under, the final persons table equals the one-shot batch fold
    over the same ordered ops."""
    from hogflare_spark.operators.ingest import ingest_raw_requests
    from hogflare_spark.streaming.ingest_stream import (
        StreamingIngestJob,
        read_request_stream,
    )

    batch_raw = spark.createDataFrame(
        [Row(request_seq=r["request_seq"], endpoint=r["endpoint"], body=r["body"])
         for r in CHAOS_OPS]
    )
    want = {
        r["canonical_id"]: r
        for r in ingest_raw_requests(batch_raw)["persons"].collect()
    }

    for si, split in enumerate(CHAOS_SPLITS):
        assert sum(split) == len(CHAOS_OPS)
        landing = str(tmp_path / f"landing{si}")
        ckpt = str(tmp_path / f"ckpt{si}")
        job = StreamingIngestJob(str(tmp_path / f"wh{si}"))
        start = 0
        for bi, size in enumerate(split):
            _write_batch(landing, f"b{bi}.json", CHAOS_OPS[start:start + size])
            start += size
            job.run_available_now(read_request_stream(spark, landing), ckpt)

        persons = job.read_persons(spark)
        got = {r["canonical_id"]: r for r in persons.collect()}
        assert set(got) == set(want), f"split {split}"
        for cid, w in want.items():
            g = got[cid]
            assert sorted(g["distinct_ids"]) == sorted(w["distinct_ids"]), (split, cid)
            assert g["properties"] == w["properties"], (split, cid)
            assert g["properties_set_once"] == w["properties_set_once"], (split, cid)
            assert g["version"] == w["version"], (split, cid)

        # the reference's fetch_person asserts (S13 debug lookup): anon-1
        # resolves to canonical person-1 carrying the merged state
        p1 = persons.where(F.array_contains("distinct_ids", "anon-1")).collect()
        assert len(p1) == 1 and p1[0]["canonical_id"] == "person-1", split
        assert json.loads(p1[0]["properties"]["plan"]) == "pro", split
        assert json.loads(p1[0]["properties"]["email"]) == "person1@example.com"
        assert json.loads(p1[0]["properties_set_once"]["created_at"]) == "2024-01-01"
        # identify auto-alias merged anon-2 into person-2; email later unset
        p2 = got["person-2"]
        assert "anon-2" in p2["distinct_ids"] and "email" not in p2["properties"]
        assert json.loads(p2["properties_set_once"]["src"]) == "ad"


HYBRID_OPS = [
    _capture(1, "anon-1", {"$set": {"plan": "free"}}),
    _capture(2, "u2", {"$set": {"t": "x"}}),
    _alias(3, "user-1", "anon-1"),  # cross-key merge → touched-component
    # delta: both edge endpoints are in the touched set, so the lane
    # seeds anon-1's record, merges it into user-1, and writes a
    # tombstone retiring the absorbed canonical id
    _capture(4, "anon-1", {"$set": {"plan": "pro"}}),  # touches the merged
    # person through its ABSORBED id — the affected-person semi-join must
    # resolve anon-1 → canonical user-1
    _capture(5, "new-guy", {"$set": {"n": 1}}),  # creates a person in a
    # delta; its id must continue above the pointer's tracked max
    _capture(6, "u2", {"$unset": ["t"]}),
]


def test_hybrid_streaming_fast_lane_converges_to_batch_fold(spark, tmp_path):
    """VERDICT r3 item 4 (+ r4 item 7): a mixed stream (captures + late
    alias) through the hybrid job — EVERY post-bootstrap batch takes the
    O(touched components) delta lane, alias batches included — converges
    to the one-shot batch fold, ids included."""
    from hogflare_spark.operators.ingest import ingest_raw_requests
    from hogflare_spark.streaming.ingest_stream import (
        StreamingIngestJob,
        read_request_stream,
    )

    landing = str(tmp_path / "landing")
    warehouse = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ck")
    job = StreamingIngestJob(warehouse, hybrid=True)

    for bi, (start, end) in enumerate([(0, 2), (2, 3), (3, 6)]):
        _write_batch(landing, f"b{bi}.json", HYBRID_OPS[start:end])
        job.run_available_now(read_request_stream(spark, landing), ckpt)

    # the alias micro-batch (batch id 1) is a DELTA now, not a full
    # rewrite: the pointer keeps base=0 with both later batches stacked
    # as deltas
    pointer = json.load(open(os.path.join(warehouse, "persons", "_STATE")))
    assert pointer["base"] == 0 and pointer["deltas"] == [1, 2], pointer
    assert os.path.isdir(os.path.join(warehouse, "persons", "d=1"))
    assert os.path.isdir(os.path.join(warehouse, "persons", "d=2"))
    # the alias delta is O(touched): exactly the merged record plus the
    # tombstone for the absorbed canonical id — u2's record must NOT be
    # replayed into it
    d1 = spark.read.parquet(os.path.join(warehouse, "persons", "d=1"))
    d1_rows = {r["canonical_id"]: r for r in d1.collect()}
    assert set(d1_rows) == {"user-1", "anon-1"}, sorted(d1_rows)
    assert d1_rows["anon-1"]["uuid"] is None  # tombstone
    assert d1_rows["user-1"]["uuid"] is not None

    batch_raw = spark.createDataFrame(
        [Row(request_seq=r["request_seq"], endpoint=r["endpoint"], body=r["body"])
         for r in HYBRID_OPS]
    )
    want = {
        r["canonical_id"]: r
        for r in ingest_raw_requests(batch_raw)["persons"].collect()
    }
    got = {r["canonical_id"]: r for r in job.read_persons(spark).collect()}
    assert set(got) == set(want)
    for cid, w in want.items():
        g = got[cid]
        assert sorted(g["distinct_ids"]) == sorted(w["distinct_ids"]), cid
        assert g["properties"] == w["properties"], cid
        assert g["properties_set_once"] == w["properties_set_once"], cid
        assert g["version"] == w["version"], cid
        assert g["id"] == w["id"], cid

    merged = got["user-1"]
    assert json.loads(merged["properties"]["plan"]) == "pro"
    assert set(merged["distinct_ids"]) == {"user-1", "anon-1"}
    assert "t" not in got["u2"]["properties"]
    events = spark.read.parquet(os.path.join(warehouse, "events"))
    assert events.count() == len(HYBRID_OPS)


def test_hybrid_streaming_chaos_splits_match_batch_fold(spark, tmp_path):
    """The chaos scenario through the hybrid job: whatever the batch
    boundaries, and whichever lane each batch takes, the result equals
    the batch fold (same contract the full-lane chaos test pins)."""
    from hogflare_spark.operators.ingest import ingest_raw_requests
    from hogflare_spark.streaming.ingest_stream import (
        StreamingIngestJob,
        read_request_stream,
    )

    batch_raw = spark.createDataFrame(
        [Row(request_seq=r["request_seq"], endpoint=r["endpoint"], body=r["body"])
         for r in CHAOS_OPS]
    )
    want = {
        r["canonical_id"]: r
        for r in ingest_raw_requests(batch_raw)["persons"].collect()
    }

    for si, split in enumerate([[1] * 9, [3, 1, 1, 4]]):
        landing = str(tmp_path / f"hlanding{si}")
        ckpt = str(tmp_path / f"hckpt{si}")
        warehouse = str(tmp_path / f"hwh{si}")
        job = StreamingIngestJob(warehouse, hybrid=True)
        start = 0
        for bi, size in enumerate(split):
            _write_batch(landing, f"b{bi}.json", CHAOS_OPS[start:start + size])
            start += size
            job.run_available_now(read_request_stream(spark, landing), ckpt)

        got = {r["canonical_id"]: r for r in job.read_persons(spark).collect()}
        assert set(got) == set(want), split
        for cid, w in want.items():
            g = got[cid]
            assert sorted(g["distinct_ids"]) == sorted(w["distinct_ids"]), (split, cid)
            assert g["properties"] == w["properties"], (split, cid)
            assert g["properties_set_once"] == w["properties_set_once"], (split, cid)
            assert g["version"] == w["version"], (split, cid)
        # the one-op-per-batch split must actually have exercised the
        # delta lane (trailing captures after the last cross-key op)
        if split == [1] * 9:
            deltas = [
                d for d in os.listdir(os.path.join(warehouse, "persons"))
                if d.startswith("d=")
            ]
            assert deltas, "fast lane never engaged"


def _group_upsert(seq: int, gtype: str, gkey: str, props: dict | None) -> dict:
    return {
        "request_seq": seq,
        "endpoint": "groups",
        "body": json.dumps(
            {"group_type": gtype, "group_key": gkey, "properties": props}
        ),
    }


def test_hybrid_streaming_group_delta_lane_converges(spark, tmp_path):
    """Group state through the hybrid job's delta lane (groups never have
    cross-key ops, so every post-bootstrap batch is a delta) equals the
    one-shot batch fold."""
    from hogflare_spark.operators.ingest import ingest_raw_requests
    from hogflare_spark.streaming.ingest_stream import (
        StreamingIngestJob,
        read_request_stream,
    )

    ops = [
        _group_upsert(1, "team", "t1", {"m": 1}),
        _capture(2, "u1", {"$set": {"a": 1}}),
        # batch 2 (delta lane): new group key + LWW update of t1
        _group_upsert(3, "team", "t2", {"m": 7}),
        _group_upsert(4, "team", "t1", {"m": 5, "x": "y"}),
        _capture(5, "u1", {"$set": {"a": 2}}),
    ]
    landing = str(tmp_path / "glanding")
    warehouse = str(tmp_path / "gwh")
    ckpt = str(tmp_path / "gck")
    job = StreamingIngestJob(
        warehouse, group_types=("company", "team", None, None, None), hybrid=True
    )
    for bi, (start, end) in enumerate([(0, 2), (2, 5)]):
        _write_batch(landing, f"b{bi}.json", ops[start:end])
        job.run_available_now(read_request_stream(spark, landing), ckpt)

    # batch id 1 wrote a groups DELTA, not a full rewrite
    pointer = json.load(open(os.path.join(warehouse, "groups", "_STATE")))
    assert pointer["base"] == 0 and pointer["deltas"] == [1], pointer
    assert os.path.isdir(os.path.join(warehouse, "groups", "d=1"))

    batch_raw = spark.createDataFrame(
        [Row(request_seq=r["request_seq"], endpoint=r["endpoint"], body=r["body"])
         for r in ops]
    )
    want = {
        (r["group_type"], r["group_key"]): r
        for r in ingest_raw_requests(
            batch_raw, group_types=("company", "team", None, None, None)
        )["groups"].collect()
    }
    got = {
        (r["group_type"], r["group_key"]): r
        for r in job.read_groups(spark).collect()
    }
    assert set(got) == set(want) == {("team", "t1"), ("team", "t2")}
    for key, w in want.items():
        g = got[key]
        assert g["properties"] == w["properties"], key
        assert g["version"] == w["version"], key
    assert json.loads(got[("team", "t1")]["properties"]["m"]) == 5


def test_streaming_sequential_ids_continue_across_batches(spark, tmp_path):
    from hogflare_spark.streaming.ingest_stream import (
        StreamingIngestJob,
        read_request_stream,
    )

    landing = str(tmp_path / "landing")
    job = StreamingIngestJob(str(tmp_path / "wh"))

    _write_batch(landing, "b1.json", [_capture(1, "a"), _capture(2, "b")])
    job.run_available_now(read_request_stream(spark, landing), str(tmp_path / "ck"))
    ids1 = {r["canonical_id"]: r["id"] for r in job.read_persons(spark).collect()}

    _write_batch(landing, "b2.json", [_capture(3, "c"), _capture(4, "a")])
    job.run_available_now(read_request_stream(spark, landing), str(tmp_path / "ck"))
    ids2 = {r["canonical_id"]: r["id"] for r in job.read_persons(spark).collect()}

    # prior ids stable, new id continues the sequence
    assert ids2["a"] == ids1["a"] and ids2["b"] == ids1["b"]
    assert ids2["c"] == max(ids1.values()) + 1


def test_stateful_person_snapshots_operator(spark, tmp_path):
    from hogflare_spark.streaming.ingest_stream import stateful_person_snapshots

    src = str(tmp_path / "cmds")
    out_rows = []

    cmds = [
        {"request_seq": 1, "item_index": 0, "distinct_id": "u1",
         "person_update": json.dumps({"set": {"a": 1}})},
        {"request_seq": 2, "item_index": 0, "distinct_id": "u1",
         "person_update": json.dumps({"set_once": {"a": 9, "b": 2}})},
        {"request_seq": 3, "item_index": 0, "distinct_id": "u2",
         "person_update": json.dumps({"set": {"x": True}})},
    ]
    _write_batch(src, "c1.json", cmds)

    schema = "request_seq long, item_index long, distinct_id string, person_update string"
    stream = spark.readStream.schema(schema).json(src)
    snaps = stateful_person_snapshots(stream)

    q = (
        snaps.writeStream.foreachBatch(
            lambda df, _id: out_rows.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    by_seq = {r["request_seq"]: r for r in out_rows}
    assert len(by_seq) == 3
    # post-update snapshots: set wins over set_once; set_once a ignored
    assert json.loads(by_seq[1]["person_properties"]) == {"a": 1}
    assert json.loads(by_seq[2]["person_properties"]) == {"a": 1, "b": 2}
    assert by_seq[2]["person_version"] == 2
    assert json.loads(by_seq[3]["person_properties"]) == {"x": True}

    # second micro-batch resumes state from the store
    _write_batch(src, "c2.json", [
        {"request_seq": 4, "item_index": 0, "distinct_id": "u1",
         "person_update": json.dumps({"unset": ["a"]})},
    ])
    q = (
        spark.readStream.schema(schema).json(src)
        .transform(stateful_person_snapshots)
        .writeStream.foreachBatch(lambda df, _id: out_rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    by_seq = {r["request_seq"]: r for r in out_rows}
    assert json.loads(by_seq[4]["person_properties"]) == {"b": 2}
    assert by_seq[4]["person_version"] == 3


def test_stateful_person_snapshots_seeded_from_versioned_state(spark, tmp_path):
    """VERDICT r3 item 4 (second half): the low-latency state-store lane
    seeds first-seen keys from the versioned persons table, continuing
    version counters and property bags — including keys reachable only
    through an absorbed (merged) distinct_id."""
    from hogflare_spark.streaming.ingest_stream import (
        StreamingIngestJob,
        read_request_stream,
        stateful_person_snapshots,
    )

    # authoritative table: u1 has 2 updates; anon-1 merged into user-1
    landing = str(tmp_path / "slanding")
    warehouse = str(tmp_path / "swh")
    job = StreamingIngestJob(warehouse)
    _write_batch(landing, "b0.json", [
        _capture(1, "u1", {"$set": {"a": 1}}),
        _capture(2, "u1", {"$set_once": {"first": "x"}}),
        _capture(3, "anon-1", {"$set": {"plan": "free"}}),
        _alias(4, "user-1", "anon-1"),
    ])
    job.run_available_now(read_request_stream(spark, landing), str(tmp_path / "sck"))
    persons_dir = os.path.join(warehouse, "persons")

    src = str(tmp_path / "scmds")
    _write_batch(src, "c1.json", [
        {"request_seq": 10, "item_index": 0, "distinct_id": "u1",
         "person_update": json.dumps({"set": {"a": 2}})},
        # first touch through the ABSORBED id: must seed user-1's record
        {"request_seq": 11, "item_index": 0, "distinct_id": "anon-1",
         "person_update": json.dumps({"set_once": {"plan": "paid"}})},
        {"request_seq": 12, "item_index": 0, "distinct_id": "fresh",
         "person_update": json.dumps({"set": {"n": 1}})},
    ])
    schema = "request_seq long, item_index long, distinct_id string, person_update string"
    out_rows = []
    q = (
        spark.readStream.schema(schema).json(src)
        .transform(lambda df: stateful_person_snapshots(df, seed_persons_dir=persons_dir))
        .writeStream.foreachBatch(lambda df, _id: out_rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "sck2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    by_seq = {r["request_seq"]: r for r in out_rows}
    # u1: seeded with {a:1}, set_once {first:x}, version 2 → update makes 3
    assert json.loads(by_seq[10]["person_properties"]) == {"a": 2, "first": "x"}
    assert by_seq[10]["person_version"] == 3
    # anon-1 resolves to the MERGED record: plan already set → set_once noop
    assert json.loads(by_seq[11]["person_properties"]) == {"plan": "free"}
    assert by_seq[11]["person_version"] >= 2
    # unknown key starts fresh at version 1
    assert json.loads(by_seq[12]["person_properties"]) == {"n": 1}
    assert by_seq[12]["person_version"] == 1


def test_windowed_event_counts_watermark(spark, tmp_path):
    from hogflare_spark.streaming.ingest_stream import windowed_event_counts

    src = str(tmp_path / "ev")
    rows = [
        {"event": "a", "created_at": "2025-01-01T00:00:10Z"},
        {"event": "a", "created_at": "2025-01-01T00:00:50Z"},
        {"event": "b", "created_at": "2025-01-01T00:01:10Z"},
        {"event": "a", "created_at": "2025-01-01T00:02:05Z"},
    ]
    _write_batch(src, "e1.json", rows)

    stream = (
        spark.readStream.schema("event string, created_at string")
        .json(src)
        .withColumn("created_at", F.to_timestamp("created_at"))
    )
    agg = windowed_event_counts(stream, window="1 minute", watermark="5 minutes")

    got = []
    q = (
        agg.writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    counts = {(str(r["window_start"]), r["event"]): r["n"] for r in got}
    assert counts[("2025-01-01 00:00:00", "a")] == 2
    assert counts[("2025-01-01 00:01:00", "b")] == 1
    assert counts[("2025-01-01 00:02:00", "a")] == 1


def test_streaming_sessions_gap_boundary_and_merge(spark, tmp_path):
    """Closed-boundary session semantics: an event exactly `gap` after
    the previous one still MERGES (touching session windows coalesce) —
    the property the batch oracle must mirror with `diff > gap`. A
    session straddling two micro-batches is stitched in the state store
    and emitted once, with the merged count; a clearly-past-gap event
    opens a new session."""
    from hogflare_spark.streaming.ingest_stream import streaming_sessions

    src = str(tmp_path / "sess")
    b1 = [
        # u1: two events 10 min apart -> one session (merged)
        {"user_id": 1, "created_at": "2025-01-01T00:00:00Z"},
        {"user_id": 1, "created_at": "2025-01-01T00:10:00Z"},
        # u2: second event exactly 30 min later -> touching windows MERGE
        {"user_id": 2, "created_at": "2025-01-01T00:00:00Z"},
        {"user_id": 2, "created_at": "2025-01-01T00:30:00Z"},
        # u3: second event past the gap -> two sessions
        {"user_id": 3, "created_at": "2025-01-01T00:00:00Z"},
        {"user_id": 3, "created_at": "2025-01-01T00:30:00.000001Z"},
    ]
    # u1's third event lands in the NEXT micro-batch, 5 min after the
    # second -> still the same session (cross-batch merge)
    b2 = [
        {"user_id": 1, "created_at": "2025-01-01T00:15:00Z"},
        # watermark pusher far in the future closes everything
        {"user_id": 9, "created_at": "2025-01-02T00:00:00Z"},
    ]
    out_dir = str(tmp_path / "out")
    for i, rows in enumerate([b1, b2]):
        _write_batch(src, f"s{i}.json", rows)
        stream = (
            spark.readStream.schema("user_id bigint, created_at string")
            .json(src)
            .withColumn("created_at", F.to_timestamp("created_at"))
        )
        q = (
            streaming_sessions(stream, gap="30 minutes", watermark="1 minute")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ck_sess"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    emitted = (
        spark.read.schema(
            "user_id bigint, session_start timestamp, "
            "session_end timestamp, n_events long"
        )
        .parquet(out_dir)
        .collect()
    )
    sessions = {
        (r["user_id"], str(r["session_start"])): r["n_events"] for r in emitted
    }
    # u1: ONE session of 3 events spanning both micro-batches
    assert sessions[(1, "2025-01-01 00:00:00")] == 3
    assert sum(1 for (u, _) in sessions if u == 1) == 1
    # u2: exactly-at-gap event merged into one session
    assert sessions[(2, "2025-01-01 00:00:00")] == 2
    assert sum(1 for (u, _) in sessions if u == 2) == 1
    # u3: a microsecond past the gap opened a second session
    assert sessions[(3, "2025-01-01 00:00:00")] == 1
    assert sum(1 for (u, _) in sessions if u == 3) == 2


def _raw_df(spark, rows):
    return spark.createDataFrame(
        [Row(request_seq=r["request_seq"], endpoint=r["endpoint"], body=r["body"])
         for r in rows]
    )


def test_batch_replay_is_idempotent_both_lanes(spark, tmp_path):
    """A foreachBatch body can re-run with the same batch id after a
    crash between the state commit and the stream checkpoint. Replays
    must be REWRITES, not re-applications: person/group version counters
    must not double, ids must not advance, and warehouse events must not
    duplicate — for the full lane AND the hybrid delta lane."""
    from hogflare_spark.streaming.ingest_stream import StreamingIngestJob

    def snap(job):
        persons = {
            r["canonical_id"]: (r["version"], r["id"], dict(r["properties"] or {}))
            for r in job.read_persons(spark).collect()
        }
        groups = {
            (r["group_type"], r["group_key"]): r["version"]
            for r in (job.read_groups(spark) or spark.createDataFrame([], "group_type string, group_key string, version long")).collect()
        }
        ev_dir = job.events_dir
        n_events = (
            spark.read.parquet(ev_dir).count() if os.path.isdir(ev_dir) else 0
        )
        return persons, groups, n_events

    # ---- full lane (non-hybrid job) -----------------------------------
    job = StreamingIngestJob(str(tmp_path / "wh_full"))
    job.process_batch(_raw_df(spark, BATCH1), 0)
    job.process_batch(_raw_df(spark, BATCH2), 1)
    want = snap(job)
    job.process_batch(_raw_df(spark, BATCH2), 1)  # checkpoint replay
    assert snap(job) == want
    # and a replay of a replay
    job.process_batch(_raw_df(spark, BATCH2), 1)
    assert snap(job) == want

    # ---- hybrid job: batch 1 (alias) takes the full lane, batch 2
    # (alias-free) the delta lane; replay each ----------------------------
    hj = StreamingIngestJob(str(tmp_path / "wh_hybrid"), hybrid=True)
    hj.process_batch(_raw_df(spark, BATCH1), 0)
    hj.process_batch(_raw_df(spark, BATCH2), 1)  # alias -> full lane
    delta_batch = [
        _capture(6, "user-1", {"$set": {"plan": "max"}}),
        _capture(7, "anon-2", {"$set": {"color": "blue"}}),
    ]
    hj.process_batch(_raw_df(spark, delta_batch), 2)  # delta lane
    want_h = snap(hj)
    hj.process_batch(_raw_df(spark, delta_batch), 2)  # replay delta
    assert snap(hj) == want_h
    hj.process_batch(_raw_df(spark, delta_batch), 2)  # replay of a replay
    assert snap(hj) == want_h
    # a later batch after the replays converges normally
    hj.process_batch(_raw_df(spark, [_capture(8, "user-1", {"$set": {"z": 1}})]), 3)
    final = snap(hj)
    assert final[0]["user-1"][0] == want_h[0]["user-1"][0] + 1  # one more version
    hj.process_batch(_raw_df(spark, [_capture(8, "user-1", {"$set": {"z": 1}})]), 3)
    assert snap(hj) == final  # and batch 3's replay is a rewrite too


def test_fresh_checkpoint_new_run_is_not_a_replay(spark, tmp_path):
    """Spark batch ids restart at 0 with a fresh checkpoint dir. A NEW
    stream's batch 0 over an existing warehouse must APPLY on top of the
    committed state — not be misread as a checkpoint replay of the OLD
    stream's batch 0 (which would roll the pointer back and silently
    discard state and events). Run-epoched commit ids keep the two id
    spaces disjoint while same-run replays stay recognizable."""
    from hogflare_spark.sinks.lake import read_events
    from hogflare_spark.streaming.ingest_stream import StreamingIngestJob

    wh = str(tmp_path / "wh")

    def version_of(job, did):
        return {
            did_: r["version"]
            for r in job.read_persons(spark).collect()
            for did_ in (r["distinct_ids"] or [])
        }[did]

    a = StreamingIngestJob(wh, run_id="ckpt-a")
    a.process_batch(_raw_df(spark, BATCH1), 0)
    v_a = version_of(a, "anon-1")
    n_events_a = read_events(spark, a.events_dir).count()

    # a new stream (fresh checkpoint => new run id), batch ids restart
    b = StreamingIngestJob(wh, run_id="ckpt-b")
    nb = [_capture(10, "anon-1", {"$set": {"plan": "pro"}})]
    b.process_batch(_raw_df(spark, nb), 0)
    assert version_of(b, "anon-1") == v_a + 1, "new run must apply, not roll back"
    assert version_of(b, "anon-2") is not None  # untouched state survived
    assert read_events(spark, b.events_dir).count() == n_events_a + 1

    # while a genuine same-run replay of that batch is still a rewrite
    b2 = StreamingIngestJob(wh, run_id="ckpt-b")
    b2.process_batch(_raw_df(spark, nb), 0)
    assert version_of(b2, "anon-1") == v_a + 1
    assert read_events(spark, b2.events_dir).count() == n_events_a + 1


def test_alias_delta_batch_replay_is_a_rewrite(spark, tmp_path):
    """A checkpoint replay of an ALIAS-carrying delta batch (merge +
    tombstone) must be a rewrite: same merged record, same tombstone,
    no double version bump, no resurrected absorbed id."""
    from hogflare_spark.streaming.ingest_stream import StreamingIngestJob

    wh = str(tmp_path / "wh")
    job = StreamingIngestJob(wh, hybrid=True, run_id="r")
    job.process_batch(_raw_df(spark, BATCH1), 0)  # bootstrap: anon-1, anon-2

    alias_batch = [
        _alias(10, "user-1", "anon-1"),
        _capture(11, "user-1", {"$set": {"plan": "pro"}}),
    ]

    def snap():
        persons = {
            r["canonical_id"]: (r["version"], sorted(r["distinct_ids"]))
            for r in job.read_persons(spark).collect()
        }
        d = spark.read.parquet(os.path.join(wh, "persons", "d=1"))
        delta = {r["canonical_id"]: r["uuid"] is None for r in d.collect()}
        return persons, delta

    job.process_batch(_raw_df(spark, alias_batch), 1)  # alias delta
    want = snap()
    assert want[1] == {"user-1": False, "anon-1": True}  # merge + tombstone
    assert "anon-1" not in want[0] and "user-1" in want[0]
    assert sorted(want[0]["user-1"][1]) == ["anon-1", "user-1"]

    job.process_batch(_raw_df(spark, alias_batch), 1)  # checkpoint replay
    assert snap() == want
    job.process_batch(_raw_df(spark, alias_batch), 1)  # replay of a replay
    assert snap() == want


def test_resume_after_interleaved_writer_is_exactly_once(spark, tmp_path):
    """r6 verdict #3: run A commits batch 0; run B (fresh checkpoint)
    interleaves a write; A resumes from ITS OWN checkpoint and replays
    batch 0. Under the old last-writer `_RUN` scheme A's resume derived
    a FRESH epoch, so the replay missed its committed-batch marker and
    double-applied (duplicate events, state applied twice). The O_EXCL
    per-run epoch claim keeps A's epoch stable: the replay must be a
    pure rewrite."""
    from hogflare_spark.sinks.lake import read_events
    from hogflare_spark.streaming.ingest_stream import StreamingIngestJob

    wh = str(tmp_path / "wh")

    def version_of(job, did):
        return {
            did_: r["version"]
            for r in job.read_persons(spark).collect()
            for did_ in (r["distinct_ids"] or [])
        }[did]

    a = StreamingIngestJob(wh, run_id="run-a")
    epoch_a = a._resolve_epoch()
    a.process_batch(_raw_df(spark, BATCH1), 0)

    b = StreamingIngestJob(wh, run_id="run-b")
    assert b._resolve_epoch() != epoch_a  # distinct runs, distinct epochs
    b.process_batch(
        _raw_df(spark, [_capture(10, "anon-1", {"$set": {"plan": "pro"}})]), 0
    )
    v_after_b = version_of(b, "anon-1")
    n_events = read_events(spark, b.events_dir).count()

    # A resumes from its own checkpoint AFTER B wrote: same epoch back,
    # and the at-least-once replay of its batch 0 is a rewrite.
    a2 = StreamingIngestJob(wh, run_id="run-a")
    assert a2._resolve_epoch() == epoch_a, "resume must reuse the claimed epoch"
    a2.process_batch(_raw_df(spark, BATCH1), 0)
    assert version_of(a2, "anon-1") == v_after_b, "replay double-applied state"
    assert read_events(spark, a2.events_dir).count() == n_events, (
        "replay duplicated events"
    )

    # and B's own resume is likewise stable
    b2 = StreamingIngestJob(wh, run_id="run-b")
    assert b2._resolve_epoch() == b._resolve_epoch()


def test_epoch_claims_are_per_run_and_monotonic(tmp_path):
    """Sequential fresh runs claim strictly increasing epochs; a resume
    always resolves to the run's original claim regardless of how many
    writers interleaved; legacy `_RUN`-only warehouses are adopted at
    their recorded epoch."""
    import json as _json

    from hogflare_spark.streaming.ingest_stream import StreamingIngestJob

    wh = str(tmp_path / "wh")
    epochs = {}
    for rid in ("r1", "r2", "r3"):
        epochs[rid] = StreamingIngestJob(wh, run_id=rid)._resolve_epoch()
    assert len(set(epochs.values())) == 3
    assert epochs["r1"] < epochs["r2"] < epochs["r3"]
    for rid, e in epochs.items():
        assert StreamingIngestJob(wh, run_id=rid)._resolve_epoch() == e

    # legacy warehouse: only a _RUN record from the old scheme
    wh2 = str(tmp_path / "wh2")
    os.makedirs(wh2)
    with open(os.path.join(wh2, "_RUN"), "w") as fh:
        _json.dump({"run_id": "old", "epoch": 5}, fh)
    assert StreamingIngestJob(wh2, run_id="old")._resolve_epoch() == 5
    assert StreamingIngestJob(wh2, run_id="new")._resolve_epoch() == 6
    # ...and the adopted legacy run keeps 5 even after "new" wrote _RUN
    assert StreamingIngestJob(wh2, run_id="old")._resolve_epoch() == 5
