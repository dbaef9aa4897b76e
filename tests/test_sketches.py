"""Accuracy gates for approximate operators (rows-only driver entries) and
lake time-travel/expiration tests."""

from __future__ import annotations

from pyspark.sql import Row

from tests.conftest import SF_SMOKE


def test_approx_distinct_within_rsd(spark):
    from hogflare_spark.plans import QUERIES, load_all

    load_all()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["ev_approx_distinct_users"](spark, SF_SMOKE).collect()
    }
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(
            __import__("pyspark.sql.functions", fromlist=["F"]).count_distinct("user_id").alias("n")
        ).collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel_err < 0.05, f"{k}: approx {approx[k]} vs exact {exact[k]}"


def test_time_travel_and_expiration(spark, tmp_path):
    from hogflare_spark.sinks.lake import expire_versions, read_table, upsert_table

    root = str(tmp_path / "dim")
    upsert_table(spark, spark.createDataFrame([Row(key="a", val=1)]), root, ["key"])
    upsert_table(spark, spark.createDataFrame([Row(key="a", val=2)]), root, ["key"])
    upsert_table(spark, spark.createDataFrame([Row(key="a", val=3)]), root, ["key"])

    assert read_table(spark, root).collect()[0]["val"] == 3
    assert read_table(spark, root, version=1).collect()[0]["val"] == 1
    assert read_table(spark, root, version=2).collect()[0]["val"] == 2

    dropped = expire_versions(root, keep_last=2)
    assert dropped == [1]
    assert read_table(spark, root).collect()[0]["val"] == 3
    try:
        read_table(spark, root, version=1)
        raise AssertionError("expired version must not be readable")
    except FileNotFoundError:
        pass
