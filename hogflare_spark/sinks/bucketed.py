"""Bucketed table layouts: co-located joins without a shuffle.

At 100 TB the events↔persons (and events↔groups) joins are the hottest
recurring joins in the engine. Writing both sides bucketed by the join
key — `bucketBy(N, key)` + `sortBy(key)` — stores rows pre-partitioned
and pre-sorted on disk, so Spark plans the join with ZERO Exchange
operators: each task reads bucket i of both tables and merges. The
shuffle is paid once at write time and amortized over every subsequent
join, which is the same trade Iceberg's `bucket(N, key)` partition
transform makes (the reference's sink is Iceberg — this is the
Spark-native spelling of that layout).

Bucket-count discipline: both sides must use the same N (or integer
multiples, with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
pick N ≈ cluster cores × small-multiple so one bucket is one task.

`saveAsTable` is required — bucketing metadata lives in the catalog, a
path-only `parquet(path)` write silently drops it. With `path` set the
table is external: data stays at the given location, the catalog holds
only the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Write `df` as a bucketed (and bucket-sorted) catalog table."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def cokeyed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs the planner emits a SortMergeJoin with no
    Exchange on either side (asserted by the bucketed-join pytest); the
    per-bucket sort order also elides the Sorts when `sortBy` matches the
    join key.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
