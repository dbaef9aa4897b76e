"""Parquet table readers for the driver-generated test lake.

At 100 TB these would be Iceberg catalog tables (`spark.table(...)`) with
partition pruning; here each table is a single parquet file per
TESTDATA.md. The reader keeps the scan declarative so Catalyst pushes
filters and prunes columns into the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): a session built without
        # session.py's conf (e.g. the driver's own harness) would fail the
        # scan outright, so set the runtime-settable conf defensively, and
        # pin UTC so timestamp arithmetic matches the DuckDB oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; with nanosAsLong (set in session.py) it arrives as
        # long ns-since-epoch. Integer `div` (not float /) keeps full
        # precision above 2^53, then truncate to micros like DuckDB does.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so `spark.sql` works —
    the query-layer equivalent of the reference's "query with DuckDB"
    recipe (/root/reference/README.md:237-256), served natively."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
