"""Partitioning helpers for CPU-bound operators.

A single small parquet file arrives as ONE scan partition (splits can't
cross row-group boundaries), which serializes per-row-heavy operators
(minhash sketching, cosine scoring) on one core no matter how many the
session has. `fan_out` round-robin repartitions ONLY when the input has
fewer partitions than the session's parallelism — on a real cluster where
a 100 TB table scans as tens of thousands of splits it is a no-op, so the
shuffle cost exists exactly in the regime where it's negligible (small
inputs) and disappears in the regime where it would hurt (large ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition to `target` (default: defaultParallelism)
    iff the plan reads fewer input files than that.

    The check uses inputFiles() — pure FileIndex metadata — because
    df.rdd.getNumPartitions() pays a >1s plan->RDD conversion per call.
    A 100 TB table backs onto thousands of files, so this is a no-op
    exactly where the repartition shuffle would be expensive; non-file
    sources (createDataFrame, streams) report no files and are left
    untouched.
    """
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if n_files == 0 or n_files >= target:
        return df
    return df.repartition(target)
