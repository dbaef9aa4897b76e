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


def has_explicit_repartition(df: DataFrame) -> bool:
    """True when the analyzed plan already contains a user-inserted
    Repartition / RepartitionByExpression / Rebalance node — the author
    has taken control of parallelism, so fan_out must not stack a second
    shuffle on top (r9: gates pre-fan their SCAN so heavy projections
    evaluate above the exchange; fan_out re-shuffling the projected rows
    was measured 3x slower because the projection ran single-threaded
    below the round-robin). Cheap: one plan-string render, no execution.
    A false positive only skips an optional widening shuffle."""
    try:
        return "Repartition" in df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False


def is_small_file_input(df: DataFrame, target: int | None = None) -> bool:
    """0 < #input-files < target: the under-parallel regime where one
    small parquet file arrives as one scan partition. Pure FileIndex
    metadata (inputFiles()), because df.rdd.getNumPartitions() pays a
    >1s plan->RDD conversion per call."""
    target = target or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return False
    return 0 < n_files < target


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition to `target` (default: defaultParallelism)
    iff the plan reads fewer input files than that AND the author hasn't
    already inserted an explicit repartition.

    A 100 TB table backs onto thousands of files, so this is a no-op
    exactly where the repartition shuffle would be expensive; non-file
    sources (createDataFrame, streams) report no files and are left
    untouched.
    """
    if not is_small_file_input(df, target):
        return df
    if has_explicit_repartition(df):
        return df
    spark = df.sparkSession
    return df.repartition(target or spark.sparkContext.defaultParallelism)
