"""Hypertable-style sketch rollups: pre-aggregate at a fine time grain,
answer any coarser window by MERGING, never by rescanning raw data.

The pattern (continuous aggregates over a time-partitioned fact table):
distinct-count questions at week/month grain should not rescan the raw
events — a per-(day, key) Datasketches HLL sketch is a few KB, and HLL
union is lossless register-wise max, so rolling daily sketches up to
weeks gives the same estimator state as sketching the week directly.
`count_distinct` can NOT be pre-aggregated this way (distinct is not
additive); the sketch column is exactly what makes the rollup lawful.

Spark shape: `hll_sketch_agg` (Datasketches HLL, JVM-side) per fine
bucket — ONE shuffle of the raw data, producing |buckets| rows that
persist as the continuous aggregate — then any coarse window is a
`hll_union_agg` over the tiny sketch table. At 100 TB the raw scan
happens once per ingest batch (and appends), while every dashboard
window query touches only sketch rows.

Cross-engine gating: Datasketches binary images and estimates are
Spark-specific (DuckDB's approx_count_distinct is a different HLL), so
the gate emits EXACT distincts plus accuracy/consistency BOOLEANS the
oracle asserts as literals — the same pattern as the HLL++
`ev_approx_distinct_users` gate (relational_ext.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    events: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    fine: str = "day",
    coarse: str = "week",
    lg_k: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """(fine_aggregate, coarse_rollup).

    fine_aggregate: one row per (fine bucket, *keys) holding the HLL
    sketch (binary) — the persistable continuous aggregate.
    coarse_rollup: per (coarse bucket, *keys) the union-merged estimate
    `est_users` — computed ONLY from fine_aggregate's sketches.
    """
    fine_ts = F.date_trunc(fine, F.col(time_col)).alias("bucket")
    fine_agg = events.groupBy(fine_ts, *key_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )
    coarse_ts = F.date_trunc(coarse, F.col("bucket")).alias("bucket")
    rollup = (
        fine_agg.groupBy(coarse_ts, *key_cols)
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            "bucket",
            *key_cols,
            F.hll_sketch_estimate("merged").alias("est_users"),
        )
    )
    return fine_agg, rollup


def sketch_rollup_check(
    events: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    fine: str = "day",
    coarse: str = "week",
    lg_k: int = 12,
    est_tol: float = 0.08,
    merge_tol: float = 0.02,
) -> DataFrame:
    """Oracle-compatible reduction: per coarse bucket × keys —
    exact distinct, rollup-estimate-within-`est_tol`-of-exact, and
    rollup-consistent-with-direct-sketching (within `merge_tol`,
    covering Datasketches' sparse->dense promotion differences between
    the union path and the one-shot path).

    Tolerance vs lg_k (SF-dependence of the accuracy gate): HLL relative
    standard error is ~1.04/sqrt(2^lg_k) — 1.6% at the default lg_k=12 —
    and is n-independent once the sketch is dense, but the gate asserts
    EVERY bucket, so the chance of one bucket exceeding a k-sigma bound
    grows linearly with bucket count (a bigger SF means more buckets,
    not worse per-bucket error). est_tol=0.08 is ~5 sigma per bucket
    (P < 1e-6 each), so a 100x SF bump stays deterministic-green;
    est_tol=0.05 (~3 sigma) could break at large SF with NO code defect.
    The absolute floor in the check covers tiny buckets where one user
    of difference exceeds any relative bound (sparse mode is near-exact
    there, but the floor makes the gate shape-stable)."""
    _, rollup = sketch_rollup(
        events, time_col, key_cols, value_col, fine, coarse, lg_k
    )
    coarse_ts = F.date_trunc(coarse, F.col(time_col)).alias("bucket")
    direct = events.groupBy(coarse_ts, *key_cols).agg(
        F.count_distinct(F.col(value_col)).alias("exact_users"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
        ).alias("_direct_est"),
    )
    joined = direct.join(rollup, ["bucket", *key_cols])
    exact = F.col("exact_users").cast("double")
    return joined.select(
        F.to_date("bucket").alias("bucket"),
        *key_cols,
        "exact_users",
        (
            F.abs(F.col("est_users") - exact)
            <= F.greatest(exact * F.lit(est_tol), F.lit(2.0))
        ).alias("est_within_tol"),
        (
            F.abs(F.col("est_users") - F.col("_direct_est"))
            <= F.greatest(exact * F.lit(merge_tol), F.lit(1.0))
        ).alias("rollup_matches_direct"),
    )
