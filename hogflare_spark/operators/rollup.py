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


def hist_quantile_rollup(
    events: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    fine: str = "day",
    coarse: str = "week",
    bin_width: float = 8.0,
    n_bins: int = 128,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> tuple[DataFrame, DataFrame]:
    """Mergeable QUANTILE rollup — the latency-dashboard twin of
    sketch_rollup. Exact percentiles cannot be pre-aggregated (order
    statistics are not additive), and Spark's approx_percentile state
    is not SQL-mergeable across rows — but a FIXED-BIN histogram is:
    counts add, so per-(fine bucket, keys) histograms roll up to any
    coarser window by summing, and a quantile estimate falls out of the
    merged cumulative distribution with at most ~2 bin widths of error.

    Representation: (bucket, *keys, bin, cnt) ROWS, not arrays — the
    natural shuffle-friendly mergeable form (map-side combine collapses
    each task's histogram; zero-count bins never materialize; merging
    is a plain sum groupBy, skew-free because the key space is
    buckets × keys × <=n_bins).

    Estimator (replicated verbatim in the DuckDB oracle so estimates
    hash-match BIT-EXACTLY): per (coarse bucket, keys) with total n,
    for each q the unique nonzero bin with cum_before < q*n <= cum
    interpolates est = bin*w + w * (q*n - cum_before) / cnt. Values
    clamp into [0, n_bins*w); all inputs to the float expression are
    exact integers, so both engines run the same IEEE op sequence
    (final floor(x*1e6+0.5)/1e6 for transport).

    Returns (fine_hist, coarse_quantiles). fine_hist is the persistable
    continuous aggregate: the ONLY scan of raw data. coarse_quantiles
    reads nothing but fine_hist. At 100 TB the raw scan happens once
    per ingest batch; every dashboard window re-slices tiny histogram
    rows.
    """
    fine_hist = fine_histogram(
        events, time_col, key_cols, value_col, fine, bin_width, n_bins
    )
    coarse_quantiles = hist_quantiles(
        fine_hist, key_cols, coarse, bin_width, quantiles
    )
    return fine_hist, coarse_quantiles


def fine_histogram(
    events: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    fine: str = "day",
    bin_width: float = 8.0,
    n_bins: int = 128,
) -> DataFrame:
    """The persistable continuous aggregate: (bucket, *keys, bin, cnt)
    rows — the only stage that scans raw data. NULL values are excluded
    up front (quantiles of nulls are undefined anyway) — also removes
    the engines' one representational divergence: a NULL bin would sort
    NULLS FIRST in Spark's window but NULLS LAST in DuckDB's, silently
    shifting every cum."""
    w = float(bin_width)
    v = F.col(value_col).cast("double")
    bin_ = F.least(
        F.greatest(F.floor(v / F.lit(w)), F.lit(0)).cast("long"),
        F.lit(int(n_bins) - 1),
    )
    fine_ts = F.date_trunc(fine, F.col(time_col)).alias("bucket")
    return (
        events.where(v.isNotNull())
        .groupBy(fine_ts, *key_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    fine_hist: DataFrame,
    key_cols: list[str],
    coarse: str = "week",
    bin_width: float = 8.0,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile estimates per (coarse bucket, *keys) from histogram rows
    alone — never touches raw data, so it serves equally over the batch
    fine aggregate and the streaming state's accumulated histogram."""
    from pyspark.sql import Window

    w = float(bin_width)
    coarse_ts = F.date_trunc(coarse, F.col("bucket")).alias("bucket")
    merged = fine_hist.groupBy(coarse_ts, *key_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )
    part = Window.partitionBy("bucket", *key_cols)
    cumw = part.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    withcum = merged.select(
        "*",
        F.sum("cnt").over(cumw).alias("cum"),
        F.sum("cnt").over(part).alias("n"),
    )
    cnt = F.col("cnt").cast("double")
    cum = F.col("cum").cast("double")
    before = cum - cnt
    qcols = []
    for q in quantiles:
        target = F.lit(float(q)) * F.col("n").cast("double")
        est = (
            F.col("bin").cast("double") * F.lit(w)
            + F.lit(w) * (target - before) / cnt
        )
        hit = (cum >= target) & (before < target)
        name = f"p{round(q * 100)}_est"
        qcols.append(
            F.max(F.when(hit, F.floor(est * 1e6 + 0.5) / F.lit(1e6))).alias(name)
        )
    return withcum.groupBy("bucket", *key_cols).agg(
        F.max("n").alias("n_events"), *qcols
    )


def hist_quantile_rollup_check(
    events: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    fine: str = "day",
    coarse: str = "week",
    bin_width: float = 8.0,
    n_bins: int = 128,
) -> DataFrame:
    """Gate frame: the bit-exact estimator columns PLUS an accuracy
    boolean per tail quantile. The reference is the ceil(q*n)-th ORDER
    STATISTIC of the (clamped) values, not the continuous percentile:
    for target q*n the estimator picks the bin with cum_before < q*n
    <= cum, and since cum_before < ceil(q*n) <= cum that very bin
    contains x_(ceil(q*n)) — so |est - x_k| <= bin_width is a THEOREM,
    green at any SF and any data (a continuous-percentile reference is
    NOT bin-bounded: in a sparse tail the interpolated rank q(n-1)+1
    can sit a value gap away, which is how the first draft of this
    gate failed on one p99 group). The order statistic is the
    VERIFICATION side only (sorted collect per group at gate scale) —
    production reads the histogram path alone. The DuckDB oracle
    replicates the estimator arithmetic for the value columns and
    asserts the booleans as literals."""
    _, est = hist_quantile_rollup(
        events, time_col, key_cols, value_col, fine, coarse, bin_width, n_bins
    )
    w = float(bin_width)
    clamped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
        F.lit(w * int(n_bins)) - F.lit(1e-9),
    )
    coarse_ts = F.date_trunc(coarse, F.col(time_col)).alias("bucket")
    ordered = events.groupBy(coarse_ts, *key_cols).agg(
        F.sort_array(F.collect_list(clamped)).alias("_vals")
    )
    n = F.size("_vals")
    x90 = F.element_at("_vals", F.ceil(F.lit(0.9) * n).cast("int"))
    x99 = F.element_at("_vals", F.ceil(F.lit(0.99) * n).cast("int"))
    tol = w + 1e-6  # exact bound + transport-rounding slack
    out = est.join(ordered, ["bucket", *key_cols]).select(
        F.to_date("bucket").alias("bucket"),
        *key_cols,
        "n_events",
        "p50_est",
        "p90_est",
        "p99_est",
        (F.abs(F.col("p90_est") - x90) <= F.lit(tol)).alias("p90_within_bin"),
        (F.abs(F.col("p99_est") - x99) <= F.lit(tol)).alias("p99_within_bin"),
    )
    return out
