"""Exact distributed selection: the k-th smallest value of a column
without ever globally sorting it.

approx_percentile trades accuracy for one pass, and the histogram
rollup (operators/rollup.py) trades accuracy for mergeability — but
some jobs need the EXACT order statistic (SLA cutoffs written into
contracts, deterministic train/eval threshold splits), and the naive
`Window.orderBy(col)` answer funnels the entire table through one
reducer. The classic fix is iterative histogram narrowing (the
distributed k-selection from the external-memory literature — a
BigQuery/Presto-style exact-percentile strategy):

  level 0: one aggregate over the full column -> (min, max, count);
  bucket [min, max] uniformly, ONE map-side-combined groupBy gives a
  <=B-row histogram; the bucket containing rank k is found on the
  driver (B rows — model-sized by construction) and the search
  RECURSES into only that bucket's rows — a parquet-pushable range
  predicate, so every later level scans a shrinking fraction of the
  data. With B=4096, two levels bound the candidate set to n/B^2
  (a 10^12-row table -> ~60k rows), which a TakeOrdered finishes
  without a wide shuffle.

Per level: 2 jobs (stats + histogram), both plain aggregates; the
driver never holds more than the B-row histogram. Worst case (massive
duplicate mass at one value) the range stops shrinking — detected via
min==max, which IS the answer for any rank inside that bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kth_smallest(
    df: DataFrame,
    value_col: str,
    k: int,
    buckets: int = 4096,
    max_levels: int = 4,
    direct_threshold: int = 200_000,
    _stats: tuple | None = None,
) -> float:
    """The exact k-th smallest (1-based) non-null value of `value_col`.

    Each narrowing level filters with the SAME floor-bucket expression
    used to build the histogram — not a reconstructed >=/< range — so
    float boundary values can never land outside the chosen bucket.
    Raises ValueError if k is out of range.

    `_stats` (internal): a caller-precomputed (min, max, count) of the
    non-null values — level 0 then skips its stats job, so a caller
    evaluating several ranks over one cached projection (see
    `exact_quantile_values`) pays the full-column aggregate once
    instead of once per rank.
    """
    sub = df.select(F.col(value_col).cast("double").alias("v")).where(
        F.col(value_col).isNotNull()
    )
    remaining = int(k)
    if remaining < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for level in range(int(max_levels)):
        if level == 0 and _stats is not None:
            mn, mx, n = _stats
        else:
            mn, mx, n = sub.agg(
                F.min("v"), F.max("v"), F.count(F.lit(1))
            ).first()
        if n < remaining:
            raise ValueError(f"rank {remaining} exceeds {n} candidate rows")
        if mn == mx:
            return float(mn)  # duplicate mass: every rank is this value
        if n <= direct_threshold:
            break
        width = (mx - mn) / buckets
        idx = F.least(
            F.floor((F.col("v") - F.lit(mn)) / F.lit(width)),
            F.lit(buckets - 1),
        ).cast("long")
        hist = {
            r["b"]: r["c"]
            for r in sub.groupBy(idx.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        cum = 0
        for b in sorted(hist):
            c = hist[b]
            if cum + c >= remaining:
                remaining -= cum
                sub = sub.where(idx == b)
                break
            cum += c
    # candidate set is bounded (direct_threshold, or n/B^max_levels):
    # TakeOrderedAndProject — per-partition heaps, no global sort.
    rows = sub.orderBy("v").limit(remaining).orderBy(F.desc("v")).limit(1)
    return float(rows.first()["v"])


def exact_quantile_values(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.99),
    **kwargs,
) -> list[tuple[float, int, float]]:
    """(q, rank ceil(q*n), exact value) per requested quantile — the
    order-statistic convention (rank-k element), matching a
    row_number()-based SQL oracle exactly; n counts non-null rows.

    r13 (guide §1.2 job count, §5 reuse): ONE cached narrow projection
    of the non-null values serves every rank, and ONE
    (min, max, count) aggregate — which doubles as the cache
    materialization — replaces the former separate count() plus a
    per-rank level-0 stats job. Each `kth_smallest` call then starts
    from the shared stats (`_stats`) and reads the cache, never the
    base scan: for Q quantiles the former 1 + 2Q full-column scans
    collapse to one scan plus Q bounded selections. The per-rank
    narrowing arithmetic is unchanged, so values are identical."""
    import math

    from hogflare_spark.functions.caching import cached, release

    sub = cached(
        df.select(F.col(value_col).cast("double").alias("v")).where(
            F.col(value_col).isNotNull()
        )
    )
    try:
        mn, mx, n = sub.agg(
            F.min("v"), F.max("v"), F.count(F.lit(1))
        ).first()
        out = []
        for q in qs:
            k = max(1, int(math.ceil(q * n)))
            out.append(
                (
                    float(q),
                    k,
                    kth_smallest(sub, "v", k, _stats=(mn, mx, n), **kwargs),
                )
            )
    finally:
        release(sub)
    return out
