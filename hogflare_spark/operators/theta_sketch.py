"""KMV / theta-style distinct sketches with SET ALGEBRA (round 11).

The rollup family's HLL sketches (operators/rollup.py, F.approx_count_
distinct / hll_sketch_agg) merge by UNION only — they cannot answer
"how many users did A AND B" without a pre-materialized intersection
column. K-minimum-values sketches (Bar-Yossef et al. 2002; the theta
sketch of Dasgupta et al. / Apache DataSketches generalizes them) keep
the k smallest DISTINCT hash values per segment, and because the kept
sets are comparable samples of the key space, they support union AND
intersection estimates after the fact: audience-overlap analytics over
segments sketched independently — the query class a 100 TB engine
cannot afford to answer with exact pairwise distinct-joins for every
segment pair.

Estimators (deterministic here: xxhash64 is seeded-fixed, so every run
produces the same sketch and the same estimate):
- u(key) = affine map of xxhash64(key) into (0,1); signed-long order on
  the raw hash is monotone with u, so ranking by the hash IS ranking
  by u.
- distinct(segment): |D| < k -> exact |kept|; else (k-1)/u_k (the
  classic unbiased KMV estimator, RSE ~ 1/sqrt(k-2)).
- intersection(A,B): theta = min(theta_A, theta_B) where theta_S = u_k
  of S (1.0 if |S| < k); count common hashes with u < theta; estimate
  count/theta. When both segments are below k the sketch holds the
  whole key set and the estimate is EXACT.

Scale shape: one pass computes every segment's sketch together. A
coarse approx_count_distinct per segment (map-side, one tiny row per
segment) sizes a PUSHED-DOWN prefilter u <= 8k/n_est, so only ~8k rows
per segment reach the dedup + per-segment rank — the sort never sees
the key space. The 8x margin makes missing a true k-minimum
astronomically unlikely (Chernoff: the k-th min concentrates at k/n);
the verified gate recomputes exact counts and would flag a cut sketch
via its tolerance booleans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# u in (0,1): (h + 2^63 + 1) / (2^64 + 2) computed in double precision
_U_SCALE = float(2**64 + 2)
_U_SHIFT = float(2**63 + 1)


def _u(col):
    return (col.cast("double") + F.lit(_U_SHIFT)) / F.lit(_U_SCALE)


def kmv_sketches(
    df: DataFrame,
    key_cols: list[str],
    segment_col: str,
    k: int,
    prefilter: bool = True,
) -> DataFrame:
    """Per-segment KMV sketch rows: (segment, h, u, rk) for the k
    smallest distinct key hashes of each segment — the mergeable,
    intersectable summary. One scan; with `prefilter` (default) the
    dedup+rank input is ~8k rows per segment regardless of key-space
    size."""
    kk = int(k)
    h = F.xxhash64(*key_cols)
    base = df.select(
        F.col(segment_col).alias("segment"), h.alias("h"), _u(h).alias("u")
    )
    if prefilter:
        est = df.groupBy(F.col(segment_col).alias("segment")).agg(
            F.approx_count_distinct(F.xxhash64(*key_cols), 0.05).alias("n_est")
        )
        base = base.join(F.broadcast(est), "segment").where(
            F.col("u")
            <= F.least(F.lit(1.0), F.lit(8.0 * kk) / F.col("n_est"))
        )
    w = Window.partitionBy("segment").orderBy("h")
    return (
        base.select("segment", "h", "u")
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= kk)
    )


def kmv_distinct_estimates(sketches: DataFrame, k: int) -> DataFrame:
    """(segment, est): (k-1)/u_k when the sketch is full, exact kept
    count otherwise."""
    kk = int(k)
    return sketches.groupBy("segment").agg(
        F.when(
            F.count(F.lit(1)) < kk, F.count(F.lit(1)).cast("double")
        )
        .otherwise(F.lit(float(kk - 1)) / F.max("u"))
        .alias("est")
    )


def kmv_intersection_estimate(
    sketches: DataFrame, seg_a: str, seg_b: str, k: int
) -> DataFrame:
    """One row (est): theta-sketch intersection of two segments' KMV
    sketches — count common hashes below theta = min(theta_a, theta_b),
    scaled by 1/theta. Exact when both segments fit under k."""
    kk = int(k)
    theta = (
        sketches.where(F.col("segment").isin([seg_a, seg_b]))
        .groupBy("segment")
        .agg(
            F.when(F.count(F.lit(1)) < kk, F.lit(1.0))
            .otherwise(F.max("u"))
            .alias("theta")
        )
        # coalesce the zero-segment aggregate's NULL to 1.0 (ADVICE r11):
        # empty sketches hold the whole — empty — key set, so theta = 1
        # and est degrades to an exact 0.0 instead of NULL-ing the
        # gate's tolerance booleans.
        .agg(F.coalesce(F.min("theta"), F.lit(1.0)).alias("theta"))
    )
    a = sketches.where(F.col("segment") == seg_a).select("h", "u")
    b = sketches.where(F.col("segment") == seg_b).select("h")
    n_common = (
        a.join(b, "h")
        .crossJoin(F.broadcast(theta))
        .where(F.col("u") < F.col("theta"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))  # one row (n=0 when empty)
    )
    return n_common.crossJoin(F.broadcast(theta)).select(
        (F.col("n").cast("double") / F.col("theta")).alias("est")
    )
