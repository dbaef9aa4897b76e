"""Deterministic sampling / splitting operators for training-data
pipelines.

Two primitives every large-scale corpus pipeline needs and that must be
REPRODUCIBLE across runs, engines, and cluster sizes — so both key off a
content-derived hash (functions/hashing.h60), never off Spark's
partition-dependent `rand()`/`monotonically_increasing_id()`:

- hash_split: train/val/test assignment by hash bucket. A document's
  split is a pure function of its id, so re-running the pipeline (or
  adding data) never migrates an existing document between splits —
  the property that prevents silent eval-set leakage across dataset
  versions.
- stratified_sample: fixed-size per-stratum quota (e.g. N docs per
  language), taking the lowest hash ranks inside each stratum. The
  hash order is a deterministic uniform shuffle, so the quota is an
  unbiased sample that is stable across runs.

Scale shape: hash_split is a pure projection (no shuffle, no state —
it composes into any scan). stratified_sample is one shuffle on the
stratum key + a per-stratum sort bounded by stratum size; with heavily
skewed strata the rank window is the textbook place for a pre-filter
(keep only hashes below quota/|stratum| * safety before ranking), noted
inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hogflare_spark.functions.hashing import h60

# Salt folded into the split hash so that independent uses of hash_split
# and stratified_sample over the same ids draw independent "randomness".
SPLIT_SALT = "hash-split:"
SAMPLE_SALT = "stratified-sample:"


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Adds (bucket, split): bucket = h60(salt || id) % 100, split =
    'train' below train_pct, 'val' below train_pct+val_pct, else 'test'.

    Integer-percent buckets keep the boundary decision exact (no float
    thresholds that could round differently across engines).
    """
    bucket = (
        h60(F.concat(F.lit(SPLIT_SALT), F.col(id_col).cast("string"))) % 100
    ).cast("long")
    return df.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, F.lit("train"))
        .when(F.col("bucket") < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def hash_split_sql(id_expr: str, train_pct: int = 80, val_pct: int = 10) -> tuple[str, str]:
    """DuckDB mirrors of hash_split's (bucket, split) expressions."""
    from hogflare_spark.functions.hashing import h60_sql

    hashed = h60_sql(f"'{SPLIT_SALT}' || CAST({id_expr} AS VARCHAR)")
    bucket = f"({hashed} % 100)"
    split = (
        f"CASE WHEN {bucket} < {train_pct} THEN 'train' "
        f"WHEN {bucket} < {train_pct + val_pct} THEN 'val' ELSE 'test' END"
    )
    return bucket, split


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, n_per_stratum: int
) -> DataFrame:
    """Keeps the `n_per_stratum` lowest-hash rows of each stratum.

    Deterministic: the rank key is (h60(salt || id), id) — the id
    tiebreak makes the order total even under (astronomically unlikely)
    hash collisions, so the kept set is engine-independent.

    At 100 TB with mega-strata, pre-filter before the window (e.g.
    `sample_hash < quota_share_of_hash_space * safety_factor`) so the
    per-stratum sort ranks a bounded superset instead of the whole
    stratum; at these sizes the plain window is the clearer plan.
    """
    sample_hash = h60(F.concat(F.lit(SAMPLE_SALT), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(sample_hash, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def stratified_sample_sql(
    table: str, id_expr: str, stratum_expr: str, n_per_stratum: int
) -> str:
    """DuckDB mirror: the same (hash, id)-ranked per-stratum quota."""
    from hogflare_spark.functions.hashing import h60_sql

    hash_expr = h60_sql(f"'{SAMPLE_SALT}' || CAST({id_expr} AS VARCHAR)")
    return (
        f"SELECT * EXCLUDE (_rk) FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {stratum_expr} "
        f"ORDER BY {hash_expr}, {id_expr}) AS _rk FROM {table}"
        f") WHERE _rk <= {n_per_stratum}"
    )
