"""Skew-resistant aggregation patterns.

At 100 TB a handful of hot keys (one team, one bot distinct_id) can hold
a whole stage hostage. Three mitigations, in preference order:

1. AQE skew-join splitting — already on in session.py; handles skewed
   JOIN sides automatically.
2. Map-side partial aggregation — automatic for algebraic aggregates
   (sum/count/min/max); a hot key's rows collapse per-partition before
   the shuffle, so plain groupBy().agg() is already skew-safe for these.
3. The patterns here — for the aggregates partial-agg can NOT collapse:
   exact distinct counts and collect-like accumulations, where every row
   of the hot key would otherwise land on one reducer.

`salted_two_phase_distinct` spreads each key over `salt` reducers by
hashing the counted value, computes per-salt partial distincts, then
combines. Phase 1's (key, salt) groups bound any reducer's share of a
hot key to ~1/salt of it; phase 2 touches only (key, salt) pre-counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_two_phase_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-spread over `salt`
    reducers. Output: key_cols + distinct_count.

    Phase 1 groups by (key, pmod(hash(value), salt)) and counts distinct
    values inside each salt bucket — distinct-by-hash-bucket partitions
    the value space, so bucket counts are disjoint and phase 2 can SUM
    them (no overlap to reconcile).
    """
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(value_col)), F.lit(salt)))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        F.count_distinct(F.col(value_col)).alias("_partial")
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("_partial").cast("long").alias("distinct_count")
    )
