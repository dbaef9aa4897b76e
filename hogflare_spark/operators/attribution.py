"""Multi-touch marketing attribution over an event stream.

The PostHog-family insight the reference's analytics side never grew:
split each conversion's credit across the touch events that preceded
it, under the four standard models (first-touch, last-touch, linear,
position-based 40/20/40), and roll credit up per channel.

Spark shape — two window passes + one small aggregate, no joins:

  1. conversion segmentation: S(row) = count of conversion events at or
     after the row (one `sum` over an unbounded-following frame on the
     per-user (ts, id) sort). A touch with S = k belongs to the k-th
     conversion from the end of the user's stream — exactly
     "touches since the previous conversion", the standard attribution
     scope — and touches with S = 0 (after the last conversion) are
     unattributed. This replaces the naive as-of join of every touch to
     its next conversion with a scan-local expression.
  2. per-conversion ranking: row_number + count over (user, S) for the
     surviving touches — same sort keys, so Catalyst reuses ONE
     Exchange for both passes (the SCD2 plan property).
  3. credit per model in integer BASIS POINTS of a million
     (`1_000_000 div n` style): fixed-point credits keep the
     distributed per-channel sums exact and order-free — float credit
     (1/n) would make the final sums bit-dependent on reduction order
     (the same reason distributed_kmeans sums fixed-point components).
     Integer division drops at most n-1 millionths per conversion;
     the models' proportions are otherwise standard: linear 1/n each,
     first/last all-to-one, position 40% first / 40% last / 20% split
     across middles (n=1 -> 100%, n=2 -> 50/50).

At 100 TB this is one shuffle of the events on user_id plus a
|channels|-row aggregate — the minimum for any per-user ordered
computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def multi_touch_attribution(
    events: DataFrame,
    conversion_event: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(channel, n_touches, linear_bp, first_bp, last_bp, position_bp):
    per-channel credit sums in millionths, under all four models in one
    pass. A channel is the touch's event type; conversion events
    themselves are not touches."""
    is_conv = (F.col(type_col) == conversion_event).cast("long")
    w_seg = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    seg = events.select(user_col, type_col, ts_col, id_col).withColumn(
        "_grp", F.sum(is_conv).over(w_seg)
    )
    touches = seg.where(
        (F.col(type_col) != conversion_event) & (F.col("_grp") > 0)
    )
    w_rank = Window.partitionBy(user_col, "_grp").orderBy(ts_col, id_col)
    w_all = (
        Window.partitionBy(user_col, "_grp")
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = touches.select(
        F.col(type_col).alias("channel"),
        F.row_number().over(w_rank).alias("_rk"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )
    n, rk = F.col("_n"), F.col("_rk")
    first_bp = F.when(rk == 1, F.lit(MICRO)).otherwise(F.lit(0))
    last_bp = F.when(rk == n, F.lit(MICRO)).otherwise(F.lit(0))
    linear_bp = F.expr(f"{MICRO} div _n")
    position_bp = (
        F.when(n == 1, F.lit(MICRO))
        .when(n == 2, F.lit(MICRO // 2))
        .when(rk == 1, F.lit(MICRO * 2 // 5))
        .when(rk == n, F.lit(MICRO * 2 // 5))
        .otherwise(F.expr(f"{MICRO // 5} div (_n - 2)"))
    )
    return (
        ranked.select(
            "channel",
            linear_bp.alias("_lin"),
            first_bp.alias("_first"),
            last_bp.alias("_last"),
            position_bp.alias("_pos"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("_lin").alias("linear_bp"),
            F.sum("_first").alias("first_bp"),
            F.sum("_last").alias("last_bp"),
            F.sum("_pos").alias("position_bp"),
        )
    )


def multi_touch_attribution_sql(
    table: str,
    conversion_event: str,
    user_expr: str = "user_id",
    type_expr: str = "event_type",
    ts_expr: str = "ts",
    id_expr: str = "event_id",
) -> str:
    """DuckDB mirror: identical segmentation, ranking, and integer
    basis-point arithmetic."""
    return f"""
    WITH seg AS (
      SELECT {user_expr} AS u, {type_expr} AS channel, {ts_expr} AS t,
             {id_expr} AS i,
             sum(CASE WHEN {type_expr} = '{conversion_event}' THEN 1 ELSE 0 END)
               OVER (PARTITION BY {user_expr} ORDER BY {ts_expr}, {id_expr}
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS grp
      FROM {table}
    ), touches AS (
      SELECT u, channel, t, i, grp FROM seg
      WHERE channel <> '{conversion_event}' AND grp > 0
    ), ranked AS (
      SELECT channel,
             row_number() OVER (PARTITION BY u, grp ORDER BY t, i) AS rk,
             count(*) OVER (PARTITION BY u, grp) AS n
      FROM touches
    )
    SELECT channel,
           count(*) AS n_touches,
           CAST(sum({MICRO} // n) AS BIGINT) AS linear_bp,
           CAST(sum(CASE WHEN rk = 1 THEN {MICRO} ELSE 0 END) AS BIGINT) AS first_bp,
           CAST(sum(CASE WHEN rk = n THEN {MICRO} ELSE 0 END) AS BIGINT) AS last_bp,
           sum(CASE WHEN n = 1 THEN {MICRO}
                    WHEN n = 2 THEN {MICRO // 2}
                    WHEN rk = 1 THEN {MICRO * 2 // 5}
                    WHEN rk = n THEN {MICRO * 2 // 5}
                    ELSE {MICRO // 5} // (n - 2) END)::BIGINT AS position_bp
    FROM ranked GROUP BY channel
    """
