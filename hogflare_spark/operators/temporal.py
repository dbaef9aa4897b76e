"""Temporal dimension modeling: SCD2 history from an ordered change
stream.

The reference's persons/groups stores keep only CURRENT state plus a
version counter (persons.rs:55-74 `version`, groups.rs:36-41 LWW) — a
warehouse consuming the same stream usually wants the slowly-changing-
dimension form instead: one row per value EPOCH with
[valid_from, valid_to) bounds, so any past state is a range predicate
away and as-of joins (ev_asof_last_touch's shape) can hit historical
attributes.

`scd2_history` builds that form from the raw ordered stream in two
narrow window passes over one `partitionBy(key)` shuffle:

  1. change detection: a row opens an epoch iff it is the key's first
     row or any tracked column differs null-safely from its
     predecessor (consecutive duplicates collapse — re-sending the
     same properties must not mint versions, same rule as the person
     fold's no-op updates);
  2. epoch bounds: over the surviving change rows only, valid_to =
     next change's order key (null = current), version = change index.

Both windows share the same (key, order) sort, so Catalyst plans ONE
Exchange + ONE Sort and evaluates both Window operators on the sorted
run — at 100 TB this costs exactly one shuffle of the events, the
floor for any per-key ordered computation. No UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key_col: str,
    value_cols: list[str],
    order_col: str,
) -> DataFrame:
    """(key, *values, valid_from, valid_to, version, is_current) — one
    row per value epoch of each key, ordered change stream in.

    `order_col` must be unique per key (an event/request sequence);
    `value_cols` are compared null-safely, so null→value, value→null
    and null→null transitions behave like any other (only the last is
    a no-op).
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    changed: Column = F.lag(F.col(order_col)).over(w).isNull()
    for v in value_cols:
        changed = changed | ~F.lag(F.col(v)).over(w).eqNullSafe(F.col(v))
    starts = (
        df.select(key_col, *value_cols, order_col)
        .withColumn("_chg", changed)  # window exprs can't sit in WHERE
        .where(F.col("_chg"))
        .drop("_chg")
    )
    w2 = Window.partitionBy(key_col).orderBy(order_col)
    return starts.select(
        F.col(key_col),
        *[F.col(v) for v in value_cols],
        F.col(order_col).alias("valid_from"),
        F.lead(F.col(order_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(F.col(order_col)).over(w2).isNull().alias("is_current"),
    )


def scd2_history_sql(
    table: str,
    key_expr: tuple[str, str],
    value_exprs: list[tuple[str, str]],
    order_expr: str,
) -> str:
    """DuckDB mirror: the same two-window construction.

    `key_expr` and each `value_exprs` entry are (expr, alias) pairs so
    JSON-extracted values keep the Spark-side column names.
    """
    kx, ka = key_expr
    vals = ", ".join(f"{e} AS {a}" for e, a in value_exprs)
    aliases = [a for _, a in value_exprs]
    change = " OR ".join(
        ["lag(ord) OVER w IS NULL"]
        + [f"NOT (lag({a}) OVER w IS NOT DISTINCT FROM {a})" for a in aliases]
    )
    cols = ", ".join(aliases)
    return f"""
    WITH base AS (
      SELECT {kx} AS {ka}, {vals}, {order_expr} AS ord FROM {table}
    ), flagged AS (
      SELECT {ka}, {cols}, ord, ({change}) AS _chg
      FROM base WINDOW w AS (PARTITION BY {ka} ORDER BY ord)
    ), starts AS (
      SELECT {ka}, {cols}, ord FROM flagged WHERE _chg
    )
    SELECT {ka}, {cols},
           ord AS valid_from,
           lead(ord) OVER w2 AS valid_to,
           CAST(row_number() OVER w2 AS INT) AS version,
           lead(ord) OVER w2 IS NULL AS is_current
    FROM starts WINDOW w2 AS (PARTITION BY {ka} ORDER BY ord)
    """


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    order_col: str,
) -> DataFrame:
    """Join each fact row to the history epoch valid AT its order key —
    the point-in-time-correct feature lookup a training pipeline needs
    to avoid label leakage (joining CURRENT state onto past examples
    leaks the future; joining the epoch whose
    [valid_from, valid_to) contains the example's own order key cannot).

    `history` is scd2_history output for the same key domain. The join
    is an equi-join on the key with the interval predicate as a join
    filter — per-key epoch counts are small (bounded by that key's
    change count), so the equi-join carries the heavy lifting and every
    fact matches EXACTLY one epoch (intervals partition the key's
    order-range by construction; facts before the key's first epoch or
    for unknown keys are dropped). When per-key epoch counts explode,
    the union-and-carry-forward window form (ev_asof_last_touch's
    shape) trades the join for one sort — same result, different cost
    profile.
    """
    h = history.select(
        F.col(key_col).alias("_h_key"),
        F.col("valid_from"),
        F.col("valid_to"),
        *[
            F.col(c)
            for c in history.columns
            if c not in (key_col, "valid_from", "valid_to")
        ],
    )
    cond = (
        (F.col(key_col) == F.col("_h_key"))
        & (F.col(order_col) >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col(order_col) < F.col("valid_to")))
    )
    return facts.join(h, cond).drop("_h_key")
