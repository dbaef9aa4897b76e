"""JVM expression fast path for the group-state fold (G1/G5).

Group records are strictly simpler than persons: last-write-wins per
property key, version+1 per update, create-on-first-touch, NO merges and
NO unsets (/root/reference/src/groups.rs:16-41). That makes every
(group_type, group_key) cell vectorizable with two linear windows:

- properties[k] = value of the LAST update touching k (max by op order);
  dict key order = order of each key's FIRST touch (updates never remove
  keys, so insertion order is stable — simpler than the person fold's
  presence segments).
- hydration (`lookup` / `gi_lookup` / `gi_update` result rows) reads the
  running state as-of the emitting op — probes union'd into the per-key
  change stream, exactly the as-of window shape of person_fast.py.
- `present` = the op's (request_seq, item_index, sub) order is >= the
  first update's (a gi_update sees its own update: updates precede reads
  within one event, lib.rs:423-460).

Byte parity relies on the same eligibility guards as person_fast
(`safe_fragment_guard`): a cell takes this path only when every props
fragment re-serializes identically through variant/Jackson vs Python's
json.loads→dumps; seeded (prior-state) cells and unsafe fragments fall
back to the Python replay in group_state.py.

Ordering subtlety mirrored from the kernel: the replay SORTS by the full
(request_seq, item_index, sub) — lookups carry sub=1000+j so they order
after every update of their event — but the synthetic-time fallback uses
the COLLAPSED seq_linear (sub capped at 99, group_state.py:207-210).
Both are reproduced here: `ord` uses the full sub, `op_time` the capped
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hogflare_spark.operators.person_fast import (
    _ISO_TS_RE,
    _op_time,
    _obj_json,
    safe_fragment_guard,
)
from hogflare_spark.operators.ingest import _json_string_literal

_PROPS_SCHEMA = "map<string,variant>"


def group_op_fast_eligible() -> F.Column:
    """Row-level guard over derive_group_ops output columns; a
    (group_type, group_key) cell is fast-eligible iff EVERY op passes
    (seeds fail the kind check → whole cell falls back)."""
    props = F.col("props")
    return (
        F.col("kind").isin("update", "gi_update", "lookup", "gi_lookup")
        & (props.isNull() | safe_fragment_guard(props))
        & (F.col("timestamp").isNull() | F.col("timestamp").rlike(_ISO_TS_RE))
    )


def fast_group_fold(fast_ops: DataFrame, fold_out_schema) -> DataFrame:
    """Fast-eligible group ops (derive_group_ops columns, hash-partitioned
    by (group_type, group_key)) → _FOLD_OUT rows (result / group),
    byte-identical to the Python replay."""
    gk = ["group_type", "group_key"]
    s_capped = (
        F.col("request_seq") * F.lit(1_000_000)
        + F.col("item_index") * F.lit(100)
        + F.least(F.col("sub"), F.lit(99))
    )
    base = fast_ops.select(
        *gk,
        "request_seq",
        "item_index",
        "sub",
        "kind",
        "props",
        _op_time(F.col("timestamp"), s_capped).alias("op_time"),
    )
    is_update = F.col("kind").isin("update", "gi_update")

    # ---- per-cell core: creation op (first update), version ---------------
    core = (
        base.where(is_update)
        .groupBy(*gk)
        .agg(
            F.min(F.struct("request_seq", "item_index", "sub", "op_time")).alias("f"),
            F.count(F.lit(1)).alias("version"),
        )
        .select(
            *gk,
            "version",
            F.col("f.op_time").alias("created_at"),
            F.struct(
                F.col("f.request_seq").alias("request_seq"),
                F.col("f.item_index").alias("item_index"),
                F.col("f.sub").alias("sub"),
            ).alias("first_upd"),
        )
    )

    # ---- micro-ops: one row per (update, key) -----------------------------
    micro = (
        base.where(is_update)
        .select(
            *gk,
            "request_seq",
            "item_index",
            "sub",
            F.posexplode(F.map_entries(F.from_json("props", _PROPS_SCHEMA))),
        )
        .select(
            *gk,
            "request_seq",
            "item_index",
            "sub",
            F.col("pos"),
            F.col("col.key").alias("k"),
            F.to_json(F.col("col.value")).alias("val"),
        )
    )

    # LWW with no unsets: the state of key k after a micro-op IS that
    # op's value; only the insertion position needs a running window.
    run = Window.partitionBy(*gk, "k").orderBy(
        "request_seq", "item_index", "sub", "pos"
    ).rowsBetween(Window.unboundedPreceding, 0)
    state = micro.select(
        *gk,
        "k",
        "request_seq",
        "item_index",
        "sub",
        "pos",
        F.col("val").alias("pv"),
        F.min(F.struct("request_seq", "item_index", "sub", "pos")).over(run).alias("pp"),
    )

    # ---- final per-key values → groups-table property map -----------------
    w_last = Window.partitionBy(*gk, "k").orderBy(
        F.desc("request_seq"), F.desc("item_index"), F.desc("sub"), F.desc("pos")
    )
    finals = (
        state.withColumn("_rn", F.row_number().over(w_last))
        .where(F.col("_rn") == 1)
        .select(*gk, "k", "pv", "pp")
    )
    key_lit = F.concat(F.lit('"'), F.col("k"), F.lit('":'))
    cell_maps = finals.groupBy(*gk).agg(
        F.collect_list(
            F.struct(
                F.lit(0).alias("grp"),
                F.col("pp").alias("pos"),
                # groups-table values are JSON-encoded (double) like the
                # kernel's json.dumps({k: json.dumps(v)})
                F.concat(key_lit, _json_string_literal(F.col("pv"))).alias("frag"),
            )
        ).alias("props_e")
    )
    group_rows = core.join(cell_maps, gk, "left").select(
        F.lit("group").alias("row_type"),
        F.lit(None).cast("long").alias("request_seq"),
        F.lit(None).cast("long").alias("item_index"),
        "group_type",
        "group_key",
        _obj_json("props_e").alias("props"),
        F.lit(True).alias("present"),
        F.lit(False).alias("echo"),
        "created_at",
        F.col("version").cast("long").alias("version"),
    )

    # ---- result rows: as-of hydration per emitting op ---------------------
    emits = F.col("kind").isin("lookup", "gi_lookup", "gi_update")
    probes_base = base.where(emits).join(
        core.select(*gk, "first_upd"), gk, "left"
    )
    changes = state.select(
        *gk,
        "k",
        "request_seq",
        "item_index",
        "sub",
        "pos",
        F.lit(0).alias("is_probe"),
        F.struct(
            F.lit(0).alias("grp"),
            F.col("pp").alias("pos"),
            F.concat(key_lit, F.col("pv")).alias("frag"),
        ).alias("entry"),
        F.lit(None).cast("boolean").alias("present"),
        F.lit(None).cast("boolean").alias("echo"),
    )
    probes = probes_base.join(finals.select(*gk, "k"), gk, "left").select(
        *gk,
        "k",
        "request_seq",
        "item_index",
        "sub",
        F.lit(0).alias("pos"),
        F.lit(1).alias("is_probe"),
        F.lit(None)
        .cast(
            "struct<grp:int,pos:struct<request_seq:bigint,item_index:bigint,"
            "sub:bigint,pos:int>,frag:string>"
        )
        .alias("entry"),
        (
            F.col("first_upd").isNotNull()
            & (
                F.struct("request_seq", "item_index", "sub")
                >= F.col("first_upd")
            )
        ).alias("present"),
        F.col("kind").startswith("gi_").alias("echo"),
    )
    w_asof = Window.partitionBy(*gk, "k").orderBy(
        "request_seq", "item_index", "sub", "is_probe", "pos"
    ).rowsBetween(Window.unboundedPreceding, 0)
    asof = (
        changes.unionByName(probes)
        .withColumn("cur", F.last("entry", ignorenulls=True).over(w_asof))
        .where(F.col("is_probe") == 1)
    )
    result_rows = (
        asof.groupBy(*gk, "request_seq", "item_index", "sub", "present", "echo")
        .agg(F.collect_list("cur").alias("entries"))
        .select(
            F.lit("result").alias("row_type"),
            "request_seq",
            "item_index",
            "group_type",
            "group_key",
            F.when(F.col("present"), _obj_json("entries")).alias("props"),
            "present",
            "echo",
            F.lit(None).cast("timestamp").alias("created_at"),
            F.lit(None).cast("long").alias("version"),
        )
    )

    out = result_rows.unionByName(group_rows)
    return out.select(*[F.col(f.name).cast(f.dataType) for f in fold_out_schema.fields])
