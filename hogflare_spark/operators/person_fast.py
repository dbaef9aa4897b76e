"""JVM fast path for the person fold: alias-free identity components.

The overwhelming majority of identity components contain no alias/merge
ops — they are a single distinct_id receiving $set / $set_once / $unset
updates (reference: the plain-capture path, /root/reference/src/
persons.rs:55-74,259-279,328-348). For those components the per-key fold
is expressible as whole-stage-codegen window/aggregate expressions, so no
row ever crosses the Python boundary. Components containing alias, merge
or seeded-prior-state ops keep the exact Python kernel replay
(person_store.py) — cross-record merges are genuinely order-dependent
state machines.

Byte parity with the kernel is guaranteed by ELIGIBILITY GUARDS, the same
design as normalize.fast_capture_path: a component takes the fast path
only when every fragment the path would splice re-serializes identically
in Python (json.loads→dumps compact) and the JVM (Jackson / variant).
Ineligible components silently fall back — the guards can only cost
speed, never correctness.

Per-key fold semantics (mirrors PersonRecord.apply_update):
- micro-ops per update: $set entries (phase 0), $set_once entries
  (phase 1), $unset entries (phase 2) — the kernel's application order.
- $unset clears the key from both maps → segment boundary.
- properties[k] = value of the last $set in the final segment.
- properties key order = order of the first $set in each key's final
  presence segment (Python dict: pop on unset, append on re-set).
- set_once[k] sticks iff the first ($set|$set_once) micro-op in the
  segment is a $set_once (at that moment neither map contains k).
- merged snapshot = properties entries (insertion order) then
  set_once-only entries (insertion order); $set wins on read
  (persons.rs:112-121).
- version counts apply_update calls (ensure_person does not bump).

Exchange accounting (the 100 TB argument): the input op frame arrives
hash-partitioned by component and is cached (it feeds four consumers).
Micro-ops explode via `inline` — a narrow map, so every window/groupBy
keyed by (comp) or (comp, k) is satisfied by the existing partitioning
with sorts only, NO new exchange. The only repartitions are the two over
the snapshot assembly frame (ops × touched keys — the same O(events ×
keys) volume the kernel serializes per snapshot, now in codegen): one for
the as-of union window, one for the per-event groupBy. The Python path
this replaces had one exchange but paid Python CPU + Arrow transfer on
every row; here all compute is JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# printable ASCII minus backslash: no escape sequences survive in any
# fragment, so Python's ensure_ascii json.dumps and Jackson/variant
# re-serialization are byte-identical (see normalize._FAST_SAFE_BODY_RE)
_SAFE_ASCII_RE = r"^[\x20-\x5B\x5D-\x7E]*$"
# digit followed by [.eE]: float re-serialization differs (E-notation)
_FLOATY_RE = r"[0-9][.eE]"
# 19+ digit integer runs: beyond int64, variant decimal round-trip not
# guaranteed byte-exact vs Python's arbitrary-precision ints
_BIGINT_RE = r"[0-9]{19}"
# timestamps both datetime.fromisoformat (after Z→+00:00) and Spark's
# try_to_timestamp parse to the same UTC instant
_ISO_TS_RE = (
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d{1,6})?(Z|[+-]\d{2}:\d{2})?$"
)

_UPDATE_SCHEMA = (
    "struct<set:map<string,variant>,set_once:map<string,variant>,unset:array<string>>"
)

_ENTRY_TYPE = "array<struct<phase:int,pos:int,k:string,mk:int,val:string>>"

_SYNTH_EPOCH_MS = 946_684_800_000  # 2000-01-01 UTC, person_store.synthetic_time


def synth_time_expr(seq_linear: F.Column) -> F.Column:
    """JVM twin of person_store.synthetic_time, piecewise boundary
    included: milliseconds below SYNTH_COMPRESS_AFTER, microseconds past
    it (keeps 64-bit-scale seq values inside timestamp range and
    bit-identical with the Python kernel's datetimes)."""
    from hogflare_spark.operators.person_store import SYNTH_COMPRESS_AFTER

    boundary_us = (_SYNTH_EPOCH_MS + SYNTH_COMPRESS_AFTER) * 1000
    return F.when(
        seq_linear < F.lit(SYNTH_COMPRESS_AFTER),
        F.timestamp_millis(seq_linear + F.lit(_SYNTH_EPOCH_MS)),
    ).otherwise(
        F.timestamp_micros(
            seq_linear - F.lit(SYNTH_COMPRESS_AFTER) + F.lit(boundary_us)
        )
    )


def op_fast_eligible() -> F.Column:
    """Row-level guard over derive_person_ops output columns.

    A component is fast-eligible iff EVERY op in it passes — alias and
    seed ops fail the kind check, sending their whole component to the
    Python replay (see fold_person_state)."""
    upd = F.col("update")
    set_frag = F.get_json_object(upd, "$.set")
    so_frag = F.get_json_object(upd, "$.set_once")
    no_containers = (
        ~F.coalesce(set_frag, F.lit("")).contains(":{")
        & ~F.coalesce(set_frag, F.lit("")).contains(":[")
        & ~F.coalesce(so_frag, F.lit("")).contains(":{")
        & ~F.coalesce(so_frag, F.lit("")).contains(":[")
    )
    upd_ok = upd.isNull() | (
        upd.rlike(_SAFE_ASCII_RE)
        & ~upd.rlike(_FLOATY_RE)
        & ~upd.rlike(_BIGINT_RE)
        & no_containers
    )
    return (
        F.col("kind").isin("update", "ensure")
        & F.col("emit")
        & F.col("distinct_id").isNotNull()
        & F.col("distinct_id").rlike(_SAFE_ASCII_RE)
        # distinct_id is an already-DECODED string (unlike the update,
        # whose JSON text would need a rejected backslash to embed a
        # quote), so a literal '"' passes the ASCII guard yet would be
        # spliced unescaped into the distinct_ids JSON array below.
        & ~F.col("distinct_id").contains('"')
        & (F.col("timestamp").isNull() | F.col("timestamp").rlike(_ISO_TS_RE))
        & upd_ok
    )


def _uuid_from_md5(src: F.Column) -> F.Column:
    d = F.md5(src)
    return F.concat(
        F.substring(d, 1, 8), F.lit("-"),
        F.substring(d, 9, 4), F.lit("-"),
        F.substring(d, 13, 4), F.lit("-"),
        F.substring(d, 17, 4), F.lit("-"),
        F.substring(d, 21, 12),
    )


def _op_time(ts: F.Column, seq_linear: F.Column) -> F.Column:
    """_parse_ts twin: ISO parse (UTC session tz) else synthetic time."""
    return F.coalesce(
        F.try_to_timestamp(F.regexp_replace(ts, "Z$", "+00:00")),
        synth_time_expr(seq_linear),
    )


def _obj_json(entries) -> F.Column:
    """array<struct<grp,pos,frag>> (nulls pre-filtered by collect_list) →
    compact JSON object text. sort = (grp, pos) lexicographic → kernel
    dict order. concat_ws treats a NULL array as empty, so an entity with
    no touched keys serializes as '{}' like json.dumps({})."""
    entries = F.col(entries) if isinstance(entries, str) else entries
    return F.concat(
        F.lit("{"),
        F.concat_ws(",", F.transform(F.array_sort(entries), lambda e: e["frag"])),
        F.lit("}"),
    )


def safe_fragment_guard(col: F.Column) -> F.Column:
    """True iff a compact JSON-object fragment re-serializes byte-
    identically through variant/Jackson vs Python json.loads→dumps:
    printable-ASCII backslash-free, no floats, no >int64 ints, scalar
    values only (no nested containers)."""
    return (
        col.rlike(_SAFE_ASCII_RE)
        & ~col.rlike(_FLOATY_RE)
        & ~col.rlike(_BIGINT_RE)
        & ~col.contains(":{")
        & ~col.contains(":[")
    )


def fast_person_fold(fast_ops: DataFrame, fold_out_schema) -> DataFrame:
    """Alias-free ops (derive_person_ops columns + `comp`, hash-partitioned
    by comp) → _FOLD_OUT rows (snapshot / person / alloc), byte-identical
    to PersonStoreReplay over the same singleton components."""
    s_lin = (
        F.col("request_seq") * F.lit(1_000_000)
        + F.col("item_index") * F.lit(100)
        + F.col("sub")
    )
    base = fast_ops.select(
        "comp",
        "request_seq",
        "item_index",
        "sub",
        "kind",
        "update",
        s_lin.alias("s"),
        _op_time(F.col("timestamp"), s_lin).alias("op_time"),
    )

    # ---- per-person core: creation op, uuid, version ----------------------
    # deterministic_uuid(component, canonical, rs, ii, sub, 0) — singleton
    # components have canonical == comp (person_store.py:43-47,163-176).
    # groupBy(comp) is satisfied by the incoming hash partitioning.
    core = (
        base.groupBy("comp")
        .agg(
            F.min(F.struct("s", "request_seq", "item_index", "sub", "op_time")).alias(
                "f"
            ),
            F.sum(F.when(F.col("kind") == "update", 1).otherwise(0)).alias("version"),
        )
        .select(
            "comp",
            "version",
            F.col("f.op_time").alias("created_at"),
            F.col("f.s").alias("alloc_a"),
            _uuid_from_md5(
                F.concat_ws(
                    "\x1f",
                    F.col("comp"),
                    F.col("comp"),
                    F.col("f.request_seq").cast("string"),
                    F.col("f.item_index").cast("string"),
                    F.col("f.sub").cast("string"),
                    F.lit("0"),
                )
            ).alias("uuid"),
        )
    )

    # ---- micro-ops: one row per (op, key) touch ---------------------------
    # Single `inline` over one concatenated entry array — a NARROW map, so
    # the (comp)-hash partitioning survives and every window below runs
    # with sorts only, no exchange.
    u = F.from_json("update", _UPDATE_SCHEMA)
    empty = F.lit(None).cast(_ENTRY_TYPE)

    def _map_entries(field: F.Column, phase: int, mk: int) -> F.Column:
        return F.coalesce(
            F.transform(
                F.map_entries(field),
                lambda e, i: F.struct(
                    F.lit(phase).alias("phase"),
                    i.cast("int").alias("pos"),
                    e["key"].alias("k"),
                    F.lit(mk).alias("mk"),
                    # to_json(variant): byte-exact for guarded scalars
                    F.to_json(e["value"]).alias("val"),
                ),
            ),
            empty,
        )

    unset_entries = F.coalesce(
        F.transform(
            u["unset"],
            lambda k, i: F.struct(
                F.lit(2).alias("phase"),
                i.cast("int").alias("pos"),
                k.alias("k"),
                F.lit(2).alias("mk"),
                F.lit(None).cast("string").alias("val"),
            ),
        ),
        empty,
    )
    micro = (
        base.where(F.col("kind") == "update")
        .select(
            "comp",
            "s",
            F.concat(
                _map_entries(u["set"], 0, 0),
                _map_entries(u["set_once"], 1, 1),
                unset_entries,
            ).alias("entries"),
        )
        .select("comp", "s", F.inline("entries"))
    )

    # ---- running per-key state (linear windows, no exchange) --------------
    wk = Window.partitionBy("comp", "k").orderBy("s", "phase", "pos")
    is_unset = (F.col("mk") == 2).cast("int")
    micro = micro.withColumn("seg", F.sum(is_unset).over(wk) - is_unset)
    wseg = Window.partitionBy("comp", "k", "seg").orderBy("s", "phase", "pos")

    ord_struct = F.struct("s", "phase", "pos")
    last_set = F.max(
        F.when(F.col("mk") == 0, F.struct("s", "phase", "pos", "val"))
    ).over(wseg)
    first_set = F.min(F.when(F.col("mk") == 0, ord_struct)).over(wseg)
    first_write = F.min(
        F.when(F.col("mk") != 2, F.struct("s", "phase", "pos", "mk", "val"))
    ).over(wseg)

    state = micro.select(
        "comp",
        "k",
        "s",
        "phase",
        "pos",
        # state AFTER this micro-op; an unset row itself clears everything
        F.when(F.col("mk") != 2, last_set["val"]).alias("pv"),
        F.when(F.col("mk") != 2, first_set).alias("pp"),
        F.when(
            (F.col("mk") != 2) & (first_write["mk"] == 1), first_write["val"]
        ).alias("ov"),
        F.when(
            (F.col("mk") != 2) & (first_write["mk"] == 1),
            F.struct(
                first_write["s"].alias("s"),
                first_write["phase"].alias("phase"),
                first_write["pos"].alias("pos"),
            ),
        ).alias("op_"),
    )

    # ---- final per-key state → person property maps -----------------------
    w_last = Window.partitionBy("comp", "k").orderBy(
        F.desc("s"), F.desc("phase"), F.desc("pos")
    )
    finals = (
        state.withColumn("_rn", F.row_number().over(w_last))
        .where(F.col("_rn") == 1)
        .select("comp", "k", "pv", "pp", "ov", "op_")
    )

    # persons-table maps keep values JSON-ENCODED (kernel double-encodes:
    # json.dumps({k: json.dumps(v)}) — person_state.py _replay person rows)
    from hogflare_spark.operators.ingest import _json_string_literal

    key_lit = F.concat(F.lit('"'), F.col("k"), F.lit('":'))  # keys quote-free (guard)
    person_maps = finals.groupBy("comp").agg(
        F.collect_list(
            F.when(
                F.col("pv").isNotNull(),
                F.struct(
                    F.lit(0).alias("grp"),
                    F.col("pp").alias("pos"),
                    F.concat(key_lit, _json_string_literal(F.col("pv"))).alias("frag"),
                ),
            )
        ).alias("props_e"),
        F.collect_list(
            F.when(
                F.col("ov").isNotNull(),
                F.struct(
                    F.lit(0).alias("grp"),
                    F.col("op_").alias("pos"),
                    F.concat(key_lit, _json_string_literal(F.col("ov"))).alias("frag"),
                ),
            )
        ).alias("once_e"),
    )

    persons = (
        core.join(person_maps, "comp", "left")
        .select(
            F.lit("person").alias("row_type"),
            F.lit(None).cast("long").alias("request_seq"),
            F.lit(None).cast("long").alias("item_index"),
            F.lit(None).cast("string").alias("person_id"),
            F.lit(None).cast("timestamp").alias("person_created_at"),
            F.lit(None).cast("string").alias("person_properties"),
            F.col("comp").alias("canonical_id"),
            "uuid",
            "created_at",
            F.col("version").cast("long").alias("version"),
            # distinct_ids json: quote-free under the ASCII guard
            F.concat(F.lit('["'), F.col("comp"), F.lit('"]')).alias("distinct_ids"),
            _obj_json("props_e").alias("properties"),
            _obj_json("once_e").alias("properties_set_once"),
            F.col("alloc_a"),
            F.lit(0).cast("long").alias("alloc_b"),
            F.lit(0).cast("long").alias("alloc_c"),
            F.lit(None).cast("long").alias("prior_id"),
        )
    )

    allocs = core.select(
        F.lit("alloc").alias("row_type"),
        F.lit(None).cast("long").alias("request_seq"),
        F.lit(None).cast("long").alias("item_index"),
        F.lit(None).cast("string").alias("person_id"),
        F.lit(None).cast("timestamp").alias("person_created_at"),
        F.lit(None).cast("string").alias("person_properties"),
        F.lit(None).cast("string").alias("canonical_id"),
        "uuid",
        F.lit(None).cast("timestamp").alias("created_at"),
        F.lit(None).cast("long").alias("version"),
        F.lit(None).cast("string").alias("distinct_ids"),
        F.lit(None).cast("string").alias("properties"),
        F.lit(None).cast("string").alias("properties_set_once"),
        "alloc_a",
        F.lit(0).cast("long").alias("alloc_b"),
        F.lit(0).cast("long").alias("alloc_c"),
        F.lit(None).cast("long").alias("prior_id"),
    )

    # ---- per-event snapshots: as-of join of ops × touched keys ------------
    # Probes carry uuid/created_at from core up front (comp-local join, no
    # exchange) so the per-event groupBy below directly yields snapshot
    # rows — no join back afterwards.
    changes = state.select(
        "comp",
        "k",
        "s",
        "phase",
        "pos",
        F.lit(0).alias("is_probe"),
        F.struct(
            # merged view: $set wins; once-only entries group after props
            F.when(F.col("pv").isNotNull(), F.lit(0))
            .when(F.col("ov").isNotNull(), F.lit(1))
            .alias("grp"),
            F.when(F.col("pv").isNotNull(), F.col("pp"))
            .when(F.col("ov").isNotNull(), F.col("op_"))
            .alias("pos"),
            F.when(
                F.col("pv").isNotNull() | F.col("ov").isNotNull(),
                F.concat(key_lit, F.coalesce("pv", "ov")),
            ).alias("frag"),
        ).alias("entry"),
        F.lit(None).cast("long").alias("request_seq"),
        F.lit(None).cast("long").alias("item_index"),
        F.lit(None).cast("string").alias("uuid"),
        F.lit(None).cast("timestamp").alias("created_at"),
    )
    # LEFT join: an op for a person that never touched a key still needs a
    # probe row (k null, empty state) so its snapshot serializes as '{}'
    probes = (
        base.select("comp", "s", "request_seq", "item_index")
        .join(core.select("comp", "uuid", "created_at"), "comp")
        .join(finals.select("comp", "k"), "comp", "left")
        .select(
            "comp",
            "k",
            "s",
            F.lit(99).alias("phase"),
            F.lit(0).alias("pos"),
            F.lit(1).alias("is_probe"),
            F.lit(None)
            .cast("struct<grp:int,pos:struct<s:long,phase:int,pos:int>,frag:string>")
            .alias("entry"),
            "request_seq",
            "item_index",
            "uuid",
            "created_at",
        )
    )
    w_asof = Window.partitionBy("comp", "k").orderBy(
        "s", "is_probe", "phase", "pos"
    ).rowsBetween(Window.unboundedPreceding, 0)
    asof = (
        changes.unionByName(probes)
        .withColumn("cur", F.last("entry", ignorenulls=True).over(w_asof))
        .where(F.col("is_probe") == 1)
    )
    snapshots = (
        asof.groupBy("comp", "s", "request_seq", "item_index", "uuid", "created_at")
        .agg(
            F.collect_list(F.when(F.col("cur.frag").isNotNull(), F.col("cur"))).alias(
                "entries"
            )
        )
        .select(
            F.lit("snapshot").alias("row_type"),
            "request_seq",
            "item_index",
            F.col("uuid").alias("person_id"),
            F.col("created_at").alias("person_created_at"),
            _obj_json("entries").alias("person_properties"),
            F.lit(None).cast("string").alias("canonical_id"),
            F.lit(None).cast("string").alias("uuid"),
            F.lit(None).cast("timestamp").alias("created_at"),
            F.lit(None).cast("long").alias("version"),
            F.lit(None).cast("string").alias("distinct_ids"),
            F.lit(None).cast("string").alias("properties"),
            F.lit(None).cast("string").alias("properties_set_once"),
            F.lit(None).cast("long").alias("alloc_a"),
            F.lit(None).cast("long").alias("alloc_b"),
            F.lit(None).cast("long").alias("alloc_c"),
            F.lit(None).cast("long").alias("prior_id"),
        )
    )

    out = snapshots.unionByName(persons).unionByName(allocs)
    # conform to the exact _FOLD_OUT schema (nullability/casts)
    return out.select(
        *[F.col(f.name).cast(f.dataType) for f in fold_out_schema.fields]
    )
