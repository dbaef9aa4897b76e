"""Distributed person-state fold: ingest commands → per-event snapshots +
persons table.

Spark shape (SURVEY.md §7 M3):

1. derive person ops (alias / update / ensure) from the command rows —
   pure expressions, one narrow projection;
2. connected components over alias edges (identity.py) → co-partitioning
   key; ops for unrelated distinct_ids stay in singleton components, so
   the shuffle is effectively a groupBy(distinct_id) with identity
   clusters coalesced;
3. `applyInPandas` per component replays the MemoryPersonStore kernel
   (person_store.py) in (request_seq, item_index, sub) order, emitting
   post-update snapshots per event (U12 — the event carries the person
   state as of *after* its own update, lib.rs:462-470) plus final person
   records and id-allocation events;
4. global sequential person ids materialize post-hoc as a rank over
   allocation order (U10 — a distributed engine must not serialize on a
   counter; SURVEY.md §7.4.3 documents the parity condition).

At 100 TB: stage 1 is map-only; stage 2 shuffles only alias edges
(~#persons, not #events); stage 3 is one shuffle of person-op rows keyed
by component — the same data movement a shuffled streaming state op would
do; stage 4 is a window over #persons rows. Event rows themselves never
shuffle — snapshots join back to events on (request_seq, item_index).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from datetime import datetime
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from hogflare_spark.functions.caching import cached
from hogflare_spark.operators.person_store import (
    PersonStoreReplay,
    snapshot_fields,
    synthetic_time,
)

_FOLD_OUT = StructType(
    [
        StructField("row_type", StringType(), False),
        StructField("request_seq", LongType(), True),
        StructField("item_index", LongType(), True),
        StructField("person_id", StringType(), True),
        StructField("person_created_at", TimestampType(), True),
        StructField("person_properties", StringType(), True),
        StructField("canonical_id", StringType(), True),
        StructField("uuid", StringType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("version", LongType(), True),
        StructField("distinct_ids", StringType(), True),
        StructField("properties", StringType(), True),
        StructField("properties_set_once", StringType(), True),
        StructField("alloc_a", LongType(), True),
        StructField("alloc_b", LongType(), True),
        StructField("alloc_c", LongType(), True),
        StructField("prior_id", LongType(), True),
    ]
)


# replay order within a partition: component runs are contiguous, ops
# within a run in request order (ties only among seed rows, which load
# disjoint records — order-insensitive)
_FOLD_SORT = ["comp", "request_seq", "item_index", "sub"]


def _parse_ts(value: str | None, fallback_seq: int) -> datetime:
    from hogflare_spark.operators.person_store import parse_event_time

    return parse_event_time(value, fallback_seq)


def derive_person_ops(commands: DataFrame) -> DataFrame:
    """Command rows → person-op rows (request_seq, item_index, sub, kind,
    distinct_id, alias, update, timestamp, emit).

    Mirrors handler orchestration: identify's auto-alias precedes its
    update (lib.rs:690-718); the snapshot placed on the event comes from
    the update/ensure op (or the alias op for `/alias` items); group-
    identify events carry no person fields (lib.rs:869-920).

    ONE scan (r9): a command derives at most two ops — an alias/auto-
    alias op and an update/ensure op — built as conditional structs and
    exploded, instead of the former three filtered branches unioned
    (three scans of the command projection per fold; at 100 TB that is
    two redundant passes over the decoded batch). `F.when` with no
    otherwise yields a NULL struct, which the array filter drops, so a
    command matching no branch still contributes nothing.
    """
    is_alias = F.col("alias").isNotNull()
    eligible = F.col("alias").isNull() & (F.col("skip_person") == "0")
    null_s = F.lit(None).cast("string")
    op_first = F.when(
        is_alias,
        F.struct(
            F.lit(1).alias("sub"),
            F.lit("alias").alias("kind"),
            F.get_json_object("alias", "$.distinct_id").alias("distinct_id"),
            F.get_json_object("alias", "$.alias").alias("alias_id"),
            null_s.alias("update"),
            F.lit(True).alias("emit"),
        ),
    ).when(
        eligible & F.col("anon_distinct_id").isNotNull(),
        F.struct(
            F.lit(0).alias("sub"),
            F.lit("alias").alias("kind"),
            F.col("distinct_id").alias("distinct_id"),
            F.col("anon_distinct_id").alias("alias_id"),
            null_s.alias("update"),
            F.lit(False).alias("emit"),
        ),
    )
    op_update = F.when(
        eligible,
        F.struct(
            F.lit(1).alias("sub"),
            F.when(F.col("person_update").isNotNull(), F.lit("update"))
            .otherwise(F.lit("ensure"))
            .alias("kind"),
            F.col("distinct_id").alias("distinct_id"),
            null_s.alias("alias_id"),
            F.col("person_update").alias("update"),
            F.lit(True).alias("emit"),
        ),
    )
    return commands.select(
        "request_seq",
        "item_index",
        "timestamp",
        F.explode(
            F.filter(F.array(op_first, op_update), lambda x: x.isNotNull())
        ).alias("_op"),
    ).select(
        "request_seq",
        "item_index",
        F.col("_op.sub").alias("sub"),
        F.col("_op.kind").alias("kind"),
        F.col("_op.distinct_id").alias("distinct_id"),
        F.col("_op.alias_id").alias("alias_id"),
        F.col("_op.update").alias("update"),
        F.col("timestamp"),
        F.col("_op.emit").alias("emit"),
    )


def _seed_ops(prior_persons: DataFrame) -> DataFrame:
    """Prior persons table → seed op rows (kind='seed', request_seq=-1,
    sorted before every real op). The record is serialized whole into the
    `update` slot and reconstructed by PersonStoreReplay.load_record."""
    payload = F.to_json(
        F.struct(
            F.col("uuid"),
            F.date_format("created_at", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx").alias(
                "created_at"
            ),
            F.col("version"),
            F.col("distinct_ids"),
            F.col("properties"),
            F.col("properties_set_once"),
            F.col("id"),
            F.col("team_id"),
        )
    )
    return prior_persons.select(
        F.lit(-1).cast("long").alias("request_seq"),
        F.lit(0).cast("long").alias("item_index"),
        F.lit(0).alias("sub"),
        F.lit("seed").alias("kind"),
        F.col("canonical_id").alias("distinct_id"),
        F.lit(None).cast("string").alias("alias_id"),
        payload.alias("update"),
        F.lit(None).cast("string").alias("timestamp"),
        F.lit(False).alias("emit"),
    )


def _two_phase_rank(allocs: DataFrame, small_batch: bool = False) -> DataFrame:
    """Global dense allocation rank without a single-reducer stage (U10).

    `small_batch=True` (decided from the same commands-count used by the
    fold's auto fast-path switch) takes a plain global row_number instead:
    below ~10^6 allocations one reducer sorting the whole set is cheaper
    than the range shuffle + sampling pass + offset join, and the output
    is identical (the key is unique and totally ordered either way).

    `row_number().over(Window.orderBy(...))` with no partitionBy funnels
    every allocation through one reducer — fine at test scale, fatal on a
    100 TB backfill allocating hundreds of millions of persons. Instead:

    1. range-partition + sort on the key, so partition i holds keys
       strictly below partition i+1 and rows are ordered within each;
    2. read the partition-local row index straight out of
       `monotonically_increasing_id()` (documented layout: partition id in
       the upper 31 bits, per-partition row counter in the lower 33) — no
       window function, so no second exchange after the range shuffle;
    3. add the cumulative row-count of all lower partitions — a running
       sum over one row per partition, bounded by cluster width
       (#shuffle partitions), not data size.

    Keys are unique (alloc_uuid is a fresh UUID), so ranks are total and
    deterministic regardless of where the range boundaries land. The tiny
    (#allocs-row) indexed frame is cached so the counts pass and the
    final join don't each redo the range shuffle and its sampling job.
    """
    n = allocs.sparkSession.sparkContext.defaultParallelism
    keys = ["alloc_a", "alloc_b", "alloc_uuid"]
    if small_batch:
        w = Window.orderBy(*keys)
        return allocs.select(
            "alloc_uuid", F.row_number().over(w).cast("long").alias("rank")
        )
    local = (
        allocs.repartitionByRange(n, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("mid", F.monotonically_increasing_id())
        .select(
            "alloc_uuid",
            F.shiftrightunsigned("mid", 33).alias("pid"),
            (F.col("mid").bitwiseAND(F.lit((1 << 33) - 1))).alias("local_idx"),
        )
    )
    local = cached(local)
    counts = local.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    offsets = counts.select(
        "pid",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
    )
    return local.join(F.broadcast(offsets), "pid").select(
        "alloc_uuid", (F.col("local_idx") + F.col("offset") + F.lit(1)).alias("rank")
    )


# Auto-mode threshold for engaging the JVM expression fold for EVERY
# eligible component. None = auto only engages it per-component via
# MEGA_COMPONENT_MIN_OPS below: measured head-to-head (scripts/fold_crossover.py, local[32],
# 3 keys/op), the Arrow+Python replay wins at every size we can measure —
# and the round-5 streaming-replay rewrite widened the gap: 9s vs 36s at
# 2M ops (was 16s vs 31s with the per-group applyInPandas shape) —
# because the expression path's as-of snapshot assembly pays two extra
# exchanges and three wide sorts over an ops×keys frame while the replay
# pays C-speed dict work in one exchange. The JVM path stays available
# as fast_path=True: since the replay now streams Arrow batches (it no
# longer buffers a component's full op list in one pandas frame), the
# JVM path's remaining value is executors without Python runtimes and
# wholly-spillable execution; auto's mega-component routing keeps it
# exercised on oversized components.
FAST_PATH_MIN_COMMANDS: int | None = None
# Above this, the allocation rank uses the range-partitioned two-phase
# scheme; below it, a single-reducer sort of #persons rows is cheaper.
RANK_TWO_PHASE_MIN_COMMANDS = 1_000_000
# Mega-component escape hatch for auto mode: a component whose op count
# reaches this is routed to the JVM expression fold even though the
# Python replay is faster for normal components — the replay buffers a
# component's ENTIRE op list as one pandas frame (one hot distinct_id
# with millions of ops = one OOM-able task), while the expression fold
# streams through spillable sorts. Throughput-vs-robustness crossover,
# not a measured speed crossover (see FAST_PATH_MIN_COMMANDS above).
MEGA_COMPONENT_MIN_OPS = 500_000
# Target op rows per replay task. Each mapInPandas task pays a Python
# worker round trip (~40-60 ms of Arrow framing + scheduling at local
# sizes) regardless of row count, while the replay itself costs ~6 µs/op
# — so below ~25k ops/task the boundary overhead outweighs the extra
# parallelism (measured at sf0.1: the same no-op kernel costs 1.09 s at
# 32 partitions vs 0.56 s at 8). The fold therefore sizes its width to
# ceil(ops / this) CLAMPED to the cluster's parallelism — at real scale
# ops/25k vastly exceeds the core count and the clamp keeps the fold as
# wide as the cluster, so this is purely a small-batch tax cut.
FOLD_OPS_PER_TASK = 25_000
# Pin the fold output as an eagerly-materialized RDD (localCheckpoint)
# instead of cache(): snapshots, the allocation rank's sampling pass, and
# persons assembly all consume it — some from AQE broadcast threads whose
# plan clones defeat CacheManager sameResult matching, observed re-running
# the whole decode+replay chain per consumer. Tests that assert on the
# fold's plan SHAPE (which engine ran) set this to False, since the
# checkpoint hides the subtree behind a Scan ExistingRDD.
FOLD_PIN = True


def fold_person_state(
    commands: DataFrame,
    team_id: int | None = None,
    prior_persons: DataFrame | None = None,
    fast_path: bool | str = "auto",
    person_id_floor: int | None = None,
    emit_snapshots: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns (snapshots, persons).

    `emit_snapshots=False` skips the per-op snapshot assembly inside the
    Python replay (merged-property dict + JSON dump per emitted op) for
    callers that consume ONLY the persons table — a persons rebuild at
    100 TB shouldn't serialize one snapshot per event it never reads.
    The returned snapshots frame is then empty. Python-replay path only;
    the JVM twin assembles snapshots in codegen where the saving is
    negligible.

    snapshots: (request_seq, item_index, person_id, person_created_at,
    person_properties) — join back to events on the seq pair.
    persons: final state table per PERSON_SCHEMA.

    `prior_persons` (streaming incremental folds): a PERSON_SCHEMA frame
    whose records are seeded into the replay before this batch's ops —
    their distinct_ids contribute identity edges so ops touching any of a
    record's ids land in its component, and their sequential ids survive
    (new allocations continue above the prior max).

    `fast_path`: "auto" (default) uses the Arrow+Python replay unless
    FAST_PATH_MIN_COMMANDS is configured and exceeded — head-to-head
    measurement (scripts/fold_crossover.py) shows the replay beats the
    JVM expression fold at every locally measurable size, so auto
    defaults to the replay — EXCEPT that individual eligible components
    whose op count reaches MEGA_COMPONENT_MIN_OPS are routed to the JVM
    fold for memory robustness (the replay would buffer the whole
    component as one pandas frame). True forces the JVM path
    (person_fast.py) — the memory-robust mode for components too large
    to buffer in pandas and for Python-less executors; pinned by the
    hf_person_fold_fast driver gate and tests/test_person_fast.py.
    False forces the Python replay.
    """
    from hogflare_spark.operators.identity import connected_components

    small_batch = False
    n_commands: int | None = None
    n_alias_cmds: int | None = None
    if fast_path == "auto":
        # ONE aggregate sizes the whole fold: the command count (rank
        # scheme + fold width) and the alias-op count. The alias count
        # lets the common no-alias batch skip the CC probe job and the
        # component left-join below outright (r9; the probe was a
        # separate isEmpty job per fold). r12: when the decode lane's
        # all-fast branch produced `commands`, it stashed these two
        # counts from observe() metrics collected DURING its checkpoint
        # materialization (normalize.decode_normalize_requests) — the
        # sizing then costs zero jobs; otherwise one aggregate job rides
        # the checkpointed/cached command projection as before.
        sizing = getattr(commands, "_hogflare_sizing", None)
        if sizing is not None:
            n_commands, n_alias_cmds = int(sizing[0]), int(sizing[1])
        else:
            from hogflare_spark.operators.normalize import (
                alias_command_condition,
            )

            agg_row = commands.agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(alias_command_condition(), 1)).alias(
                    "n_alias"
                ),
            ).first()
            n_commands = int(agg_row["n"])
            n_alias_cmds = int(agg_row["n_alias"])
        small_batch = n_commands < RANK_TWO_PHASE_MIN_COMMANDS
        if FAST_PATH_MIN_COMMANDS is not None and n_commands >= FAST_PATH_MIN_COMMANDS:
            fast_path = True
        elif n_commands * 2 >= MEGA_COMPONENT_MIN_OPS:
            # per-component routing: replay for normal components, JVM
            # fold for oversized ones. One command derives at most two
            # person ops, so below half the per-component threshold no
            # component can possibly be mega — skip the flag pass and
            # its localCheckpoint entirely.
            fast_path = "mega"
        else:
            fast_path = False

    ops = derive_person_ops(commands)
    if prior_persons is not None:
        ops = ops.unionByName(_seed_ops(prior_persons))

    # identity graph: alias edges ONLY. Singleton distinct_ids don't need to
    # pass through the CC loop — the left join below coalesces them to their
    # own id. This keeps the iterative CC input at ~#alias-ops (tiny) instead
    # of ~#ops (the event stream), which is the difference between a
    # constant-size fixpoint loop and one shuffling the whole stream per
    # round at 100 TB.
    if n_alias_cmds == 0 and prior_persons is None:
        # the sizing aggregate above proved there are no alias ops and
        # nothing is seeded: every component is the singleton of its
        # distinct_id — skip the CC machinery AND its left join
        components = None
        ops_with_comp = ops.withColumn("comp", F.col("distinct_id"))
    else:
        edges = ops.where(F.col("kind") == "alias").select(
            F.col("distinct_id").alias("src"), F.col("alias_id").alias("dst")
        )
        if prior_persons is not None:
            # a prior record's distinct_ids are identity edges: new ops
            # touching any of them must land in the record's component
            edges = edges.union(
                prior_persons.select(
                    F.col("canonical_id").alias("src"),
                    F.explode("distinct_ids").alias("dst"),
                )
            )
        components = connected_components(edges)

        ops_with_comp = ops.join(
            components.withColumnRenamed("id", "distinct_id"), "distinct_id", "left"
        ).withColumn("comp", F.coalesce("comp", "distinct_id"))

    def _row(row_type: str, **kw) -> dict:
        base = {f.name: None for f in _FOLD_OUT.fields}
        base["row_type"] = row_type
        base.update(kw)
        return base

    def _alloc_key(alloc: tuple) -> tuple[int, int]:
        # (request_seq, item_index, sub, k) → sortable pair
        return (
            alloc[0] * 1_000_000 + alloc[1] * 100 + alloc[2],
            alloc[3] if len(alloc) > 3 else 0,
        )

    def _flush_store(store: PersonStoreReplay, out: list) -> None:
        """Emit a finished component's alloc events + final records."""
        for uuid_, alloc in store.alloc_events:
            a, b = _alloc_key(alloc)
            out.append(_row("alloc", uuid=uuid_, alloc_a=a, alloc_b=b, alloc_c=0))
        for canonical, record in store.records.items():
            a, b = _alloc_key(record.alloc_seq or (0, 0, 0, 0))
            out.append(
                _row(
                    "person",
                    canonical_id=canonical,
                    uuid=record.uuid,
                    created_at=record.created_at,
                    version=record.version,
                    distinct_ids=json.dumps(record.distinct_ids),
                    # map values JSON-encoded for lossless nesting
                    # (FIXTURES.md §3)
                    properties=json.dumps(
                        {k: json.dumps(v, separators=(",", ":")) for k, v in record.properties.items()},
                        separators=(",", ":"),
                    ),
                    properties_set_once=json.dumps(
                        {
                            k: json.dumps(v, separators=(",", ":"))
                            for k, v in record.properties_set_once.items()
                        },
                        separators=(",", ":"),
                    ),
                    alloc_a=a,
                    alloc_b=b,
                    alloc_c=0,
                    prior_id=record.prior_id,
                )
            )

    _COLS = [f.name for f in _FOLD_OUT.fields]

    def _emit_frame(pd, s_seq, s_item, s_pid, s_created, s_props, out):
        """Assemble one output frame. Snapshot rows dominate (one per
        emitted op) and are accumulated as columns; low-cardinality
        alloc/person rows keep the dict path for clarity. Uniform object
        dtype on BOTH frames: the None-filled filler columns are all-NA,
        and concat'ing an all-NA column against an inferred int64 twin
        trips pandas' deprecated concat dtype inference (future versions
        change the result dtype the Arrow conversion of _FOLD_OUT
        depends on). The values are already Python objects, so
        dtype=object costs nothing."""
        rest = pd.DataFrame(out, columns=_COLS, dtype=object)
        if not s_seq:
            return rest if len(rest) else None
        snap = pd.DataFrame(
            {
                "row_type": "snapshot",
                "request_seq": s_seq,
                "item_index": s_item,
                "person_id": s_pid,
                "person_created_at": s_created,
                "person_properties": s_props,
            },
            dtype=object,
        )
        for c in _COLS:
            if c not in snap.columns:
                snap[c] = pd.Series([None] * len(snap), dtype=object)
        snap = snap[_COLS]
        if not len(rest):
            return snap
        return pd.concat([snap, rest], ignore_index=True)

    def _replay_stream(batches: Iterator[Any]) -> Iterator[Any]:
        """Partition-streaming replay: rows arrive sorted by
        (comp, request_seq, item_index, sub) — _FOLD_SORT, enforced by
        the sortWithinPartitions below — so each component's ops are a
        contiguous run. One kernel instance walks the whole partition,
        switching stores at comp boundaries (state persists across Arrow
        batches, so a component spanning batches needs no carry-over
        buffering). This replaces groupBy().applyInPandas, whose
        per-group Arrow-batch + pandas-frame machinery measured ~5x the
        cost of the replay itself on realistic (many small components)
        traffic: a no-op applyInPandas over 100k ops / 1.5k comps took
        1.9 s where the equivalent sorted mapInPandas took 0.4 s."""
        import pandas as pd

        comp_cur: Any = None
        store: PersonStoreReplay | None = None
        from hogflare_spark.functions.fastjson import loads
        for pdf in batches:
            s_seq: list[int] = []
            s_item: list[int] = []
            s_pid: list[Any] = []
            s_created: list[Any] = []
            s_props: list[Any] = []
            out: list = []
            # Columnar extraction + plain zip: .tolist() converts the
            # numpy int64 columns to Python ints ONCE (itertuples paid a
            # namedtuple._make per row plus int() casts per field —
            # measured ~15% of the kernel). op_time is passed as the RAW
            # (timestamp, seq_linear) pair; the store parses it only
            # when a record is actually created (person_store
            # _resolve_time — per-op eager parsing was another ~10%).
            for rseq, item, sub, kind, did, alias_id, update, ts, emit, comp in zip(
                pdf["request_seq"].tolist(),
                pdf["item_index"].tolist(),
                pdf["sub"].tolist(),
                pdf["kind"].tolist(),
                pdf["distinct_id"].tolist(),
                pdf["alias_id"].tolist(),
                pdf["update"].tolist(),
                pdf["timestamp"].tolist(),
                pdf["emit"].tolist(),
                pdf["comp"].tolist(),
            ):
                if comp != comp_cur or store is None:
                    if store is not None:
                        _flush_store(store, out)
                    comp_cur = comp
                    store = PersonStoreReplay(comp_cur, team_id)
                seq_linear = rseq * 1_000_000 + item * 100 + sub
                op_time = (ts, seq_linear)
                seq = (rseq, item, sub)
                if kind == "seed":
                    store.load_record(did, loads(update))
                    continue
                if kind == "alias":
                    _, record = store.apply_alias(did, alias_id, op_time, seq)
                elif kind == "update":
                    _, record = store.apply_update(loads(update), op_time, seq)
                else:
                    _, record = store.ensure_person(did, op_time, seq)
                if emit_snapshots and emit:
                    pid, pcreated, pprops = snapshot_fields(record)
                    s_seq.append(rseq)
                    s_item.append(item)
                    s_pid.append(pid)
                    s_created.append(pcreated)
                    s_props.append(pprops)
            frame = _emit_frame(pd, s_seq, s_item, s_pid, s_created, s_props, out)
            if frame is not None:
                yield frame
        if store is not None:
            out = []
            _flush_store(store, out)
            if out:
                yield pd.DataFrame(out, columns=_COLS, dtype=object)

    # Explicit hash-partition on the fold key: the groupBy's own shuffle
    # would be AQE-coalesced by *bytes* (a few MB of narrow op rows → 1-4
    # partitions), serializing the CPU-bound Python replay. A pinned
    # partition count keeps the fold as wide as the cluster — but no wider
    # than FOLD_OPS_PER_TASK-sized tasks justify (each Python worker round
    # trip has a fixed cost that dominates under ~25k ops/task; see the
    # constant). One command derives at most two ops, so 2·n_commands
    # bounds the op count without another job.
    n_fold = ops_with_comp.sparkSession.sparkContext.defaultParallelism
    if n_commands is not None:
        n_fold = max(
            1, min(n_fold, -(-2 * n_commands // FOLD_OPS_PER_TASK))
        )
    partitioned = ops_with_comp.repartition(n_fold, "comp")

    def _stream_fold(df: DataFrame) -> DataFrame:
        # partition-local sort puts each component's ops in one
        # contiguous, replay-ordered run; no extra exchange
        return df.sortWithinPartitions(*_FOLD_SORT).mapInPandas(
            _replay_stream, _FOLD_OUT
        )

    if fast_path == "mega":
        # Cheap pre-check before the full eligibility flag pass: the
        # mega routing only fires when SOME component's op count reaches
        # MEGA_COMPONENT_MIN_OPS. Computed WITHOUT materializing the ops
        # frame (the old eager localCheckpoint of every op row measured
        # ~1.5s of the sf1 gate): per-id op counts partial-aggregate to
        # |ids| rows map-side, join the (tiny) CC labels, and sum per
        # component — a component's op count is exactly the sum of its
        # member ids' op counts. The common case (no hot key) then skips
        # the window flag pass and its full-frame localCheckpoint
        # entirely; the fold re-reads ops from the cached commands.
        id_counts = ops.groupBy("distinct_id").agg(F.count(F.lit(1)).alias("c"))
        if components is None:
            # no alias ops, no seeds: components ARE the distinct_ids
            comp_counts = id_counts.withColumnRenamed("distinct_id", "comp")
        else:
            comp_counts = (
                id_counts.join(
                    components.withColumnRenamed("id", "distinct_id"),
                    "distinct_id",
                    "left",
                )
                .withColumn("comp", F.coalesce("comp", "distinct_id"))
                .groupBy("comp")
                .agg(F.sum("c").alias("c"))
            )
        mx = comp_counts.agg(F.max("c").alias("mx")).first()["mx"]
        if mx is None or mx < MEGA_COMPONENT_MIN_OPS:
            fast_path = False
        else:
            # hot key present: the flag pass below fans this frame out
            # to several consumers — pin it once
            partitioned = partitioned.localCheckpoint(eager=True)

    if fast_path:
        # Alias-free components whose fragments pass the byte-parity
        # guards fold in pure JVM expressions (person_fast.py); only
        # components with alias/seed ops — or unsafe fragments — pay the
        # Python replay. The component flag is a partition-local window
        # (same hash partitioning, no extra exchange).
        from hogflare_spark.operators.person_fast import (
            fast_person_fold,
            op_fast_eligible,
        )

        wc = Window.partitionBy("comp")
        # localCheckpoint (NOT cache): the fast pipeline fans this frame
        # out to four consumers that self-join (probes = ops × core ×
        # keys). Self-join deduplication re-labels expression ids, which
        # defeats CacheManager's sameResult lookup — with .cache() the
        # decode/normalize/CC sub-DAG silently re-executed per branch
        # (observed: raw FileScans with pushed eligibility filters in the
        # executed plan). A localCheckpoint pins the rows to a concrete
        # RDD-backed node that every branch shares and preserves the
        # (comp) hash partitioning for the downstream windows. Narrow op
        # rows — at 100 TB this is the op projection of the batch, the
        # same data the Python replay buffered per group.
        eligible = F.min(F.when(op_fast_eligible(), 1).otherwise(0)).over(wc) == 1
        if fast_path == "mega":
            # auto mode's robustness routing: only components whose op
            # count reaches MEGA_COMPONENT_MIN_OPS take the JVM fold;
            # everything else keeps the measured-faster Python replay.
            # The count is a partition-local window over the same hash
            # partitioning — no extra exchange.
            eligible = eligible & (
                F.count(F.lit(1)).over(wc) >= F.lit(MEGA_COMPONENT_MIN_OPS)
            )
        flagged = partitioned.withColumn("_fast", eligible).localCheckpoint(
            eager=True
        )
        slow_ops = flagged.where(~F.col("_fast")).drop("_fast")
        fast_ops = flagged.where(F.col("_fast"))
        # flagged is materialized, so one grouped count is a single
        # cached-scan job; skipping an empty branch avoids spinning 32
        # Python workers (slow) or a dozen no-op stages (fast) for zero
        # rows — the common cases are all-fast (plain capture traffic)
        # and all-slow (seeded streaming batches).
        counts = {
            r["_fast"]: r["count"]
            for r in flagged.groupBy("_fast").count().collect()
        }
        branches = []
        if counts.get(False, 0):
            branches.append(_stream_fold(slow_ops))
        if counts.get(True, 0):
            branches.append(fast_person_fold(fast_ops, _FOLD_OUT))
        if not branches:
            branches = [flagged.sparkSession.createDataFrame([], _FOLD_OUT)]
        folded = branches[0]
        for b in branches[1:]:
            folded = folded.unionByName(b)
    else:
        folded = _stream_fold(partitioned)
    # see FOLD_PIN: physical pin so the replay runs exactly once across
    # all consumers; O(batch) state rows
    folded = folded.localCheckpoint(eager=True) if FOLD_PIN else cached(folded)

    snapshots = folded.where(F.col("row_type") == "snapshot").select(
        "request_seq", "item_index", "person_id", "person_created_at", "person_properties"
    )

    allocs = folded.where(F.col("row_type") == "alloc").select(
        F.col("uuid").alias("alloc_uuid"), "alloc_a", "alloc_b"
    )
    # new allocations continue above the prior max id (seeded records keep
    # their stored id via prior_id). `person_id_floor` overrides the
    # derived max for callers that seed only a SLICE of the prior table
    # (the hybrid streaming fast lane passes the affected persons plus
    # the global max id it tracks in its state pointer) — without it a
    # restricted seed would re-issue ids already held by unseeded rows.
    if person_id_floor is not None:
        # a known floor is a literal — no join needed
        id_rank = _two_phase_rank(allocs, small_batch).select(
            "alloc_uuid",
            (F.col("rank") + F.lit(int(person_id_floor)).cast("long")).alias(
                "new_id"
            ),
        )
    elif prior_persons is not None:
        max_prior = prior_persons.agg(
            F.coalesce(F.max("id"), F.lit(0)).cast("long").alias("_max_prior")
        )
        id_rank = (
            _two_phase_rank(allocs, small_batch)
            .crossJoin(F.broadcast(max_prior))
            .select(
                "alloc_uuid",
                (F.col("rank") + F.col("_max_prior")).alias("new_id"),
            )
        )
    else:
        # fresh fold: ids start at 1 — the former broadcast-crossJoin of
        # a literal 0 cost one AQE broadcast job per fold for nothing
        id_rank = _two_phase_rank(allocs, small_batch).select(
            "alloc_uuid", F.col("rank").alias("new_id")
        )
    persons = (
        folded.where(F.col("row_type") == "person")
        .join(id_rank, F.col("uuid") == F.col("alloc_uuid"), "left")
        .select(
            "canonical_id",
            F.coalesce(F.col("prior_id"), F.col("new_id")).cast("long").alias("id"),
            F.lit(team_id).cast("long").alias("team_id"),
            "uuid",
            "created_at",
            "version",
            F.from_json("distinct_ids", "array<string>").alias("distinct_ids"),
            F.from_json("properties", "map<string,string>").alias("properties_raw"),
            F.from_json("properties_set_once", "map<string,string>").alias("set_once_raw"),
        )
        .withColumnRenamed("properties_raw", "properties")
        .withColumnRenamed("set_once_raw", "properties_set_once")
    )
    return snapshots, persons
