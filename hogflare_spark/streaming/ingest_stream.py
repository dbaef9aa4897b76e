"""Structured Streaming ingest (SURVEY.md §7 M6).

The reference processes requests synchronously per HTTP call with per-key
Durable-Object state (/root/reference/src/lib.rs:406-475,
src/persons.rs:488-541). The Spark realization is micro-batch:

- `read_request_stream`: readStream over a landing directory of JSON
  request rows (a thin HTTP receiver writes these; Kafka would slot in
  identically via format("kafka")).
- `StreamingIngestJob`: foreachBatch incremental fold. Each micro-batch
  decodes + normalizes its requests, seeds the person/group folds with
  the prior state version, appends enriched events (partitioned by event
  date), and writes a new state version. State versions are directories
  `persons/v=<n>` with a _LATEST pointer committed last, so a crashed
  batch never corrupts readable state and replays (same batch id) simply
  rewrite the same version — idempotent with the stream checkpoint.
- `stateful_person_snapshots`: a true per-key stateful operator
  (`applyInPandasWithState`, state store-backed) folding $set/$set_once/
  $unset per distinct_id and emitting post-update snapshots — the direct
  analogue of the reference's per-key DO serialization. Cross-key alias
  merges are NOT expressible inside a keyed state op (they need cross-
  partition coordination); the foreachBatch path above is the complete-
  semantics mode, this operator is the low-latency alias-free mode.
- `windowed_event_counts`: event-time tumbling-window aggregation with a
  watermark — the late-data policy the reference never had (SURVEY.md
  §2.6 "Streaming" row documents the divergence).

Arrival-order parity: within a micro-batch, ops replay in (request_seq,
item_index) order exactly like the batch path; across batches, order is
micro-batch arrival order. This matches the reference's per-request
sequencing as long as the receiver assigns monotone request_seq.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from hogflare_spark.schemas import GROUP_SCHEMA, PERSON_SCHEMA

RAW_STREAM_SCHEMA = StructType(
    [
        StructField("request_seq", LongType(), False),
        StructField("endpoint", StringType(), False),
        StructField("body", StringType(), False),
        StructField("content_encoding", StringType(), True),
        StructField("header_api_key", StringType(), True),
        StructField("header_sent_at", StringType(), True),
    ]
)


def read_request_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source request stream; one JSON object per line."""
    reader = spark.readStream.schema(RAW_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(landing_dir)


class StreamingIngestJob:
    """Incremental ingest: micro-batches fold into versioned state tables
    plus a date-partitioned events log."""

    def __init__(
        self,
        warehouse_dir: str,
        team_id: int | None = None,
        group_types: tuple[str | None, ...] = (None, None, None, None, None),
    ):
        self.warehouse_dir = warehouse_dir
        self.team_id = team_id
        self.group_types = group_types
        self.events_dir = os.path.join(warehouse_dir, "events")

    # ---- state versioning ------------------------------------------------

    def _state_root(self, table: str) -> str:
        return os.path.join(self.warehouse_dir, table)

    def _latest_version(self, table: str) -> int | None:
        pointer = os.path.join(self._state_root(table), "_LATEST")
        if not os.path.exists(pointer):
            return None
        with open(pointer) as fh:
            return int(fh.read().strip())

    def _read_state(self, spark: SparkSession, table: str, schema) -> DataFrame | None:
        version = self._latest_version(table)
        if version is None:
            return None
        path = os.path.join(self._state_root(table), f"v={version}")
        return spark.read.schema(schema).parquet(path)

    def _write_state(self, df: DataFrame, table: str, version: int) -> None:
        root = self._state_root(table)
        path = os.path.join(root, f"v={version}")
        df.write.mode("overwrite").parquet(path)
        tmp = os.path.join(root, "_LATEST.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(root, "_LATEST"))

    def read_persons(self, spark: SparkSession) -> DataFrame | None:
        return self._read_state(spark, "persons", PERSON_SCHEMA)

    def read_groups(self, spark: SparkSession) -> DataFrame | None:
        return self._read_state(spark, "groups", GROUP_SCHEMA)

    # ---- the micro-batch body -------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from hogflare_spark.operators.ingest import ingest_raw_requests

        spark = batch_df.sparkSession
        out = ingest_raw_requests(
            batch_df,
            team_id=self.team_id,
            group_types=self.group_types,
            prior_persons=self.read_persons(spark),
            prior_groups=self.read_groups(spark),
        )
        events = out["events"].withColumn("event_date", F.to_date("created_at"))
        # events first: if we crash between events and state, the stream
        # checkpoint replays this batch id and the rewrite of both is
        # idempotent (deterministic uuids/seq keys)
        events.write.mode("append").partitionBy("event_date").parquet(self.events_dir)
        # state folds must materialize BEFORE the new version overwrites
        # the directory the fold is lazily reading from
        new_persons = out["persons"].localCheckpoint(eager=True)
        new_groups = out["groups"].localCheckpoint(eager=True)
        self._write_state(new_persons, "persons", int(batch_id))
        self._write_state(new_groups, "groups", int(batch_id))

    def start(
        self,
        raw_stream: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
    ):
        writer = (
            raw_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_available_now(self, raw_stream: DataFrame, checkpoint_dir: str) -> None:
        q = self.start(raw_stream, checkpoint_dir, available_now=True)
        q.awaitTermination()


# ---------------------------------------------------------------------------
# per-key stateful operator (alias-free low-latency mode)
# ---------------------------------------------------------------------------

SNAPSHOT_SCHEMA = StructType(
    [
        StructField("request_seq", LongType(), False),
        StructField("item_index", LongType(), False),
        StructField("distinct_id", StringType(), False),
        StructField("person_version", LongType(), False),
        StructField("person_properties", StringType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("properties", StringType(), True),
        StructField("properties_set_once", StringType(), True),
        StructField("version", LongType(), True),
    ]
)


def stateful_person_snapshots(commands: DataFrame) -> DataFrame:
    """Streaming per-distinct_id $set/$set_once/$unset fold emitting
    post-update snapshots (U5+U12 for the alias-free stream).

    Input: streaming frame with (request_seq, item_index, distinct_id,
    person_update JSON). State lives in the Spark state store keyed by
    distinct_id — per-key serial processing, the reference's DO model
    (persons.rs:488-541). Updates within a batch apply in (request_seq,
    item_index) order.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key: tuple, pdfs: Iterator[Any], state: GroupState) -> Iterator[Any]:
        import pandas as pd

        (distinct_id,) = key
        if state.exists:
            props_json, set_once_json, version = state.get
            props = json.loads(props_json or "{}")
            set_once = json.loads(set_once_json or "{}")
            version = int(version or 0)
        else:
            props, set_once, version = {}, {}, 0

        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["request_seq", "item_index"], kind="mergesort")
            for r in pdf.itertuples(index=False):
                update = json.loads(r.person_update) if r.person_update else {}
                version += 1
                for k, v in update.get("set", {}).items():
                    props[k] = v
                for k, v in update.get("set_once", {}).items():
                    if k not in props and k not in set_once:
                        set_once[k] = v
                for k in update.get("unset", []):
                    props.pop(k, None)
                    set_once.pop(k, None)
                merged = dict(set_once)
                merged.update(props)
                rows.append(
                    {
                        "request_seq": int(r.request_seq),
                        "item_index": int(r.item_index),
                        "distinct_id": distinct_id,
                        "person_version": version,
                        "person_properties": json.dumps(
                            merged, separators=(",", ":")
                        ),
                    }
                )
        state.update(
            (
                json.dumps(props, separators=(",", ":")),
                json.dumps(set_once, separators=(",", ":")),
                version,
            )
        )
        yield pd.DataFrame(rows, columns=[f.name for f in SNAPSHOT_SCHEMA.fields])

    return commands.groupBy("distinct_id").applyInPandasWithState(
        fold,
        SNAPSHOT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# event-time windowed aggregation with watermark
# ---------------------------------------------------------------------------


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    time_col: str = "created_at",
) -> DataFrame:
    """Tumbling-window per-event-name counts with late-data bound.

    The watermark drops events later than `watermark` behind the max seen
    event time and lets the state store evict closed windows — the policy
    knob the reference lacks (it processes strictly in arrival order).
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("win"), F.col("event"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event",
            "n",
        )
    )
