"""Canonical schemas for the engine's governed tables.

The 21-column event sink contract mirrors the reference's PipelineEvent
(/root/reference/src/pipeline.rs:146-183, README.md:57-85): fixed top-level
frame, JSON-string payload columns (SURVEY.md §1.2-1.3). JSON stays a
string — parquet/Iceberg-safe, lossless for arbitrary nesting, and Spark's
JSON path functions (get_json_object / from_json) are JVM-side.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# events — the sink contract (reference: src/pipeline.rs:146-183)
# ---------------------------------------------------------------------------
EVENT_SCHEMA = StructType(
    [
        StructField("uuid", StringType(), False),
        StructField("team_id", LongType(), True),
        StructField("source", StringType(), False),
        StructField("event", StringType(), False),
        StructField("distinct_id", StringType(), False),
        StructField("timestamp", TimestampType(), True),
        StructField("created_at", TimestampType(), False),
        StructField("properties", StringType(), True),  # JSON
        StructField("context", StringType(), True),  # JSON
        StructField("person_id", StringType(), True),
        StructField("person_created_at", TimestampType(), True),
        StructField("person_properties", StringType(), True),  # JSON
        StructField("group0", StringType(), True),
        StructField("group1", StringType(), True),
        StructField("group2", StringType(), True),
        StructField("group3", StringType(), True),
        StructField("group4", StringType(), True),
        StructField("group_properties", StringType(), True),  # JSON
        StructField("api_key", StringType(), True),
        StructField("extra", StringType(), True),  # JSON
    ]
)

EVENT_COLUMNS = [f.name for f in EVENT_SCHEMA.fields]

# Stable columns for oracle comparison (uuid/created_at are fresh per run,
# matching the reference's own test strategy — tests/pipeline_e2e.rs:134-144).
EVENT_STABLE_COLUMNS = [c for c in EVENT_COLUMNS if c not in ("uuid", "created_at")]

# ---------------------------------------------------------------------------
# persons — person state table (reference: src/persons.rs:21-31)
# properties maps hold JSON-encoded values so arbitrary JSON nests losslessly.
# ---------------------------------------------------------------------------
PERSON_SCHEMA = StructType(
    [
        StructField("canonical_id", StringType(), False),
        StructField("id", LongType(), True),
        StructField("team_id", LongType(), True),
        StructField("uuid", StringType(), False),
        StructField("created_at", TimestampType(), False),
        StructField("version", LongType(), False),
        StructField("distinct_ids", ArrayType(StringType()), False),
        StructField("properties", MapType(StringType(), StringType()), False),
        StructField("properties_set_once", MapType(StringType(), StringType()), False),
    ]
)

# ---------------------------------------------------------------------------
# groups — group state table (reference: src/groups.rs:16-23)
# ---------------------------------------------------------------------------
GROUP_SCHEMA = StructType(
    [
        StructField("group_type", StringType(), False),
        StructField("group_key", StringType(), False),
        StructField("created_at", TimestampType(), False),
        StructField("version", LongType(), False),
        StructField("properties", MapType(StringType(), StringType()), False),
    ]
)

# ---------------------------------------------------------------------------
# raw_requests — universal ingest input (FIXTURES.md §1): one row per
# request item, already content-decoded to a JSON string body.
# ---------------------------------------------------------------------------
RAW_REQUEST_SCHEMA = StructType(
    [
        StructField("request_seq", LongType(), False),
        StructField("item_index", LongType(), False),
        StructField("endpoint", StringType(), False),
        StructField("body_json", StringType(), False),
        StructField("header_api_key", StringType(), True),
        StructField("header_sent_at", TimestampType(), True),
        StructField("ip", StringType(), True),
        StructField("geo_json", StringType(), True),
    ]
)

# identity_edges — alias input (FIXTURES.md §4)
IDENTITY_EDGE_SCHEMA = StructType(
    [
        StructField("request_seq", LongType(), False),
        StructField("item_index", LongType(), False),
        StructField("distinct_id", StringType(), False),  # primary side
        StructField("alias", StringType(), False),  # secondary side
    ]
)
