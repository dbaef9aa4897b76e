"""Incremental corpus deduplication for streaming document ingestion.

The batch dedup operators (operators/dedup.py) assume the whole corpus
is present; a real training-data pipeline ingests SNAPSHOTS — each new
crawl/batch must be deduplicated against everything already kept
without re-processing the accumulated corpus. This module is that
incremental half:

- within a micro-batch: keep the min-id row per content hash (the same
  keeper rule as operators/dedup.exact_dedup);
- across batches: an anti-join of the batch's winners against the
  persisted hash state of every previously KEPT document — a new doc
  whose content hash is already in the corpus is dropped, regardless of
  which earlier batch kept it.

State layout: `state/batch=<n>/` parquet of the content hashes kept by
batch n; `kept/batch=<n>/` the kept (doc_id, content_hash) rows.
Deterministic replays are idempotent by construction: a re-delivered
batch id OVERWRITES its own two subdirectories with identical content
(the anti-join reads only batches strictly below the current id, so a
replay never sees its own hashes and drops everything).

Scale shape: the only shuffles are the within-batch hash groupBy
(|batch|-sized) and the anti-join on the 60-bit hash key — |batch| on
the probe side against the accumulated state on the build side. At
100 TB the state table is the thing to co-locate: write it bucketed by
`content_hash` (sinks/bucketed.py) and the anti-join plans shuffle-free
on the state side; the per-batch probe shuffle is batch-sized, never
corpus-sized. The state holds ONE 8-byte hash per kept document —
~orders of magnitude smaller than the corpus it summarizes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hogflare_spark.functions.hashing import h60

KEPT_SCHEMA = "doc_id bigint, content_hash bigint"
STATE_SCHEMA = "content_hash bigint"


class StreamingCorpusDedup:
    """foreachBatch incremental exact-dedup over a document stream.

    Use as `stream.writeStream.foreachBatch(job.process_batch)` or call
    `process_batch(df, batch_id)` directly per micro-batch (the gate and
    tests drive it availableNow-style). `read_kept` returns the
    accumulated kept set.
    """

    def __init__(self, work_dir: str, id_col: str = "doc_id", text_col: str = "text"):
        self.work_dir = work_dir
        self.id_col = id_col
        self.text_col = text_col
        self.state_dir = os.path.join(work_dir, "state")
        self.kept_dir = os.path.join(work_dir, "kept")

    def _prior_state(self, spark: SparkSession, batch_id: int) -> DataFrame:
        dirs = []
        if os.path.isdir(self.state_dir):
            for d in os.listdir(self.state_dir):
                if d.startswith("batch=") and int(d.split("=", 1)[1]) < batch_id:
                    dirs.append(os.path.join(self.state_dir, d))
        if not dirs:
            return spark.createDataFrame([], STATE_SCHEMA)
        return spark.read.schema(STATE_SCHEMA).parquet(*dirs)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hashed = batch_df.select(
            F.col(self.id_col).alias("doc_id"),
            h60(F.col(self.text_col)).alias("content_hash"),
        )
        # within-batch keeper: min id per hash (exact_dedup's rule)
        winners = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
        # cross-batch: drop anything a previous batch already kept
        fresh = winners.join(
            self._prior_state(spark, batch_id), "content_hash", "left_anti"
        ).select("doc_id", "content_hash")
        # overwrite THIS batch's subdirs: deterministic input => a replay
        # rewrites identical content, so re-delivery is a no-op
        fresh.select("doc_id", "content_hash").write.mode("overwrite").parquet(
            os.path.join(self.kept_dir, f"batch={batch_id}")
        )
        fresh.select("content_hash").write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )

    def read_kept(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(KEPT_SCHEMA).parquet(
            os.path.join(self.kept_dir, "batch=*")
        )
