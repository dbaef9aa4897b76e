"""Incremental ANN index maintenance: the streaming half of the IVF
stack.

`operators/similarity.ivf_write_index` materializes a corpus as a
cell-partitioned parquet index in one shot; a production embedding
pipeline instead APPENDS — each new micro-batch of vectors must join
the index without rebuilding it, and queries must see the accumulated
corpus. `StreamingIvfIndex` is that incremental form, on the same
snapshot-state pattern as `streaming/corpus_dedup`:

- bootstrap (first batch): train the coarse quantizer on the batch
  (`ivf_train_centroids` — bounded driver-side sample, deterministic),
  claim a versioned data dir, land the batch, then swing ONE atomic
  pointer holding BOTH the centroids and the data path — a reader can
  never pair data with the wrong quantizer;
- append (every later batch): load the pointer, assign the batch's
  vectors under the PERSISTED centroids (map-only JVM expression, no
  shuffle), and overwrite `batch=<id>/cell=<c>/` under the data dir —
  re-delivery of a batch id rewrites identical content, so the layout
  is replay-idempotent without coordination;
- query: `ivf_query_index` unchanged — partition discovery lifts the
  (batch, cell) dir levels into columns and the probe-cell filter still
  PRUNES at the cell level, so a probe opens only the probed cell dirs
  of each batch.

Centroid staleness is the deliberate trade (every incremental ANN
index makes it): cells drift as the distribution moves, which degrades
probe recall but never correctness of what IS indexed — rerank is
exact over whatever candidates the probes return. A retrain is a new
pointer version over the same protocol (`ivf_write_index` on the
accumulated corpus), exactly like the batch rebuild path.

At scale: per batch this is one map-only assignment scan and one
partitioned write of |batch| rows; nothing ever rewrites the
accumulated index. Small files from many tiny batches are the known
cost of the layout — the same compaction answer as the dedup state
(roll batch dirs into a snapshot version) applies and is what
`ivf_write_index` + pointer swing already implement for full rebuilds.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingIvfIndex:
    """foreachBatch-driveable incremental IVF index: call
    `process_batch(df, batch_id)` per micro-batch, `query_topk` any
    time after the bootstrap batch."""

    def __init__(
        self,
        index_dir: str,
        n_centroids: int = 16,
        sample_mod: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.index_dir = index_dir
        self.n_centroids = n_centroids
        self.sample_mod = sample_mod
        self.id_col = id_col
        self.vec_col = vec_col
        self._pointer_path = os.path.join(index_dir, "_CENTROIDS.json")

    def _pointer(self) -> dict | None:
        if os.path.exists(self._pointer_path):
            with open(self._pointer_path) as fh:
                return json.load(fh)
        return None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from hogflare_spark.operators.similarity import (
            ivf_assign_expr,
            ivf_train_centroids,
        )

        ptr = self._pointer()
        if ptr is None:
            centroids = ivf_train_centroids(
                batch_df,
                self.n_centroids,
                sample_mod=self.sample_mod,
                id_col=self.id_col,
                vec_col=self.vec_col,
            )
            os.makedirs(self.index_dir, exist_ok=True)
            version = 1
            while True:
                data_rel = f"data.v={version}"
                try:
                    os.mkdir(os.path.join(self.index_dir, data_rel))
                    break
                except FileExistsError:
                    version += 1
        else:
            centroids, data_rel = ptr["centroids"], ptr["data"]

        assigned = batch_df.select(
            F.col(self.id_col).alias("vec_id"),
            F.col(self.vec_col).alias("embedding"),
            ivf_assign_expr(F.col(self.vec_col), centroids).alias("cell"),
        )
        assigned.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(self.index_dir, data_rel, f"batch={batch_id}")
        )
        if ptr is None:
            # pointer swings only AFTER the bootstrap data landed — a
            # crash before this line leaves an unreferenced orphan dir,
            # never a reader pairing data with absent centroids
            tmp = self._pointer_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {"centroids": centroids, "data": data_rel,
                     "bootstrap_batch": batch_id},
                    fh,
                )
            os.replace(tmp, self._pointer_path)

    def query_topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int,
        n_probe: int = 4,
    ) -> DataFrame:
        from hogflare_spark.operators.similarity import ivf_query_index

        return ivf_query_index(
            spark,
            self.index_dir,
            queries,
            k,
            n_probe=n_probe,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )
