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
cost of the layout — `compact()` rolls the batch dirs into a
cell-partitioned snapshot version behind the same pointer swing, with
the pointer's covered_max making absorbed-batch re-deliveries no-ops.
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
        if ptr is not None and batch_id <= ptr.get("covered_max", -1):
            # this batch id was absorbed into a compacted snapshot — its
            # rows are already in the data; a re-delivery is a no-op
            # (the batch=<id> dir it would overwrite no longer exists)
            return
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

    def compact(self, spark: SparkSession, keep_old: bool = False) -> bool:
        """Roll the accumulated batch=<id>/cell=<c>/ dirs into one
        snapshot — the same small-files answer as the dedup state's
        roll-up: 10^5 micro-batches otherwise mean 10^5 dirs per probed
        cell. The snapshot lands under `batch=-1/cell=<c>/` so the
        layout keeps a uniform (batch, cell) partition depth and later
        appends coexist with it; replay protection needs no per-row
        provenance (unlike the dedup state, whose prior-state reads are
        batch-ordered) — the pointer's `covered_max` is the whole
        contract: process_batch treats any batch id at or below it as
        already absorbed. Crash-safe ordering: write snapshot under a
        claimed new version -> swing pointer (os.replace) -> drop the
        superseded version. Returns False when there is nothing to
        compact."""
        import shutil

        ptr = self._pointer()
        if ptr is None:
            return False
        old_rel = ptr["data"]
        old_path = os.path.join(self.index_dir, old_rel)
        batches = [
            int(d.split("=", 1)[1])
            for d in os.listdir(old_path)
            if d.startswith("batch=")
        ]
        if not [b for b in batches if b >= 0]:
            return False  # only a prior snapshot: nothing new to absorb
        version = int(old_rel.split("=", 1)[1]) + 1
        while True:
            new_rel = f"data.v={version}"
            try:
                os.mkdir(os.path.join(self.index_dir, new_rel))
                break
            except FileExistsError:
                version += 1
        merged = (
            spark.read.option("basePath", old_path)
            .parquet(old_path)
            .select("vec_id", "embedding", "cell")
        )
        merged.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(self.index_dir, new_rel, "batch=-1")
        )
        new_ptr = dict(
            ptr,
            data=new_rel,
            covered_max=max(max(batches), ptr.get("covered_max", -1)),
        )
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(new_ptr, fh)
        os.replace(tmp, self._pointer_path)
        if not keep_old:
            shutil.rmtree(old_path, ignore_errors=True)
        return True

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
