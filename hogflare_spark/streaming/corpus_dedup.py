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
batch n, rolled up every `compact_every` batches into a single bucketed
snapshot `state/snapshot=<v>/` (+ `_SNAPSHOT` pointer) so the per-batch
anti-join never unions an unbounded list of per-batch directories —
at 10^5 micro-batches the un-compacted layout is 10^5 small files per
join, the classic streaming small-files scale-killer. Snapshot rows
keep their source `batch` id, which is what preserves replay
idempotence THROUGH compaction: a re-delivered batch id n anti-joins
against `batch < n` only, so absorbing a not-yet-checkpoint-committed
batch into a snapshot can never make its own replay see its own hashes
(the filter excludes them), and the replay rewrites identical content.
`kept/batch=<n>/` holds the kept (doc_id, content_hash) rows.

Scale shape: the only shuffles are the within-batch hash groupBy
(|batch|-sized) and the anti-join on the 60-bit hash key — |batch| on
the probe side against the accumulated state on the build side. The
snapshot is written as a bucketed-by-`content_hash` catalog table
(sinks/bucketed.py), so at 100 TB the corpus-sized build side is read
pre-partitioned with ZERO Exchange — only the batch-sized probe side
shuffles, every micro-batch. A fresh session re-registers the external
bucketed table from the `_SNAPSHOT` pointer; if no catalog is usable it
degrades to a plain parquet read of the same files (correct, one extra
build-side shuffle). The state holds ONE 8-byte hash per kept document
— orders of magnitude smaller than the corpus it summarizes.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hogflare_spark.functions.hashing import h60

KEPT_SCHEMA = "doc_id bigint, content_hash bigint"
STATE_SCHEMA = "content_hash bigint"
SNAPSHOT_SCHEMA = "content_hash bigint, batch bigint"


class StreamingCorpusDedup:
    """foreachBatch incremental exact-dedup over a document stream.

    Use as `stream.writeStream.foreachBatch(job.process_batch)` or call
    `process_batch(df, batch_id)` directly per micro-batch (the gate and
    tests drive it availableNow-style). `read_kept` returns the
    accumulated kept set.
    """

    def __init__(
        self,
        work_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        compact_every: int = 16,
        n_state_buckets: int = 32,
    ):
        self.work_dir = work_dir
        self.id_col = id_col
        self.text_col = text_col
        self.compact_every = compact_every
        self.n_state_buckets = n_state_buckets
        self.state_dir = os.path.join(work_dir, "state")
        self.kept_dir = os.path.join(work_dir, "kept")
        self._pointer_path = os.path.join(work_dir, "_SNAPSHOT")

    # ---- snapshot pointer ------------------------------------------------

    def _read_snapshot_pointer(self) -> dict | None:
        if os.path.exists(self._pointer_path):
            with open(self._pointer_path) as fh:
                return json.load(fh)
        return None

    def _table_name(self, version: int) -> str:
        tag = hashlib.md5(self.work_dir.encode()).hexdigest()[:10]
        return f"corpus_dedup_state_{tag}_v{version}"

    def _snapshot_path(self, version: int) -> str:
        return os.path.join(self.state_dir, f"snapshot={version}")

    def _snapshot_df(self, spark: SparkSession, ptr: dict) -> DataFrame:
        """The snapshot as a DataFrame, preferring the bucketed catalog
        table (zero build-side Exchange in the anti-join); re-registers
        it after a session restart; plain parquet as the last resort."""
        name, path = ptr["table"], ptr["path"]
        if not ptr.get("bucketed", False):
            # written by the fallback writer: registering CLUSTERED over
            # files without bucket-id names would declare a layout the
            # data doesn't have — a silently-wrong anti-join. Plain read.
            return spark.read.schema(SNAPSHOT_SCHEMA).parquet(path)
        try:
            if not spark.catalog.tableExists(name):
                spark.sql(
                    f"CREATE TABLE {name} (content_hash BIGINT, batch BIGINT) "
                    f"USING PARQUET CLUSTERED BY (content_hash) "
                    f"INTO {ptr['n_buckets']} BUCKETS LOCATION '{path}'"
                )
            return spark.table(name)
        except Exception:
            return spark.read.schema(SNAPSHOT_SCHEMA).parquet(path)

    # ---- state reads -----------------------------------------------------

    def _batch_dirs(self, above: int) -> list[tuple[int, str]]:
        out = []
        if os.path.isdir(self.state_dir):
            for d in os.listdir(self.state_dir):
                if d.startswith("batch=") and int(d.split("=", 1)[1]) > above:
                    out.append((int(d.split("=", 1)[1]), os.path.join(self.state_dir, d)))
        return sorted(out)

    def _prior_state(self, spark: SparkSession, batch_id: int) -> DataFrame:
        ptr = self._read_snapshot_pointer()
        covered = ptr["covered_max"] if ptr else -1
        parts = []
        if ptr is not None:
            parts.append(
                self._snapshot_df(spark, ptr)
                .where(F.col("batch") < batch_id)
                .select("content_hash")
            )
        dirs = [p for b, p in self._batch_dirs(covered) if b < batch_id]
        if dirs:
            parts.append(spark.read.schema(STATE_SCHEMA).parquet(*dirs))
        if not parts:
            return spark.createDataFrame([], STATE_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ---- write path ------------------------------------------------------

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
        self._maybe_compact(spark)

    def _maybe_compact(self, spark: SparkSession) -> None:
        """Roll loose `batch=` dirs into the next snapshot version once
        `compact_every` of them accumulate. Crash-safe ordering: write
        snapshot data → swing `_SNAPSHOT` (atomic os.replace) → delete
        absorbed dirs + the superseded snapshot. A crash between any two
        steps leaves a state every reader handles (orphan snapshot dir
        is overwritten by the next attempt; un-deleted absorbed dirs are
        excluded by the covered_max filter)."""
        ptr = self._read_snapshot_pointer()
        covered = ptr["covered_max"] if ptr else -1
        loose = self._batch_dirs(covered)
        if len(loose) < self.compact_every:
            return
        new_max = max(b for b, _ in loose)
        version = (ptr["version"] + 1) if ptr else 0
        # basePath read lifts the batch=N dir name into a `batch` column
        # — the provenance that keeps replays exact through compaction.
        loose_df = (
            spark.read.schema(STATE_SCHEMA)
            .option("basePath", self.state_dir)
            .parquet(*[p for _, p in loose])
            .select("content_hash", F.col("batch").cast("long").alias("batch"))
        )
        merged = (
            self._snapshot_df(spark, ptr).unionByName(loose_df) if ptr else loose_df
        )
        path = self._snapshot_path(version)
        name = self._table_name(version)
        try:
            from hogflare_spark.sinks.bucketed import write_bucketed

            write_bucketed(
                merged, name, ["content_hash"], self.n_state_buckets, path=path
            )
            bucketed = True
        except Exception:
            # no usable catalog: same files, bounded count, no bucket spec
            merged.repartition(self.n_state_buckets, "content_hash").write.mode(
                "overwrite"
            ).parquet(path)
            bucketed = False
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": version,
                    "covered_max": new_max,
                    "table": name,
                    "path": path,
                    "n_buckets": self.n_state_buckets,
                    "bucketed": bucketed,
                },
                fh,
            )
        os.replace(tmp, self._pointer_path)
        for _, p in loose:
            shutil.rmtree(p, ignore_errors=True)
        if ptr is not None:
            shutil.rmtree(self._snapshot_path(ptr["version"]), ignore_errors=True)
            try:
                spark.sql(f"DROP TABLE IF EXISTS {ptr['table']}")
            except Exception:
                pass

    def read_kept(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(KEPT_SCHEMA).parquet(
            os.path.join(self.kept_dir, "batch=*")
        )


NEAR_STATE_SCHEMA = "id bigint, band_key string, sig array<bigint>"
NEAR_SNAPSHOT_SCHEMA = "id bigint, band_key string, sig array<bigint>, batch bigint"
NEAR_KEPT_SCHEMA = "doc_id bigint"


class StreamingNearDupDedup:
    """Incremental cross-snapshot NEAR-dup dedup — the MinHash sibling of
    `StreamingCorpusDedup` (which is exact-hash only): each micro-batch
    drops documents whose MinHash band keys collide with an earlier-seen
    document AND whose signature agreement clears the threshold.

    Semantics (order-free by construction): a doc D is dropped iff some
    document earlier in stream order — previous batch, or lower id in
    the same batch — shares ≥ 1 of the B band keys with D and matches D
    on ≥ `min_matches` of the `num_perm` MinHash positions (the standard
    signature estimate of Jaccard; an exact INTEGER compare, no floats).
    "Earlier-seen" counts dropped documents too, so the kept set does
    NOT depend on the greedy keep/drop history — when batches partition
    the corpus in id order, the result is exactly the batch criterion
    "no lower-id near-duplicate", which is what the DuckDB oracle
    checks without replaying batches.

    State: one (id, band_key, sig) row per band per SEEN document,
    per-batch dirs overwritten by batch id (replay-idempotent), rolled
    into a band_key-bucketed snapshot every `compact_every` batches —
    the same crash-safe pointer protocol as the exact class. The state
    holds B rows of (8B key + P·8B sig) per document — a fixed small
    multiple of the exact class's 8 bytes, still orders of magnitude
    under the corpus. Per batch the only shuffles are the band-key
    groupJoin of |batch|·B probe rows against the (bucketed) state and
    the batch's internal band self-join; like the batch MinHash
    operator, run exact dedup first so identical-text clusters don't
    inflate band buckets.
    """

    def __init__(
        self,
        work_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.8,
        compact_every: int = 16,
        n_state_buckets: int = 32,
    ):
        import math

        from hogflare_spark.operators.dedup import NUM_PERM

        self.work_dir = work_dir
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = NUM_PERM
        self.min_matches = math.ceil(threshold * NUM_PERM)
        self.compact_every = compact_every
        self.n_state_buckets = n_state_buckets
        self.state_dir = os.path.join(work_dir, "state")
        self.kept_dir = os.path.join(work_dir, "kept")
        self._pointer_path = os.path.join(work_dir, "_SNAPSHOT")

    # pointer/table helpers mirror StreamingCorpusDedup
    _read_snapshot_pointer = StreamingCorpusDedup._read_snapshot_pointer
    _snapshot_path = StreamingCorpusDedup._snapshot_path
    _batch_dirs = StreamingCorpusDedup._batch_dirs

    def _table_name(self, version: int) -> str:
        tag = hashlib.md5(self.work_dir.encode()).hexdigest()[:10]
        return f"corpus_neardedup_state_{tag}_v{version}"

    def _snapshot_df(self, spark: SparkSession, ptr: dict) -> DataFrame:
        name, path = ptr["table"], ptr["path"]
        if not ptr.get("bucketed", False):
            return spark.read.schema(NEAR_SNAPSHOT_SCHEMA).parquet(path)
        try:
            if not spark.catalog.tableExists(name):
                spark.sql(
                    f"CREATE TABLE {name} (id BIGINT, band_key STRING, "
                    f"sig ARRAY<BIGINT>, batch BIGINT) "
                    f"USING PARQUET CLUSTERED BY (band_key) "
                    f"INTO {ptr['n_buckets']} BUCKETS LOCATION '{path}'"
                )
            return spark.table(name)
        except Exception:
            return spark.read.schema(NEAR_SNAPSHOT_SCHEMA).parquet(path)

    def _prior_state(
        self, spark: SparkSession, batch_id: int
    ) -> DataFrame | None:
        """Accumulated (id, band_key, sig) state of every batch < batch_id,
        or None when there is none (lets the first batch skip the prior
        probe's stages entirely)."""
        ptr = self._read_snapshot_pointer()
        covered = ptr["covered_max"] if ptr else -1
        parts = []
        if ptr is not None:
            parts.append(
                self._snapshot_df(spark, ptr)
                .where(F.col("batch") < batch_id)
                .select("id", "band_key", "sig")
            )
        dirs = [p for b, p in self._batch_dirs(covered) if b < batch_id]
        if dirs:
            parts.append(spark.read.schema(NEAR_STATE_SCHEMA).parquet(*dirs))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _sig_matches(self, a, b):
        # exact integer agreement count — the engine-portable signature
        # estimate (list_filter/list_transform twin in the oracle)
        return F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda v: v))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from hogflare_spark.functions import text as T
        from hogflare_spark.functions.caching import cached, release
        from hogflare_spark.operators.dedup import (
            BANDS,
            ROWS_PER_BAND,
            with_shingle_hashes,
        )

        spark = batch_df.sparkSession
        sk = with_shingle_hashes(batch_df, self.text_col, self.id_col)
        sg = sk.select(
            "id", T.minhash_signature(F.col("hs"), self.num_perm).alias("sig")
        )
        bands = cached(
            sg.select(
                "id",
                "sig",
                F.explode(
                    T.band_keys(F.col("sig"), BANDS, ROWS_PER_BAND)
                ).alias("band_key"),
            )
        )
        try:
            other = bands.select(
                F.col("band_key"),
                F.col("id").alias("o_id"),
                F.col("sig").alias("o_sig"),
            )
            dropped_within = (
                bands.join(other, "band_key")
                .where(F.col("o_id") < F.col("id"))
                .where(
                    self._sig_matches(F.col("sig"), F.col("o_sig"))
                    >= F.lit(self.min_matches)
                )
                .select("id")
            )
            prior = self._prior_state(spark, batch_id)
            if prior is None:
                # first batch: no accumulated state — skip the prior
                # probe's join/scan stages outright
                dropped = dropped_within.distinct()
            else:
                dropped_prior = (
                    bands.join(
                        prior.select(
                            F.col("band_key"),
                            F.col("id").alias("p_id"),
                            F.col("sig").alias("p_sig"),
                        ),
                        "band_key",
                    )
                    .where(
                        self._sig_matches(F.col("sig"), F.col("p_sig"))
                        >= F.lit(self.min_matches)
                    )
                    .select("id")
                )
                dropped = dropped_prior.unionByName(dropped_within).distinct()
            # anti-join probe is the RAW batch ids: with_shingle_hashes is
            # row-preserving, and probing sg would re-run the whole
            # shingle+minhash tree just to project ids (only `bands` is
            # cached; measured ~0.8 s/batch at sf0.1)
            kept = (
                batch_df.select(F.col(self.id_col).alias("id"))
                .join(dropped, "id", "left_anti")
                .select(F.col("id").alias("doc_id"))
            )
            kept.write.mode("overwrite").parquet(
                os.path.join(self.kept_dir, f"batch={batch_id}")
            )
            # state rows for ALL seen docs (kept or dropped) — the
            # "earlier-seen" rule is what makes the result batch-shape-free.
            # Write parallelism derives from the batch's input size (r12,
            # guide §6 output sizing): `bands` is cached at the sketch
            # fan-out width (compute parallelism — keep it), but the
            # per-batch state dir does not need one near-empty file per
            # sketch partition; coalesce reads the cache, so the fanned-
            # out sketch stages are untouched.
            from hogflare_spark.operators.partitioning import adaptive_partitions

            n_out = adaptive_partitions(batch_df, expansion=8.0, floor=2)
            bands.select("id", "band_key", "sig").coalesce(n_out).write.mode(
                "overwrite"
            ).parquet(os.path.join(self.state_dir, f"batch={batch_id}"))
        finally:
            release(bands)
        self._maybe_compact(spark)

    def _maybe_compact(self, spark: SparkSession) -> None:
        ptr = self._read_snapshot_pointer()
        covered = ptr["covered_max"] if ptr else -1
        loose = self._batch_dirs(covered)
        if len(loose) < self.compact_every:
            return
        new_max = max(b for b, _ in loose)
        version = (ptr["version"] + 1) if ptr else 0
        loose_df = (
            spark.read.schema(NEAR_STATE_SCHEMA)
            .option("basePath", self.state_dir)
            .parquet(*[p for _, p in loose])
            .select("id", "band_key", "sig", F.col("batch").cast("long").alias("batch"))
        )
        merged = (
            self._snapshot_df(spark, ptr).unionByName(loose_df) if ptr else loose_df
        )
        path = self._snapshot_path(version)
        name = self._table_name(version)
        try:
            from hogflare_spark.sinks.bucketed import write_bucketed

            write_bucketed(
                merged, name, ["band_key"], self.n_state_buckets, path=path
            )
            bucketed = True
        except Exception:
            merged.repartition(self.n_state_buckets, "band_key").write.mode(
                "overwrite"
            ).parquet(path)
            bucketed = False
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": version,
                    "covered_max": new_max,
                    "table": name,
                    "path": path,
                    "n_buckets": self.n_state_buckets,
                    "bucketed": bucketed,
                },
                fh,
            )
        os.replace(tmp, self._pointer_path)
        for _, p in loose:
            shutil.rmtree(p, ignore_errors=True)
        if ptr is not None:
            shutil.rmtree(self._snapshot_path(ptr["version"]), ignore_errors=True)
            try:
                spark.sql(f"DROP TABLE IF EXISTS {ptr['table']}")
            except Exception:
                pass

    def read_kept(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(NEAR_KEPT_SCHEMA).parquet(
            os.path.join(self.kept_dir, "batch=*")
        )
