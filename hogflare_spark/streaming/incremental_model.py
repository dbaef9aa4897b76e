"""Incremental trainer state over streaming snapshots (r7 verdict #9).

The corpus-side trainers are batch operators; a real pipeline ingests
SNAPSHOTS and wants the model to track the accumulated corpus without
re-scanning it. This module gives the DSIR hashed-n-gram model that
incremental path on the same state pattern `StreamingCorpusDedup`
proved out (streaming/corpus_dedup.py): per-batch state dirs keyed by
batch id for replay idempotence, rolled into a single snapshot every
`compact_every` batches so reads never union an unbounded dir list.

Why DSIR is the right first trainer for this: its model IS exact
integer bucket counts (operators/text_analysis.dsir_model_counts), and
integer counts are order-free and ADDITIVE — the sum of per-batch
counts is bit-for-bit the full-corpus count, so the incremental model
EQUALS the batch model after any number of micro-batches (pinned by
tests/test_streaming_model.py), not merely approximates it. Trainers
whose state is not additive (k-means centroids, BPE merge tables) need
re-fits; count-shaped models (DSIR, unigram LMs, perplexity cutpoint
histograms) all fit this exact pattern.

Scale shape per micro-batch: the batch's feature stream groupBys into
≤ n_buckets rows (map-side partials; the shuffle is bucket-bounded, not
batch-bounded), written as one tiny parquet dir. The accumulated model
read is ≤ (n_dirs · n_buckets) rows summed by bucket — and compaction
keeps n_dirs ≤ compact_every + 1. Scoring a corpus under the model is
the batch `dsir_score` with the model read from state instead of
recomputed: one broadcast join, the corpus never re-scans for training.

Replay idempotence (the foreachBatch contract): a re-delivered batch id
overwrites its own `state/batch=<n>` dir with identical deterministic
counts; once a snapshot has absorbed batches ≤ v (pointer version v),
reads take per-batch dirs only for n > v, so a replayed absorbed batch
can never double-count.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MODEL_SCHEMA = "b bigint, cr bigint, ct bigint"


class IncrementalDsirModel:
    """foreachBatch-driveable incremental DSIR model.

    `process_batch(df, batch_id)` folds one micro-batch's counts into
    state; `model(spark)` returns the accumulated (b, cr, ct) model;
    `score(df)` scores any corpus under it with the exact batch
    arithmetic (operators/text_analysis.dsir_score)."""

    def __init__(
        self,
        work_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        target_col: str = "lang",
        target_value: str = "en",
        n_buckets: int = 256,
        compact_every: int = 16,
    ):
        self.work_dir = work_dir
        self.text_col = text_col
        self.id_col = id_col
        self.target_col = target_col
        self.target_value = target_value
        self.n_buckets = n_buckets
        self.compact_every = compact_every
        self.state_dir = os.path.join(work_dir, "state")
        self._pointer_path = os.path.join(work_dir, "_SNAPSHOT")

    # ---- state layout ----------------------------------------------------

    def _read_pointer(self) -> dict | None:
        if os.path.exists(self._pointer_path):
            with open(self._pointer_path) as fh:
                return json.load(fh)
        return None

    def _batch_dirs(self, after: int) -> list[str]:
        if not os.path.isdir(self.state_dir):
            return []
        out = []
        for name in os.listdir(self.state_dir):
            if name.startswith("batch="):
                n = int(name.split("=", 1)[1])
                if n > after:
                    out.append(os.path.join(self.state_dir, name))
        return sorted(out)

    def _feats(self, df: DataFrame) -> DataFrame:
        from hogflare_spark.operators.text_analysis import dsir_features

        return dsir_features(
            df,
            self.text_col,
            self.id_col,
            self.target_col,
            self.target_value,
            self.n_buckets,
        )

    # ---- the foreachBatch hook --------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from hogflare_spark.operators.text_analysis import dsir_model_counts

        counts = dsir_model_counts(self._feats(batch_df))
        # overwrite-by-batch-id: a foreachBatch replay rewrites the same
        # deterministic counts instead of double-counting
        counts.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )
        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        live = self._batch_dirs(after=int(ptr["through_batch"]))
        if len(live) >= self.compact_every:
            self._compact(batch_df.sparkSession, ptr, live)

    def _compact(self, spark: SparkSession, ptr: dict, live: list[str]) -> None:
        """Roll the snapshot + live batch dirs into one summed snapshot.
        Tiny data (≤ n_buckets rows per dir), but the DIR COUNT is the
        scale hazard — unbounded per-batch dirs is the streaming
        small-files killer the corpus-dedup state hit in r5."""
        version = int(ptr["version"]) + 1
        through = max(int(p.rsplit("=", 1)[1]) for p in live)
        acc = spark.read.schema(MODEL_SCHEMA).parquet(*live)
        if int(ptr["version"]) >= 0:
            prev = spark.read.schema(MODEL_SCHEMA).parquet(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}")
            )
            acc = acc.unionByName(prev)
        snap = acc.groupBy("b").agg(
            F.sum("cr").alias("cr"), F.sum("ct").alias("ct")
        )
        out = os.path.join(self.state_dir, f"snapshot={version}")
        snap.coalesce(1).write.mode("overwrite").parquet(out)
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "through_batch": through}, fh)
        os.replace(tmp, self._pointer_path)
        for p in live:
            shutil.rmtree(p, ignore_errors=True)
        if int(ptr["version"]) >= 0:
            shutil.rmtree(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}"),
                ignore_errors=True,
            )

    # ---- reads -------------------------------------------------------------

    def model(self, spark: SparkSession) -> DataFrame:
        """The accumulated (b, cr, ct) model — snapshot plus any batch
        dirs newer than it, summed by bucket."""
        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        paths = self._batch_dirs(after=int(ptr["through_batch"]))
        if int(ptr["version"]) >= 0:
            paths.append(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}")
            )
        if not paths:
            return spark.createDataFrame([], MODEL_SCHEMA)
        acc = spark.read.schema(MODEL_SCHEMA).parquet(*paths)
        return acc.groupBy("b").agg(
            F.sum("cr").alias("cr"), F.sum("ct").alias("ct")
        )

    def score(self, df: DataFrame) -> DataFrame:
        """(doc_id, n_feats, imp_weight) for `df` under the accumulated
        model — the exact batch dsir_score arithmetic, so once the model
        has absorbed the same rows, scores equal batch dsir_weights
        bit-for-bit."""
        from hogflare_spark.operators.text_analysis import dsir_score

        return dsir_score(
            self._feats(df), self.model(df.sparkSession), self.n_buckets
        )


BM25_STATE_SCHEMA = "term string, df bigint, n bigint, sdl bigint"


class IncrementalBm25Stats:
    """Incremental BM25 corpus statistics on the same snapshot-state
    pattern: per-term document frequencies plus the corpus scalars
    (doc count N, summed doc length) — everything BM25 scoring needs
    beyond the query — accumulated per micro-batch WITHOUT re-scanning
    the corpus.

    Like the DSIR model (and unlike k-means/BPE state), the whole
    model is additive integer counts: sum of per-batch (term, df) rows
    and per-batch (N, sdl) scalars IS the full-corpus statistic
    bit-for-bit, for any batch shape. The corpus scalars ride a single
    NULL-term row per batch dir so one schema and one sum-by-term read
    cover both (a term never collides with NULL).

    Scale shape per batch: one distinct-(doc, term) explode groupBy —
    vocabulary-bounded shuffle output — plus a 1-row aggregate; the
    accumulated read sums ≤ (n_dirs · |vocab|) rows and compaction
    keeps n_dirs ≤ compact_every + 1. Replay idempotence: deterministic
    per-batch overwrites keyed by batch id; snapshot pointer fences
    absorbed batches (the IncrementalDsirModel contract verbatim).
    """

    def __init__(
        self,
        work_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        compact_every: int = 16,
    ):
        self.work_dir = work_dir
        self.text_col = text_col
        self.id_col = id_col
        self.compact_every = compact_every
        self.state_dir = os.path.join(work_dir, "state")
        self._pointer_path = os.path.join(work_dir, "_SNAPSHOT")

    _read_pointer = IncrementalDsirModel._read_pointer
    _batch_dirs = IncrementalDsirModel._batch_dirs

    def _batch_stats(self, df: DataFrame) -> DataFrame:
        from hogflare_spark.functions import text as T

        toks = T.tokens(F.col(self.text_col))
        per_doc = df.select(
            F.col(self.id_col).alias("id"), toks.alias("tok")
        )
        terms = (
            per_doc.select(F.explode(F.array_distinct("tok")).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .select(
                "term", "df", F.lit(0).cast("long").alias("n"),
                F.lit(0).cast("long").alias("sdl"),
            )
        )
        scalars = per_doc.agg(
            F.lit(None).cast("string").alias("term"),
            F.lit(0).cast("long").alias("df"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("tok")).cast("long").alias("sdl"),
        )
        return terms.unionByName(scalars)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._batch_stats(batch_df).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )
        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        live = self._batch_dirs(after=int(ptr["through_batch"]))
        if len(live) >= self.compact_every:
            self._compact(batch_df.sparkSession, ptr, live)

    def _sum_by_term(self, acc: DataFrame) -> DataFrame:
        return acc.groupBy("term").agg(
            F.sum("df").alias("df"),
            F.sum("n").alias("n"),
            F.sum("sdl").alias("sdl"),
        )

    def _compact(self, spark: SparkSession, ptr: dict, live: list[str]) -> None:
        version = int(ptr["version"]) + 1
        through = max(int(p.rsplit("=", 1)[1]) for p in live)
        acc = spark.read.schema(BM25_STATE_SCHEMA).parquet(*live)
        if int(ptr["version"]) >= 0:
            acc = acc.unionByName(
                spark.read.schema(BM25_STATE_SCHEMA).parquet(
                    os.path.join(self.state_dir, f"snapshot={ptr['version']}")
                )
            )
        out = os.path.join(self.state_dir, f"snapshot={version}")
        self._sum_by_term(acc).coalesce(1).write.mode("overwrite").parquet(out)
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "through_batch": through}, fh)
        os.replace(tmp, self._pointer_path)
        for p in live:
            shutil.rmtree(p, ignore_errors=True)
        if int(ptr["version"]) >= 0:
            shutil.rmtree(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}"),
                ignore_errors=True,
            )

    def model(self, spark: SparkSession) -> DataFrame:
        """(term, df, n, sdl) accumulated: per-term rows carry df; the
        NULL-term row carries the corpus scalars."""
        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        paths = self._batch_dirs(after=int(ptr["through_batch"]))
        if int(ptr["version"]) >= 0:
            paths.append(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}")
            )
        if not paths:
            return spark.createDataFrame([], BM25_STATE_SCHEMA)
        return self._sum_by_term(
            spark.read.schema(BM25_STATE_SCHEMA).parquet(*paths)
        )


HIST_STATE_SCHEMA = "bucket timestamp, key string, bin bigint, cnt bigint"


class IncrementalHistQuantiles:
    """Incremental continuous aggregate for the histogram-quantile
    rollup (operators/rollup.py): per-(fine bucket, key, bin) counts
    accumulated per micro-batch — the streaming twin of the batch
    fine_histogram, on the same snapshot-state pattern as the DSIR and
    BM25 models.

    Histogram counts are the textbook additive model: the sum of
    per-batch bin counts IS the full-corpus histogram bit-for-bit for
    any batch shape (pinned in tests/test_streaming_model.py), so the
    weekly p50/p90/p99 read — operators/rollup.hist_quantiles over the
    accumulated state — EQUALS the batch rollup exactly. This is what
    a latency dashboard over a 100 TB event stream actually deploys:
    each ingest micro-batch folds (buckets x keys x <=n_bins)-bounded
    rows into state, and no dashboard window ever rescans raw events.

    Scale shape per batch: one map-side-combined groupBy whose shuffle
    output is bin-bounded, written as one tiny parquet dir; compaction
    keeps the dir count <= compact_every + 1. Replay idempotence:
    deterministic per-batch overwrites keyed by batch id; the snapshot
    pointer fences absorbed batches (IncrementalDsirModel contract
    verbatim)."""

    def __init__(
        self,
        work_dir: str,
        time_col: str = "ts",
        key_col: str = "event_type",
        value_col: str = "value",
        fine: str = "day",
        bin_width: float = 8.0,
        n_bins: int = 128,
        compact_every: int = 16,
    ):
        self.work_dir = work_dir
        self.time_col = time_col
        self.key_col = key_col
        self.value_col = value_col
        self.fine = fine
        self.bin_width = bin_width
        self.n_bins = n_bins
        self.compact_every = compact_every
        self.state_dir = os.path.join(work_dir, "state")
        self._pointer_path = os.path.join(work_dir, "_SNAPSHOT")

    _read_pointer = IncrementalDsirModel._read_pointer
    _batch_dirs = IncrementalDsirModel._batch_dirs

    def _batch_hist(self, df: DataFrame) -> DataFrame:
        from hogflare_spark.operators.rollup import fine_histogram

        return fine_histogram(
            df,
            self.time_col,
            [self.key_col],
            self.value_col,
            self.fine,
            self.bin_width,
            self.n_bins,
        ).select(
            F.col("bucket").cast("timestamp").alias("bucket"),
            F.col(self.key_col).cast("string").alias("key"),
            "bin",
            "cnt",
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._batch_hist(batch_df).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )
        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        live = self._batch_dirs(after=int(ptr["through_batch"]))
        if len(live) >= self.compact_every:
            self._compact(batch_df.sparkSession, ptr, live)

    @staticmethod
    def _sum_bins(acc: DataFrame) -> DataFrame:
        return acc.groupBy("bucket", "key", "bin").agg(F.sum("cnt").alias("cnt"))

    def _compact(self, spark: SparkSession, ptr: dict, live: list[str]) -> None:
        version = int(ptr["version"]) + 1
        through = max(int(p.rsplit("=", 1)[1]) for p in live)
        acc = spark.read.schema(HIST_STATE_SCHEMA).parquet(*live)
        if int(ptr["version"]) >= 0:
            acc = acc.unionByName(
                spark.read.schema(HIST_STATE_SCHEMA).parquet(
                    os.path.join(self.state_dir, f"snapshot={ptr['version']}")
                )
            )
        out = os.path.join(self.state_dir, f"snapshot={version}")
        self._sum_bins(acc).coalesce(1).write.mode("overwrite").parquet(out)
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "through_batch": through}, fh)
        os.replace(tmp, self._pointer_path)
        for p in live:
            shutil.rmtree(p, ignore_errors=True)
        if int(ptr["version"]) >= 0:
            shutil.rmtree(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}"),
                ignore_errors=True,
            )

    def histogram(self, spark: SparkSession) -> DataFrame:
        """The accumulated fine histogram (bucket, key, bin, cnt)."""
        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        paths = self._batch_dirs(after=int(ptr["through_batch"]))
        if int(ptr["version"]) >= 0:
            paths.append(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}")
            )
        if not paths:
            return spark.createDataFrame([], HIST_STATE_SCHEMA)
        return self._sum_bins(
            spark.read.schema(HIST_STATE_SCHEMA).parquet(*paths)
        )

    def quantiles(
        self,
        spark: SparkSession,
        coarse: str = "week",
        qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    ) -> DataFrame:
        """Coarse quantile estimates from state alone — the exact batch
        hist_quantiles arithmetic, so once the state has absorbed the
        same rows the estimates equal the batch rollup bit-for-bit."""
        from hogflare_spark.operators.rollup import hist_quantiles

        return hist_quantiles(
            self.histogram(spark), ["key"], coarse, self.bin_width, qs
        )


MG_STATE_SCHEMA = "item string, est bigint"


class IncrementalHeavyHitters:
    """Incremental Misra-Gries census (operators/heavy_hitters.py) on
    the snapshot-state pattern: each micro-batch folds its own
    capacity-bounded MG summary (plus an item=NULL stream-total row)
    into a `state/batch=<n>` dir; compaction sums summaries by item and
    re-applies the MG reduction so the snapshot stays <= capacity
    candidate rows. Every reduction — inside a batch's scan, or at
    compaction — subtracts its s from >= capacity+1 entries, so the
    total subtracted weight over the WHOLE merge tree is
    <= N/(capacity+1): the accumulated state keeps the exact batch
    guarantee (est <= true, error <= N/(capacity+1), guaranteed recall
    above the threshold) after any number of micro-batches and
    compactions. This is what a URL/user-agent/n-gram census over a
    100 TB event stream deploys: bounded state per trigger, and the
    dashboard read never rescans raw events.

    Replay idempotence: deterministic per-batch MG summaries overwrite
    their own batch dir; the snapshot pointer fences absorbed batches
    (IncrementalDsirModel contract verbatim).
    """

    def __init__(
        self,
        work_dir: str,
        item_col: str = "item",
        capacity: int = 64,
        compact_every: int = 16,
    ):
        self.work_dir = work_dir
        self.item_col = item_col
        self.capacity = int(capacity)
        self.compact_every = compact_every
        self.state_dir = os.path.join(work_dir, "state")
        self._pointer_path = os.path.join(work_dir, "_SNAPSHOT")

    _read_pointer = IncrementalDsirModel._read_pointer
    _batch_dirs = IncrementalDsirModel._batch_dirs

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from hogflare_spark.operators.heavy_hitters import misra_gries

        misra_gries(batch_df, self.item_col, self.capacity).write.mode(
            "overwrite"
        ).parquet(os.path.join(self.state_dir, f"batch={batch_id}"))
        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        live = self._batch_dirs(after=int(ptr["through_batch"]))
        if len(live) >= self.compact_every:
            self._compact(batch_df.sparkSession, ptr, live)

    @staticmethod
    def _merge_summaries(acc: DataFrame, capacity: int) -> DataFrame:
        """Sum by item, then the Agarwal merge reduction back down to
        <= capacity candidates (state-sized frames only — two tiny
        jobs). The NULL-total row is summed but never reduced."""
        summed = acc.groupBy("item").agg(F.sum("est").alias("est"))
        cands = summed.where(F.col("item").isNotNull())
        top = cands.orderBy(F.desc("est"), "item").limit(capacity + 1).collect()
        s = int(top[-1]["est"]) if len(top) == capacity + 1 else 0
        reduced = cands.where(F.col("est") > s).select(
            "item", (F.col("est") - F.lit(s)).alias("est")
        )
        return reduced.unionByName(summed.where(F.col("item").isNull()))

    def _compact(self, spark: SparkSession, ptr: dict, live: list[str]) -> None:
        version = int(ptr["version"]) + 1
        through = max(int(p.rsplit("=", 1)[1]) for p in live)
        acc = spark.read.schema(MG_STATE_SCHEMA).parquet(*live)
        if int(ptr["version"]) >= 0:
            acc = acc.unionByName(
                spark.read.schema(MG_STATE_SCHEMA).parquet(
                    os.path.join(self.state_dir, f"snapshot={ptr['version']}")
                )
            )
        out = os.path.join(self.state_dir, f"snapshot={version}")
        self._merge_summaries(acc, self.capacity).coalesce(1).write.mode(
            "overwrite"
        ).parquet(out)
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "through_batch": through}, fh)
        os.replace(tmp, self._pointer_path)
        for p in live:
            shutil.rmtree(p, ignore_errors=True)
        if int(ptr["version"]) >= 0:
            shutil.rmtree(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}"),
                ignore_errors=True,
            )

    def summary(self, spark: SparkSession) -> DataFrame:
        """The accumulated MG summary (item/est + NULL-total rows),
        merged WITHOUT a reduction (summing only adds no error); at
        most (compact_every x capacity) candidate rows before the next
        compaction absorbs them."""
        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        paths = self._batch_dirs(after=int(ptr["through_batch"]))
        if int(ptr["version"]) >= 0:
            paths.append(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}")
            )
        if not paths:
            return spark.createDataFrame([], MG_STATE_SCHEMA)
        return spark.read.schema(MG_STATE_SCHEMA).parquet(*paths).groupBy(
            "item"
        ).agg(F.sum("est").alias("est"))


KMV_STATE_SCHEMA = "segment string, h bigint, u double"


class IncrementalKmvSketches:
    """Incremental KMV/theta sketches (operators/theta_sketch.py) on the
    snapshot-state pattern: each micro-batch contributes its own
    per-segment k-minimum-values rows to a `state/batch=<n>` dir;
    compaction (and every read) merges by taking the k smallest DISTINCT
    hashes per segment — the textbook KMV merge, which is exact: the k
    smallest of a union are a subset of the union of each side's k
    smallest, so the accumulated sketch EQUALS the batch sketch over the
    same rows bit-for-bit (pinned in tests/test_round11.py). Distinct /
    union / intersection estimates therefore carry the batch operator's
    exact guarantees after any number of micro-batches. State is <=
    (dirs x segments x k) rows between compactions and (segments x k)
    after one.

    Replay idempotence: per-batch sketches are deterministic (fixed-seed
    xxhash64) and overwrite their own batch dir; the snapshot pointer
    fences absorbed batches (IncrementalDsirModel contract verbatim).
    """

    def __init__(
        self,
        work_dir: str,
        key_cols: list[str],
        segment_col: str,
        k: int = 512,
        compact_every: int = 16,
    ):
        self.work_dir = work_dir
        self.key_cols = list(key_cols)
        self.segment_col = segment_col
        self.k = int(k)
        self.compact_every = compact_every
        self.state_dir = os.path.join(work_dir, "state")
        self._pointer_path = os.path.join(work_dir, "_SNAPSHOT")

    _read_pointer = IncrementalDsirModel._read_pointer
    _batch_dirs = IncrementalDsirModel._batch_dirs

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from hogflare_spark.operators.theta_sketch import kmv_sketches

        kmv_sketches(
            batch_df, self.key_cols, self.segment_col, self.k
        ).select("segment", "h", "u").write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )
        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        live = self._batch_dirs(after=int(ptr["through_batch"]))
        if len(live) >= self.compact_every:
            self._compact(batch_df.sparkSession, ptr, live)

    def _merge(self, acc: DataFrame) -> DataFrame:
        """k smallest distinct hashes per segment — the exact KMV merge."""
        from pyspark.sql import Window

        w = Window.partitionBy("segment").orderBy("h")
        return (
            acc.select("segment", "h", "u")
            .distinct()
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= self.k)
            .select("segment", "h", "u")
        )

    def _compact(self, spark: SparkSession, ptr: dict, live: list[str]) -> None:
        version = int(ptr["version"]) + 1
        through = max(int(p.rsplit("=", 1)[1]) for p in live)
        acc = spark.read.schema(KMV_STATE_SCHEMA).parquet(*live)
        if int(ptr["version"]) >= 0:
            acc = acc.unionByName(
                spark.read.schema(KMV_STATE_SCHEMA).parquet(
                    os.path.join(self.state_dir, f"snapshot={ptr['version']}")
                )
            )
        out = os.path.join(self.state_dir, f"snapshot={version}")
        self._merge(acc).coalesce(1).write.mode("overwrite").parquet(out)
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "through_batch": through}, fh)
        os.replace(tmp, self._pointer_path)
        for p in live:
            shutil.rmtree(p, ignore_errors=True)
        if int(ptr["version"]) >= 0:
            shutil.rmtree(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}"),
                ignore_errors=True,
            )

    def sketches(self, spark: SparkSession) -> DataFrame:
        """The accumulated per-segment sketches (segment, h, u, rk) in
        the exact shape operators/theta_sketch's estimators consume."""
        from pyspark.sql import Window

        ptr = self._read_pointer() or {"version": -1, "through_batch": -1}
        paths = self._batch_dirs(after=int(ptr["through_batch"]))
        if int(ptr["version"]) >= 0:
            paths.append(
                os.path.join(self.state_dir, f"snapshot={ptr['version']}")
            )
        if not paths:
            return spark.createDataFrame(
                [], KMV_STATE_SCHEMA + ", rk int"
            )
        w = Window.partitionBy("segment").orderBy("h")
        return (
            spark.read.schema(KMV_STATE_SCHEMA)
            .parquet(*paths)
            .distinct()
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= self.k)
        )
