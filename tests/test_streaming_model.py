"""IncrementalDsirModel: the incremental model over N micro-batches must
EQUAL the batch model (exact integer counts are additive), survive
foreachBatch replays without double-counting, and keep its state dir
count bounded through compaction."""

from __future__ import annotations

from pyspark.sql import Row

from hogflare_spark.streaming.incremental_model import IncrementalDsirModel

ROWS = [
    Row(doc_id=i, lang=("en" if i % 3 else "de"),
        text=f"common words here tok{i % 7} tok{i % 5} filler text")
    for i in range(30)
]


def _batches(spark, n=3):
    per = len(ROWS) // n
    return [spark.createDataFrame(ROWS[i * per : (i + 1) * per]) for i in range(n)]


def _model_rows(df):
    return sorted((r["b"], r["cr"], r["ct"]) for r in df.collect())


def test_incremental_model_equals_batch_model_and_scores(spark, tmp_path):
    from hogflare_spark.operators.text_analysis import (
        dsir_features,
        dsir_model_counts,
        dsir_weights,
    )

    job = IncrementalDsirModel(str(tmp_path / "m1"), target_col="lang")
    for i, b in enumerate(_batches(spark)):
        job.process_batch(b, i)

    full = spark.createDataFrame(ROWS)
    want = _model_rows(
        dsir_model_counts(dsir_features(full, "text", "doc_id", "lang", "en"))
    )
    assert _model_rows(job.model(spark)) == want

    got = sorted(tuple(r) for r in job.score(full).collect())
    ref = sorted(
        tuple(r) for r in dsir_weights(full, "text", "doc_id", "lang", "en").collect()
    )
    assert got == ref  # bit-equal, not approximate


def test_incremental_model_replay_is_idempotent(spark, tmp_path):
    job = IncrementalDsirModel(str(tmp_path / "m2"), target_col="lang")
    batches = _batches(spark)
    job.process_batch(batches[0], 0)
    job.process_batch(batches[1], 1)
    before = _model_rows(job.model(spark))
    job.process_batch(batches[1], 1)  # foreachBatch redelivery
    assert _model_rows(job.model(spark)) == before


def test_incremental_model_compaction_bounds_dirs_and_replays(spark, tmp_path):
    import os

    from hogflare_spark.operators.text_analysis import (
        dsir_features,
        dsir_model_counts,
    )

    job = IncrementalDsirModel(
        str(tmp_path / "m3"), target_col="lang", compact_every=2
    )
    per = 3
    batches = [
        spark.createDataFrame(ROWS[i * per : (i + 1) * per]) for i in range(10)
    ]
    for i, b in enumerate(batches):
        job.process_batch(b, i)
        live = [n for n in os.listdir(job.state_dir) if n.startswith("batch=")]
        assert len(live) <= job.compact_every

    full = spark.createDataFrame(ROWS)
    want = _model_rows(
        dsir_model_counts(dsir_features(full, "text", "doc_id", "lang", "en"))
    )
    assert _model_rows(job.model(spark)) == want
    # replaying a batch ALREADY ABSORBED by a snapshot must not double-count
    job.process_batch(batches[0], 0)
    assert _model_rows(job.model(spark)) == want


# ------------------------------------------- IncrementalHistQuantiles


def _hist_events(spark):
    from pyspark.sql import functions as F

    rows = [
        (i, f"2024-01-{(i % 28) + 1:02d}T12:00:00", "t" + str(i % 2),
         float((i * 37) % 500) / 2.0)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type",
             "value")


def test_incremental_hist_equals_batch_and_replays(spark, tmp_path):
    """Additivity: three micro-batches (with a mid-stream compaction)
    accumulate to the EXACT batch fine histogram, quantile estimates
    equal the batch rollup bit-for-bit, and a replayed batch id does
    not double-count."""
    from pyspark.sql import functions as F

    from hogflare_spark.operators.rollup import hist_quantile_rollup
    from hogflare_spark.streaming.incremental_model import (
        IncrementalHistQuantiles,
    )

    ev = _hist_events(spark)
    job = IncrementalHistQuantiles(str(tmp_path / "hq"), compact_every=2)
    job.process_batch(ev.where(F.col("event_id") < 70), 0)
    job.process_batch(
        ev.where((F.col("event_id") >= 70) & (F.col("event_id") < 140)), 1
    )  # compaction fires here
    job.process_batch(ev.where(F.col("event_id") >= 140), 2)

    fine_batch, quant_batch = hist_quantile_rollup(
        ev, "ts", ["event_type"], "value"
    )
    got_hist = {
        (r["bucket"], r["key"], r["bin"], r["cnt"])
        for r in job.histogram(spark).collect()
    }
    want_hist = {
        (r["bucket"], r["event_type"], r["bin"], r["cnt"])
        for r in fine_batch.collect()
    }
    assert got_hist == want_hist
    got_q = {tuple(r) for r in job.quantiles(spark).collect()}
    want_q = {tuple(r) for r in quant_batch.collect()}
    assert got_q == want_q

    # replay: re-deliver an absorbed-or-not batch id — state unchanged
    job.process_batch(ev.where(F.col("event_id") >= 140), 2)
    assert {
        (r["bucket"], r["key"], r["bin"], r["cnt"])
        for r in job.histogram(spark).collect()
    } == want_hist
