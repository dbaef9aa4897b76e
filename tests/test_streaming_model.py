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
