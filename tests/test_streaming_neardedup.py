"""StreamingNearDupDedup: the accumulated kept set must be independent
of the batch shape (the order-free "no lower-id near-duplicate"
criterion), idempotent under foreachBatch replays, and dir-bounded
through compaction."""

from __future__ import annotations

import os

from pyspark.sql import Row

from hogflare_spark.streaming.corpus_dedup import StreamingNearDupDedup

ROWS = []
for i in range(24):
    if i % 5 == 2:
        # near-duplicate of the previous doc: same long text, one word
        # swapped (shingle Jaccard well above the 0.8 threshold)
        ROWS.append(Row(doc_id=i, text=ROWS[-1].text.replace("pivotword", "swapped")))
    else:
        # mutually DISTINCT docs: every word carries the doc index, so
        # cross-doc shingle overlap is zero
        ROWS.append(
            Row(doc_id=i, text=" ".join(f"d{i}w{j}" if j != 5 else "pivotword" for j in range(60)))
        )


def _kept(spark, tmp, batches, **kw):
    job = StreamingNearDupDedup(str(tmp), **kw)
    for bid, rows in enumerate(batches):
        job.process_batch(spark.createDataFrame(rows), bid)
    return job, sorted(r["doc_id"] for r in job.read_kept(spark).collect())


def test_kept_set_is_batch_shape_free(spark, tmp_path):
    one_job, one = _kept(spark, tmp_path / "a", [ROWS])
    _, three = _kept(spark, tmp_path / "b", [ROWS[:8], ROWS[8:16], ROWS[16:]])
    _, five = _kept(
        spark, tmp_path / "c", [ROWS[i : i + 5] for i in range(0, 24, 5)]
    )
    assert one == three == five
    # dropped docs are exactly the planted near-dups MINUS pair (16,17),
    # whose deterministic signature agreement is 25/32 — one position
    # under the ceil(0.8·32)=26 threshold (honest MinHash estimator
    # variance at true J≈0.90; pinned so a hashing change surfaces here)
    dropped = sorted(set(range(24)) - set(one))
    assert dropped == [2, 7, 12, 22]


def test_replay_is_idempotent(spark, tmp_path):
    job, kept = _kept(spark, tmp_path / "r", [ROWS[:12], ROWS[12:]])
    job.process_batch(spark.createDataFrame(ROWS[:12]), 0)  # redelivery
    assert sorted(r["doc_id"] for r in job.read_kept(spark).collect()) == kept


def test_compaction_bounds_state_dirs(spark, tmp_path):
    job = StreamingNearDupDedup(str(tmp_path / "k"), compact_every=2)
    for bid in range(6):
        job.process_batch(spark.createDataFrame(ROWS[bid * 4 : bid * 4 + 4]), bid)
        loose = [d for d in os.listdir(job.state_dir) if d.startswith("batch=")]
        assert len(loose) <= job.compact_every
    kept = sorted(r["doc_id"] for r in job.read_kept(spark).collect())
    _, want = _kept(spark, tmp_path / "k2", [ROWS])
    assert kept == want
