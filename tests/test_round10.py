"""Round-10 gates: BM25 batch plan-shape invariance vs |queries|
(r9 verdict #8), the approx n-gram census (r9 verdict #6 — the Expand
must disappear), and the lake staging-name fix (ADVICE r9)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _load_docs(spark):
    from hogflare_spark.sources.readers import load_table

    return load_table(spark, SF_SMOKE, "documents")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _vocab(spark, n=600):
    """A few hundred real corpus words, so generated queries hit docs."""
    rows = (
        _load_docs(spark)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .where(F.length("w") > 2)
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), "w")
        .limit(n)
        .collect()
    )
    return [r["w"] for r in rows]


# ------------------------------------------------------------- BM25 batch


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _numbered_nodes(fmt: str, node: str) -> int:
    """Count DISTINCT plan nodes of a kind in `explain("formatted")`
    output — the numbered `(n) <Node>` detail lines, one per node. Raw
    substring counts over plan strings overcount badly: the tree section
    and every InMemoryRelation reference reprint whole subtrees."""
    import re

    return len(re.findall(rf"^\(\d+\) {node}", fmt, flags=re.M))


def test_bm25_batch_plan_shape_independent_of_query_count(spark):
    """r9 verdict #8: the two-corpus-scan contract must hold at real
    query scale. Execute with 4 and with 300 generated queries: exactly
    TWO parquet scans of the documents table (the 1-row stats aggregate
    + the cache-build of the term-filtered tf frame), both downstream
    consumers reading the cache (InMemoryTableScan), and identical
    shuffle-Exchange counts — query count may only change broadcast-side
    literals, never the corpus-side plan shape. (This test caught a real
    third scan in round 10: the doc-freq branch silently recomputed the
    explode lineage before the tf frame was cached.)"""
    from hogflare_spark.functions.caching import unpersist_all
    from hogflare_spark.operators.retrieval import bm25_batch_topk

    docs = _load_docs(spark)
    words = _vocab(spark)

    def gen(n_q: int):
        # deterministic 3-term queries drawn round-robin from the vocab
        return [
            (qid, [words[(3 * qid + j) % len(words)] for j in range(3)])
            for qid in range(n_q)
        ]

    plans = {}
    try:
        for n_q in (4, 300):
            df = bm25_batch_topk(docs, gen(n_q), k_top=5)
            df.collect()  # materialize so the final AQE plan is real
            fmt = _formatted(df)
            plans[n_q] = {
                "scans": _numbered_nodes(fmt, "Scan parquet"),
                "inmem": _numbered_nodes(fmt, "InMemoryTableScan"),
                "exchanges": _numbered_nodes(fmt, "Exchange"),
            }
    finally:
        unpersist_all()
    assert plans[4]["scans"] == plans[300]["scans"] == 2, plans
    assert plans[4]["inmem"] >= 2 and plans[300]["inmem"] >= 2, plans
    assert plans[4]["exchanges"] == plans[300]["exchanges"], plans


def test_bm25_batch_runs_at_300_queries(spark):
    """Execution (not just planning) at a few hundred queries: every
    returned group obeys the per-query contract (rank dense from 1,
    scores positive and non-increasing)."""
    from hogflare_spark.operators.retrieval import bm25_batch_topk

    docs = _load_docs(spark)
    words = _vocab(spark)
    queries = [
        (qid, [words[(7 * qid + j) % len(words)] for j in range(3)])
        for qid in range(300)
    ]
    out = bm25_batch_topk(docs, queries, k_top=3).collect()
    assert out, "300 vocab-drawn queries must match at least one doc"
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) > 100  # most queries hit something
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert all(s > 0 for s in scores)
        assert scores == sorted(scores, reverse=True)


# ------------------------------------------------- approx n-gram census


def test_topk_ngrams_approx_drops_the_second_shuffle(spark):
    """The exact census pays a SECOND shuffle (Catalyst rewrites one
    count-distinct as pre-aggregate by (ngram, id) then by ngram); the
    approx_rsd path must plan exactly ONE — that's the entire point of
    the 100 TB swap documented in the operator. Neither path may pay a
    global sort (TakeOrdered only) and neither uses Expand (that node
    only appears for multiple distinct columns)."""
    from hogflare_spark.operators.text_analysis import topk_ngrams

    docs = _load_docs(spark)
    exact_fmt = _formatted(topk_ngrams(docs, "text", "doc_id", n=3, k=10))
    approx_fmt = _formatted(
        topk_ngrams(docs, "text", "doc_id", n=3, k=10, approx_rsd=0.02)
    )
    assert _numbered_nodes(exact_fmt, "Exchange") == 2
    assert _numbered_nodes(approx_fmt, "Exchange") == 1
    # both stay TakeOrdered (no global sort), no Expand anywhere
    for fmt in (exact_fmt, approx_fmt):
        assert _numbered_nodes(fmt, "TakeOrderedAndProject") == 1
        assert _numbered_nodes(fmt, "Expand") == 0


def test_topk_ngrams_approx_check_green_and_topk_exact(spark):
    """The gate frame: every accuracy boolean true at this SF, and the
    (ngram, occurrences) top-k matches the exact census bit-for-bit —
    occurrences is exact in both paths, so the SET cannot drift."""
    from hogflare_spark.operators.text_analysis import (
        topk_ngrams,
        topk_ngrams_approx_check,
    )

    docs = _load_docs(spark)
    got = topk_ngrams_approx_check(docs, "text", "doc_id", n=3, k=25).collect()
    assert got and all(r["df_within_tol"] for r in got)
    exact = topk_ngrams(docs, "text", "doc_id", n=3, k=25).collect()
    assert [(r["ngram"], r["occurrences"]) for r in got] == [
        (r["ngram"], r["occurrences"]) for r in exact
    ]


# ------------------------------------------------------- lake staging fix


def test_lake_staging_names_invisible_to_partition_globs(tmp_path):
    """ADVICE r9: staged/backup dirs must NOT carry the `event_date=`
    prefix, or a concurrent read_events glob can double-read mid-swap.
    The helper must emit '_'-prefixed siblings (ignored by Spark's file
    listing) in the partition's parent dir."""
    from hogflare_spark.sinks.lake import _staged_paths

    pdir = str(tmp_path / "events" / "event_date=2024-01-15")
    staged, backup = _staged_paths(pdir)
    assert os.path.dirname(staged) == os.path.dirname(pdir)
    assert os.path.basename(staged).startswith("_")
    assert os.path.basename(backup).startswith("_")
    assert not os.path.basename(staged).startswith("event_date=")
    assert not os.path.basename(backup).startswith("event_date=")
    # distinct names so a staged dir can never collide with its backup
    assert staged != backup


def test_delete_person_rows_leaves_no_staging_debris(spark, tmp_path):
    """End-to-end: delete a subject, then assert the lake contains ONLY
    `event_date=` leaf dirs (no _staged_/_old_ remnants) and the rows
    are gone while other subjects' rows survive."""
    from pyspark.sql import Row

    from hogflare_spark.sinks.lake import (
        append_events,
        delete_person_rows,
        read_events,
    )

    events_dir = str(tmp_path / "lake")
    rows = [
        Row(uuid=f"u{i}", team_id=1, distinct_id=d, event="ev", created_at=ts)
        for i, (d, ts) in enumerate(
            [
                ("alice", "2025-03-01T10:00:00Z"),
                ("bob", "2025-03-01T11:00:00Z"),
                ("alice", "2025-03-02T09:00:00Z"),
                ("carol", "2025-03-02T10:00:00Z"),
            ]
        )
    ]
    df = spark.createDataFrame(rows).withColumn(
        "created_at", F.to_timestamp("created_at")
    )
    append_events(df, events_dir)
    pdirs, n_deleted = delete_person_rows(spark, events_dir, ["alice"])
    assert len(pdirs) == 2 and n_deleted == 2
    for _root, dirs, _files in os.walk(events_dir):
        for d in dirs:
            assert not d.startswith("_staged_") and not d.startswith("_old_"), d
    remaining = read_events(spark, events_dir)
    assert remaining.where(F.col("distinct_id") == "alice").count() == 0
    assert remaining.count() == 2
