"""BM25 + hybrid RRF retrieval: Spark results vs a pure-Python BM25
reference on a toy corpus, plus fusion-behavior pins."""

from __future__ import annotations

import math

from pyspark.sql import Row

DOCS = [
    Row(doc_id=0, text="spark join window hash spark join"),
    Row(doc_id=1, text="spark filter scan"),
    Row(doc_id=2, text="window hash"),
    Row(doc_id=3, text="nothing relevant here"),
    Row(doc_id=4, text="join join join spark window hash value"),
]


def _py_bm25(terms, k1=1.2, b=0.75):
    toks = {r.doc_id: r.text.lower().split() for r in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for did, tk in toks.items():
        s = 0.0
        for t in sorted(set(terms)):
            df = sum(1 for v in toks.values() if t in v)
            idf = math.floor(
                math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e9 + 0.5
            ) / 1e9
            tf = float(tk.count(t))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(tk) / avgdl)))
        s = math.floor(s * 1e6 + 0.5) / 1e6
        if s > 0:
            out[did] = s
    return out


def test_bm25_matches_python_reference(spark):
    from hogflare_spark.operators.retrieval import bm25_topk

    terms = ["spark", "join", "window", "hash"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(spark.createDataFrame(DOCS), terms, k_top=10).collect()
    }
    assert got == _py_bm25(terms)


def test_bm25_ranks_term_rich_docs_first(spark):
    from hogflare_spark.operators.retrieval import bm25_topk

    out = bm25_topk(spark.createDataFrame(DOCS), ["spark", "join"], k_top=10).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] in (0, 4)  # both terms, high tf
    assert 3 not in ranked  # zero-score doc excluded


def test_hybrid_rrf_rewards_presence_in_both_rankings(spark):
    from hogflare_spark.operators.retrieval import hybrid_rrf_topk

    # embeddings: doc 0 nearly identical to the query vec (id 9); doc 3
    # orthogonal — doc 0 should fuse lexical + dense and land on top
    def v(x, y):
        return [x, y, 0.0, 0.0]

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=v(1.0, 0.05)),
            Row(vec_id=1, embedding=v(0.9, 0.4)),
            Row(vec_id=2, embedding=v(0.1, 1.0)),
            Row(vec_id=3, embedding=v(0.0, 1.0)),
            Row(vec_id=4, embedding=v(0.8, 0.6)),
            Row(vec_id=9, embedding=v(1.0, 0.0)),
        ]
    )
    out = hybrid_rrf_topk(
        spark.createDataFrame(DOCS), emb, ["spark", "join"], 9, k_top=5, pool=5
    ).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == 0  # top of dense, top-2 lexical
    assert 9 not in ranked  # the query row itself is excluded


def test_bm25_batch_matches_per_query_bitwise(spark):
    """bm25_batch_topk's per-(query, doc) scores and ranks must equal
    running bm25_topk per query — the sorted-term fold reproduces the
    single-query summation order exactly (absent tf=0 terms contribute
    an exact +0.0, which IEEE addition ignores)."""
    from hogflare_spark.operators.retrieval import bm25_batch_topk, bm25_topk

    docs = spark.createDataFrame(DOCS)
    queries = [
        (1, ["spark", "join"]),
        (2, ["window", "hash", "value"]),
        (3, ["nothing"]),
        (4, ["absent-term"]),  # matches no doc -> no rows for query 4
    ]
    batch = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in bm25_batch_topk(docs, queries, k_top=10).collect()
    }
    expect = {}
    for qid, terms in queries:
        for r in bm25_topk(docs, terms, k_top=10).collect():
            expect[(qid, r["doc_id"])] = (r["rank"], r["score"])
    assert batch == expect
    assert not any(q == 4 for q, _ in batch)


def test_bm25_batch_empty_queries(spark):
    from hogflare_spark.operators.retrieval import bm25_batch_topk

    out = bm25_batch_topk(spark.createDataFrame(DOCS), [])
    assert out.count() == 0
