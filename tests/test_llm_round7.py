"""Round-7 operator tests: distributed k-means and CCNet perplexity
buckets. Cross-engine parity is covered by the registered DuckDB oracles
(tests/test_oracle_parity.py walks the registry); these tests pin the
operators' BEHAVIOR on planted fixtures.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _blob(center: list[float], n: int, base_id: int, eps: float = 0.01):
    """n points jittered deterministically around a center."""
    rows = []
    for i in range(n):
        vec = [c + eps * ((i * 7 + j * 3) % 5 - 2) for j, c in enumerate(center)]
        rows.append(Row(vec_id=base_id + i, embedding=vec))
    return rows


def test_kmeans_separates_planted_blobs(spark):
    from hogflare_spark.operators.similarity import distributed_kmeans

    rows = (
        _blob([1.0, 0.0, 0.0, 0.0], 10, 0)
        + _blob([0.0, 1.0, 0.0, 0.0], 10, 100)
        + _blob([0.0, 0.0, 1.0, 0.0], 10, 200)
    )
    df = spark.createDataFrame(rows)
    out = distributed_kmeans(df, k=3, iters=3).collect()
    cells = {r["id"]: r["cell"] for r in out}
    assert len(cells) == 30
    # every blob lands in exactly one cell, and the three cells differ
    blob_cells = [
        {cells[i] for i in range(b, b + 10)} for b in (0, 100, 200)
    ]
    assert all(len(s) == 1 for s in blob_cells)
    assert len({next(iter(s)) for s in blob_cells}) == 3


def test_kmeans_deterministic_across_runs(spark):
    from hogflare_spark.operators.similarity import distributed_kmeans

    rows = _blob([0.5, 0.5, 0.1, 0.0], 20, 0) + _blob([0.0, 0.1, 0.9, 0.2], 20, 50)
    df = spark.createDataFrame(rows).repartition(4)
    a = sorted((r["id"], r["cell"]) for r in distributed_kmeans(df, k=4, iters=2).collect())
    b = sorted((r["id"], r["cell"]) for r in distributed_kmeans(df, k=4, iters=2).collect())
    assert a == b


def test_kmeans_matches_exact_python_replay(spark):
    """The fixed-point Lloyd arithmetic is replayable with plain Python
    floats/ints — the same contract the DuckDB oracle relies on."""
    from hogflare_spark.operators.similarity import KMEANS_SCALE, distributed_kmeans

    rows = _blob([1.0, 0.2, 0.0, 0.0], 8, 0) + _blob([0.0, 0.1, 1.0, 0.5], 8, 20)
    df = spark.createDataFrame(rows)
    k, iters = 3, 3
    got = sorted((r["id"], r["cell"]) for r in distributed_kmeans(df, k=k, iters=iters).collect())

    # exact replay: normalize (left fold), quantize, assign (round9 dot,
    # tie -> lower cell), fixed-point mean update, renormalize
    def unit(v):
        acc = 0.0
        for x in v:
            acc += x * x
        n = math.sqrt(acc)
        return [x / n for x in v] if n > 0 else [0.0] * len(v)

    data = sorted((r.vec_id, unit(r.embedding)) for r in rows)
    q = {i: [math.floor(x * KMEANS_SCALE + 0.5) for x in v] for i, v in data}
    cent = [v for _, v in data[:k]]

    def assign(v):
        best = None
        for j, c in enumerate(cent):
            acc = 0.0
            for x, y in zip(v, c):
                acc += x * y
            d = math.floor(acc * 1e9 + 0.5) / 1e9
            if best is None or d > best[0] or (d == best[0] and j < best[1]):
                best = (d, j)
        return best[1]

    for _ in range(iters):
        members: dict[int, list[int]] = {}
        for i, v in data:
            members.setdefault(assign(v), []).append(i)
        for j, ids in members.items():
            sums = [sum(q[i][d] for i in ids) for d in range(4)]
            m = [(s / len(ids)) / KMEANS_SCALE for s in sums]
            acc = 0.0
            for x in m:
                acc += x * x
            n = math.sqrt(acc)
            if n > 0:
                cent[j] = [x / n for x in m]
    want = sorted((i, assign(v)) for i, v in data)
    assert got == want


def test_kmeans_k_larger_than_corpus(spark):
    from hogflare_spark.operators.similarity import distributed_kmeans

    df = spark.createDataFrame(_blob([1.0, 0.0, 0.0, 0.0], 3, 0))
    out = distributed_kmeans(df, k=8, iters=2).collect()
    assert len(out) == 3  # k clamps to |corpus|; no crash, full assignment


def test_perplexity_buckets_balanced_and_ordered(spark):
    from hogflare_spark.operators.text_analysis import perplexity_buckets

    # two languages; within each, common-token docs must out-rank docs
    # with injected rare tokens
    rows = []
    for lang, base in (("en", 0), ("de", 100)):
        for i in range(9):
            rare = f" zzq{i}x" * (i % 3)  # 0, 1 or 2 rare tokens
            rows.append(
                Row(
                    doc_id=base + i,
                    lang=lang,
                    text=("the quick brown fox jumps" * 3) + rare,
                )
            )
    df = spark.createDataFrame(rows)
    out = perplexity_buckets(df, "text", "doc_id", "lang").collect()
    assert len(out) == 18
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        counts = {b: 0 for b in (1, 2, 3)}
        for r in rs:
            counts[r["bucket"]] += 1
        assert max(counts.values()) - min(counts.values()) <= 1, (lang, counts)
        # ntile respects the score order: min(head) >= max(tail)
        head = [r["mean_tok_prob"] for r in rs if r["bucket_name"] == "head"]
        tail = [r["mean_tok_prob"] for r in rs if r["bucket_name"] == "tail"]
        assert min(head) >= max(tail)
        names = {r["bucket"]: r["bucket_name"] for r in rs}
        assert names == {1: "head", 2: "middle", 3: "tail"}


def test_perplexity_buckets_rare_docs_in_tail(spark):
    from hogflare_spark.operators.text_analysis import perplexity_buckets

    rows = [
        Row(doc_id=i, lang="en", text="common words common words common words")
        for i in range(6)
    ] + [
        Row(doc_id=10 + i, lang="en", text=f"qzj{i}a wvx{i}b common kpl{i}c rqm{i}d")
        for i in range(3)
    ]
    out = perplexity_buckets(spark.createDataFrame(rows), "text", "doc_id", "lang").collect()
    tail_ids = {r["doc_id"] for r in out if r["bucket_name"] == "tail"}
    assert tail_ids == {10, 11, 12}


def test_perplexity_sampled_full_sample_equals_exact_ntile(spark):
    """With sample_mod=1 the rank-ceiling boundaries reproduce ntile's
    bucket sizes exactly, so the map-only assignment must equal the
    exact window form row-for-row."""
    from hogflare_spark.operators.text_analysis import (
        perplexity_buckets,
        perplexity_buckets_sampled,
    )

    rows = []
    for lang, base, n in (("en", 0, 10), ("de", 100, 7), ("fr", 200, 2)):
        for i in range(n):
            rare = f" xqz{i}w" * (i % 4)
            rows.append(Row(doc_id=base + i, lang=lang, text="a b c d e" * 4 + rare))
    df = spark.createDataFrame(rows)
    exact = {
        (r["doc_id"]): r["bucket"]
        for r in perplexity_buckets(df, "text", "doc_id", "lang").collect()
    }
    sampled = {
        (r["doc_id"]): r["bucket"]
        for r in perplexity_buckets_sampled(
            df, "text", "doc_id", "lang", sample_mod=1
        ).collect()
    }
    assert sampled == exact


def test_perplexity_sampled_stride_is_monotone_and_total(spark):
    """With a strided sample, every doc still gets exactly one bucket and
    buckets are monotone in the (score DESC, doc_id ASC) order."""
    from hogflare_spark.operators.text_analysis import perplexity_buckets_sampled

    rows = [
        Row(doc_id=i, lang="en", text="w x y z" * 5 + f" rr{i % 7}q" * (i % 5))
        for i in range(40)
    ]
    out = perplexity_buckets_sampled(
        spark.createDataFrame(rows), "text", "doc_id", "lang", sample_mod=3
    ).collect()
    assert len(out) == 40
    assert {r["bucket"] for r in out} <= {1, 2, 3}
    ordered = sorted(out, key=lambda r: (-r["mean_tok_prob"], r["doc_id"]))
    buckets = [r["bucket"] for r in ordered]
    assert buckets == sorted(buckets)


def test_linear_probe_separates_toy_classes(spark):
    """A linearly separable toy set (positives along +e1, negatives along
    -e1 with noise dims) must be classified perfectly after a few
    balanced GD steps."""
    from hogflare_spark.operators.classifier import linear_probe

    rows = []
    for i in range(30):
        vec = [0.0] * 8
        vec[0] = 1.0 if i % 3 == 0 else -1.0
        vec[1 + i % 7] = 0.3
        rows.append(Row(vec_id=i, embedding=vec, label=0 if i % 3 == 0 else 1))
    out = linear_probe(
        spark.createDataFrame(rows), target_label=0, iters=12
    ).collect()
    assert len(out) == 30
    for r in out:
        assert r["predicted"] == (r["id"] % 3 == 0)


def test_linear_probe_partition_invariant(spark):
    """The fixed-point gradient sums are order-free, so the trained model
    (hence every score) must be identical under any partitioning."""
    from hogflare_spark.operators.classifier import linear_probe

    rows = [
        Row(
            vec_id=i,
            embedding=[((i * 7 + d * 3) % 11) / 11.0 - 0.5 for d in range(8)],
            label=i % 4,
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    a = {r["id"]: (r["score"], r["predicted"]) for r in linear_probe(df, 0, iters=6).collect()}
    b = {
        r["id"]: (r["score"], r["predicted"])
        for r in linear_probe(df.repartition(13), 0, iters=6).collect()
    }
    assert a == b


def test_linear_probe_predicts_both_classes_on_imbalanced_data(spark):
    """Class balancing is the point: with a 25% positive class the probe
    must not collapse to the constant-negative classifier."""
    from hogflare_spark.operators.classifier import linear_probe

    rows = []
    for i in range(40):
        pos = i % 4 == 0
        vec = [1.0 if pos else -1.0] + [((i + d) % 5) / 10.0 for d in range(7)]
        rows.append(Row(vec_id=i, embedding=vec, label=0 if pos else 1 + i % 3))
    out = linear_probe(spark.createDataFrame(rows), 0, iters=12).collect()
    preds = {r["predicted"] for r in out}
    assert preds == {True, False}


def test_dsir_weights_upweight_target_like_docs(spark):
    """Documents made of target-domain vocabulary must out-weigh
    documents made of off-target vocabulary; weights straddle 1.0."""
    from hogflare_spark.operators.text_analysis import dsir_weights

    rows = []
    for i in range(12):
        rows.append(Row(doc_id=i, lang="en", text="alpha beta gamma delta " * 4))
    for i in range(12, 24):
        rows.append(Row(doc_id=i, lang="de", text="zug bahn strasse wagen " * 4))
    # score two held-out-ish docs, one per vocabulary
    rows.append(Row(doc_id=100, lang="fr", text="alpha beta gamma delta"))
    rows.append(Row(doc_id=101, lang="fr", text="zug bahn strasse wagen"))
    out = {
        r["doc_id"]: r["imp_weight"]
        for r in dsir_weights(
            spark.createDataFrame(rows), "text", "doc_id", "lang", "en"
        ).collect()
    }
    assert out[100] > 1.0 > out[101]
    assert out[100] > out[101]


def test_dsir_weights_single_token_doc(spark):
    """A single-token document has no bigrams (Spark's sequence(1,0) is
    descending, not empty — the operator guards it) and still scores."""
    from hogflare_spark.operators.text_analysis import dsir_weights

    rows = [
        Row(doc_id=0, lang="en", text="hello"),
        Row(doc_id=1, lang="en", text="hello world hello"),
        Row(doc_id=2, lang="de", text="zug"),
    ]
    out = dsir_weights(
        spark.createDataFrame(rows), "text", "doc_id", "lang", "en"
    ).collect()
    assert len(out) == 3
    n = {r["doc_id"]: r["n_feats"] for r in out}
    assert n[0] == 1 and n[2] == 1  # unigram only
    assert n[1] == 5  # 3 unigrams + 2 bigrams


def test_budget_select_matches_greedy_python_oracle(spark):
    """Kept set == greedy take-while over (score DESC, doc_id ASC)."""
    from hogflare_spark.operators.sampling import budget_select
    from hogflare_spark.operators.text_analysis import unigram_lm_scores

    rows = [
        Row(doc_id=i, text="common words here " * 3 + f" odd{i}tok" * (i % 4))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    budget = 60
    scored = sorted(
        unigram_lm_scores(df, "text", "doc_id").collect(),
        key=lambda r: (-r["mean_tok_prob"], r["doc_id"]),
    )
    want, cum = set(), 0
    for r in scored:
        cum += r["n_tokens"]
        if cum <= budget:
            want.add(r["doc_id"])
    got = {r["doc_id"] for r in budget_select(df, "text", "doc_id", budget).collect()}
    assert got == want and len(got) > 0


def test_budget_select_extremes(spark):
    from hogflare_spark.operators.sampling import budget_select

    rows = [Row(doc_id=i, text="a b c d e") for i in range(5)]
    df = spark.createDataFrame(rows)
    assert budget_select(df, "text", "doc_id", 2).count() == 0  # budget < any doc
    big = budget_select(df, "text", "doc_id", 10_000).collect()
    assert {r["doc_id"] for r in big} == set(range(5))  # budget > corpus
    assert max(r["cum_tokens"] for r in big) == 25


def _mix_docs():
    rows = []
    # domain sizes/token masses chosen so quotas differ
    for d, n, words in (("a", 30, 20), ("b", 12, 10), ("c", 4, 5)):
        for i in range(n):
            rows.append(
                Row(doc_id=len(rows), source=d, text=("w " * words).strip())
            )
    return rows


def test_mixture_materialize_respects_quotas(spark):
    from hogflare_spark.operators.sampling import domain_mixture, mixture_materialize

    df = spark.createDataFrame(_mix_docs())
    quotas = {
        r["domain"]: r["quota"]
        for r in domain_mixture(df, "source", "text", sample_n=20).collect()
    }
    out = mixture_materialize(df, "source", "text", "doc_id", sample_n=20).collect()
    got = {}
    for r in out:
        got[r["domain"]] = got.get(r["domain"], 0) + 1
    sizes = {"a": 30, "b": 12, "c": 4}
    for d, q in quotas.items():
        assert got.get(d, 0) == min(q, sizes[d]), (d, q, got)
    # draw ranks are 1..count within each domain
    for d in got:
        rks = sorted(r["draw_rank"] for r in out if r["domain"] == d)
        assert rks == list(range(1, got[d] + 1))


def test_mixture_materialize_prefilter_path_is_exact(spark):
    """Forcing every domain down the mega-domain pre-filter (tiny size
    cutoff) must reproduce the plain-window draw bit-for-bit, including
    when a hostile safety factor forces the deficiency refill."""
    from hogflare_spark.operators.sampling import mixture_materialize

    df = spark.createDataFrame(_mix_docs())

    def key(rows):
        return sorted((r["doc_id"], r["domain"], r["draw_rank"]) for r in rows)

    plain = key(
        mixture_materialize(df, "source", "text", "doc_id", sample_n=20).collect()
    )
    pre = key(
        mixture_materialize(
            df, "source", "text", "doc_id", sample_n=20,
            prefilter_min_domain=2, safety=4.0,
        ).collect()
    )
    starved = key(
        mixture_materialize(
            df, "source", "text", "doc_id", sample_n=20,
            prefilter_min_domain=2, safety=0.01,  # undershoots -> refill
        ).collect()
    )
    assert pre == plain
    assert starved == plain


def test_bpe_greedy_self_pair_chains(spark):
    """'a a a a a' under merge (a,a): greedy left-to-right keeps the
    1st/3rd matches -> (a a)(a a) a ; counting counts all 4 adjacent
    occurrences (Sennrich counting), only the apply is greedy."""
    from hogflare_spark.operators.bpe import bpe_segment, bpe_train_merges

    df = spark.createDataFrame([Row(doc_id=0, text="a a a a a")])
    merges = bpe_train_merges(df, "text", "doc_id", n_merges=1).collect()
    assert (merges[0]["left"], merges[0]["right"], merges[0]["cnt"]) == ("a", "a", 4)
    seg = bpe_segment(df, "text", "doc_id", [("a", "a")]).collect()
    assert seg[0]["tokens"] == ["a a", "a a", "a"]


def test_bpe_ties_break_lexically(spark):
    from hogflare_spark.operators.bpe import bpe_train_merges

    df = spark.createDataFrame(
        [Row(doc_id=0, text="z w"), Row(doc_id=1, text="b c"), Row(doc_id=2, text="z w b c")]
    )
    m = bpe_train_merges(df, "text", "doc_id", n_merges=1).collect()[0]
    # both ("z","w") and ("b","c") occur twice; lexical min wins
    assert (m["left"], m["right"]) == ("b", "c")


def test_bpe_learns_frequent_phrase_and_is_partition_invariant(spark):
    from hogflare_spark.operators.bpe import bpe_train_merges

    rows = [
        Row(doc_id=i, text=("machine learning is fun and machine learning works " * 2))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    a = [tuple(r) for r in bpe_train_merges(df, "text", "doc_id", 3).collect()]
    b = [
        tuple(r)
        for r in bpe_train_merges(df.repartition(7), "text", "doc_id", 3).collect()
    ]
    assert a == b
    assert (a[0][1], a[0][2]) == ("machine", "learning")


def test_bpe_segment_applies_learned_table_to_new_docs(spark):
    from hogflare_spark.operators.bpe import bpe_segment

    df = spark.createDataFrame(
        [Row(doc_id=0, text="deep learning and machine learning")]
    )
    seg = bpe_segment(
        df, "text", "doc_id", [("machine", "learning"), ("deep", "learning")]
    ).collect()
    assert seg[0]["tokens"] == ["deep learning", "and", "machine learning"]


def test_pq_codes_shape_and_subspace_locality(spark):
    """m codes per vector; vectors identical in a subspace must share
    that subspace's code regardless of other dims."""
    from hogflare_spark.operators.similarity import pq_codes

    rows = []
    for i in range(12):
        first = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        rest = [((i * 3 + d) % 7) / 7.0 for d in range(4)]
        rows.append(Row(vec_id=i, embedding=first + rest))
    out = pq_codes(
        spark.createDataFrame(rows), m_subspaces=2, k=4, iters=2
    ).collect()
    assert len(out) == 24
    sub0 = {r["id"]: r["code"] for r in out if r["subspace"] == 0}
    evens = {sub0[i] for i in range(0, 12, 2)}
    odds = {sub0[i] for i in range(1, 12, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_pq_codes_rejects_indivisible_dim(spark):
    from hogflare_spark.operators.similarity import pq_codes

    df = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 2.0, 3.0])])
    with pytest.raises(ValueError):
        pq_codes(df, m_subspaces=2)


def test_bpe_segment_corpus_matches_train_then_apply(spark):
    from hogflare_spark.operators.bpe import (
        bpe_segment,
        bpe_segment_corpus,
        bpe_train_merges,
    )

    rows = [
        Row(doc_id=i, text="big data big data systems and big data tools")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    merges = [
        (r["left"], r["right"])
        for r in bpe_train_merges(df, "text", "doc_id", 2).collect()
    ]
    via_apply = {
        r["doc_id"]: "\x1f".join(r["tokens"])
        for r in bpe_segment(df, "text", "doc_id", merges).collect()
    }
    via_corpus = {
        r["doc_id"]: r["segmented"]
        for r in bpe_segment_corpus(df, "text", "doc_id", 2).collect()
    }
    assert via_corpus == via_apply
    assert all("big data" in v for v in via_corpus.values())


def test_pq_adc_ranks_by_quantized_similarity(spark):
    """ADC must rank a query's own cluster-mates above far vectors, and
    ranks are dense 1..k per query with self excluded."""
    from hogflare_spark.operators.similarity import pq_adc_topk

    rows = []
    for i in range(20):
        base = [1.0, 0.0] if i < 10 else [0.0, 1.0]
        rows.append(
            Row(
                vec_id=i,
                embedding=[base[0], base[1], ((i * 3) % 5) / 50.0, 0.1],
            )
        )
    df = spark.createDataFrame(rows)
    q = df.where(F.col("vec_id").isin(0, 15))
    out = pq_adc_topk(q, df, k_top=5, m_subspaces=2, k=4, iters=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == [1, 2, 3, 4, 5]
        assert all(r["neighbor_id"] != qid for r in rs)
        same_group = {n for n in range(20) if (n < 10) == (qid < 10)} - {qid}
        top = {r["neighbor_id"] for r in rs}
        assert top <= same_group, (qid, top)


def test_kmeans_fit_assign_split_matches_monolith_semantics(spark):
    """distributed_kmeans == assign under distributed_kmeans_fit's
    centroids (the refactor must be behavior-preserving)."""
    from hogflare_spark.operators.similarity import (
        _kmeans_assign_expr,
        distributed_kmeans,
        distributed_kmeans_fit,
        unit_vec_expr,
    )

    rows = _blob([1.0, 0.1, 0.0, 0.0], 9, 0) + _blob([0.0, 0.2, 1.0, 0.0], 9, 30)
    df = spark.createDataFrame(rows)
    got = sorted(
        (r["id"], r["cell"]) for r in distributed_kmeans(df, k=3, iters=2).collect()
    )
    cent = distributed_kmeans_fit(df, k=3, iters=2)
    manual = sorted(
        (r["id"], r["cell"])
        for r in df.select(
            F.col("vec_id").alias("id"),
            _kmeans_assign_expr(unit_vec_expr(F.col("embedding")), cent).alias("cell"),
        ).collect()
    )
    assert got == manual


def test_pq_adc_candidate_recall_against_brute_force(spark):
    """ADC's production role is CANDIDATE generation before an exact
    rerank; pin that signal: on the sf0.001 embeddings (near-random
    64-dim vectors — a hard ANN case), the ADC top-100 shortlist (20%
    of the corpus) must recover most of the exact cosine top-10.
    Measured 0.84 mean candidate recall at m=8/k=8; floor 0.7. (Top-10
    DIRECT recall is ~0.16 here — 24-bit codes can't order subtle
    neighbors, which is exactly why FAISS reranks; the determinism of
    the ranking itself is pinned by the oracle gate.)"""
    from hogflare_spark.operators.similarity import brute_force_topk, pq_adc_topk
    from hogflare_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0)
    exact = {}
    for r in brute_force_topk(q, emb, 10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    adc = {}
    for r in pq_adc_topk(q, emb, k_top=100).collect():
        adc.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(adc) == set(exact) and len(exact) >= 5
    recalls = [len(adc[k] & exact[k]) / 10 for k in exact]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_bpe_checkpoint_cadence_preserves_merges_and_segmentation(spark):
    """The K-step lineage recut (r7 verdict #3) is an execution detail:
    training with checkpoint_every=2 (3 recuts over 8 merges) must learn
    the identical merge table as a run that never checkpoints, and the
    cadenced segmenter must produce the identical segmentation."""
    from hogflare_spark.operators.bpe import bpe_segment, bpe_train_merges

    rows = [
        Row(doc_id=i, text="one two three four five six one two three four " * 2)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows)
    plain = [
        tuple(r) for r in bpe_train_merges(df, "text", "doc_id", 8, 10**9).collect()
    ]
    cadenced = [
        tuple(r) for r in bpe_train_merges(df, "text", "doc_id", 8, 2).collect()
    ]
    assert cadenced == plain and len(plain) == 8
    merges = [(l, r) for _, l, r, _, _ in plain]
    seg_plain = {
        r["doc_id"]: r["tokens"]
        for r in bpe_segment(df, "text", "doc_id", merges, 10**9).collect()
    }
    seg_cadenced = {
        r["doc_id"]: r["tokens"]
        for r in bpe_segment(df, "text", "doc_id", merges, 2).collect()
    }
    assert seg_cadenced == seg_plain


def test_probe_score_kernel_bit_matches_column_margin(spark):
    """The Arrow-tier margin (ordered_dots + round9, r7 verdict #2) must
    equal the interpreted Column fold `_rounded_margin` to the BIT —
    same multiply/add sequence, same floor-based rounding — on wide
    irrational-ish vectors where any reassociation would show."""
    from hogflare_spark.operators.classifier import (
        _probe_score_kernel,
        _rounded_margin,
    )

    dim = 33
    rows = [
        Row(
            id=i,
            x=[math.sin(i * 97 + j * 13) * math.exp((j % 7) - 3) for j in range(dim)],
            y=float(i % 2),
        )
        for i in range(64)
    ]
    w = [math.cos(j * 29) * 1.7 for j in range(dim)]
    df = spark.createDataFrame(rows)
    jvm = {
        r["id"]: r["score"]
        for r in df.select("id", _rounded_margin(F.col("x"), w).alias("score")).collect()
    }
    kern = {
        r["id"]: r["score"]
        for r in df.mapInPandas(
            _probe_score_kernel(w), "id long, score double"
        ).collect()
    }
    assert kern == jvm


def test_ivfpq_rerank_recovers_what_the_shortlist_contains(spark):
    """The rerank stage must convert candidate recall into top-k recall:
    reranked top-10 recall vs brute force equals the shortlist's
    candidate recall (every exact neighbor present in the shortlist is
    re-scored with exact cosine, so it must surface), and far exceeds
    the compressed-domain direct ordering (~0.16 at 24-bit codes)."""
    from hogflare_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_rerank_topk,
        pq_adc_topk,
    )
    from hogflare_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0)
    exact, short, rr = {}, {}, {}
    for r in brute_force_topk(q, emb, 10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in pq_adc_topk(q, emb, k_top=100).collect():
        short.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in ivfpq_rerank_topk(q, emb, k_top=10, shortlist=100).collect():
        rr.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(rr) == set(exact)
    # exactly the shortlisted exact neighbors resurface — no more, no less
    for k in exact:
        assert rr[k] & exact[k] == short[k] & exact[k]
    mean_recall = sum(len(rr[k] & exact[k]) / 10 for k in exact) / len(exact)
    assert mean_recall >= 0.7, mean_recall


def test_kmeans_parallel_init_beats_lowest_id_on_clustered_fixture(spark):
    """k-means‖ init (r7 verdict #7) on a fixture built to defeat
    lowest-id seeding: three tight, well-separated direction clusters
    with ALL k lowest ids inside cluster 0. Final inertia (Σ min-cell
    1 − cos) under the parallel init must be ≤ the lowest-id init's,
    and the run must be reproducible for a fixed seed."""
    import numpy as np

    from hogflare_spark.operators.similarity import distributed_kmeans_fit

    rng_dirs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    vid = 0
    for c in (0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2):  # ids 0-3 all cluster 0
        d = rng_dirs[c]
        jit = [(vid * 7 % 5) / 50.0, (vid * 11 % 5) / 50.0, (vid * 13 % 5) / 50.0, 0.1]
        rows.append(Row(vec_id=vid, embedding=[a + b for a, b in zip(d, jit)]))
        vid += 1
    df = spark.createDataFrame(rows)

    def inertia(cent):
        c = np.asarray(cent)
        x = np.array([r["embedding"] for r in rows], dtype=np.float64)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        return float((1.0 - (x @ c.T).max(axis=1)).sum())

    base = distributed_kmeans_fit(df, k=3, iters=4)
    par = distributed_kmeans_fit(df, k=3, iters=4, init="parallel", seed=7)
    par2 = distributed_kmeans_fit(df, k=3, iters=4, init="parallel", seed=7)
    assert par == par2  # deterministic for a fixed seed
    assert inertia(par) <= inertia(base) + 1e-12, (inertia(par), inertia(base))
    # the fixture is strong enough that ‖-init actually separates it
    assert inertia(par) < 0.05, inertia(par)
