"""Bounded hard checks for queries whose DuckDB oracles are super-linear
(or just intractably slow) at scaled SFs — closing the r5/r6 "sf1 oracle
gap" so `SIM_SF_DIR=<scaled dir> SIM_SCALE_CHECKS=1 driver_sim.py` runs
with NO skipped queries.

The Spark side always runs at FULL scale; only the oracle workload is
bounded. Three check families, chosen per query semantics:

1. **Restricted-view equality** — rebuild the DuckDB views restricted to
   a deterministic, closure-respecting sample of ids, run the query's
   REGISTERED oracle on them, and compare against the Spark result rows
   filtered to the same id set. Exact for row-local queries (each output
   row a function of one input row: lang_id) and for pairwise-criterion
   pair queries (pair membership depends only on the two rows: minhash /
   simhash banding, n-gram jaccard, substring windows, cosine) — for
   those the documents sample is closed under content (md5 groups) so
   min-id/keeper semantics also commute. The operators' bucket/posting
   caps (1000) sit far above any bucket the scaled corpora produce, and
   the registered oracles model no caps, so cap divergence cannot explain
   a mismatch — any diff is real.
2. **Replication expectation** — the scaled dirs are factor-F shifted
   replicas (scripts/make_scaled_sf.py), so identical-content structure
   is known a priori: every vector exists F times, hence each ANN
   query's top-k (k < F) is EXACTLY the k lowest-id other replicas of
   itself at sim 1.0 under the documented (sim desc, id asc) tie-break.
   Checked for every query row, not a sample.
3. **Invariant + cohesion** — for transitive-closure outputs (dedup /
   semantic clusters) whose pair edges are already restricted-verified
   by the pair gates: canonical == min id of its cluster (full output),
   and all replicas of one base doc/vector — identical content by
   construction — share a cluster (full output). Plus, for the corpus-
   filter capstone, cross-consistency of its drop_dup bit against the
   independently checked llm_dedup_clusters output and the internal
   keep == NOT(any drop) composition.

Sampling is deterministic (smallest md5 values), so reruns are
reproducible; no RNG, no timestamps.
"""

from __future__ import annotations

import os
from collections.abc import Callable

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# strides used by scripts/make_scaled_sf.py — base id = id % stride
DOC_STRIDE = int(os.environ.get("SIM_DOC_STRIDE", 10_000_000))
VEC_STRIDE = int(os.environ.get("SIM_VEC_STRIDE", 10_000_000))
N_DOC_GROUPS = int(os.environ.get("SIM_CHECK_DOC_GROUPS", 100))
N_VECS = int(os.environ.get("SIM_CHECK_VECS", 400))
_PLANT_MOD, _PLANT_OFFSET = 10, 10_000  # mirrors plans/llm_pipeline.py


def _duck(sf_dir: str, restrict: dict[str, str] | None = None):
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in TABLES:
        pred = (restrict or {}).get(t, "")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'{pred}"
        )
    return con


def _doc_sample(sf_dir: str, n_groups: int = N_DOC_GROUPS) -> set[int]:
    """Content-closed doc_id sample: the n_groups smallest md5(text)
    values, then EVERY doc sharing one of those texts (incl. all
    replicas)."""
    con = _duck(sf_dir)
    rows = con.execute(
        f"""
        SELECT doc_id FROM documents
        WHERE md5(coalesce(text, '')) IN (
          SELECT h FROM (
            SELECT DISTINCT md5(coalesce(text, '')) AS h FROM documents
          ) ORDER BY h LIMIT {n_groups}
        )
        """
    ).fetchall()
    con.close()
    return {r[0] for r in rows}


def _vec_sample(sf_dir: str, n: int = N_VECS) -> set[int]:
    con = _duck(sf_dir)
    rows = con.execute(
        f"SELECT vec_id FROM embeddings ORDER BY md5(vec_id::VARCHAR) LIMIT {n}"
    ).fetchall()
    con.close()
    return {r[0] for r in rows}


def _norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def _in_list(ids) -> str:
    return ",".join(str(i) for i in sorted(ids))


def _result(ok: bool, **detail) -> dict:
    return {"mode": "scale_check", "ok": bool(ok), **detail}


def _oracle_sql(name: str) -> str:
    from hogflare_spark.plans import ORACLES

    return ORACLES[name]


def _pair_check_docs(name: str) -> Callable:
    def check(spark, sf_dir, srows, scols):
        allowed = _doc_sample(sf_dir)
        con = _duck(sf_dir, {"documents": f" WHERE doc_id IN ({_in_list(allowed)})"})
        res = con.execute(_oracle_sql(name))
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        con.close()
        ia, ib = scols.index("id_a"), scols.index("id_b")
        sres = [r for r in srows if r[ia] in allowed and r[ib] in allowed]
        ok = sorted(scols) == sorted(ocols) and _norm_rows(sres, scols) == _norm_rows(
            orows, ocols
        )
        return _result(
            ok,
            family="restricted-pair",
            sample_docs=len(allowed),
            restricted_pairs=len(orows),
            spark_restricted_pairs=len(sres),
            total_spark_rows=len(srows),
        )

    return check


def _pair_check_vecs(name: str, planted: bool) -> Callable:
    def check(spark, sf_dir, srows, scols):
        sampled = _vec_sample(sf_dir)
        allowed = set(sampled)
        if planted:
            allowed |= {v + _PLANT_OFFSET for v in sampled if v % _PLANT_MOD == 0}
        con = _duck(
            sf_dir, {"embeddings": f" WHERE vec_id IN ({_in_list(sampled)})"}
        )
        res = con.execute(_oracle_sql(name))
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        con.close()
        ia, ib = scols.index("id_a"), scols.index("id_b")
        sres = [r for r in srows if r[ia] in allowed and r[ib] in allowed]
        ok = sorted(scols) == sorted(ocols) and _norm_rows(sres, scols) == _norm_rows(
            orows, ocols
        )
        return _result(
            ok,
            family="restricted-pair",
            sample_vecs=len(sampled),
            restricted_pairs=len(orows),
            spark_restricted_pairs=len(sres),
            total_spark_rows=len(srows),
        )

    return check


def _rowlocal_check_docs(name: str, id_col: str) -> Callable:
    def check(spark, sf_dir, srows, scols):
        allowed = _doc_sample(sf_dir)
        con = _duck(sf_dir, {"documents": f" WHERE doc_id IN ({_in_list(allowed)})"})
        res = con.execute(_oracle_sql(name))
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        con.close()
        ii = scols.index(id_col)
        sres = [r for r in srows if r[ii] in allowed]
        ok = sorted(scols) == sorted(ocols) and _norm_rows(sres, scols) == _norm_rows(
            orows, ocols
        )
        return _result(
            ok,
            family="restricted-rowlocal",
            sample_docs=len(allowed),
            restricted_rows=len(orows),
            total_spark_rows=len(srows),
        )

    return check


def _decontaminate_check(name: str = "llm_decontaminate") -> Callable:
    """Row-local EXCEPT the benchmark union: keep the FULL benchmark
    (doc_id % 25 == 0, the gate's own predicate) in the view so every
    sampled corpus doc sees the same shingle union Spark saw; restrict
    only the corpus side."""

    def check(spark, sf_dir, srows, scols):
        allowed = _doc_sample(sf_dir)
        pred = f" WHERE doc_id % 25 = 0 OR doc_id IN ({_in_list(allowed)})"
        con = _duck(sf_dir, {"documents": pred})
        res = con.execute(_oracle_sql(name))
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        con.close()
        ii = scols.index("id")
        oi = ocols.index("id")
        keep = {i for i in allowed if i % 25 != 0}
        sres = [r for r in srows if r[ii] in keep]
        ores = [r for r in orows if r[oi] in keep]
        ok = sorted(scols) == sorted(ocols) and _norm_rows(sres, scols) == _norm_rows(
            ores, ocols
        )
        return _result(
            ok,
            family="restricted-rowlocal",
            sample_docs=len(keep),
            restricted_rows=len(ores),
            total_spark_rows=len(srows),
        )

    return check


def _ann_check(name: str) -> Callable:
    def check(spark, sf_dir, srows, scols):
        con = _duck(sf_dir)
        vec_ids = [r[0] for r in con.execute("SELECT vec_id FROM embeddings").fetchall()]
        con.close()
        by_base: dict[int, list[int]] = {}
        for v in vec_ids:
            by_base.setdefault(v % VEC_STRIDE, []).append(v)
        factor = max(len(v) for v in by_base.values())
        iq, in_, ir, is_ = (
            scols.index("query_id"),
            scols.index("neighbor_id"),
            scols.index("rank"),
            scols.index("sim"),
        )
        got: dict[int, list] = {}
        bad_sim = 0
        for r in srows:
            got.setdefault(r[iq], []).append((r[ir], r[in_]))
            if round(float(r[is_]), 6) != 1.0:
                bad_sim += 1
        expected_queries = [v for v in vec_ids if v % 50 == 0]
        k = max((r[ir] for r in srows), default=0)
        mismatches = []
        for q in expected_queries:
            reps = sorted(x for x in by_base[q % VEC_STRIDE] if x != q)
            want = [(rank + 1, nid) for rank, nid in enumerate(reps[:k])]
            if sorted(got.get(q, [])) != want:
                mismatches.append(q)
        ok = (
            not bad_sim
            and not mismatches
            and len(got) == len(expected_queries)
            and factor > k
        )
        return _result(
            ok,
            family="replication-expectation",
            queries=len(expected_queries),
            factor=factor,
            k=k,
            non_unit_sims=bad_sim,
            mismatched_queries=len(mismatches),
        )

    return check


def _cluster_check(stride: int, id_col: str, cluster_col: str,
                   canonical_col: str, base_max: int | None = None) -> Callable:
    def check(spark, sf_dir, srows, scols):
        ii, ic = scols.index(id_col), scols.index(cluster_col)
        ik = scols.index(canonical_col)
        clusters: dict = {}
        for r in srows:
            clusters.setdefault(r[ic], []).append((r[ii], bool(r[ik])))
        # canonical == min id of its cluster, exactly one per cluster
        bad_canon = 0
        for cid, members in clusters.items():
            mn = min(i for i, _ in members)
            canon = [i for i, k in members if k]
            if canon != [mn] and sorted(canon) != [mn]:
                bad_canon += 1
        # replica cohesion: identical-content replicas share a cluster
        by_base: dict = {}
        for r in srows:
            base = r[ii] % stride
            if base_max is not None and base >= base_max:
                continue  # derived (planted) rows: near- but not bit-identical
            by_base.setdefault(base, set()).add(r[ic])
        split_bases = sum(1 for s in by_base.values() if len(s) > 1)
        ok = bad_canon == 0 and split_bases == 0 and len(clusters) > 0
        return _result(
            ok,
            family="invariant+cohesion",
            clusters=len(clusters),
            bad_canonical=bad_canon,
            bases=len(by_base),
            split_bases=split_bases,
        )

    return check


def _corpus_filter_check(name: str = "llm_corpus_filter") -> Callable:
    def check(spark, sf_dir, srows, scols):
        from hogflare_spark.plans import QUERIES

        # drop_dup must agree with the independently-checked clusters gate
        cl = QUERIES["llm_dedup_clusters"](spark, sf_dir)
        ccols = cl.columns
        ci, ck = ccols.index("id"), ccols.index("is_canonical")
        canon = {r[ci]: bool(r[ck]) for r in cl.collect()}
        ii = scols.index("doc_id")
        idup = scols.index("drop_dup")
        flags = [scols.index(c) for c in scols if c.startswith("drop_")]
        ikeep = scols.index("keep")
        bad_dup = sum(
            1 for r in srows if bool(r[idup]) != (not canon.get(r[ii], True))
        )
        bad_keep = sum(
            1
            for r in srows
            if bool(r[ikeep]) != (not any(bool(r[j]) for j in flags))
        )
        ok = bad_dup == 0 and bad_keep == 0 and len(srows) == len(canon)
        return _result(
            ok,
            family="cross-consistency",
            rows=len(srows),
            bad_drop_dup=bad_dup,
            bad_keep_composition=bad_keep,
        )

    return check




def _py_kmeans_cells(sf_dir: str) -> list[tuple[int, int]]:
    """Pure-Python replay of distributed_kmeans over the embeddings
    table: bit-exact (id, cell) assignments (fixed-point int sums are
    order-free; every float op is the same IEEE sequence). Shared by
    the kmeans and cluster-balanced-sample checks."""
    import math

    from hogflare_spark.operators.similarity import KMEANS_SCALE
    from hogflare_spark.plans.llm_pipeline import _KMEANS_ITERS, _KMEANS_K

    con = _duck(sf_dir)
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    con.close()

    def unit(v):
        acc = 0.0
        for x in v:
            acc += x * x
        n = math.sqrt(acc)
        return [x / n for x in v] if n > 0 else [0.0] * len(v)

    data = [(i, unit(v)) for i, v in rows]
    q = {i: [math.floor(x * KMEANS_SCALE + 0.5) for x in v] for i, v in data}
    k = min(_KMEANS_K, len(data))
    cent = [v for _, v in data[:k]]
    dim = len(cent[0]) if cent else 0

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

    for _ in range(_KMEANS_ITERS):
        members: dict[int, list[int]] = {}
        for i, v in data:
            members.setdefault(assign(v), []).append(i)
        for j, ids in members.items():
            sums = [sum(q[i][d] for i in ids) for d in range(dim)]
            m = [(s / len(ids)) / KMEANS_SCALE for s in sums]
            acc = 0.0
            for x in m:
                acc += x * x
            nrm = math.sqrt(acc)
            if nrm > 0:
                cent[j] = [x / nrm for x in m]
    return sorted((i, assign(v)) for i, v in data)


def _kmeans_replay_check(name: str) -> Callable:
    """Exact pure-Python replay of distributed_kmeans' fixed-point Lloyd
    iterations — an oracle INDEPENDENT of both engines, and ~10x faster
    at scaled SFs than DuckDB's unrolled relational replay. Full-output
    compare."""

    def check(spark, sf_dir, srows, scols):
        from hogflare_spark.plans.llm_pipeline import _KMEANS_ITERS, _KMEANS_K

        want = _py_kmeans_cells(sf_dir)
        k = min(_KMEANS_K, len(want))
        ii, ic = scols.index("id"), scols.index("cell")
        got = sorted((r[ii], r[ic]) for r in srows)
        ok = got == want
        return _result(
            ok,
            family="exact-replay",
            rows=len(srows),
            replay_rows=len(want),
            k=k,
            iters=_KMEANS_ITERS,
        )

    return check


def _cluster_balanced_replay_check(name: str) -> Callable:
    """Exact check for llm_cluster_balanced_sample: the shared kmeans
    Python replay plus the (h60(salt||id), id) per-cell quota — a full
    independent recomputation of the kept set."""

    def check(spark, sf_dir, srows, scols):
        from hogflare_spark.functions.hashing import _py_h60
        from hogflare_spark.operators.sampling import SAMPLE_SALT
        from hogflare_spark.plans.llm_pipeline import _CBS_PER_CLUSTER

        cells = _py_kmeans_cells(sf_dir)
        by_cell: dict[int, list[int]] = {}
        for i, c in cells:
            by_cell.setdefault(c, []).append(i)
        want = set()
        for c, ids in by_cell.items():
            drawn = sorted(
                ids, key=lambda i: (_py_h60(f"{SAMPLE_SALT}{i}"), i)
            )[:_CBS_PER_CLUSTER]
            want.update((i, c) for i in drawn)
        ii, ic = scols.index("id"), scols.index("cell")
        got = {(r[ii], r[ic]) for r in srows}
        ok = got == want
        return _result(
            ok,
            family="exact-replay",
            rows=len(srows),
            replay_rows=len(want),
            cells=len(by_cell),
            per_cluster=_CBS_PER_CLUSTER,
        )

    return check


def _prefix_near_dedup_check(name: str, prefix_n: int = 5_000) -> Callable:
    """Exact restricted check for llm_stream_near_dedup: its criterion —
    kept iff NO LOWER-ID near-duplicate — is prefix-closed (a doc's
    verdict depends only on lower ids), so the registered oracle run on
    the `prefix_n` smallest doc_ids equals the Spark kept set filtered
    to the same prefix. Bounds the oracle's band self-join to the
    prefix; the Spark side still ran at full scale."""

    def check(spark, sf_dir, srows, scols):
        con = _duck(sf_dir)
        cut = con.execute(
            f"SELECT max(doc_id) FROM (SELECT doc_id FROM documents "
            f"ORDER BY doc_id LIMIT {prefix_n})"
        ).fetchone()[0]
        con.close()
        con = _duck(sf_dir, {"documents": f" WHERE doc_id <= {cut}"})
        res = con.execute(_oracle_sql(name))
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        con.close()
        ii = scols.index("doc_id")
        sres = [r for r in srows if r[ii] <= cut]
        ok = sorted(scols) == sorted(ocols) and _norm_rows(sres, scols) == _norm_rows(
            orows, ocols
        )
        return _result(
            ok,
            family="prefix-closed",
            prefix_max_id=cut,
            restricted_kept=len(orows),
            spark_restricted_kept=len(sres),
            total_spark_rows=len(srows),
        )

    return check


def _adc_query_subset_check(name: str, rerank: bool, stride: int = 2_000) -> Callable:
    """Exact restricted check for the ADC-family gates: per-query outputs
    are independent and codebook training sees only the CORPUS (view
    untouched), so the oracle REBUILT with a sparser query predicate
    (`vec_id % stride = 0` ⊂ the gate's `% 50 = 0`) equals the Spark
    rows filtered to those queries. Bounds the oracle's
    queries × corpus × m ADC union by 50/stride while training stays
    bit-identical."""

    def check(spark, sf_dir, srows, scols):
        from hogflare_spark.operators.similarity import (
            ivfpq_rerank_topk_sql,
            pq_adc_topk_sql,
        )
        from hogflare_spark.plans.llm_pipeline import (
            _PQ_ITERS,
            _PQ_K,
            _PQ_M,
            _RERANK_SHORTLIST,
            TOPK,
            _cos_sql,
        )

        pred = f"vec_id % {stride} = 0"
        if rerank:
            inner = ivfpq_rerank_topk_sql(
                "embeddings", pred, _cos_sql, k_top=TOPK,
                shortlist=_RERANK_SHORTLIST, m_subspaces=_PQ_M, k=_PQ_K,
                iters=_PQ_ITERS,
            )
        else:
            inner = pq_adc_topk_sql(
                "embeddings", pred, k_top=TOPK, m_subspaces=_PQ_M,
                k=_PQ_K, iters=_PQ_ITERS,
            )
        con = _duck(sf_dir)
        res = con.execute(f"SELECT * FROM ({inner}) ORDER BY query_id, rank")
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        con.close()
        iq = scols.index("query_id")
        sres = [r for r in srows if r[iq] % stride == 0]
        ok = sorted(scols) == sorted(ocols) and _norm_rows(sres, scols) == _norm_rows(
            orows, ocols
        )
        return _result(
            ok,
            family="query-subset",
            stride=stride,
            restricted_rows=len(orows),
            spark_restricted_rows=len(sres),
            total_spark_rows=len(srows),
        )

    return check


CHECKS: dict[str, Callable] = {
    # pairwise-criterion pair joins over documents
    "llm_minhash_near_dups": _pair_check_docs("llm_minhash_near_dups"),
    "llm_simhash_near_dups": _pair_check_docs("llm_simhash_near_dups"),
    "llm_ngram_jaccard_pairs": _pair_check_docs("llm_ngram_jaccard_pairs"),
    "llm_substring_dedup": _pair_check_docs("llm_substring_dedup"),
    # pairwise-criterion pair joins over embeddings
    "llm_exact_embedding_near_dups": _pair_check_vecs(
        "llm_exact_embedding_near_dups", planted=False
    ),
    "llm_embedding_near_dups": _pair_check_vecs(
        "llm_embedding_near_dups", planted=True
    ),
    "llm_lsh_near_dups": _pair_check_vecs("llm_lsh_near_dups", planted=True),
    # row-local scans whose oracle SQL is merely slow at scale
    "llm_lang_id": _rowlocal_check_docs("llm_lang_id", "doc_id"),
    "llm_decontaminate": _decontaminate_check(),
    # ANN: exact expectation from the replication structure
    "llm_ann_topk": _ann_check("llm_ann_topk"),
    "llm_ann_lsh_exhaustive": _ann_check("llm_ann_lsh_exhaustive"),
    "llm_ann_ivf_exhaustive": _ann_check("llm_ann_ivf_exhaustive"),
    # transitive-closure outputs: invariants + identical-replica cohesion
    "llm_dedup_clusters": _cluster_check(
        DOC_STRIDE, "id", "cluster_id", "is_canonical"
    ),
    "llm_semantic_dedup": _cluster_check(
        VEC_STRIDE, "id", "cluster_id", "is_canonical", base_max=_PLANT_OFFSET
    ),
    # iterative model training: exact fixed-point replay
    "llm_kmeans_clusters": _kmeans_replay_check("llm_kmeans_clusters"),
    # round-8 oracle-heavy gates: prefix-closed / query-subset exact
    # restrictions (full oracles measured 116 s / 83 s / 203 s at sf1)
    "llm_stream_near_dedup": _prefix_near_dedup_check("llm_stream_near_dedup"),
    "llm_pq_adc_topk": _adc_query_subset_check("llm_pq_adc_topk", rerank=False),
    "llm_ivfpq_rerank_topk": _adc_query_subset_check(
        "llm_ivfpq_rerank_topk", rerank=True
    ),
    # capstone composition
    "llm_corpus_filter": _corpus_filter_check(),
    # round-9 second wave: the two new gates whose oracles are
    # super-linear at sf1 (brute-force ANN O(n*q); kmeans CTE unroll)
    "llm_stream_ivf_index": _ann_check("llm_stream_ivf_index"),
    "llm_cluster_balanced_sample": _cluster_balanced_replay_check(
        "llm_cluster_balanced_sample"
    ),
}
