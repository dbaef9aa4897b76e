"""Round-12 suite: integer micro-unit histogram quantiles (the r11
driver-hash fix), the person-scale compiled flag read path, and the
ADVICE-r11 hardening fixes (null-map merge, escape envelope, empty KMV
intersection, PageRank source-only nodes)."""

from __future__ import annotations

import json
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# ------------------------------------------------ integer hist quantiles


def test_quantile_micro_terms_decomposition():
    from hogflare_spark.operators.rollup import quantile_micro_terms

    assert quantile_micro_terms(0.5, 8.0) == (1, 2, 8_000_000, "p50_est_micros")
    assert quantile_micro_terms(0.99, 8.0) == (
        99,
        100,
        8_000_000,
        "p99_est_micros",
    )
    qn, qd, wm, name = quantile_micro_terms(0.9, 0.25)
    assert (qn, qd, wm) == (9, 10, 250_000)
    with pytest.raises(ValueError):
        quantile_micro_terms(0.5, 1e-9)  # sub-micro bin width


def test_hist_quantiles_integer_exact_vs_fraction_reference(spark):
    """The BIGINT micro-unit estimator must equal round-half-up of the
    exact rational est*1e6 on every group — and the output columns must
    be LongType (no doubles may survive in graded columns, r11 verdict
    #1)."""
    from hogflare_spark.operators.rollup import fine_histogram, hist_quantiles

    rows = [
        (f"2024-02-{(i % 21) + 1:02d}T06:00:00", "k" + str(i % 3),
         float((i * 53) % 997) / 3.0)
        for i in range(400)
    ]
    ev = spark.createDataFrame(
        rows, "ts_s string, event_type string, value double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    fine = fine_histogram(ev, "ts", ["event_type"], "value")
    got = hist_quantiles(fine, ["event_type"]).collect()
    assert got

    schema = {f.name: f.dataType.simpleString() for f in
              hist_quantiles(fine, ["event_type"]).schema.fields}
    for c in ("p50_est_micros", "p90_est_micros", "p99_est_micros",
              "n_events"):
        assert schema[c] == "bigint", (c, schema[c])

    # exact rational reference over the same histogram rows
    hist = fine.collect()
    from collections import defaultdict

    merged = defaultdict(int)
    for r in hist:
        wk = r["bucket"]  # fine bucket; reference re-truncs to week below
        merged[(r["bucket"], r["event_type"], r["bin"])] += r["cnt"]
    # rebuild per (week, key): Spark's date_trunc('week') — reuse it
    wk_map = {
        (r["bucket"], r["event_type"], r["bin"]): r["cnt"] for r in hist
    }
    trunc = {
        r["bucket"]: r["wk"]
        for r in fine.select("bucket")
        .distinct()
        .withColumn("wk", F.date_trunc("week", "bucket"))
        .collect()
    }
    groups = defaultdict(lambda: defaultdict(int))
    for (b, k, bn), c in wk_map.items():
        groups[(trunc[b], k)][bn] += c

    def ref_est(bins: dict, q: Fraction, w_micros: int) -> int:
        n = sum(bins.values())
        cum = 0
        for bn in sorted(bins):
            before, cum = cum, cum + bins[bn]
            if Fraction(before) < q * n <= Fraction(cum):
                est = w_micros * bn + Fraction(
                    w_micros * (q * n - before), bins[bn]
                )
                # round half up of the exact rational
                return (2 * est.numerator + est.denominator) // (
                    2 * est.denominator
                )
        raise AssertionError("no hit bin")

    by_key = {(r["bucket"], r["event_type"]): r for r in got}
    for (wk, key), bins in groups.items():
        r = by_key[(wk, key)]
        assert r["n_events"] == sum(bins.values())
        for q, col in [
            (Fraction(1, 2), "p50_est_micros"),
            (Fraction(9, 10), "p90_est_micros"),
            (Fraction(99, 100), "p99_est_micros"),
        ]:
            assert r[col] == ref_est(bins, q, 8_000_000), (wk, key, col)


def test_hist_gate_graded_columns_are_float_free(spark):
    from hogflare_spark.plans import QUERIES, load_all

    load_all()
    df = QUERIES["ev_hist_quantile_rollup"](spark, SF_SMOKE)
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert not any(t in ("double", "float") for t in kinds.values()), kinds


# ------------------------------------------------ merged_person_json


def _merge_ref(props, set_once):
    out = dict(set_once or {})
    out.update(props or {})
    return out


def test_merged_person_json_null_maps(spark):
    """NULL properties / NULL set_once must behave as {} while the other
    map still applies (ADVICE r11 medium: map_concat used to collapse
    the whole merge to NULL -> {})."""
    from hogflare_spark.flags.response import merged_person_json

    cases = [
        ({"a": '"x"'}, {"a": '"y"', "b": '"z"'}),
        (None, {"b": '"z"'}),
        ({"a": '"x"'}, None),
        (None, None),
        ({}, {"b": '"1"'}),
    ]
    df = spark.createDataFrame(
        [(i, p, s) for i, (p, s) in enumerate(cases)],
        "i int, properties map<string,string>, "
        "properties_set_once map<string,string>",
    )
    got = {
        r["i"]: json.loads(r["j"])
        for r in df.select("i", merged_person_json().alias("j")).collect()
    }
    for i, (p, s) in enumerate(cases):
        want = {
            k: json.loads(v) for k, v in _merge_ref(p, s).items()
        }
        assert got[i] == want, (i, got[i], want)


def test_escape_json_str_envelope(spark):
    from hogflare_spark.flags.response import _escape_json_str

    df = spark.createDataFrame(
        [('he said "hi" \\ bye',), (None,)], "s string"
    )
    out = df.select(_escape_json_str(F.col("s")).alias("e")).collect()
    assert out[0]["e"] == 'he said \\"hi\\" \\\\ bye'
    assert out[1]["e"] is None

    bad = spark.createDataFrame([("café",)], "s string")
    with pytest.raises(Exception, match="envelope"):
        bad.select(_escape_json_str(F.col("s")).alias("e")).collect()


# ------------------------------------------------ KMV empty intersection


def test_kmv_intersection_empty_segments_is_zero(spark):
    from hogflare_spark.operators.theta_sketch import (
        kmv_intersection_estimate,
        kmv_sketches,
    )

    df = spark.createDataFrame(
        [(i, "present") for i in range(40)], "id long, seg string"
    )
    sk = kmv_sketches(df, ["id"], "seg", k=16)
    est = kmv_intersection_estimate(sk, "absent_a", "absent_b", 16).collect()
    assert len(est) == 1 and est[0]["est"] == 0.0


# ------------------------------------------------ person-scale flag gate


def test_flag_eval_persons_matches_kernel(spark):
    """Differential: the compiled-Column person-scale path must agree
    with the per-row kernel on every (person, flag) over a synthetic
    orders slice covering all branches (channel precedence, NULL
    set_once, coercion, multi-condition fallthrough)."""
    from hogflare_spark.flags.compiler import evaluate_flags_df
    from hogflare_spark.flags.kernel import FlagContext, evaluate_flags
    from hogflare_spark.flags.model import parse_flag_config
    from hogflare_spark.flags.response import merged_person_json
    from hogflare_spark.plans.hogflare_semantics import _PERSON_FLAG_CONFIG

    flags = sorted(
        parse_flag_config(_PERSON_FLAG_CONFIG), key=lambda f: f.key
    )
    stats = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]
    rows = [
        (
            k,
            stats[k % 3],
            prios[k % 4],
            k * 31 + 7,
            float(k * 7919 % 40000000) / 100.0,
        )
        for k in range(1, 85)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderstatus string, o_orderpriority string, "
        "o_custkey long, o_totalprice double",
    )

    okey = F.col("o_orderkey")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    jstr = lambda c: F.concat(F.lit('"'), c, F.lit('"'))  # noqa: E731
    base_props = F.create_map(
        F.lit("status"), jstr(F.col("o_orderstatus")),
        F.lit("priority"), jstr(F.col("o_orderpriority")),
        F.lit("cust"), jstr(F.col("o_custkey").cast("string")),
        F.lit("total_cents"), jstr(cents.cast("string")),
    )
    props = F.when(
        okey % 3 == 0,
        F.map_concat(base_props, F.create_map(F.lit("channel"), F.lit('"app"'))),
    ).otherwise(base_props)
    set_once = F.when(
        okey % 7 == 0, F.lit(None).cast("map<string,string>")
    ).otherwise(
        F.create_map(
            F.lit("channel"),
            F.when(okey % 2 == 0, F.lit('"web"')).otherwise(F.lit('"email"')),
        )
    )
    persons = orders.select(
        okey.alias("okey"),
        okey.cast("string").alias("distinct_id"),
        props.alias("properties"),
        set_once.alias("properties_set_once"),
    )
    contexts = persons.select(
        "okey",
        "distinct_id",
        merged_person_json().alias("person_properties"),
        F.create_map().cast("map<string,string>").alias("groups"),
        F.lit(None).cast("string").alias("group_properties"),
    )
    got = {
        (r["okey"], r["flag_key"]): (
            r["value"],
            r["condition_index"],
        )
        for r in evaluate_flags_df(contexts, flags).collect()
    }

    # the store-native map lane (what the gate runs) must match the
    # JSON/variant lane bit-for-bit on every (person, flag)
    from hogflare_spark.flags.compiler import evaluate_flags_maps

    got_map = {
        (r["okey"], r["flag_key"]): (
            r["value"],
            r["condition_index"],
        )
        for r in evaluate_flags_maps(persons, flags).collect()
    }
    assert got_map == got

    # kernel reference from the raw maps (decode JSON values)
    raw = persons.collect()
    n_checked = 0
    for r in raw:
        merged = dict(r["properties_set_once"] or {})
        merged.update(r["properties"] or {})
        pp = {k: json.loads(v) for k, v in merged.items()}
        ctx = FlagContext(
            distinct_id=r["distinct_id"],
            person_properties=pp,
            groups={},
            group_properties={},
        )
        for res in evaluate_flags(flags, ctx):
            want_value = json.dumps(res.value) if not isinstance(
                res.value, str
            ) else json.dumps(res.value)
            got_value, got_ci = got[(r["okey"], res.key)]
            assert got_value == want_value, (r["okey"], res.key)
            assert got_ci == res.condition_index, (r["okey"], res.key)
            n_checked += 1
    assert n_checked == len(raw) * len(flags)


def test_flag_eval_persons_gate_shape(spark):
    """Gate smoke at SF_SMOKE: float-free graded columns, checksum
    partitions the persons set exactly once per flag."""
    from hogflare_spark.plans import QUERIES, load_all
    from hogflare_spark.sources.readers import load_table

    load_all()
    df = QUERIES["hf_flag_eval_persons"](spark, SF_SMOKE)
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert not any(t in ("double", "float") for t in kinds.values()), kinds
    rows = df.collect()
    orders = load_table(spark, SF_SMOKE, "orders")
    n = orders.count()
    ksum = orders.agg(F.sum("o_orderkey")).first()[0]
    from collections import defaultdict

    per_flag_n = defaultdict(int)
    per_flag_sum = defaultdict(int)
    for r in rows:
        per_flag_n[r["flag_key"]] += r["n_persons"]
        per_flag_sum[r["flag_key"]] += r["key_sum"]
    assert set(per_flag_n) == {
        "channel-web", "cust-odd", "not-fulfilled", "open-orders",
        "urgent-high-value",
    }
    for fk in per_flag_n:
        assert per_flag_n[fk] == n, fk
        assert per_flag_sum[fk] == ksum, fk


# ------------------------------------------------ PageRank source-only


def test_pagerank_keeps_source_only_nodes(spark):
    """A node with out-edges but no in-edges must keep its rank row —
    and keep contributing its outflow — every iteration (ADVICE r11:
    it used to vanish after iteration 1, silently dropping mass).
    Exact integer replica as the oracle on a non-bidirected graph."""
    from hogflare_spark.operators.graph import (
        PAGERANK_BASE,
        PAGERANK_SCALE,
        pagerank_fixed_point,
    )

    edge_list = [(1, 2), (2, 3), (3, 2), (4, 1)]  # 4 and (pre-fix) 1
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    iters = 4
    got = {r["node"]: r["rank"] for r in
           pagerank_fixed_point(edges, iterations=iters).collect()}

    from collections import Counter, defaultdict

    outdeg = Counter(a for a, _ in edge_list)
    nodes = {n for e in edge_list for n in e}
    rank = {n: PAGERANK_SCALE for n in nodes}
    for _ in range(iters):
        s = defaultdict(int)
        for a, b in edge_list:
            s[b] += rank[a] // outdeg[a]
        rank = {n: PAGERANK_BASE + (85 * s[n]) // 100 for n in nodes}
    assert got == rank


# ------------------------------------------------ MaxSim late interaction


def test_maxsim_rerank_matches_python_reference(spark):
    """Exact integer replica of the two-stage MaxSim pipeline on a tiny
    deterministic vector set: same slice boundaries, same nano
    quantization, same (score desc, id) ranking."""
    import math

    from hogflare_spark.operators.retrieval import maxsim_rerank

    dim, n_tok, d_sub = 16, 4, 4
    vecs = [
        (i, [math.sin(0.7 * i + 0.3 * j) for j in range(dim)])
        for i in range(30)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = [
        (r["query_id"], r["neighbor_id"], r["rank"], r["score_nanos"])
        for r in maxsim_rerank(
            df, F.col("vec_id") % 9 == 0, n_tokens=n_tok, dim=dim,
            shortlist=8, k_top=5,
        ).orderBy("query_id", "rank").collect()
    ]

    # python replica — float32 round-trip first (the stored arrays are
    # float), then double arithmetic in index order
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    V = {i: [f32(x) for x in v] for i, v in vecs}

    def nanos(dot):
        return math.floor(dot * 1e9 + 0.5)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    want = []
    qs = [i for i in V if i % 9 == 0]
    for q in sorted(qs):
        s1 = sorted(
            ((nanos(dot(V[q], V[d])), d) for d in V if d != q),
            key=lambda t: (-t[0], t[1]),
        )[:8]
        scored = []
        for _, d in s1:
            s = 0
            for t in range(n_tok):
                qt = V[q][t * d_sub:(t + 1) * d_sub]
                s += max(
                    nanos(dot(qt, V[d][u * d_sub:(u + 1) * d_sub]))
                    for u in range(n_tok)
                )
            scored.append((s, d))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s, d) in enumerate(scored[:5], 1):
            want.append((q, d, rank, s))
    assert got == want


def test_maxsim_gate_graded_columns_are_float_free(spark):
    from hogflare_spark.plans import QUERIES, load_all

    load_all()
    df = QUERIES["llm_maxsim_rerank"](spark, SF_SMOKE)
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert not any(t in ("double", "float") for t in kinds.values()), kinds


# ------------------------------------------------ decayed engagement


def test_decayed_engagement_matches_python_reference(spark):
    from collections import defaultdict

    from hogflare_spark.plans import QUERIES, load_all
    from hogflare_spark.plans.events_analytics import (
        _DECAY_HORIZON_DAYS,
        _DECAY_W_MICROS,
    )
    from hogflare_spark.sources.readers import load_table

    load_all()
    got = [
        tuple(r)
        for r in QUERIES["ev_decayed_engagement"](spark, SF_SMOKE).collect()
    ]
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["user_id"], r["day"])] += 1
    anchor = max(d for _, d in daily)
    n_ev = defaultdict(int)
    score = defaultdict(int)
    for (u, d), c in daily.items():
        age = (anchor - d).days
        w = _DECAY_W_MICROS[age] if age <= _DECAY_HORIZON_DAYS else 0
        n_ev[u] += c
        score[u] += c * w
    order = sorted(score, key=lambda u: (-score[u], u))[:20]
    want = [
        (u, n_ev[u], score[u], rank) for rank, u in enumerate(order, 1)
    ]
    assert got == want


# ------------------------------------------------ compiled-flag cache


def test_compiled_flag_cache_identity_and_isolation(spark):
    """The r12 compiled-structs cache must hit on an equal-content flag
    list (same Column object even for a re-parsed config), miss across
    id_cols / lanes / differing flag content, and never bleed results
    between interleaved evaluations of different flag sets."""
    from hogflare_spark.flags.compiler import (
        _compiled_structs,
        evaluate_flags_maps,
    )
    from hogflare_spark.flags.model import parse_flag_config

    cfg_a = '{"flags": [{"key": "fa", "conditions": [{"properties": [{"key": "tier", "value": "gold"}]}]}]}'
    cfg_b = '{"flags": [{"key": "fa", "conditions": [{"properties": [{"key": "tier", "value": "silver"}]}]}]}'
    flags_a = parse_flag_config(cfg_a)
    flags_b = parse_flag_config(cfg_b)

    from hogflare_spark.flags.compiler import _MapCtx
    from pyspark.sql import functions as F2

    ctx = _MapCtx(F2.col("distinct_id"), F2.col("_merged_props"))
    c1 = _compiled_structs("maps", flags_a, ctx, ("distinct_id",))
    c2 = _compiled_structs(
        "maps", parse_flag_config(cfg_a), ctx, ("distinct_id",)
    )
    assert c1 is c2  # content-equal re-parse hits
    c3 = _compiled_structs("maps", flags_a, ctx, ("other_id",))
    c4 = _compiled_structs("maps", flags_b, ctx, ("distinct_id",))
    assert c3 is not c1 and c4 is not c1  # id_col / content key apart

    persons = spark.createDataFrame(
        [("u1", {"tier": '"gold"'}), ("u2", {"tier": '"silver"'})],
        "distinct_id string, properties map<string,string>",
    ).withColumn(
        "properties_set_once", F2.lit(None).cast("map<string,string>")
    )

    def vals(flags):
        rows = evaluate_flags_maps(persons, flags).orderBy("distinct_id")
        return [(r["distinct_id"], r["value"]) for r in rows.collect()]

    a_first = vals(flags_a)
    assert vals(flags_b) == [("u1", "false"), ("u2", "true")]
    assert a_first == vals(flags_a) == [("u1", "true"), ("u2", "false")]


# --------------------------------------- uncompressed input estimation


def test_input_bytes_uncompressed_sees_through_compression(spark):
    """adaptive_partitions sizing for CPU-bound operators must track
    row volume, not encoding luck (the r12 sf1 bpe regression: the
    replicated scale-probe corpus landed at 1.5x the on-disk bytes for
    10x the rows, so on-disk sizing kept the 10x exploded state on the
    toy partition count). The contract under test: the uncompressed
    footer estimate tracks raw row volume, so a HIGHLY compressible
    corpus that is smaller on disk than an incompressible one still
    derives MORE state partitions — on-disk sizing orders them the
    wrong way around."""
    import os
    import random
    import tempfile

    from hogflare_spark.operators.partitioning import (
        adaptive_partitions,
        input_bytes,
    )

    with tempfile.TemporaryDirectory() as td:
        rng = random.Random(7)
        # redundant: long repetitive texts — big raw, tiny on disk
        redundant = [(i, "alpha beta gamma delta " * 400) for i in range(1200)]
        # dense: short high-entropy texts — small raw, but incompressible
        dense = [
            (i, "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(700)))
            for i in range(900)
        ]
        rp, dp = os.path.join(td, "red"), os.path.join(td, "den")
        w = lambda df: df.coalesce(1).write.option(  # noqa: E731
            "parquet.enable.dictionary", "false"
        )
        w(spark.createDataFrame(redundant, "doc_id long, text string")).parquet(rp)
        w(spark.createDataFrame(dense, "doc_id long, text string")).parquet(dp)

        red, den = spark.read.parquet(rp), spark.read.parquet(dp)
        assert input_bytes(red) < input_bytes(den)  # disk: red looks smaller
        unc_red = input_bytes(red, uncompressed=True)
        unc_den = input_bytes(den, uncompressed=True)
        assert unc_red > 10 * unc_den  # raw: red is the big workload

        kw = dict(bytes_per_partition=64 * 1024, expansion=1.0, floor=2, cap=512)
        n_red = adaptive_partitions(red, uncompressed=True, **kw)
        n_den = adaptive_partitions(den, uncompressed=True, **kw)
        n_red_disk = adaptive_partitions(red, uncompressed=False, **kw)
        assert n_red > n_den  # raw sizing ranks the workloads correctly
        assert n_red > n_red_disk  # the on-disk estimate under-sizes red
        # non-parquet fallback: not file-backed -> 0 (cap path)
        assert input_bytes(
            spark.createDataFrame([(1,)], "x int"), uncompressed=True
        ) == 0


def test_bm25_topk_single_corpus_scan(spark):
    """r12 optimization: bm25_topk must tokenize the corpus exactly once.
    Before the per_doc cache, the stats aggregate and the scoring join
    each re-ran the tokenize projection (two parquet scans), and the
    `score > 0` filter's inferred isnotnull conditions pushed below the
    projection re-evaluated the interpreted split/filter HOFs a third
    time per row. Pin: ONE parquet scan of documents (the cache build),
    both downstream legs reading the cache."""
    from hogflare_spark.functions.caching import unpersist_all
    from hogflare_spark.operators.retrieval import bm25_topk
    from hogflare_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    try:
        df = bm25_topk(docs, ["hash", "join", "spark", "window"], k_top=10)
        rows = df.collect()  # materialize so the final AQE plan is real
        import contextlib
        import io
        import re

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        fmt = buf.getvalue()

        def n_nodes(node: str) -> int:
            return len(re.findall(rf"^\(\d+\) {node}", fmt, flags=re.M))

        assert n_nodes("Scan parquet") == 1, fmt
        assert n_nodes("InMemoryTableScan") >= 2, fmt
        # contract sanity on the smoke corpus: dense ranks from 1,
        # scores positive non-increasing
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert all(s > 0 for s in scores)
        assert all(a >= b for a, b in zip(scores, scores[1:]))
    finally:
        unpersist_all()


def test_quality_token_features_matches_column_form(spark):
    """r12 optimization: quality_token_features (tokenize-once cached
    shape) must return exactly what the per-column expressions return —
    same rows, same schema — and scan the corpus parquet exactly once
    (the cache build)."""
    from hogflare_spark.functions.caching import unpersist_all
    from hogflare_spark.operators import text_analysis as TA
    from hogflare_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    try:
        fast = TA.quality_token_features(docs).orderBy("doc_id")
        ref = docs.select(
            "doc_id",
            TA.ws_token_count(F.col("text")).alias("ws_tokens"),
            TA.bpe_token_count(F.col("text")).alias("bpe_tokens"),
            TA.quality_score(F.col("text")).alias("quality"),
        ).orderBy("doc_id")
        rows_fast = fast.collect()
        assert rows_fast == ref.collect()
        assert fast.schema == ref.schema

        import contextlib
        import io
        import re

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fast.explain("formatted")
        fmt = buf.getvalue()
        n_scans = len(re.findall(r"^\(\d+\) Scan parquet", fmt, flags=re.M))
        assert n_scans == 1, fmt
    finally:
        unpersist_all()
