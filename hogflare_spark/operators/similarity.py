"""Similarity search over embedding columns (array<float>).

- cosine_expr: JVM-side cosine (zip_with + aggregate) — no Python UDF,
  stays inside whole-stage codegen.
- brute_force_topk: exact top-k; the query side is broadcast (query sets
  are small by construction), so the corpus is scanned once with no
  shuffle — this is the right plan even at 100 TB when |queries| is
  thousands.
- embedding_near_dup_pairs: exact pair join above a cosine threshold.
- lsh_ann_topk: random-hyperplane LSH (Charikar 2002) with multi-probe —
  a scale path: corpus is bucketed by an 8-bit signature, each query
  probes its bucket plus all buckets within hamming distance `probe_dist`,
  and only those candidates are reranked exactly. Candidate volume is
  ~corpus * P(bucket match), tunable via planes/probe_dist.
- ivf_ann_topk: IVF coarse quantizer (Jégou et al. 2011 / FAISS IVF) —
  the other scale path: spherical k-means centroids trained on a bounded
  driver-side sample, corpus assigned to cells JVM-side, queries probe
  their n_probe nearest cells and rerank exactly. At 100 TB the cell id
  becomes a partition/cluster column and probing is partition pruning.
- ivf_write_index / ivf_query_index: that at-scale form materialized —
  the corpus written cell-PARTITIONED with persisted centroids, probes
  pushed as partition filters so the scan opens only probed cells
  (PartitionFilters asserted in test).
- distributed_kmeans: fully distributed Lloyd — map-only JVM assignment
  scans + one k-row groupBy per iteration — the trainer to use when the
  corpus outgrows ivf_train_centroids' bounded driver-side sample;
  fixed-point centroid sums keep every iteration exactly replayable by
  the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hogflare_spark.functions.hashing import hyperplanes
from hogflare_spark.functions.caching import cached, release


def _require_int_ids(df: DataFrame, id_col: str, op: str) -> None:
    """The Arrow kernel tier moves ids as int64 arrays, and k-means‖
    seeding hashes the id through splitmix64 — so these operators require
    an INTEGRAL id column (r8 ADVICE: fail fast at plan-build with a
    clear message instead of a numpy cast error deep inside a task).
    Callers with string/uuid ids should derive a surrogate first, e.g.
    `df.withColumn("vec_id", F.xxhash64("uuid"))`."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    dt = df.schema[id_col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"{op} requires an integral id column; {id_col!r} is "
            f"{dt.simpleString()}. Map non-integer ids to a surrogate "
            f'first, e.g. df.withColumn({id_col!r}, F.xxhash64({id_col!r})).'
        )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, as double."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank, sim).

    Deterministic: rank on (round(sim, 9) desc, neighbor_id asc) so FP
    noise in the last bits can't reorder ties. Self-matches excluded.

    r8: the per-(corpus row × query) interpreted cosine fold moved onto
    the Arrow tier — the query set collects once (it was already
    broadcast; small by the operator's contract) and one map-only kernel
    scan scores each corpus batch against every query with the exact
    fold order of `cosine_expr` (query/corpus norms and the dot all
    strict left-to-right; multiplication operand order is immaterial —
    IEEE multiply is exactly commutative). round(…, 9) stays a JVM
    Column so boundary decisions match the previous plan and the
    oracle bit-for-bit. Only (query_id, neighbor_id, sim) scalars leave
    Python — the vectors themselves never materialize per pair.

    NOTE the query-set collect is EAGER (runs at plan-build time, not
    first action): the kernel closure must embed the query matrix before
    mapInPandas pickles it to executors, and the operator's contract is
    a small query set (it was broadcast even before the Arrow rewrite).
    Ids must be integral — see _require_int_ids.
    """
    from hogflare_spark.operators.partitioning import fan_out

    _require_int_ids(queries, id_col, "brute_force_topk")
    _require_int_ids(corpus, id_col, "brute_force_topk")
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    spark = corpus.sparkSession
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, sim double"
        )
    q_ids = [int(r["query_id"]) for r in q_rows]
    q_vecs = [[float(x) for x in r["qv"]] for r in q_rows]

    def _score(batches):
        import numpy as np
        import pandas as pd

        qm = np.asarray(q_vecs, dtype=np.float64)
        qid = np.asarray(q_ids, dtype=np.int64)
        nq, dim = qm.shape
        qn = np.zeros(nq)
        for i in range(dim):
            qn = qn + qm[:, i] * qm[:, i]
        qn = np.sqrt(qn)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cv = np.array([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
            nid = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            n = cv.shape[0]
            dot = np.zeros((n, nq))
            cn = np.zeros(n)
            for i in range(dim):
                dot = dot + cv[:, i : i + 1] * qm[:, i]
                cn = cn + cv[:, i] * cv[:, i]
            cn = np.sqrt(cn)
            denom_ok = (qn[None, :] > 0) & (cn[:, None] > 0)
            denom = np.where(denom_ok, qn[None, :] * cn[:, None], 1.0)
            sim = np.where(denom_ok, dot / denom, 0.0)
            keep = nid[:, None] != qid[None, :]
            rr, cc = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": qid[cc],
                    "neighbor_id": nid[rr],
                    "sim_raw": sim[rr, cc],
                }
            )

    c = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    )
    scored = c.mapInPandas(
        _score, "query_id long, neighbor_id long, sim_raw double"
    ).select(
        "query_id", "neighbor_id", F.round(F.col("sim_raw"), 9).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 16,
) -> DataFrame:
    """(id_a, id_b, sim) for all pairs with cosine >= threshold, id_a < id_b.

    EXACT block-partitioned pair join (the 1-Bucket-Theta / fragment-
    replicate pattern, Okcan & Riedewald SIGMOD'11): every vector hashes
    to one of ``num_blocks`` blocks; the A side replicates each row to
    block-pair keys (b, j>=b), the B side to (i<=b, b), and a plain
    shuffled equi-join on the key distributes the O(n^2) compare evenly
    across executors. No crossJoin node, no broadcast of the corpus, and
    per-row replication is bounded by num_blocks+1 — at 100 TB the knob
    trades shuffle volume (n * num_blocks rows) against per-task compare
    width (n^2 / num_blocks^2 pairs per key).

    Exactness matters here: the documents corpus plants near-dup pairs
    only epsilon above the 0.4 threshold (min qualifying sim 0.4005 at
    sf0.01), so LSH candidate generation cannot reach recall 1.0 with
    bounded candidate volume at this threshold. For genuinely high
    thresholds (>= ~0.8) use `lsh_near_dup_pairs`, the sub-quadratic
    approximate path.

    The per-pair compare runs as ONE Arrow-batched matrix kernel per
    block-pair key (applyInPandas → int64 matmul), not as a per-pair
    Column expression: Catalyst's higher-order functions (aggregate /
    zip_with) are interpreted, never whole-stage-codegen'd, so folding
    3×dim lambdas per pair costs ~20 min for the 1.3e7 sf1 pairs where
    the matmul kernel takes seconds. Data movement does NOT grow: the
    kernel input is the same n×(num_blocks+1) narrow replicated rows
    the pair join would shuffle — vectors are never replicated per
    PAIR, only per block-pair key.

    Cross-engine determinism: vectors are L2-normalized then quantized
    to fixed-point (floor(x·2^20+0.5), the kmeans trick), so the pair
    dot is an EXACT int64 sum — order-free, hence identical between
    numpy's matmul and the oracle's list_sum — and sim = dot/2^40 is a
    power-of-two scaling (exact), rounded to 9 decimals floor-based.
    sim therefore equals true cosine only to ~1e-6 (quantization), a
    documented contract shared bit-for-bit by both engines; the planted
    threshold margins (≥5e-4) dwarf it.
    """
    import pandas as pd

    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            unit_vec_expr(F.col(vec_col)),
            lambda x: F.floor(x * F.lit(float(KMEANS_SCALE)) + F.lit(0.5)).cast("long"),
        ).alias("q"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).cast("int").alias("blk"),
    )
    a_side = base.select(
        "id",
        "q",
        F.col("blk").alias("ki"),
        F.explode(F.sequence(F.col("blk"), F.lit(num_blocks - 1))).alias("kj"),
        F.lit(0).alias("side"),
    )
    b_side = base.select(
        "id",
        "q",
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("ki"),
        F.col("blk").alias("kj"),
        F.lit(1).alias("side"),
    )
    scale2 = float(KMEANS_SCALE) * float(KMEANS_SCALE)
    thr = float(threshold)

    def _compare(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
        am = pdf[pdf["side"] == 0]
        bm = pdf[pdf["side"] == 1]
        if len(am) == 0 or len(bm) == 0:
            return empty
        qa = np.array(am["q"].tolist(), dtype=np.int64)
        qb = np.array(bm["q"].tolist(), dtype=np.int64)
        ids_a = am["id"].to_numpy(dtype=np.int64)
        ids_b = bm["id"].to_numpy(dtype=np.int64)
        dots = qa @ qb.T  # exact: |dot| <= dim * 2^40 << 2^63
        sims = np.floor((dots / scale2) * 1e9 + 0.5) / 1e9
        ii, jj = np.nonzero(sims >= thr)
        if len(ii) == 0:
            return empty
        id_a, id_b, s = ids_a[ii], ids_b[jj], sims[ii, jj]
        if int(pdf["ki"].iat[0]) == int(pdf["kj"].iat[0]):
            # diagonal key: both sides are the same block — keep i<j once
            keep = id_a < id_b
            id_a, id_b, s = id_a[keep], id_b[keep], s[keep]
        else:
            lo = np.minimum(id_a, id_b)
            id_b = np.maximum(id_a, id_b)
            id_a = lo
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "sim": s})

    # explicit width: the shuffled bytes are tiny, so AQE would coalesce
    # the quadratic-work groups onto a couple of tasks (observed at the
    # sf1 probe); an explicit repartition on the group key is exempt
    # from coalescing and satisfies applyInPandas' distribution
    n_wide = df.sparkSession.sparkContext.defaultParallelism
    return (
        a_side.unionByName(b_side)
        .repartition(n_wide, "ki", "kj")
        .groupBy("ki", "kj")
        .applyInPandas(_compare, "id_a long, id_b long, sim double")
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    force_exact: bool = False,
) -> DataFrame:
    """Strategy-selecting facade for embedding near-dup detection — the
    entry point users should call.

    `force_exact=True` → the exact block-partitioned O(n²/B) join at any
    threshold (an explicit, auditable opt-in to quadratic compare).
    Otherwise threshold >= 0.8 → `lsh_near_dup_pairs` (sub-quadratic:
    banded hyperplane LSH candidates + exact verify; precision 1.0,
    recall concentrated at high similarity — ~0.999 for pairs at
    s >= 0.98, ~0.99 at 0.95, falling to ~0.5 right at s = 0.90 with the
    default 8x8-bit banding; see lsh_near_dup_pairs for the recall/cost
    knob; `dim` required). Below 0.8 the collision probability math
    stops pruning, so without force_exact this raises — at corpus scale
    an accidental quadratic compare is an outage, not a slow query.
    """
    if force_exact:
        return embedding_near_dup_pairs(
            df, threshold, id_col=id_col, vec_col=vec_col
        )
    if threshold >= 0.8:
        if dim is None:
            raise ValueError("dim is required for the LSH near-dup path")
        return lsh_near_dup_pairs(
            df, threshold, dim=dim, id_col=id_col, vec_col=vec_col
        )
    raise ValueError(
        f"threshold {threshold} < 0.8 defeats LSH recall; the exact "
        "path is O(n^2/blocks) — pass force_exact=True if the corpus "
        "size makes that acceptable"
    )


def band_sig_exprs(vec: Column, planes: list[list[int]], bands: int) -> list[Column]:
    """Per-band LSH signatures: band b packs the sign bits of its
    len(planes)/bands hyperplane dots into one small int. Kept as
    separate per-band values (not one packed long) so the band width can
    grow past the 63 usable bits of a BIGINT signature."""
    per = len(planes) // bands
    out = []
    for b in range(bands):
        total = F.lit(0).cast("long")
        for j in range(per):
            plane = planes[b * per + j]
            dot = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            total = total + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0)
            )
        out.append(total)
    return out


def _band_sigs_udf(planes: list[list[int]], bands: int):
    """Arrow-vectorized per-band LSH signatures. The expression form
    (band_sig_exprs) evaluates num_planes aggregate/zip_with trees per
    row — higher-order functions are interpreted per ELEMENT, so 64
    planes x 64 dims is ~4k lambda invocations per row (~9 s for a
    2,200-vector corpus). This UDF computes the same dots as one numpy
    pass per Arrow batch, accumulating over dimensions IN ORDER — the
    same left-to-right summation the expression fold (and the DuckDB
    oracle's list_sum) performs, so the sign decisions that pick buckets
    are bit-identical across engines."""
    import numpy as np
    import pandas as pd

    per = len(planes) // bands
    M = np.asarray(planes, dtype=np.float64)  # (P, dim)
    weights = np.array([1 << j for j in range(per)], dtype=np.int64)

    def _sigs(col):
        X = np.stack(col.to_numpy()).astype(np.float64)  # (n, dim)
        acc = np.zeros((X.shape[0], M.shape[0]))
        for d in range(X.shape[1]):
            # dimension-sequential accumulation == the fold's add order
            acc += X[:, d : d + 1] * M[:, d]
        bits = acc > 0  # (n, P)
        out = np.empty((X.shape[0], bands), dtype=np.int64)
        for b in range(bands):
            out[:, b] = bits[:, b * per : (b + 1) * per] @ weights
        return pd.Series(list(out))

    # legacy (function, returnType) form: `from __future__ import
    # annotations` stringifies type hints, which the hint-based
    # pandas_udf signature parser cannot resolve for local imports
    return F.pandas_udf(_sigs, "array<long>")


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int,
    num_planes: int = 64,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-dup pairs: banded hyperplane-LSH candidates +
    exact cosine verify. Output schema matches embedding_near_dup_pairs.

    Candidates are pairs sharing at least one (band, band-signature)
    bucket; each candidate is exactly reranked, so precision is 1.0 and
    only recall is probabilistic: a pair at cosine s survives with
    1 - (1 - p^(num_planes/bands))^bands where p = 1 - arccos(s)/pi.
    The 64-plane/8-band default gives 8-bit bands (256 buckets each),
    which is what makes the path actually sub-quadratic: a random
    (orthogonal) pair collides in a band with probability 2^-8, so
    candidate volume is ~3% of n^2 from bucket noise plus the true
    near-dup mass — versus 2-bit bands, where ~90% of ALL pairs collide
    and the "LSH" silently degenerates to a quadratic join. The price is
    that recall concentrates at high similarity: ~0.9992 at s=0.98,
    ~0.988 at s=0.95, ~0.96 at s=0.92, but only ~0.50 right at s=0.90 —
    the banding is tuned for near-IDENTICAL duplicate detection, where
    dup pairs live at s >= 0.95. For high recall at a looser threshold,
    raise `bands` (more 8-bit bands = more chances to collide) and pay
    proportionally more shuffle volume.

    Plan shape: signatures are computed once per row; only (id, band,
    bsig) rows enter the explode and the self-join, so the shuffle
    carries ids — the 64-double vectors join back by id for the verify
    step, sized by candidate count, not by n * bands.
    """
    _require_int_ids(df, id_col, "lsh_near_dup_pairs")
    planes = hyperplanes(num_planes, dim)
    sig_udf = _band_sigs_udf(planes, bands)
    # fan the raw (id, vec) scan before the signature projection (guide
    # §2.5 input skew): a single-file corpus otherwise computes the
    # 64-plane signature UDF — and caches both working sets — on one
    # task. No-op on multi-file corpora; candidates are set-valued and
    # the verify is per-row, so results are partitioning-independent.
    from hogflare_spark.operators.partitioning import fan_out

    src = fan_out(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")))
    vecs = cached(src.select("id", F.col("vec").alias("v")))
    keyed = cached(
        src.select(
            "id",
            F.posexplode(sig_udf(F.col("vec"))).alias("band", "bsig"),
        )
    )
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), ["band", "bsig"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Under-parallel inputs only (the fan_out regime): AQE coalesces the
    # dedup exchange by PAIR-ID bytes (~16 B/row), which lands the whole
    # verify — two vector attach-joins + the cosine kernel, each row
    # ~2·dim doubles WIDE — on one or two tasks (profiled r13: a 2.9 s
    # single-task stage at sf0.1). Widening the deduped id stream is a
    # tiny shuffle here and disappears at scale exactly like fan_out.
    from hogflare_spark.operators.partitioning import is_small_file_input

    if is_small_file_input(df):
        cand = cand.repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )
    va = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    # verify on the Arrow tier: the interpreted cosine_expr costs 3 HOF
    # folds × dim per CANDIDATE pair (the r8 trainer pathology, same
    # fix) — the kernel reproduces its exact fold order (see arrowfold),
    # and the round(…, 9) stays a JVM Column so the decimal HALF_UP
    # rounding is bit-identical to the previous plan and the oracle.
    raw = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .mapInPandas(_pairwise_cosine_kernel(), "id_a long, id_b long, sim_raw double")
    )
    return raw.select(
        "id_a", "id_b", F.round(F.col("sim_raw"), 9).alias("sim")
    ).where(F.col("sim") >= threshold)


def _pairwise_cosine_kernel(
    a_col: str = "va",
    b_col: str = "vb",
    ida_col: str = "id_a",
    idb_col: str = "id_b",
):
    """mapInPandas kernel: (ida, idb, a, b) → (ida, idb, sim_raw) where
    sim_raw is bit-identical to `cosine_expr(a, b)` BEFORE rounding —
    strict array-order folds for the dot and both squared norms, sqrt,
    one multiply and one divide in the same sequence, 0.0 for a
    zero-norm side."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.array([np.asarray(v, dtype=np.float64) for v in pdf[a_col]])
            b = np.array([np.asarray(v, dtype=np.float64) for v in pdf[b_col]])
            n = a.shape[0]
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for i in range(a.shape[1]):
                dot = dot + a[:, i] * b[:, i]
                na = na + a[:, i] * a[:, i]
                nb = nb + b[:, i] * b[:, i]
            na = np.sqrt(na)
            nb = np.sqrt(nb)
            ok = (na > 0) & (nb > 0)
            sim = np.where(ok, dot / np.where(ok, na * nb, 1.0), 0.0)
            yield pd.DataFrame(
                {
                    ida_col: pdf[ida_col].to_numpy(dtype=np.int64),
                    idb_col: pdf[idb_col].to_numpy(dtype=np.int64),
                    "sim_raw": sim,
                }
            )

    return fn


def _bucket_expr(vec: Column, planes: list[list[int]]) -> Column:
    """Signature int: bit j = 1 iff dot(vec, plane_j) > 0."""
    total = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        total = total + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return total


def _probe_buckets(bucket: Column, num_planes: int, probe_dist: int) -> Column:
    """Array of bucket ids within hamming distance <= probe_dist."""
    probes = [bucket]
    if probe_dist >= 1:
        probes += [bucket.bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)]
    if probe_dist >= 2:
        probes += [
            bucket.bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        ]
    return F.array(*probes)


def ivf_train_centroids(
    corpus: DataFrame,
    n_centroids: int,
    sample_mod: int | None = None,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_sample: int = 100_000,
) -> list[list[float]]:
    """Deterministic spherical k-means on a driver-side sample → centroids.

    IVF training the way the ANN literature does it (FAISS/IVF, Jégou et
    al. 2011): train the coarse quantizer on a bounded SAMPLE, broadcast
    the centroids, assign the full corpus distributedly. The sample is the
    only collect in the pipeline and it is bounded BY DEFAULT: when
    `sample_mod` is not given it is derived from a distributed count so at
    most ~`max_sample` rows reach the driver — no full-corpus collect at
    any corpus size. Pass `sample_mod` explicitly to pin the stride.

    Deterministic: sample = ids % sample_mod == 0, sorted by id; init =
    first n_centroids sample vectors; Lloyd updates with numpy; an emptied
    cell keeps its previous centroid. All vectors L2-normalized so
    max-dot-product assignment == cosine assignment.
    """
    import math

    import numpy as np

    if sample_mod is None:
        n = corpus.count()  # metadata-cheap scan; a scalar to the driver
        sample_mod = max(1, math.ceil(n / max_sample))
    rows = (
        corpus.where(F.col(id_col) % sample_mod == 0)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    x = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    n_centroids = min(n_centroids, len(x))
    cent = x[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members) == 0:
                continue
            m = members.mean(axis=0)
            nrm = np.linalg.norm(m)
            if nrm > 0:
                cent[j] = m / nrm
    return [[float(v) for v in c] for c in cent]


def _cell_dots(vec: Column, centroids: list[list[float]]) -> list[Column]:
    """Per-centroid dot products of a (unnormalized) vector column.

    Centroids are unit vectors, so argmax-dot == argmax-cosine for cell
    ASSIGNMENT (the vector's own norm is a constant across cells); the
    rerank still computes true cosine."""
    return [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in c]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in centroids
    ]


def ivf_assign_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """Cell id (int) = argmax_j dot(vec, centroid_j); ties → higher j."""
    arr = F.array(
        *[
            F.struct(d.alias("d"), F.lit(j).alias("j"))
            for j, d in enumerate(_cell_dots(vec, centroids))
        ]
    )
    return F.array_max(arr)["j"]


def ivf_probe_expr(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """Array of the n_probe cell ids nearest (by dot) to the vector."""
    arr = F.array(
        *[
            F.struct(d.alias("d"), F.lit(j).alias("j"))
            for j, d in enumerate(_cell_dots(vec, centroids))
        ]
    )
    top = F.slice(F.reverse(F.array_sort(arr)), 1, n_probe)
    return F.transform(top, lambda s: s["j"])


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Corpus rows are assigned to their nearest centroid cell (one pass,
    JVM expressions, no shuffle); each query probes its `n_probe` nearest
    cells and exactly reranks only those candidates. Expected candidate
    volume is |corpus| * n_probe / n_centroids — the knob that turns a
    full scan into a cell-local search at 100 TB, where the cell
    assignment would be precomputed as a partition/cluster column of the
    corpus table and the probe becomes partition pruning.

    Output schema matches brute_force_topk; recall is gated in
    tests/test_llm_pipeline.py on clustered data.
    """
    from hogflare_spark.operators.partitioning import fan_out

    centroids = ivf_train_centroids(
        corpus, n_centroids, sample_mod=sample_mod, id_col=id_col, vec_col=vec_col
    )
    c = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    ).select("neighbor_id", "cv", ivf_assign_expr(F.col("cv"), centroids).alias("cell"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(ivf_probe_expr(F.col(vec_col), centroids, n_probe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 9).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_write_index(
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Materialize the corpus as a CELL-PARTITIONED parquet index.

    This is `ivf_ann_topk`'s documented at-scale form made concrete: the
    coarse-quantizer cell id becomes a physical partition column, so a
    probe is PARTITION PRUNING — the scan never opens files outside the
    probed cells. Centroids are persisted alongside the data
    (`_CENTROIDS.json`) so query time needs no retraining and the
    assignment stays consistent with the layout. Returns the centroids.
    """
    import json as _json
    import os as _os

    centroids = ivf_train_centroids(
        corpus, n_centroids, sample_mod=sample_mod, id_col=id_col, vec_col=vec_col
    )
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        ivf_assign_expr(F.col(vec_col), centroids).alias("cell"),
    )
    # Versioned data dir + ONE atomic pointer holding BOTH the centroids
    # and the data path: a rebuild over an existing index never lets a
    # reader pair new-layout data with old centroids (probe cells
    # computed against the wrong quantizer return silently wrong
    # neighbors) — the same claimed-version/pointer-swing discipline as
    # sinks/lake.py. Old versions stay until expired manually.
    _os.makedirs(index_dir, exist_ok=True)
    version = 1
    while True:
        data_rel = f"data.v={version}"
        try:
            _os.mkdir(_os.path.join(index_dir, data_rel))
            break
        except FileExistsError:
            version += 1
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        _os.path.join(index_dir, data_rel)
    )
    tmp = _os.path.join(index_dir, "_CENTROIDS.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump({"centroids": centroids, "data": data_rel}, fh)
    _os.replace(tmp, _os.path.join(index_dir, "_CENTROIDS.json"))
    return centroids


def ivf_expire_index_versions(index_dir: str, keep_last: int = 1) -> list[str]:
    """Drop superseded `data.v=N` directories (never the one the pointer
    references): the index-side twin of lake.expire_versions. Returns the
    removed relative paths."""
    import json as _json
    import os as _os
    import shutil as _shutil

    pointer_path = _os.path.join(index_dir, "_CENTROIDS.json")
    current = None
    if _os.path.exists(pointer_path):
        with open(pointer_path) as fh:
            pointer = _json.load(fh)
        current = pointer.get("data") if isinstance(pointer, dict) else "data"
    versions = sorted(
        (d for d in _os.listdir(index_dir)
         if d.startswith("data.v=") and _os.path.isdir(_os.path.join(index_dir, d))),
        key=lambda d: int(d.split("=", 1)[1]),
    )
    to_drop = [d for d in versions[:-keep_last] if d != current]
    for d in to_drop:
        _shutil.rmtree(_os.path.join(index_dir, d))
    return to_drop


def ivf_query_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k against an `ivf_write_index` layout via partition pruning.

    The union of every query's probe cells (≤ n_centroids small ints) is
    collected driver-side and pushed as a partition filter, so the scan
    reads ONLY the probed cell directories (`PartitionFilters` in the
    plan, verified by test); candidates are then cell-joined to the
    broadcast query set and exactly reranked — identical semantics to
    `ivf_ann_topk` over the same centroids, with the cell-local scan the
    100 TB regime needs.
    """
    import json as _json
    import os as _os

    with open(_os.path.join(index_dir, "_CENTROIDS.json")) as fh:
        pointer = _json.load(fh)
    if isinstance(pointer, dict):
        centroids, data_rel = pointer["centroids"], pointer["data"]
    else:  # pre-versioning layout: a bare centroid list beside data/
        centroids, data_rel = pointer, "data"
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            ivf_probe_expr(F.col(vec_col), centroids, n_probe)
        ).alias("cell"),
    )
    # the probe-cell union is bounded by n_centroids — a tiny driver
    # scalar, not a data collect
    needed = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    data = (
        spark.read.parquet(_os.path.join(index_dir, data_rel))
        .where(F.col("cell").isin([int(c) for c in needed]))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
            F.col("cell").cast("int").alias("cell"),
        )
    )
    scored = (
        data.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 9).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    num_planes: int = 8,
    probe_dist: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-probe hyperplane LSH + exact rerank.

    Output schema matches brute_force_topk; recall is probabilistic (see
    tests/test_llm_pipeline.py for the recall gate on clustered data).
    """
    from hogflare_spark.operators.partitioning import fan_out

    _require_int_ids(queries, id_col, "lsh_ann_topk")
    _require_int_ids(corpus, id_col, "lsh_ann_topk")
    planes = hyperplanes(num_planes, dim)
    c = fan_out(corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))).select(
        "neighbor_id",
        "cv",
        _bucket_expr(F.col("cv"), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            _probe_buckets(_bucket_expr(F.col(vec_col), planes), num_planes, probe_dist)
        ).alias("bucket"),
    )
    # exact rerank on the Arrow tier (same kernel as the LSH verify; the
    # JVM round keeps boundary decisions bit-identical to the oracle)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .mapInPandas(
            _pairwise_cosine_kernel(
                "qv", "cv", ida_col="query_id", idb_col="neighbor_id"
            ),
            "query_id long, neighbor_id long, sim_raw double",
        )
        .select(
            "query_id", "neighbor_id", F.round(F.col("sim_raw"), 9).alias("sim")
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def semantic_dedup_clusters(
    df: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): rows
    whose EMBEDDINGS are near-identical collapse to one kept exemplar,
    removing paraphrase/translation duplicates that token-level dedup
    (minhash/simhash/substring) cannot see.

    Composition of the scale paths this module already proves out:
    sub-quadratic banded-LSH near-dup pairs (no block-replicated pair
    join) become edges of a similarity graph; connected components
    (operators/identity.py — min-label + pointer jumping, the person
    identity machinery) assign every vector a cluster; the min-id
    member is the kept exemplar. SemDeDup's k-means stage exists here
    as the LSH bucketing — both are cheap partitions that bound the
    within-cell pair search; LSH buckets keep the whole pipeline
    deterministic and oracle-mirrorable where trained centroids would
    not be.

    Output: (id, cluster_id, is_canonical) for EVERY input row —
    singletons are their own cluster, so downstream keeps exactly the
    `is_canonical` rows.
    """
    from hogflare_spark.operators.identity import connected_components

    pairs = near_dup_pairs(df, threshold, dim=dim, id_col=id_col, vec_col=vec_col)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = connected_components(edges).withColumnRenamed("id", "member_id")
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(labels, F.col("id") == F.col("member_id"), "left").select(
        "id",
        F.coalesce("comp", "id").alias("cluster_id"),
        (F.col("id") == F.coalesce("comp", "id")).alias("is_canonical"),
    )


# --------------------------------------------------------------- k-means

KMEANS_SCALE = 1 << 20  # fixed-point quantum for the centroid-update sums


def unit_vec_expr(vec: Column) -> Column:
    """L2-normalized double array; an all-zero vector stays all-zero.

    The norm folds the squared components in array order (same sequence
    of IEEE ops as the DuckDB mirror's list_sum over generate_series),
    so normalized components are bit-identical across engines.
    """
    nrm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return F.when(nrm > 0, F.transform(vec, lambda x: x.cast("double") / nrm)).otherwise(
        F.transform(vec, lambda x: F.lit(0.0))
    )


def _kmeans_assign_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """Cell id = argmax_j round9(dot(vec, centroid_j)); ties → LOWER cell.

    The dot is rounded to 9 decimals with the portable floor-based
    rounding before the argmax so a last-bit cross-engine difference in
    the fold cannot flip an assignment (same trick as the LSH verify
    joins, plans/llm_pipeline._round6)."""
    arr = F.array(
        *[
            F.struct(
                (F.floor(d * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)).alias("d"),
                F.lit(-j).alias("nj"),
            )
            for j, d in enumerate(_cell_dots(vec, centroids))
        ]
    )
    return (F.array_max(arr)["nj"] * F.lit(-1)).alias("cell")


def distributed_kmeans(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "lowest_id",
    seed: int = 0,
) -> DataFrame:
    """Fully distributed spherical k-means (Lloyd) over an embedding
    column — the 100 TB-scale path for IVF coarse-quantizer training and
    SemDeDup's clustering stage, where `ivf_train_centroids`' bounded
    driver-side sample stops being representative.

    Spark execution shape, per iteration:
      * assignment is a pure JVM Column expression (broadcast-by-literal
        centroids, k ordered-fold dot products inside whole-stage
        codegen) — a map-only corpus scan, no shuffle;
      * the centroid update is ONE `groupBy(cell)` with map-side partial
        aggregation of `dim` integer sums — the only shuffle, k rows out;
      * only k×(dim+1) scalars ever reach the driver (the new centroids),
        exactly like Spark MLlib's KMeans — driver traffic is the model,
        never the data.

    Cross-engine determinism (the oracle replays every iteration
    relationally in DuckDB):
      * inputs are L2-normalized with an array-order fold (unit_vec_expr);
      * the per-cell mean is computed from FIXED-POINT component sums —
        each normalized component is quantized to floor(x*2^20+0.5) as a
        64-bit int, so the distributed sum is exact and order-free, then
        mean = (sum / count) / 2^20 in doubles (the 2^20 scaling is a
        power of two, hence exact);
      * assignment rounds the dot to 9 decimals (floor-based) before the
        argmax, ties to the LOWER cell id;
      * init = the k lowest-id vectors by default; an emptied cell keeps
        its previous centroid (standard Lloyd practice). Pass
        init="parallel" for the seeded k-means‖ production init
        (deterministic per seed, but NOT oracle-replayable — gates keep
        the default).

    Output: (id, cell) for every corpus row under the final centroids.
    """
    _require_int_ids(corpus, id_col, "distributed_kmeans")
    # Keep the cached normalized+quantized projection alive through the
    # final assignment (r12, guide §5: the frame is reused — recomputing
    # it cost one more full normalize pass over the corpus). The fit does
    # not release a caller-provided cache; the RETURNED frame reads it,
    # so release happens at the host's quiescent point (unpersist_all),
    # the same lifetime as every cache backing a returned frame here.
    qdf = _kmeans_qdf(corpus, id_col, vec_col)
    cent = distributed_kmeans_fit(
        corpus, k, iters, id_col, vec_col, init, seed, _qdf=qdf
    )
    if cent is None:
        return qdf.select("id", F.lit(0).alias("cell"))
    return qdf.select("id", "v").mapInPandas(
        _assign_cells_kernel(cent), "id long, cell int"
    )


def _assign_cells_kernel(centroids: list[list[float]], out_col: str = "cell"):
    """mapInPandas kernel: (id, v) batches → (id, <out_col>) under the
    given centroids — the Arrow-tier twin of `_kmeans_assign_expr` (which
    stays as the JVM reference implementation, differentially pinned in
    tests/test_llm_round7.py). Same arithmetic to the bit: strict
    array-order fold (arrowfold.ordered_dots), floor-based round9,
    argmax with ties to the LOWER cell (np.argmax keeps the first
    maximum). Map-only: no shuffle, no driver traffic."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        from hogflare_spark.functions.arrowfold import ordered_dots, round9

        w = np.asarray(centroids, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            rd = round9(ordered_dots(x, w))
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    out_col: np.argmax(rd, axis=1).astype(np.int32),
                }
            )

    return fn


def _kmeans_parallel_init(
    base: DataFrame, k: int, seed: int, rounds: int = 4, oversample: int | None = None
) -> list[list[float]] | None:
    """k-means‖ initialization (Bahmani et al., VLDB 2012) over the
    normalized (id, v) projection — the production-quality init for
    `distributed_kmeans_fit(init="parallel")`. Lowest-id init (the
    oracle-replayable default) can seed all k centers inside one true
    cluster; k-means‖ oversamples ~l=2k candidates per round with
    probability ∝ their squared distance to the current center set, then
    reduces the weighted candidate set to k centers driver-side — the
    standard scalable variant of k-means++'s D² seeding.

    Spark shape per round: one mapInPandas scan for the cost φ (per-batch
    partial sums) + one for sampling (only sampled rows — expected ~l —
    leave the executors). The final weighting pass is one more scan with
    per-batch partial counts. Total: 2·rounds+1 map-only scans at init
    time, candidate-sized driver traffic throughout.

    Determinism WITHOUT an oracle contract: this init feeds production
    quality, not a hash gate, so the kernels use plain numpy matmul (no
    ordered-fold constraint) and sampling uses splitmix64 uniforms
    derived from (id, round, seed) — reproducible across runs and
    partitionings, no RNG state."""
    import numpy as np

    l = oversample or 2 * k
    first = base.orderBy("id").limit(1).collect()
    if not first:
        return None
    centers: list[list[float]] = [[float(x) for x in first[0]["v"]]]

    def _min_d2_kernel(cent_rows, emit):
        """emit='cost' → per-batch (phi_part, n_part); emit=(l, phi, rnd,
        sd) → sampled (id, v) rows."""

        def fn(batches):
            import numpy as _np
            import pandas as _pd

            c = _np.asarray(cent_rows, dtype=_np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = _np.array([_np.asarray(v, dtype=_np.float64) for v in pdf["v"]])
                # unit vectors: d² = 2 - 2·max_dot, floored at 0
                d2 = _np.maximum(2.0 - 2.0 * (x @ c.T).max(axis=1), 0.0)
                if emit == "cost":
                    yield _pd.DataFrame({"phi_part": [float(d2.sum())]})
                else:
                    smp_l, phi, rnd, sd = emit
                    ids = pdf["id"].to_numpy(dtype=_np.int64)
                    # splitmix64 on (id, round, seed) → uniform [0, 1)
                    z = ids.astype(_np.uint64) + _np.uint64(
                        (0x9E3779B97F4A7C15 * (rnd + 1) + sd) & 0xFFFFFFFFFFFFFFFF
                    )
                    z = (z ^ (z >> _np.uint64(30))) * _np.uint64(0xBF58476D1CE4E5B9)
                    z = (z ^ (z >> _np.uint64(27))) * _np.uint64(0x94D049BB133111EB)
                    z = z ^ (z >> _np.uint64(31))
                    u = z.astype(_np.float64) / float(1 << 64)
                    p = _np.minimum(1.0, smp_l * d2 / phi) if phi > 0 else 0.0 * d2
                    take = u < p
                    if not take.any():
                        continue
                    yield _pd.DataFrame(
                        {"id": ids[take], "v": [list(r) for r in x[take]]}
                    )

        return fn

    for rnd in range(rounds):
        phi_rows = base.mapInPandas(
            _min_d2_kernel(centers, "cost"), "phi_part double"
        ).collect()
        phi = sum(r["phi_part"] for r in phi_rows)
        if phi <= 0:
            break  # every point coincides with a center already
        sampled = base.mapInPandas(
            _min_d2_kernel(centers, (float(l), float(phi), rnd, seed)),
            "id long, v array<double>",
        ).collect()
        seen = {tuple(c) for c in centers}
        for r in sorted(sampled, key=lambda r: int(r["id"])):
            v = [float(x) for x in r["v"]]
            if tuple(v) not in seen:
                seen.add(tuple(v))
                centers.append(v)

    # weight candidates by how much of the corpus they attract
    cand = np.asarray(centers, dtype=np.float64)

    def _weight_kernel(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _np.array([_np.asarray(v, dtype=_np.float64) for v in pdf["v"]])
            nearest = (x @ cand.T).argmax(axis=1)
            cnt = _np.bincount(nearest, minlength=len(cand))
            yield _pd.DataFrame({"w": [cnt.tolist()]})

    w_rows = base.mapInPandas(_weight_kernel, "w array<long>").collect()
    weights = np.zeros(len(cand), dtype=np.int64)
    for r in w_rows:
        weights += np.asarray(r["w"], dtype=np.int64)

    # reduce to k centers: weighted Lloyd on the candidate set (driver-
    # side, candidate-sized), seeded from the k heaviest candidates
    order = np.lexsort((np.arange(len(cand)), -weights))
    cent = cand[order[: min(k, len(cand))]].copy()
    for _ in range(10):
        assign = (cand @ cent.T).argmax(axis=1)
        for j in range(len(cent)):
            m = weights * (assign == j)
            if m.sum() == 0:
                continue
            mean = (cand * m[:, None]).sum(axis=0) / m.sum()
            nrm = np.linalg.norm(mean)
            if nrm > 0:
                cent[j] = mean / nrm
    return [[float(x) for x in c] for c in cent]


def _kmeans_qdf(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """The trainer's cached working set: (id, normalized v, fixed-point
    q). Tracked via `cached`; materialized by the first job that touches
    it (the init collect fills it — no standalone count)."""
    # fan the raw (id, vec) scan before normalize+quantize (guide §2.5):
    # a single-file corpus otherwise builds the cache — and runs every
    # Lloyd-iteration kernel scan over it — on one task. Results are
    # partitioning-independent: init is orderBy(id).limit(k), iteration
    # partials are exact order-free int64 sums, assignment is per-row.
    from hogflare_spark.operators.partitioning import fan_out

    base = fan_out(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col).alias("id"), unit_vec_expr(F.col(vec_col)).alias("v")
    )
    return cached(
        base.select(
            "id",
            "v",
            F.transform(
                F.col("v"),
                lambda x: F.floor(
                    x * F.lit(float(KMEANS_SCALE)) + F.lit(0.5)
                ).cast("long"),
            ).alias("q"),
        )
    )


def distributed_kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "lowest_id",
    seed: int = 0,
    _qdf: DataFrame | None = None,
) -> list[list[float]] | None:
    """The training loop of distributed_kmeans, returning the final
    centroids (the model) — split out so PQ's ADC scoring can train a
    codebook and keep the centroid VALUES, not just assignments. None on
    an empty corpus. Arithmetic identical to the original Column-
    expression loop (pinned by the kmeans gates and the exact-replay
    scale check), but executed on the Arrow tier (r7 verdict #2): each
    iteration is ONE mapInPandas scan that assigns cells via the
    ordered-fold numpy kernel AND pre-aggregates the fixed-point centroid
    sums per batch — so at most k rows per Arrow batch (not per corpus
    row) leave Python, and the k×(dim+2) partials collapse driver-side.
    The int64 sums are exact and order-free, so batch-level partial
    aggregation is not an approximation. The normalized+quantized
    projection is cached (tracked) across the `iters` scans and released
    before returning."""
    import math

    _require_int_ids(corpus, id_col, "distributed_kmeans_fit")
    # One working set serves init, every iteration, and (when the caller
    # passes it through) the final assignment: the init collect doubles
    # as the cache-materialization job, so the old standalone count and
    # the assignment's re-normalization scan are gone (r12 profile: both
    # were full-corpus passes whose output the cache already held).
    owns_qdf = _qdf is None
    qdf = _kmeans_qdf(corpus, id_col, vec_col) if owns_qdf else _qdf
    if init == "parallel":
        # opt-in k-means‖ (r7 verdict #5: lowest-id is a quality-poor
        # init at scale); not oracle-replayable, so gates keep the default
        cent = _kmeans_parallel_init(qdf.select("id", "v"), k, seed)
        if not cent:
            if owns_qdf:
                release(qdf)
            return None
    elif init == "lowest_id":
        init_rows = qdf.select("id", "v").orderBy("id").limit(k).collect()
        if not init_rows:
            if owns_qdf:
                release(qdf)
            return None
        cent = [[float(x) for x in r["v"]] for r in init_rows]
    else:
        if owns_qdf:
            release(qdf)
        raise ValueError(f"unknown init {init!r} (lowest_id | parallel)")
    dim = len(cent[0])

    try:
        for _ in range(iters):
            # project to the two columns the kernel reads (guide §4.1:
            # mapInPandas ships every column it is handed)
            partials = qdf.select("v", "q").mapInPandas(
                _kmeans_stats_kernel(cent, dim),
                "cell int, cnt long, s array<long>",
            ).collect()
            stats: dict[int, tuple[int, list[int]]] = {}
            for r in partials:  # ≤ k rows per Arrow batch — model-sized
                j = int(r["cell"])
                cnt0, sums0 = stats.get(j, (0, [0] * dim))
                stats[j] = (
                    cnt0 + int(r["cnt"]),
                    [a + b for a, b in zip(sums0, r["s"])],
                )
            for j, (cnt, sums) in stats.items():
                if cnt == 0:
                    continue
                m = [(s / cnt) / KMEANS_SCALE for s in sums]
                acc = 0.0
                for x in m:
                    acc += x * x
                nrm = math.sqrt(acc)
                if nrm > 0:
                    cent[j] = [x / nrm for x in m]
    finally:
        if owns_qdf:
            release(qdf)
    return cent


def _kmeans_stats_kernel(centroids: list[list[float]], dim: int):
    """mapInPandas kernel for one Lloyd iteration: assign each row via the
    ordered-fold dot (bit-identical to `_kmeans_assign_expr`), then emit
    per-(batch, cell) partial aggregates — count and the exact int64
    fixed-point component sums. Replaces the per-row interpreted-HOF
    assignment AND the n-row shuffle of the former groupBy with ≤k tiny
    rows per batch."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        from hogflare_spark.functions.arrowfold import ordered_dots, round9

        w = np.asarray(centroids, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            q = np.array([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            cells = np.argmax(round9(ordered_dots(x, w)), axis=1)
            uniq, inv = np.unique(cells, return_inverse=True)
            cnts = np.bincount(inv)
            sums = np.zeros((len(uniq), dim), dtype=np.int64)
            np.add.at(sums, inv, q)
            yield pd.DataFrame(
                {
                    "cell": uniq.astype(np.int32),
                    "cnt": cnts.astype(np.int64),
                    "s": [row.tolist() for row in sums],
                }
            )

    return fn


def distributed_kmeans_sql(
    table: str, k: int = 8, iters: int = 3, dim: int = 64,
    id_expr: str = "vec_id", vec_expr: str = "embedding",
) -> str:
    """DuckDB mirror of distributed_kmeans: the same normalize / quantize /
    assign / update arithmetic, with each Lloyd iteration unrolled into a
    CTE pair (assignment cross join + fixed-point mean update)."""
    scale = float(KMEANS_SCALE)
    sq_norm = f"list_sum(list_transform({vec_expr}, x -> x::DOUBLE * x::DOUBLE))"
    corpus = (
        f"SELECT {id_expr} AS id, "
        f"CASE WHEN sqrt({sq_norm}) > 0 "
        f"THEN list_transform({vec_expr}, x -> x::DOUBLE / sqrt({sq_norm})) "
        f"ELSE list_transform({vec_expr}, x -> 0.0) END AS v "
        f"FROM {table}"
    )
    parts = [
        f"corpus AS ({corpus})",
        "qc AS (SELECT id, v, "
        f"list_transform(v, x -> CAST(floor(x * {scale} + 0.5) AS BIGINT)) AS q "
        "FROM corpus)",
        f"c0 AS (SELECT rn - 1 AS cell, v AS c FROM "
        f"(SELECT v, row_number() OVER (ORDER BY id) AS rn FROM corpus) WHERE rn <= {k})",
    ]
    dot = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        "i -> qc.v[i] * ct.c[i]))"
    )
    rdot = f"floor(({dot}) * 1000000000 + 0.5) / 1000000000"
    for t in range(iters):
        parts.append(
            f"a{t} AS (SELECT id, cell, q FROM ("
            f"SELECT qc.id, ct.cell, qc.q, "
            f"row_number() OVER (PARTITION BY qc.id ORDER BY {rdot} DESC, ct.cell ASC) AS rn "
            f"FROM qc CROSS JOIN c{t} ct) WHERE rn = 1)"
        )
        parts.append(
            f"u{t} AS (SELECT a.cell, gs.i, "
            f"(sum(a.q[gs.i])::DOUBLE / count(*)::DOUBLE) / {scale} AS md "
            f"FROM a{t} a CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) gs "
            f"GROUP BY a.cell, gs.i)"
        )
        parts.append(
            f"m{t} AS (SELECT cell, list(md ORDER BY i) AS m FROM u{t} GROUP BY cell)"
        )
        parts.append(
            f"c{t + 1} AS (SELECT p.cell, "
            f"CASE WHEN n.m IS NOT NULL "
            f"AND sqrt(list_sum(list_transform(n.m, x -> x * x))) > 0 "
            f"THEN list_transform(n.m, x -> x / sqrt(list_sum(list_transform(n.m, y -> y * y)))) "
            f"ELSE p.c END AS c "
            f"FROM c{t} p LEFT JOIN m{t} n ON n.cell = p.cell)"
        )
    final = (
        f"SELECT id, cell FROM ("
        f"SELECT qc.id, ct.cell, "
        f"row_number() OVER (PARTITION BY qc.id ORDER BY {rdot} DESC, ct.cell ASC) AS rn "
        f"FROM qc CROSS JOIN c{iters} ct) WHERE rn = 1"
    )
    return "WITH " + ",\n".join(parts) + "\n" + final


def cluster_balanced_sample(
    corpus: DataFrame,
    n_per_cluster: int,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced diversity sampling: spherical k-means over the
    embedding column, then the `n_per_cluster` lowest-hash documents of
    EACH cluster — the cluster-then-uniform-sample curation recipe
    (D4, Tirumala et al. 2023; the selection stage SemDeDup-style
    pipelines run after dedup) that flattens topical skew: web corpora
    concentrate in a few dense clusters, and a uniform draw reproduces
    that concentration, while an equal per-cluster quota caps it.

    Spark shape: the trainer is distributed_kmeans (per iteration one
    map-only assignment scan + one k-row groupBy — driver traffic is
    the model); the draw is stratified_sample over the (id, cell)
    assignment — one per-cell rank window with the mega-stratum
    pre-filter, so at 100 TB each cell ranks an expected
    n·safety-row superset, not its full membership. Deterministic end
    to end (lowest-id init + fixed-point sums + (h60, id) draw order),
    which is what keeps the whole composition DuckDB-replayable.

    Output: (id, cell) — the kept sample with its cluster provenance.
    """
    from hogflare_spark.operators.sampling import stratified_sample

    cells = distributed_kmeans(
        corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    return stratified_sample(cells, "id", "cell", n_per_cluster)


def cluster_balanced_sample_sql(
    table: str,
    n_per_cluster: int,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
) -> str:
    """DuckDB mirror: the unrolled k-means CTEs feeding the same
    (h60, id)-ranked per-cell quota."""
    from hogflare_spark.operators.sampling import stratified_sample_sql

    inner = distributed_kmeans_sql(
        table, k=k, iters=iters, dim=dim, id_expr=id_expr, vec_expr=vec_expr
    )
    return stratified_sample_sql(f"({inner})", "id", "cell", n_per_cluster)


def _subspace_unit_q(vec: list, m: int, d_sub: int, scale: float):
    """Driver/kernel-shared helper: per-subspace normalize + quantize a
    full vector with the EXACT op sequence of unit_vec_expr over a slice
    (ordered squared-sum fold, sqrt, elementwise divide) followed by
    floor(x·scale + 0.5) — so the fused trainer below is bit-identical
    to the per-subspace Column pipeline the oracle unrolls."""
    nv: list[list[float]] = []
    qv: list[list[int]] = []
    import math

    for j in range(m):
        s = vec[j * d_sub : (j + 1) * d_sub]
        acc = 0.0
        for x in s:
            acc += x * x
        nrm = math.sqrt(acc)
        n = [x / nrm for x in s] if nrm > 0 else [0.0] * d_sub
        nv.append(n)
        qv.append([math.floor(x * scale + 0.5) for x in n])
    return nv, qv


def pq_fit_codebooks(
    corpus: DataFrame,
    m_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _base: DataFrame | None = None,
) -> list[list[list[float]]] | None:
    """Train all m per-subspace spherical k-means codebooks in FUSED
    corpus scans: one mapInPandas pass per Lloyd iteration computes every
    subspace's assignments and fixed-point partial sums together
    (≤ m·k tiny rows per Arrow batch), instead of m independent trainer
    loops — m·iters corpus scans collapse to iters, which at 100 TB is
    the difference between reading the corpus 16 times and twice. The
    per-subspace arithmetic is bit-identical to
    `distributed_kmeans_fit` on the slice (same normalize / quantize /
    round9-argmax / fixed-point-mean sequence), so the unrolled
    per-subspace DuckDB oracles are unchanged. Returns m codebooks of k
    centroids (or None on an empty corpus).

    `_base` (internal): a caller-owned cached (id, vec) projection of
    the corpus. When given, the trainer's iterated scans read it and the
    caller keeps the cache alive for its own downstream reads (encode,
    rerank) — one working set per gate instead of one per stage."""
    scale = float(KMEANS_SCALE)
    m = m_subspaces

    # One cached working set; the init collect doubles as both the
    # dim probe and the cache materialization (r12: the standalone
    # first() was a full-scan job whose answer the init rows carry).
    from hogflare_spark.operators.partitioning import fan_out

    owns_base = _base is None
    base = (
        cached(
            fan_out(
                corpus.select(
                    F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
                )
            )
        )
        if owns_base
        else _base
    )
    init_rows = base.orderBy("id").limit(k).collect()
    if not init_rows:
        if owns_base:
            release(base)
        return None
    dim = len(init_rows[0]["vec"])
    if dim % m_subspaces:
        if owns_base:
            release(base)
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    d_sub = dim // m_subspaces
    # m codebooks, each seeded from the k lowest-id normalized subvectors
    cbs: list[list[list[float]]] = [[] for _ in range(m)]
    for r in init_rows:
        nv, _ = _subspace_unit_q([float(x) for x in r["vec"]], m, d_sub, scale)
        for j in range(m):
            cbs[j].append(nv[j])

    def _stats_kernel(codebooks):
        def fn(batches):
            import numpy as np
            import pandas as pd

            from hogflare_spark.functions.arrowfold import ordered_dots, round9

            ws = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
                )
                out_s, out_c, out_cnt, out_sums = [], [], [], []
                for j in range(m):
                    s = x[:, j * d_sub : (j + 1) * d_sub]
                    # per-subspace normalize: ordered squared-sum fold
                    acc = np.zeros(len(s))
                    for i in range(d_sub):
                        acc = acc + s[:, i] * s[:, i]
                    nrm = np.sqrt(acc)
                    safe = nrm > 0
                    n = np.where(safe[:, None], s / np.where(safe, nrm, 1.0)[:, None], 0.0)
                    q = np.floor(n * scale + 0.5).astype(np.int64)
                    cells = np.argmax(round9(ordered_dots(n, ws[j])), axis=1)
                    uniq, inv = np.unique(cells, return_inverse=True)
                    cnts = np.bincount(inv)
                    sums = np.zeros((len(uniq), d_sub), dtype=np.int64)
                    np.add.at(sums, inv, q)
                    out_s.extend([j] * len(uniq))
                    out_c.extend(uniq.tolist())
                    out_cnt.extend(cnts.tolist())
                    out_sums.extend(row.tolist() for row in sums)
                yield pd.DataFrame(
                    {"j": out_s, "cell": out_c, "cnt": out_cnt, "s": out_sums}
                )

        return fn

    import math

    try:
        for _ in range(iters):
            # project to the one column the kernel reads (guide §4.1)
            partials = base.select("vec").mapInPandas(
                _stats_kernel(cbs), "j int, cell int, cnt long, s array<long>"
            ).collect()
            stats: dict[tuple[int, int], tuple[int, list[int]]] = {}
            for r in partials:
                key = (int(r["j"]), int(r["cell"]))
                cnt0, sums0 = stats.get(key, (0, [0] * d_sub))
                stats[key] = (
                    cnt0 + int(r["cnt"]),
                    [a + b for a, b in zip(sums0, r["s"])],
                )
            for (j, cell), (cnt, sums) in stats.items():
                if cnt == 0:
                    continue
                mean = [(s / cnt) / KMEANS_SCALE for s in sums]
                acc = 0.0
                for x in mean:
                    acc += x * x
                nrm = math.sqrt(acc)
                if nrm > 0:
                    cbs[j][cell] = [x / nrm for x in mean]
    finally:
        if owns_base:
            release(base)
    return cbs


def _pq_encode_kernel(codebooks, m: int, d_sub: int):
    """mapInPandas kernel: (id, vec) → (id, subspace, code) for ALL m
    subspaces in one pass — same normalize + round9-argmax arithmetic as
    `_assign_cells_kernel` on each slice."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        from hogflare_spark.functions.arrowfold import ordered_dots, round9

        ws = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            ids = pdf["id"].to_numpy(dtype=np.int64)
            frames = []
            for j in range(m):
                s = x[:, j * d_sub : (j + 1) * d_sub]
                acc = np.zeros(len(s))
                for i in range(d_sub):
                    acc = acc + s[:, i] * s[:, i]
                nrm = np.sqrt(acc)
                safe = nrm > 0
                n = np.where(safe[:, None], s / np.where(safe, nrm, 1.0)[:, None], 0.0)
                cells = np.argmax(round9(ordered_dots(n, ws[j])), axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "id": ids,
                            "subspace": np.full(len(ids), j, dtype=np.int32),
                            "code": cells.astype(np.int32),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return fn


def _pq_encode_wide_kernel(codebooks, m: int, d_sub: int):
    """mapInPandas kernel: (id, vec) → (id, codes array<int>[m]) — the
    SAME per-subspace normalize + round9-argmax arithmetic as
    `_pq_encode_kernel`, emitted as one packed row per vector instead of
    m long-format rows. The ADC scorer reads this shape so the corpus
    side never explodes m-fold (guide §2.3: shuffle fewer bytes — the
    packed row is what crosses the top-k exchange)."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        from hogflare_spark.functions.arrowfold import ordered_dots, round9

        ws = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            ids = pdf["id"].to_numpy(dtype=np.int64)
            cols = []
            for j in range(m):
                s = x[:, j * d_sub : (j + 1) * d_sub]
                acc = np.zeros(len(s))
                for i in range(d_sub):
                    acc = acc + s[:, i] * s[:, i]
                nrm = np.sqrt(acc)
                safe = nrm > 0
                n = np.where(safe[:, None], s / np.where(safe, nrm, 1.0)[:, None], 0.0)
                cols.append(
                    np.argmax(round9(ordered_dots(n, ws[j])), axis=1).astype(
                        np.int32
                    )
                )
            packed = np.stack(cols, axis=1)
            yield pd.DataFrame(
                {"id": ids, "codes": [row.tolist() for row in packed]}
            )

    return fn


def pq_codes(
    corpus: DataFrame,
    m_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codes (Jégou et al. 2011) for the embedding
    column — the memory side of the standard 100 TB ANN stack (IVF for
    pruning + PQ for compression): the vector splits into `m_subspaces`
    contiguous blocks and each block is vector-quantized against a
    per-subspace codebook, compressing dim floats to m small codes.

    Codebooks train with the same fixed-point-exact arithmetic as the
    IVF coarse quantizer (`distributed_kmeans`) but FUSED across
    subspaces (`pq_fit_codebooks`): one corpus scan per Lloyd iteration
    covers all m subspaces, and encoding is one more scan emitting every
    (id, subspace, code) — m·iters+m scans collapse to iters+1, the
    dominant cost at 100 TB. Since the trainer normalizes each
    subvector, this is the ANGULAR product quantizer, matching the
    cosine metric every similarity operator here uses; an all-zero
    subvector stays zero and deterministically lands in the lowest cell.

    Output: (id, subspace, code) long format — m rows per vector, no
    m-way join; pivot at the consumer if a packed row is wanted.
    """
    cbs = pq_fit_codebooks(corpus, m_subspaces, k, iters, id_col, vec_col)
    if cbs is None:
        return corpus.sparkSession.createDataFrame(
            [], "id LONG, subspace INT, code INT"
        )
    dim = len(cbs[0][0]) * m_subspaces
    d_sub = dim // m_subspaces
    return corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).mapInPandas(
        _pq_encode_kernel(cbs, m_subspaces, d_sub),
        "id long, subspace int, code int",
    )


def pq_codes_sql(
    table: str,
    m_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
) -> str:
    """DuckDB mirror: one unrolled distributed_kmeans_sql per subspace
    over the same list slices, UNION ALL with the subspace tag."""
    d_sub = dim // m_subspaces
    parts = []
    for j in range(m_subspaces):
        inner = distributed_kmeans_sql(
            table,
            k=k,
            iters=iters,
            dim=d_sub,
            id_expr=id_expr,
            vec_expr=f"list_slice({vec_expr}, {j * d_sub + 1}, {(j + 1) * d_sub})",
        )
        parts.append(
            f"SELECT id, {j} AS subspace, CAST(cell AS INT) AS code FROM ({inner})"
        )
    return " UNION ALL ".join(parts)


def _kmeans_sql_parts(
    table: str, k: int, iters: int, dim: int, id_expr: str, vec_expr: str, p: str
) -> tuple[list[str], str, str]:
    """distributed_kmeans_sql's CTE chain with a name prefix `p`, also
    exposing the FINAL centroid CTE — so PQ/ADC mirrors can compose one
    k-means per subspace inside a single WITH (names must not collide)
    and look centroid values up by cell. Arithmetic identical to
    distributed_kmeans_sql. Returns (parts, assign_cte, centroid_cte);
    assign_cte yields (id, cell), centroid_cte yields (cell, c)."""
    scale = float(KMEANS_SCALE)
    sq_norm = f"list_sum(list_transform({vec_expr}, x -> x::DOUBLE * x::DOUBLE))"
    corpus = (
        f"SELECT {id_expr} AS id, "
        f"CASE WHEN sqrt({sq_norm}) > 0 "
        f"THEN list_transform({vec_expr}, x -> x::DOUBLE / sqrt({sq_norm})) "
        f"ELSE list_transform({vec_expr}, x -> 0.0) END AS v "
        f"FROM {table}"
    )
    parts = [
        f"{p}corpus AS MATERIALIZED ({corpus})",
        f"{p}qc AS MATERIALIZED (SELECT id, v, "
        f"list_transform(v, x -> CAST(floor(x * {scale} + 0.5) AS BIGINT)) AS q "
        f"FROM {p}corpus)",
        f"{p}c0 AS MATERIALIZED (SELECT rn - 1 AS cell, v AS c FROM "
        f"(SELECT v, row_number() OVER (ORDER BY id) AS rn FROM {p}corpus) "
        f"WHERE rn <= {k})",
    ]
    dot = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> qc.v[i] * ct.c[i]))"
    )
    rdot = f"floor(({dot}) * 1000000000 + 0.5) / 1000000000"
    for t in range(iters):
        parts.append(
            f"{p}a{t} AS MATERIALIZED (SELECT id, cell, q FROM ("
            f"SELECT qc.id, ct.cell, qc.q, "
            f"row_number() OVER (PARTITION BY qc.id ORDER BY {rdot} DESC, ct.cell ASC) AS rn "
            f"FROM {p}qc qc CROSS JOIN {p}c{t} ct) WHERE rn = 1)"
        )
        parts.append(
            f"{p}u{t} AS MATERIALIZED (SELECT a.cell, gs.i, "
            f"(sum(a.q[gs.i])::DOUBLE / count(*)::DOUBLE) / {scale} AS md "
            f"FROM {p}a{t} a CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) gs "
            f"GROUP BY a.cell, gs.i)"
        )
        parts.append(
            f"{p}m{t} AS MATERIALIZED (SELECT cell, list(md ORDER BY i) AS m "
            f"FROM {p}u{t} GROUP BY cell)"
        )
        parts.append(
            f"{p}c{t + 1} AS MATERIALIZED (SELECT pc.cell, "
            f"CASE WHEN n.m IS NOT NULL "
            f"AND sqrt(list_sum(list_transform(n.m, x -> x * x))) > 0 "
            f"THEN list_transform(n.m, x -> x / sqrt(list_sum(list_transform(n.m, y -> y * y)))) "
            f"ELSE pc.c END AS c "
            f"FROM {p}c{t} pc LEFT JOIN {p}m{t} n ON n.cell = pc.cell)"
        )
    parts.append(
        f"{p}assign AS MATERIALIZED (SELECT id, cell FROM ("
        f"SELECT qc.id, ct.cell, "
        f"row_number() OVER (PARTITION BY qc.id ORDER BY {rdot} DESC, ct.cell ASC) AS rn "
        f"FROM {p}qc qc CROSS JOIN {p}c{iters} ct) WHERE rn = 1)"
    )
    return parts, f"{p}assign", f"{p}c{iters}"


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k_top: int = 10,
    m_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _base: DataFrame | None = None,
    _query_pred: Column | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (Jégou et al. 2011) —
    the QUERY half of the IVF+PQ stack: the corpus is represented ONLY
    by its m small codes per vector, and a query scores a candidate as
    Σ_j dot(q_sub_j, codebook_j[code_j]) — the query side stays exact
    ("asymmetric"), the corpus side is quantized.

    Scale shape: codebooks train per subspace with
    distributed_kmeans_fit (corpus never leaves the executors; the
    model — m·k·d_sub floats — lives on the driver), corpus encoding is
    a map-only assignment scan per subspace, and scoring joins the
    broadcast query table against the codes with the per-subspace
    distance table embedded as a LITERAL nested array (k·d_sub doubles)
    — no full vectors move for the corpus side, which is the entire
    point of PQ at 100 TB.

    Determinism: each subspace term is an array-order fold rounded to
    1e-9 and QUANTIZED to integer nanos, so the cross-subspace sum is
    order-free; ranking orders by (nanos DESC, id ASC) — all exact.
    Output: (query_id, neighbor_id, rank, score) with score = the ADC
    similarity rounded to 1e-6; self-matches excluded.

    r8: the per-(corpus row × query) interpreted fold is gone — ADC's
    whole point is that the distance table dot(q_sub, codebook[c])
    depends only on (query, code), so the n_q×k table per subspace is
    computed ONCE driver-side with the ordered-fold numpy kernel
    (bit-identical arithmetic, see functions/arrowfold) and applied as
    a literal lookup. The query set was already broadcast
    (collect-sized by the operator's contract); only the m·n_q·k longs
    of the tables ship back out.

    r12 (guide §2.3/§2.4): the corpus side is PACKED — one
    (id, codes[m]) row per vector instead of m (id, subspace, code)
    rows — and a broadcast nested-loop against the n_q (qid, tables)
    rows computes nanos MAP-SIDE as Σ_j tables[j][codes[j]] (m static
    element_at terms, all integer adds in fixed j order — the same m
    int64 values the old groupBy summed, so bit-identical). That
    removes the m-fold row explosion AND the whole (qid, id) hash
    aggregation exchange: the only shuffle left is the per-query top-k
    window over n·n_q packed rows.
    """
    import numpy as np

    from hogflare_spark.functions.arrowfold import ordered_dots

    spark = corpus.sparkSession
    from hogflare_spark.operators.partitioning import fan_out

    owns_base = _base is None
    base = (
        cached(
            fan_out(
                corpus.select(
                    F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
                )
            )
        )
        if owns_base
        else _base
    )
    cbs = pq_fit_codebooks(
        corpus, m_subspaces, k, iters, id_col, vec_col, _base=base
    )
    if cbs is None:
        return spark.createDataFrame(
            [], "query_id LONG, neighbor_id LONG, rank INT, score DOUBLE"
        )
    d_sub = len(cbs[0][0])

    # corpus side: ONE fused encode scan → (id, codes[m]) packed rows,
    # read from the gate's shared cached working set
    codes = base.mapInPandas(
        _pq_encode_wide_kernel(cbs, m_subspaces, d_sub),
        "id long, codes array<int>",
    )
    # query side: collect once, build ALL m distance tables driver-side
    # (normalization via the same per-subspace ordered fold the corpus
    # kernel uses; floor(dot·1e9 + 0.5) exactly as the Column twin did).
    # _query_pred (r13): when the caller declares the query set as a
    # predicate over the corpus ids, the collect reads the gate's cached
    # working set instead of re-scanning the source — one fewer scan job
    # per gate (guide §1.2/§5); rows identical by construction.
    if _query_pred is not None:
        q_rows = base.where(_query_pred).select(
            F.col("id").alias("qid"), F.col("vec")
        ).collect()
    else:
        q_rows = queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("vec")
        ).collect()
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id LONG, neighbor_id LONG, rank INT, score DOUBLE"
        )
    scale = float(KMEANS_SCALE)
    dt_rows = []
    for r in q_rows:
        nv, _ = _subspace_unit_q(
            [float(x) for x in r["vec"]], m_subspaces, d_sub, scale
        )
        tables = []
        for j in range(m_subspaces):
            tbl = np.floor(
                ordered_dots(
                    np.asarray([nv[j]], dtype=np.float64),
                    np.asarray(cbs[j], dtype=np.float64),
                )[0]
                * 1e9
                + 0.5
            ).astype(np.int64)
            tables.append([int(t) for t in tbl])
        dt_rows.append((int(r["qid"]), tables))
    # one slice: the broadcast build's executeCollect otherwise pays one
    # Python-worker round-trip per default slice (~0.5 s for 40 rows)
    from hogflare_spark.operators.partitioning import one_slice_df

    dt = one_slice_df(spark, dt_rows, "qid long, tables array<array<long>>")
    # broadcast nested-loop: n_q table rows against the packed codes;
    # nanos folds the m lookups map-side in fixed subspace order —
    # integer adds, so identical to the old groupBy-sum of the same m
    # terms — and no aggregation exchange exists at all
    nanos = F.lit(0).cast("long")
    for j in range(m_subspaces):
        nanos = nanos + F.get(
            F.get(F.col("tables"), j), F.get(F.col("codes"), j)
        )
    scored = (
        codes.crossJoin(F.broadcast(dt))
        .where(F.col("id") != F.col("qid"))
        .select("qid", "id", nanos.alias("nanos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("nanos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_top)
        .select(
            F.col("qid").alias("query_id"),
            F.col("id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            (
                F.floor((F.col("nanos") / F.lit(1e9)) * F.lit(1e6) + F.lit(0.5))
                / F.lit(1e6)
            ).alias("score"),
        )
    )


def ivfpq_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k_top: int = 10,
    shortlist: int = 100,
    m_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _query_pred: Column | None = None,
) -> DataFrame:
    """Two-stage ANN, the full FAISS-style IVF+PQ pipeline the ADC recall
    pin points at (tests/test_llm_round7.py: 24-bit codes give ~0.84
    candidate recall@top-100 but only ~0.16 direct top-10 ordering — the
    shortlist is good, the compressed-domain ORDER is not, hence
    rerank): stage 1 takes the top `shortlist` candidates per query in
    the compressed domain (`pq_adc_topk` — corpus moves only as (id,
    subspace, code)); stage 2 reranks ONLY those candidates with exact
    cosine on the full vectors and keeps the top `k_top`.

    Scale shape: the candidate set is |queries|·shortlist ids — it
    BROADCASTS onto the corpus scan, so full vectors are read for
    candidates only (a broadcast semi-join-shaped hash join, no
    shuffle of the corpus); the exact rerank then joins the broadcast
    query vectors and windows per query over ≤shortlist rows. Ranking
    mirrors brute_force_topk: (round9(cos) DESC, neighbor_id ASC).
    Output: (query_id, neighbor_id, rank, sim) with sim rounded to 1e-6.
    """
    # one cached (id, vec) working set serves the codebook trainer's
    # iterated scans, the encode pass, AND the exact-rerank's full-vector
    # read — the parquet is scanned once per gate, not once per stage
    # (r12, guide §5; released at the host's quiescent point like every
    # cache backing a returned frame). fan_out: a single-file corpus
    # otherwise pins the cache — and every consumer, including the
    # nested-loop ADC scoring — at the scan's 1-2 partitions (guide
    # §2.5 input skew; no-op on multi-file corpora at scale).
    from hogflare_spark.operators.partitioning import fan_out

    base = cached(
        fan_out(
            corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        )
    )
    cand = pq_adc_topk(
        queries,
        corpus,
        k_top=shortlist,
        m_subspaces=m_subspaces,
        k=k,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
        _base=base,
        _query_pred=_query_pred,
    ).select("query_id", "neighbor_id")
    cv = base.select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("cv")
    )
    # rerank's query-vector side reads the cached working set too when
    # the query set is a corpus predicate (same rows, one fewer scan)
    qv = (
        base.where(_query_pred).select(
            F.col("id").alias("query_id"), F.col("vec").alias("qv")
        )
        if _query_pred is not None
        else queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    exact = (
        cv.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 9).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_top)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("sim", 6).alias("sim"),
        )
    )


def ivfpq_rerank_topk_sql(
    table: str,
    query_pred: str,
    cos_sql,
    k_top: int = 10,
    shortlist: int = 100,
    m_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
) -> str:
    """DuckDB mirror of ivfpq_rerank_topk: the full pq_adc_topk_sql
    unroll as the candidate subquery, then the same exact-cosine rerank
    as the llm_ann_topk oracle. `cos_sql(a, b)` renders the engine's
    shared cosine SQL fragment (plans/llm_pipeline._cos_sql) so the
    rounding contract stays in one place."""
    inner = pq_adc_topk_sql(
        table,
        query_pred,
        k_top=shortlist,
        m_subspaces=m_subspaces,
        k=k,
        iters=iters,
        dim=dim,
        id_expr=id_expr,
        vec_expr=vec_expr,
    )
    return f"""
    WITH cand AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM ({inner})
    ),
    ex AS (
      SELECT c.query_id, c.neighbor_id,
             round({cos_sql('a.' + vec_expr, 'b.' + vec_expr)}, 9) AS sim
      FROM cand c
      JOIN {table} a ON a.{id_expr} = c.query_id
      JOIN {table} b ON b.{id_expr} = c.neighbor_id
    ),
    r AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM ex
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(sim, 6) AS sim
    FROM r WHERE rank <= {k_top}
    """


def pq_adc_topk_sql(
    table: str,
    query_pred: str,
    k_top: int = 10,
    m_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
) -> str:
    """DuckDB mirror: one prefixed k-means unroll per subspace (codes +
    final centroids), per-subspace nano-quantized ADC terms, order-free
    integer sum, same (nanos DESC, id) ranking."""
    d_sub = dim // m_subspaces
    parts: list[str] = []
    term_selects = []
    for j in range(m_subspaces):
        slice_expr = f"list_slice({vec_expr}, {j * d_sub + 1}, {(j + 1) * d_sub})"
        sub_parts, assign, cents = _kmeans_sql_parts(
            table, k, iters, d_sub, id_expr, slice_expr, p=f"s{j}_"
        )
        parts.extend(sub_parts)
        q_sq = f"list_sum(list_transform({slice_expr}, x -> x::DOUBLE * x::DOUBLE))"
        parts.append(
            f"q{j} AS MATERIALIZED (SELECT {id_expr} AS qid, "
            f"CASE WHEN sqrt({q_sq}) > 0 "
            f"THEN list_transform({slice_expr}, x -> x::DOUBLE / sqrt({q_sq})) "
            f"ELSE list_transform({slice_expr}, x -> 0.0) END AS qv "
            f"FROM {table} WHERE {query_pred})"
        )
        dot = (
            f"list_sum(list_transform(generate_series(1, {d_sub}), "
            f"i -> q.qv[i] * ct.c[i]))"
        )
        term_selects.append(
            f"SELECT q.qid, a.id, "
            f"CAST(floor(({dot}) * 1000000000 + 0.5) AS BIGINT) AS t "
            f"FROM q{j} q CROSS JOIN {assign} a "
            f"JOIN {cents} ct ON ct.cell = a.cell WHERE a.id <> q.qid"
        )
    union = " UNION ALL ".join(term_selects)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
    allt AS MATERIALIZED ({union}),
    sc AS (SELECT qid, id, sum(t) AS nanos FROM allt GROUP BY qid, id),
    r AS (SELECT qid, id, nanos,
          row_number() OVER (PARTITION BY qid ORDER BY nanos DESC, id ASC) AS rank
          FROM sc)
    SELECT qid AS query_id, id AS neighbor_id, CAST(rank AS INT) AS rank,
           floor((nanos / 1000000000.0) * 1000000 + 0.5) / 1000000 AS score
    FROM r WHERE rank <= {k_top}"""
    )
