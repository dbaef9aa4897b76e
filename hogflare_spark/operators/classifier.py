"""Distributed linear-probe classifier over an embedding column.

The missing trainer in the LLM curation set: quality-filter pipelines
(CCNet's fastText LM filter, GPT-3/LLaMA-style quality classifiers)
train a small linear model over document features, then score the whole
corpus with it. `linear_probe` is the 100 TB-shaped version of that
training step — CLASS-BALANCED full-batch gradient descent on weighted
least-squares loss, where

  * each iteration is ONE map-only corpus scan plus a single scalar
    aggregate (map-side partial sums of dim+1 quantized gradient
    components) — no shuffle wider than one row of d+1 longs;
  * only the model (d+1 doubles) ever reaches the driver, exactly like
    the distributed k-means trainer (`operators/similarity.
    distributed_kmeans`) and Spark MLlib's own optimizers;
  * the corpus DataFrame is scanned `iters` times, so the normalized
    projection is cached once (tracked operator cache).

Class balancing: a one-vs-rest target is typically heavily imbalanced
(one class of many), and unweighted least squares then converges to
scores centered at the base rate — a 0.5 decision threshold degenerates
to the constant-negative classifier. Rows are therefore weighted
u = n/(2·n_pos) resp. n/(2·n_neg), which recenters the two class means
around 0.5 and makes the standard `score >= 0.5` decision meaningful.
(With a single positive among n rows the weight reaches n/2 — at that
pathological imbalance shrink PROBE_SCALE or subsample negatives; at
any realistic class share the quantized sums sit far below int64.)

Cross-engine determinism (the DuckDB oracle unrolls the identical
iterations relationally, the same recipe the k-means gate proved out):

  * inputs are L2-normalized with an array-order fold (unit_vec_expr)
    and a constant bias component 1.0 is appended;
  * the margin dot(w, x) folds in array order and is rounded to 9
    decimals (floor-based) before use, so a last-bit fold difference
    cannot leak into the model;
  * the class weights are single correctly-rounded divides of exact
    integer counts — identical in Python and SQL;
  * each row's gradient contribution ((margin - y)·u)·x[i] is quantized
    to floor(g * 2^20 + 0.5) as a 64-bit int — the distributed sum is
    exact and ORDER-FREE, which is what makes the trained model
    independent of partitioning, task scheduling, and engine;
  * the weight update w[i] - lr * ((sum / n) / 2^20) is the same IEEE
    op sequence on both sides (sums stay far below 2^53, so the
    int→double conversions are exact);
  * lr defaults to 1.5 (an exact binary fraction). With unit-norm
    inputs, bias, and mean-one class weights the weighted-loss Hessian
    spectral norm is ~1, so lr < 2 is in the guaranteed-stable region
    for full-batch GD.

The reference engine has no model-training operator (its quality gates
are heuristic expressions); this extends the pipeline set the same way
distributed_kmeans does on the clustering side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hogflare_spark.functions.caching import cached, release
from hogflare_spark.operators.similarity import unit_vec_expr

# fixed-point quantum for the gradient-component sums; per-row |g| is
# bounded by the class weight (~1 for balanced data), so sums overflow
# int64 only past ~2^42 weighted rows per aggregate — and the quantum is
# a power of two, so the final /2^20 rescale is exact.
PROBE_SCALE = 1 << 20


def _rounded_margin(x, w: list[float]):
    """round9(dot(x, w)) with an array-order fold — the same op sequence
    as the oracle's list_sum over generate_series."""
    dot = F.aggregate(
        F.zip_with(x, F.array(*[F.lit(float(v)) for v in w]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.floor(dot * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def linear_probe(
    df: DataFrame,
    target_label: int,
    iters: int = 12,
    lr: float = 1.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Train a one-vs-rest linear probe (y = 1 when label == target_label)
    by `iters` class-balanced full-batch GD steps, then score every row
    with the final model. Output: (id, score, predicted) where
    score = round9(dot(w, x)) and predicted = score >= 0.5.
    """
    base = cached(
        df.select(
            F.col(id_col).alias("id"),
            F.concat(unit_vec_expr(F.col(vec_col)), F.array(F.lit(1.0))).alias("x"),
            F.when(F.col(label_col) == F.lit(target_label), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
        )
    )
    # Arrow-tier inner loop (r7 verdict #2): each GD step is one
    # mapInPandas scan that computes the ordered-fold margins in numpy
    # (bit-identical to the former _rounded_margin Column — see
    # functions/arrowfold) and pre-sums the quantized gradient
    # components per batch; only one (da,)-long int64 row per Arrow
    # batch leaves Python, collapsed exactly driver-side (int sums are
    # order-free). The whole fit — including the empty-input early
    # return — sits in one try/finally so the per-fit working set is
    # always released inline (hosts that skip the global unpersist_all
    # drain would otherwise accumulate one cached frame per fit).
    try:
        counts = base.agg(
            F.count("*").alias("n"),
            # sum() is NULL on zero rows — coalesce so the empty-input
            # early return below is actually reachable
            F.coalesce(F.sum(F.col("y").cast("long")), F.lit(0)).alias("npos"),
        ).collect()[0]
        n, npos = int(counts["n"]), int(counts["npos"])
        if n == 0:
            return base.select(
                "id", F.lit(0.0).alias("score"), F.lit(False).alias("predicted")
            )
        da = int(base.select(F.size("x").alias("da")).first()["da"])
        # class-balance weights: exact-int divides, identical in the oracle
        u_pos = n / (2 * npos) if npos else 0.0
        u_neg = n / (2 * (n - npos)) if n > npos else 0.0
        w = [0.0] * da
        scale = float(PROBE_SCALE)

        for _ in range(iters):
            partials = base.mapInPandas(
                _probe_grad_kernel(w, u_pos, u_neg, scale, da),
                "s array<long>",
            ).collect()
            sums = [0] * da
            for r in partials:
                sums = [a + b for a, b in zip(sums, r["s"])]
            # d+1 scalars — the model update, never the data
            w = [w[i] - lr * ((sums[i] / n) / scale) for i in range(da)]

        scored = base.mapInPandas(_probe_score_kernel(w), "id long, score double")
        return scored.select(
            "id", "score", (F.col("score") >= F.lit(0.5)).alias("predicted")
        )
    finally:
        release(base)


def _probe_grad_kernel(
    w: list[float], u_pos: float, u_neg: float, scale: float, da: int
):
    """mapInPandas kernel for one GD step: margin = round9(ordered dot),
    rw = (margin - y) · class weight, then the per-batch exact int64 sums
    of floor(rw · x_i · scale + 0.5) — the same op sequence as the former
    Column expressions, vectorized."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        from hogflare_spark.functions.arrowfold import ordered_dots, round9

        wv = np.asarray([w], dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            y = pdf["y"].to_numpy(dtype=np.float64)
            margin = round9(ordered_dots(x, wv))[:, 0]
            rw = (margin - y) * np.where(y == 1.0, u_pos, u_neg)
            g = np.floor((rw[:, None] * x) * scale + 0.5).astype(np.int64)
            yield pd.DataFrame({"s": [g.sum(axis=0).tolist()]})

    return fn


def _probe_score_kernel(w: list[float]):
    """mapInPandas kernel: (id, x, y) batches → (id, round9(dot(x, w)))."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        from hogflare_spark.functions.arrowfold import ordered_dots, round9

        wv = np.asarray([w], dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "score": round9(ordered_dots(x, wv))[:, 0],
                }
            )

    return fn


def linear_probe_sql(
    table: str,
    target_label: int,
    iters: int = 12,
    lr: float = 1.5,
    dim: int = 64,
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
    label_expr: str = "label",
) -> str:
    """DuckDB mirror of linear_probe: the same normalize / balance /
    margin-round / quantize / update arithmetic, each GD iteration
    unrolled into a CTE pair (per-dim quantized gradient sums + the
    weight-list update). Every CTE is MATERIALIZED: DuckDB inlines plain
    CTEs per reference, and the w-chain references each w{t} twice, so
    without materialization the unrolled plan expands 2^iters times."""
    da = dim + 1
    scale = float(PROBE_SCALE)
    sq_norm = f"list_sum(list_transform({vec_expr}, x -> x::DOUBLE * x::DOUBLE))"
    unit = (
        f"CASE WHEN sqrt({sq_norm}) > 0 "
        f"THEN list_transform({vec_expr}, x -> x::DOUBLE / sqrt({sq_norm})) "
        f"ELSE list_transform({vec_expr}, x -> 0.0) END"
    )
    parts = [
        f"corpus AS MATERIALIZED (SELECT {id_expr} AS id, "
        f"list_concat({unit}, [1.0]) AS x, "
        f"CASE WHEN {label_expr} = {target_label} THEN 1.0 ELSE 0.0 END AS y "
        f"FROM {table})",
        # exact-int class counts -> the same two correctly-rounded divides
        "bal AS MATERIALIZED (SELECT count(*) AS n, "
        "CASE WHEN sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) > 0 THEN "
        "count(*)::DOUBLE / (2 * sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END))::DOUBLE "
        "ELSE 0.0 END AS u_pos, "
        "CASE WHEN sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) > 0 THEN "
        "count(*)::DOUBLE / (2 * sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END))::DOUBLE "
        "ELSE 0.0 END AS u_neg FROM corpus)",
        f"w0 AS MATERIALIZED (SELECT list_transform(generate_series(1, {da}), i -> 0.0) AS w)",
    ]
    dot = f"list_sum(list_transform(generate_series(1, {da}), i -> c.x[i] * w.w[i]))"
    rdot = f"floor(({dot}) * 1000000000 + 0.5) / 1000000000"
    for t in range(iters):
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT c.id, c.x, "
            f"(({rdot}) - c.y) * (CASE WHEN c.y = 1.0 THEN b.u_pos ELSE b.u_neg END) "
            f"AS rw FROM corpus c CROSS JOIN w{t} w CROSS JOIN bal b)"
        )
        parts.append(
            f"u{t} AS MATERIALIZED (SELECT gs.i, "
            f"sum(CAST(floor((m.rw * m.x[gs.i]) * {scale} + 0.5) AS BIGINT)) AS s "
            f"FROM m{t} m CROSS JOIN "
            f"(SELECT unnest(generate_series(1, {da})) AS i) gs GROUP BY gs.i)"
        )
        parts.append(
            f"w{t + 1} AS MATERIALIZED (SELECT list("
            f"w.w[u.i] - {lr} * ((u.s::DOUBLE / b.n::DOUBLE) / {scale}) "
            f"ORDER BY u.i) AS w FROM u{t} u CROSS JOIN w{t} w CROSS JOIN bal b)"
        )
    final = (
        f"SELECT c.id, {rdot} AS score, ({rdot}) >= 0.5 AS predicted "
        f"FROM corpus c CROSS JOIN w{iters} w"
    )
    return "WITH " + ",\n".join(parts) + "\n" + final
