"""Similarity search over embedding columns (array<float>).

- cosine_expr: JVM-side cosine (zip_with + aggregate) — no Python UDF,
  stays inside whole-stage codegen.
- brute_force_topk: exact top-k; the query side is broadcast (query sets
  are small by construction), so the corpus is scanned once with no
  shuffle — this is the right plan even at 100 TB when |queries| is
  thousands.
- embedding_near_dup_pairs: exact pair join above a cosine threshold.
- lsh_ann_topk: random-hyperplane LSH (Charikar 2002) with multi-probe —
  the scale path: corpus is bucketed by an 8-bit signature, each query
  probes its bucket plus all buckets within hamming distance `probe_dist`,
  and only those candidates are reranked exactly. Candidate volume is
  ~corpus * P(bucket match), tunable via planes/probe_dist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hogflare_spark.functions.hashing import hyperplanes


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
    """
    from hogflare_spark.operators.partitioning import fan_out

    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    )
    scored = (
        c.crossJoin(q)
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


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, sim) for all pairs with cosine >= threshold, id_a < id_b.

    Exact O(n^2) pair join — correct baseline at test scale. The scale
    path is lsh_ann_topk's bucketing: restrict the pair join to matching
    LSH buckets (same mechanism, pair-shaped output).
    """
    from hogflare_spark.operators.partitioning import fan_out

    a = fan_out(df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")))
    b = F.broadcast(df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 9).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


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
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 9).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
