"""Distributed BPE merge training over a tokenized corpus.

The tokenizer-training step of an LLM data pipeline, shaped for Spark
the way `distributed_kmeans` shapes clustering: byte-pair encoding
(Sennrich et al. 2016) learns a merge table by repeatedly (1) counting
adjacent token pairs over the whole corpus and (2) merging every
occurrence of the most frequent pair. Here the atoms are whitespace
tokens (the corpus-scale variant — merges learn multi-word units; the
algorithm is identical to character BPE, only the atom alphabet
differs).

Spark execution shape, per merge step:
  * pair counting is one window `lead` over (doc, pos) — the corpus is
    hash-partitioned by doc id ONCE, so the window sorts within
    partitions without further exchange — plus one map-side-partial
    groupBy whose output is vocabulary-pair-bounded;
  * exactly ONE row (the argmax pair) reaches the driver per step;
  * the merge applies as a pure windowed projection (match marks, a
    greedy-parity filter, a renumber) — no shuffle, no Python;
  * each state is cached (tracked) so the next step reads materialized
    blocks whose id-partitioning and ordering the planner can see — a
    localCheckpoint would report UnknownPartitioning and re-shuffle the
    corpus every step (caught in the plan audit, PLANS.md).

Greedy merge semantics, engine-independent by construction:
  * the winning pair is (count DESC, left ASC, right ASC) — exact
    BIGINT counts with a lexical tiebreak, no floats anywhere;
  * occurrences merge left-to-right without overlap. Overlap only
    happens for self-pairs (a,a): within each maximal chain of
    consecutive matches, greedy keeps the 1st, 3rd, 5th... match —
    expressed as a row-number parity over (doc, chain). Non-self pairs
    cannot have adjacent matches (the right atom would have to equal
    the left atom), so the same parity expression is a no-op for them
    and ONE code path serves both cases.
  * pair counting counts every adjacent occurrence (including the
    overlapping self-pair occurrences), exactly like the reference
    implementation of Sennrich et al.; only the APPLY step is greedy.

The DuckDB oracle unrolls the identical steps relationally (every CTE
MATERIALIZED — the state chain references each s{t} twice, and plain
CTEs inline per reference, the 2^iters blowup the linear-probe oracle
documented).

Output: one row per learned merge, (step, left, right, merged, cnt) —
the trained artifact, like k-means' centroids; `bpe_segment` applies a
learned table to new text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hogflare_spark.functions import text as T

MERGE_JOIN = " "  # merged token = left || " " || right (reversible)


def _explode_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(T.tokens(F.col(text_col))).alias("pos", "tok"),
    )


def _merge_step(state: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one merge (left, right) greedily to (id, pos, tok)."""
    w = Window.partitionBy("id").orderBy("pos")
    m = state.select(
        "id",
        "pos",
        "tok",
        (
            (F.col("tok") == F.lit(left))
            & (F.lead("tok").over(w) == F.lit(right))
        ).alias("match"),
    )
    # chain id: consecutive match positions group together; greedy keeps
    # odd row numbers within each (id, chain)
    wm = Window.partitionBy("id", "match").orderBy("pos")
    m = m.select(
        "id",
        "pos",
        "tok",
        "match",
        (F.col("pos") - F.row_number().over(wm)).alias("_chain"),
    )
    wc = Window.partitionBy("id", "match", "_chain").orderBy("pos")
    m = m.select(
        "id",
        "pos",
        "tok",
        (F.col("match") & (F.row_number().over(wc) % 2 == 1)).alias("_merged"),
    )
    w2 = Window.partitionBy("id").orderBy("pos")
    m = m.select(
        "id",
        "pos",
        F.when(F.col("_merged"), F.lit(left + MERGE_JOIN + right))
        .otherwise(F.col("tok"))
        .alias("tok"),
        F.coalesce(F.lag("_merged").over(w2), F.lit(False)).alias("_consumed"),
    )
    return m.where(~F.col("_consumed")).select(
        "id",
        (F.row_number().over(Window.partitionBy("id").orderBy("pos")) - 1).alias(
            "pos"
        ),
        "tok",
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    w = Window.partitionBy("id").orderBy("pos")
    return (
        state.select(
            F.col("tok").alias("l"), F.lead("tok").over(w).alias("r")
        )
        .where(F.col("r").isNotNull())
        .groupBy("l", "r")
        .agg(F.count("*").alias("cnt"))
    )


def _recut_lineage(state: DataFrame, n_part: int) -> DataFrame:
    """Truncate the logical plan AND the RDD lineage of an iterated state,
    then re-establish the id hash-partitioning + (id, pos) ordering the
    exchange-free windows depend on. Each `_merge_step` stacks five
    window nodes on the analyzed plan; caching caps the PHYSICAL cost but
    the analyzer still walks the whole chain every step, so past a few
    hundred merges planning time (and eventually driver stack) dominates.
    localCheckpoint materializes the current blocks and replaces the plan
    with a flat LogicalRDD — which reports UnknownPartitioning, hence the
    explicit repartition+sort right after (ONE bounded exchange per K
    steps, amortized away by K). On a multi-executor cluster prefer a
    reliable `checkpoint()` dir: localCheckpoint blocks die with their
    executor."""
    return (
        state.localCheckpoint(eager=True)
        .repartition(n_part, "id")
        .sortWithinPartitions("id", "pos")
    )


TRAIN_SAMPLE_SALT = "bpe-train-sample:"


def bpe_train_merges(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_merges: int = 5,
    checkpoint_every: int = 16,
    sample_docs: int | None = None,
) -> DataFrame:
    """Learn the top `n_merges` BPE merges. Returns (step, left, right,
    merged, cnt) — step is 1-based learning order. Every
    `checkpoint_every` merges the state re-materializes through
    `_recut_lineage` so plan depth stays bounded at any n_merges (r7
    verdict #3); the cadence does not change results, pinned by
    tests/test_llm_round7.py.

    `sample_docs` (r8 verdict #3): train on the `sample_docs` documents
    with the lowest (h60(salt || id), id) rank instead of the full
    corpus. Exact BPE training is inherently sequential — one argmax job
    pair per merge — so a production 32k-merge vocab over the FULL
    corpus means ~64k sequential Spark jobs touching every block; the
    standard practice is to train the tokenizer on a bounded sample
    (merge quality converges long before corpus-scale counts) and apply
    the merge table corpus-wide via `bpe_segment`, which already takes
    any merge table. The sample is a deterministic uniform draw (same
    h60 device as stratified_sample: content-derived, engine- and
    partitioning-independent, id tiebreak), so sampled training is
    exactly reproducible and oracle-replayable. With the sample bounded,
    each per-merge job reads a fixed-size state regardless of corpus
    growth — the job COUNT stays linear in n_merges but the per-job cost
    stops scaling with the corpus."""
    from hogflare_spark.functions.caching import cached, release

    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every!r}"
        )
    if sample_docs is not None:
        if sample_docs < 1:
            raise ValueError(f"sample_docs must be >= 1, got {sample_docs!r}")
        from hogflare_spark.functions.hashing import h60

        rk = Window.orderBy(
            h60(
                F.concat(F.lit(TRAIN_SAMPLE_SALT), F.col(id_col).cast("string"))
            ).asc(),
            F.col(id_col).asc(),
        )
        # one global rank over doc ids (not tokens) — #docs rows through
        # one reducer, bounded and off the per-merge critical path
        df = (
            df.withColumn("_bpe_rk", F.row_number().over(rk))
            .where(F.col("_bpe_rk") <= sample_docs)
            .drop("_bpe_rk")
        )

    from hogflare_spark.operators.partitioning import adaptive_partitions

    spark = df.sparkSession
    # State partitioning is derived from the input size (guide §2), not
    # the session constant: every per-merge job pays task-launch + cache
    # read per partition, so a toy corpus on 32 partitions is pure
    # machinery, while a large corpus hits the parallelism cap — the
    # old behavior. The estimate uses UNCOMPRESSED bytes: the loop is
    # CPU-bound window compute over exploded tokens, and on-disk bytes
    # under-count that work exactly when text compresses well (the
    # replicated sf1 probe: 10x rows, 1.5x on-disk, 11.5x uncompressed
    # — sizing from on-disk bytes left the 10x state on the sf0.1
    # partition count and measured 12.1 s vs 8.2 s at the cap). x4:
    # exploded (id, pos, tok) rows outgrow the raw text by about that
    # factor. The 2 MB/partition target is pinned by a two-point A/B:
    # sf0.1 (1.6 MB raw) optimum 8 partitions — 2-partition runs 5.8 s
    # (window compute serialized), 8-16 at 3.2-3.5 s, 32 at 4.0 s — and
    # sf1 (18 MB raw) optimum at the 32-way cap (8.2 s vs 9.4 at 16,
    # 12.1 at 8); both land where measured, and any production corpus
    # saturates the cap.
    n_part = adaptive_partitions(
        df,
        bytes_per_partition=2 * 1024 * 1024,
        expansion=4.0,
        floor=8,
        uncompressed=True,
    )
    # cache (not localCheckpoint): InMemoryRelation PRESERVES the id
    # hash-partitioning and (id, pos) ordering, so every window in the
    # loop below runs exchange-free — a checkpointed RDD reports
    # UnknownPartitioning and every step would re-shuffle the corpus
    # (observed in .explain before this was changed). All intermediate
    # windows cluster on supersets of {id}, which HashPartitioning(id)
    # already satisfies. The K-step lineage recut above bounds the
    # logical-plan depth.
    state = cached(
        _explode_tokens(df, text_col, id_col)
        .repartition(n_part, "id")
        .sortWithinPartitions("id", "pos")
    )
    # No standalone materialization action: the first job that touches
    # `state` (the step-1 pair count) fills the cache. Each iteration
    # releases the PREVIOUS state only after the pair-count job has
    # materialized the current one — same lifetime discipline as the old
    # count()-then-release, one fewer Spark job per merge (r12, guide
    # §1.2: the per-step cost at any scale is job machinery; the counts
    # added nothing the next action would not compute anyway).
    prev: DataFrame | None = None
    out = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if prev is not None:
            release(prev)
            prev = None
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        out.append((step, left, right, left + MERGE_JOIN + right, cnt))
        if step < n_merges:
            prev = state
            nxt = _merge_step(state, left, right)
            if step % checkpoint_every == 0:
                nxt = _recut_lineage(nxt, n_part)
            state = cached(nxt)
    from hogflare_spark.operators.partitioning import one_slice_df

    # n_merges driver-side rows: one slice, so the consumer's collect /
    # broadcast pays one Python round-trip instead of one per core
    return one_slice_df(
        spark, out, "step INT, left STRING, right STRING, merged STRING, cnt BIGINT"
    )


def bpe_segment(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges,
    checkpoint_every: int = 16,
) -> DataFrame:
    """Apply a learned merge table (iterable of (left, right) in learning
    order) to a corpus: the tokenize-at-inference step. Returns
    (doc_id, tokens array<string>) with merged units space-joined.
    Like training, the plan re-materializes through `_recut_lineage`
    every `checkpoint_every` merges — a large merge table would
    otherwise stack 5·|merges| window nodes into one analyzed plan."""
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every!r}"
        )
    n_part = df.sparkSession.sparkContext.defaultParallelism
    state = _explode_tokens(df, text_col, id_col)
    for i, (left, right) in enumerate(merges, start=1):
        state = _merge_step(state, left, right)
        if i % checkpoint_every == 0:
            state = _recut_lineage(state, n_part)
    return (
        state.groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ).alias("tokens")
        )
        .select(F.col("id").alias("doc_id"), "tokens")
    )


def bpe_train_merges_sql(
    table: str, text_expr: str, id_expr: str, n_merges: int = 5
) -> str:
    """DuckDB mirror: the identical count / argmax / greedy-apply steps,
    unrolled with MATERIALIZED CTEs."""
    tok = T.tokens_sql(text_expr)
    parts = [
        # zipped unnests: generate_series(1, len) pairs 1:1 with the
        # token list, DuckDB's positional-explode idiom
        f"s0 AS MATERIALIZED (SELECT id, "
        f"unnest(generate_series(1, len(tok))) - 1 AS pos, "
        f"unnest(tok) AS tok FROM "
        f"(SELECT {id_expr} AS id, {tok} AS tok FROM {table}))"
    ]
    for t in range(n_merges):
        parts.append(
            f"pc{t} AS MATERIALIZED (SELECT l, r, count(*) AS cnt FROM ("
            f"SELECT tok AS l, lead(tok) OVER (PARTITION BY id ORDER BY pos) AS r "
            f"FROM s{t}) WHERE r IS NOT NULL GROUP BY l, r)"
        )
        parts.append(
            f"top{t} AS MATERIALIZED (SELECT {t + 1} AS step, l, r, cnt "
            f"FROM pc{t} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)"
        )
        if t + 1 < n_merges:
            parts.append(
                f"m{t} AS MATERIALIZED (SELECT id, pos, tok, "
                f"(tok = (SELECT l FROM top{t}) AND "
                f"lead(tok) OVER (PARTITION BY id ORDER BY pos) = "
                f"(SELECT r FROM top{t})) AS match FROM s{t})"
            )
            parts.append(
                f"c{t} AS MATERIALIZED (SELECT id, pos, tok, match, "
                f"pos - row_number() OVER (PARTITION BY id, match ORDER BY pos) "
                f"AS chain FROM m{t})"
            )
            parts.append(
                f"g{t} AS MATERIALIZED (SELECT id, pos, tok, "
                f"(match AND (row_number() OVER "
                f"(PARTITION BY id, match, chain ORDER BY pos) % 2 = 1)) "
                f"AS merged FROM c{t})"
            )
            parts.append(
                f"f{t} AS MATERIALIZED (SELECT id, pos, "
                f"CASE WHEN merged THEN "
                f"(SELECT l FROM top{t}) || '{MERGE_JOIN}' || (SELECT r FROM top{t}) "
                f"ELSE tok END AS tok, "
                f"coalesce(lag(merged) OVER (PARTITION BY id ORDER BY pos), FALSE) "
                f"AS consumed FROM g{t})"
            )
            parts.append(
                f"s{t + 1} AS MATERIALIZED (SELECT id, "
                f"row_number() OVER (PARTITION BY id ORDER BY pos) - 1 AS pos, tok "
                f"FROM f{t} WHERE NOT consumed)"
            )
    union = " UNION ALL ".join(f"SELECT * FROM top{t}" for t in range(n_merges))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT step, l AS left, r AS right, "
        f"l || '{MERGE_JOIN}' || r AS merged, cnt FROM ({union})"
    )


def bpe_segment_corpus_sql(
    table: str, text_expr: str, id_expr: str, n_merges: int = 5
) -> str:
    """DuckDB mirror of train-then-segment: the same unrolled greedy
    steps, but with every merge applied (including the last) and the
    final state re-assembled per document. The token list is joined with
    the 0x1f unit separator into ONE string so the hash gate compares a
    scalar, not an engine-specific array encoding."""
    tok = T.tokens_sql(text_expr)
    parts = [
        f"s0 AS MATERIALIZED (SELECT id, "
        f"unnest(generate_series(1, len(tok))) - 1 AS pos, "
        f"unnest(tok) AS tok FROM "
        f"(SELECT {id_expr} AS id, {tok} AS tok FROM {table}))"
    ]
    for t in range(n_merges):
        parts.append(
            f"pc{t} AS MATERIALIZED (SELECT l, r, count(*) AS cnt FROM ("
            f"SELECT tok AS l, lead(tok) OVER (PARTITION BY id ORDER BY pos) AS r "
            f"FROM s{t}) WHERE r IS NOT NULL GROUP BY l, r)"
        )
        parts.append(
            f"top{t} AS MATERIALIZED (SELECT l, r FROM pc{t} "
            f"ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)"
        )
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT id, pos, tok, "
            f"(tok = (SELECT l FROM top{t}) AND "
            f"lead(tok) OVER (PARTITION BY id ORDER BY pos) = "
            f"(SELECT r FROM top{t})) AS match FROM s{t})"
        )
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT id, pos, tok, match, "
            f"pos - row_number() OVER (PARTITION BY id, match ORDER BY pos) "
            f"AS chain FROM m{t})"
        )
        parts.append(
            f"g{t} AS MATERIALIZED (SELECT id, pos, tok, "
            f"(match AND (row_number() OVER "
            f"(PARTITION BY id, match, chain ORDER BY pos) % 2 = 1)) "
            f"AS merged FROM c{t})"
        )
        parts.append(
            f"f{t} AS MATERIALIZED (SELECT id, pos, "
            f"CASE WHEN merged THEN "
            f"(SELECT l FROM top{t}) || '{MERGE_JOIN}' || (SELECT r FROM top{t}) "
            f"ELSE tok END AS tok, "
            f"coalesce(lag(merged) OVER (PARTITION BY id ORDER BY pos), FALSE) "
            f"AS consumed FROM g{t})"
        )
        parts.append(
            f"s{t + 1} AS MATERIALIZED (SELECT id, "
            f"row_number() OVER (PARTITION BY id ORDER BY pos) - 1 AS pos, tok "
            f"FROM f{t} WHERE NOT consumed)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id AS doc_id, count(*) AS n_units, "
        f"array_to_string(list(tok ORDER BY pos), chr(31)) AS segmented "
        f"FROM s{n_merges} GROUP BY id"
    )


def bpe_segment_corpus(
    df: DataFrame, text_col: str, id_col: str, n_merges: int = 5
) -> DataFrame:
    """Train `n_merges` merges on the corpus, then segment the corpus
    with them. Output: (doc_id, n_units, segmented) where segmented is
    the 0x1f-joined unit string (scalar, hash-gate-safe)."""
    merges = [
        (r["left"], r["right"])
        for r in sorted(
            bpe_train_merges(df, text_col, id_col, n_merges).collect(),
            key=lambda r: r["step"],
        )
    ]
    seg = bpe_segment(df, text_col, id_col, merges)
    return seg.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_units"),
        F.concat_ws("\x1f", F.col("tokens")).alias("segmented"),
    )
