"""Deduplication operators for large-scale training-data pipelines.

Four families, all oracle-checkable (plans/llm_pipeline.py):

- exact:  content-hash groupBy — one shuffle on a 60-bit md5 key.
- MinHash + LSH banding: per-row signatures (no shuffle), band-bucket
  self-join for candidates, exact-Jaccard verify. The standard
  shingle→minhash→band→bucket-join pipeline (Broder 1997; MMDS §3.4).
- SimHash: per-row 32-bit sketch (Charikar 2002), bucket by sketch.
- embedding cosine near-dup: see operators/similarity.py.

Scale notes (100 TB): signature computation is embarrassingly parallel
inside the scan projection. The only shuffles are (1) the band-key
candidate join — band keys are high-entropy so the shuffle is uniform;
a pathological bucket (thousands of identical docs) is capped by
`max_bucket` to bound the quadratic pair blowup, with exact dedup
upstream removing identical payloads first — and (2) the verify join,
which is |candidate pairs| sized, tiny next to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hogflare_spark.functions import text as T
from hogflare_spark.functions.hashing import h60
from hogflare_spark.functions.caching import cached

# Default LSH geometry: 32 perms as 8 bands x 4 rows -> ~0.59 Jaccard
# threshold knee; catches everything >= 0.8 with near-certain recall and
# the verify join discards the rest.
NUM_PERM = 32
BANDS = 8
ROWS_PER_BAND = 4
SHINGLE_K = 3


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per exact content hash.

    Returns (id, content_hash, group_size, is_keeper) for every row, so
    callers can either filter keepers or audit duplicate groups.
    """
    hashed = df.select(
        F.col(id_col).alias("id"), h60(F.col(content_col)).alias("content_hash")
    )
    groups = hashed.groupBy("content_hash").agg(
        F.min("id").alias("keeper_id"), F.count("*").alias("group_size")
    )
    return hashed.join(groups, "content_hash").select(
        "id",
        "content_hash",
        "group_size",
        (F.col("id") == F.col("keeper_id")).alias("is_keeper"),
    )


def with_shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int = SHINGLE_K
) -> DataFrame:
    """(id, shingle_hashes) — the per-row, shuffle-free sketch input.

    fan_out parallelizes the CPU-heavy sketching when the source is a
    single-split file (no-op on well-partitioned inputs).
    """
    from hogflare_spark.operators.partitioning import fan_out

    df = fan_out(df.select(id_col, text_col))
    return df.select(
        F.col(id_col).alias("id"),
        # array_distinct: the hash array must be a true set so that the
        # inverted-index shared-count in ngram_jaccard_pairs equals the
        # set intersection size even under (rare) 31-bit collisions.
        F.array_distinct(
            T.shingle_hashes(T.shingles(T.tokens(F.col(text_col)), k))
        ).alias("hs"),
    )


def minhash_candidate_pairs(
    sketched: DataFrame,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
    max_bucket: int = 1000,
) -> DataFrame:
    """LSH banding: (id_a, id_b) candidate pairs, id_a < id_b, distinct.

    One shuffle on band keys; buckets larger than `max_bucket` are dropped
    (they are exact-dup clusters a preceding exact_dedup pass should have
    collapsed; dropping bounds the quadratic join).
    """
    sig = sketched.select(
        "id", T.band_keys(T.minhash_signature(F.col("hs"), num_perm), bands, rows).alias("bk")
    )
    # cache the exploded band keys: the groupBy and both sides of the
    # candidate self-join would otherwise each re-inline (and re-codegen —
    # seconds of Janino time per stage) the full signature expression
    buckets = cached(sig.select("id", F.explode("bk").alias("band_key")))
    small = (
        buckets.groupBy("band_key")
        .agg(F.collect_list("id").alias("ids"), F.count("*").alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_bucket))
    )
    a = buckets.join(small.select("band_key"), "band_key")
    b = a.select(F.col("band_key"), F.col("id").alias("id_b"))
    return (
        a.join(b, "band_key")
        .where(F.col("id") < F.col("id_b"))
        .select(F.col("id").alias("id_a"), F.col("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = SHINGLE_K,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
) -> DataFrame:
    """Full pipeline: (id_a, id_b, jaccard) for pairs >= threshold.

    Candidates come from LSH; the verify join recomputes exact shingle
    Jaccard so the output has no false positives (false negatives are
    pairs whose 8x4 bands all missed — probability (1-j^4)^8, < 1e-4 at
    j >= 0.8 with the default geometry).
    """
    sketched = cached(with_shingle_hashes(df, text_col, id_col, k))
    cands = minhash_candidate_pairs(sketched, num_perm, bands, rows)
    verified = (
        cands.join(sketched.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(sketched.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .select("id_a", "id_b", T.jaccard(F.col("hs_a"), F.col("hs_b")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    return verified


def dedup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = SHINGLE_K,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
) -> DataFrame:
    """Cluster assignment: every row → (id, cluster_id, is_canonical).

    The step after pair detection in a real dedup pipeline: near-dup
    PAIRS are not directly actionable (near-dup is not transitive —
    A~B, B~C does not imply A~C, but all three must still collapse to
    one kept document), so pairs become edges of a similarity graph and
    each connected component keeps exactly one canonical row (min id).
    Docs with no near-dup stay their own singleton cluster.

    Scale shape: the edge set is |near-dup pairs| — tiny next to the
    corpus — so the iterative CC fixpoint (operators/identity.py, the
    same min-label + pointer-jumping loop the person identity graph
    uses) runs over a frame orders of magnitude smaller than the input;
    the corpus itself is touched once by the sketching scan and once by
    the final broadcast-able label join.
    """
    from hogflare_spark.operators.identity import connected_components

    pairs = minhash_near_dup_pairs(
        df, text_col, id_col, threshold, k, num_perm, bands, rows
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = connected_components(edges).withColumnRenamed("id", "member_id")
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(labels, F.col("id") == F.col("member_id"), "left").select(
        "id",
        F.coalesce("comp", "id").alias("cluster_id"),
        (F.col("id") == F.coalesce("comp", "id")).alias("is_canonical"),
    )


def contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    k: int = SHINGLE_K,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per-corpus-doc n-gram overlap with an
    evaluation/benchmark corpus → (id, n_shingles, contaminated,
    contamination_frac, is_contaminated).

    The training-data hygiene step: a document whose k-gram set overlaps
    a benchmark set above `threshold` leaks evaluation data into
    training and must be dropped. Overlap is counted against the UNION
    of benchmark shingles (doc-level attribution of which benchmark doc
    matched is not needed to make the drop decision).

    Scale shape: the benchmark side is small by definition (eval sets),
    so its distinct shingle set is broadcast by default — the corpus is
    touched by one sketching scan and the postings probe is a
    broadcast-hash join, no corpus-sized shuffle. `broadcast_benchmark`
    is a HARD hint (it overrides autoBroadcastJoinThreshold, it does not
    fall back): for a benchmark whose shingle set would not fit in
    executor memory, pass False to let the planner pick a shuffled join
    on the shingle key instead.
    """
    corpus_sk = with_shingle_hashes(df, text_col, id_col, k)
    bench_shingles = (
        with_shingle_hashes(benchmark, text_col, id_col, k)
        .select(F.explode("hs").alias("sh"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_shingles = F.broadcast(bench_shingles)
    postings = corpus_sk.select(
        "id", F.size("hs").cast("long").alias("n_shingles"), F.explode("hs").alias("sh")
    )
    hits = (
        postings.join(bench_shingles, "sh")
        .groupBy("id")
        .agg(F.count("*").alias("contaminated"))
    )
    frac = F.when(
        F.col("n_shingles") > 0,
        F.col("contaminated").cast("double") / F.col("n_shingles"),
    ).otherwise(F.lit(0.0))
    return (
        corpus_sk.select("id", F.size("hs").cast("long").alias("n_shingles"))
        .join(hits, "id", "left")
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(0)).cast("long"))
        .select(
            "id",
            "n_shingles",
            "contaminated",
            frac.alias("contamination_frac"),
            (frac >= F.lit(threshold)).alias("is_contaminated"),
        )
    )


def substring_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_tokens: int = 8,
    max_posting: int = 1000,
) -> DataFrame:
    """Exact-substring overlap: (id_a, id_b, shared_windows, overlap_frac)
    for document pairs sharing at least one exact `window_tokens`-token
    run — the pair-detection half of exact-substring deduplication
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"), which flags verbatim copying that set-similarity measures
    dilute (a long doc embedding one copied paragraph has low Jaccard
    but is still a training-data duplicate).

    A W-token window IS a W-shingle, so the sketch input reuses
    with_shingle_hashes; pairs come from an inverted index on window
    hashes (no cross join). `overlap_frac` = shared / min(|A|, |B|)
    distinct windows — 1.0 when the shorter doc is entirely contained.

    Scale shape: one shuffle on the window hash. Posting lists longer
    than `max_posting` are dropped before the pair join — at corpus
    scale those are boilerplate runs (headers, license blocks) whose
    quadratic pair set is noise for dedup purposes; the cap bounds the
    join exactly like minhash's `max_bucket`.
    """
    sk = cached(with_shingle_hashes(df, text_col, id_col, k=window_tokens))
    sized = sk.select("id", F.size("hs").alias("sz"))
    postings = sk.select("id", F.explode("hs").alias("w"))
    ok = (
        postings.groupBy("w")
        .agg(F.count("*").alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_posting))
        .select("w")
    )
    p = postings.join(ok, "w")
    p2 = p.select("w", F.col("id").alias("id_b"))
    shared = (
        p.join(p2, "w")
        .where(F.col("id") < F.col("id_b"))
        .groupBy(F.col("id").alias("id_a"), F.col("id_b"))
        .agg(F.count("*").alias("shared_windows"))
    )
    return (
        shared.join(sized.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sized.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "shared_windows",
            (
                F.col("shared_windows").cast("double")
                / F.least("sz_a", "sz_b").cast("double")
            ).alias("overlap_frac"),
        )
    )


def simhash_sketches(
    df: DataFrame, text_col: str, id_col: str, k: int = SHINGLE_K, bits: int = 32
) -> DataFrame:
    """(id, simhash) — per-row sketch; near-dups share most bits."""
    sk = with_shingle_hashes(df, text_col, id_col, k)
    return sk.select("id", T.simhash(F.col("hs"), bits).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    k: int = SHINGLE_K,
    bits: int = 32,
    band_bits: int = 8,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with simhash distance <= max_hamming.

    Candidate generation blocks on byte-sized simhash bands (pigeonhole:
    any pair within hamming <= bands-1 shares at least one exact band),
    then verifies with popcount — the classic Manku/Jain/Sarma (WWW'07)
    near-duplicate detection layout.
    """
    sk = cached(simhash_sketches(df, text_col, id_col, k, bits))
    nbands = bits // band_bits
    mask = (1 << band_bits) - 1
    bandarr = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(j)),
                F.shiftright(F.col("simhash"), j * band_bits).bitwiseAND(F.lit(mask)).cast("string"),
            )
            for j in range(nbands)
        ]
    )
    buckets = sk.select("id", "simhash", F.explode(bandarr).alias("bkey"))
    b = buckets.select("bkey", F.col("id").alias("id_b"), F.col("simhash").alias("sim_b"))
    cands = (
        buckets.join(b, "bkey")
        .where(F.col("id") < F.col("id_b"))
        .select(F.col("id").alias("id_a"), F.col("id_b"), F.col("simhash").alias("sim_a"), F.col("sim_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cands.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float, k: int = SHINGLE_K
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard >= threshold via an inverted index.

    Not a cross join: explode shingle hashes to (shingle, id) postings,
    self-join postings (pairs sharing >= 1 shingle), count shared shingles
    per pair, then J = shared / (|A| + |B| - shared). Work is proportional
    to sum of squared posting-list lengths — the standard set-similarity
    join shape; at 100 TB you'd add prefix filtering, here posting lists
    are short because shingles are near-unique.
    """
    sk = cached(with_shingle_hashes(df, text_col, id_col, k))
    sized = sk.select("id", F.size("hs").alias("sz"), "hs")
    postings = sk.select("id", F.explode("hs").alias("sh"))
    p2 = postings.select(F.col("sh"), F.col("id").alias("id_b"))
    shared = (
        postings.join(p2, "sh")
        .where(F.col("id") < F.col("id_b"))
        .groupBy(F.col("id").alias("id_a"), F.col("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    out = (
        shared.join(sized.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sized.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("shared").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("shared"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out
