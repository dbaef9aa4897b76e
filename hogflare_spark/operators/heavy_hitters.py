"""Heavy-hitter census via mergeable Misra-Gries summaries (r10 verdict #7).

The exact n-gram/entity census (text_analysis.topk_ngrams) shuffles one
row per DISTINCT key — at 100 TB a URL/user-agent/n-gram census has
billions of keys and that shuffle (plus its aggregation state) IS the
bottleneck, even with map-side combine. The approx variant
(approx_count_distinct) fixes the doc_freq half but still carries the
full key space for occurrences. The Misra-Gries summary fixes the
occurrence half: a FIXED-SIZE (capacity-bounded) per-partition state
with a deterministic guarantee, no randomness, no failure probability.

Algorithm (Misra-Gries 1982, merge rule from Agarwal et al.,
"Mergeability of Summaries", PODS 2012): keep at most `capacity`
(item, count) pairs; to merge a new batch of counts, add them in, and
if the summary overflows, subtract the (capacity+1)-th largest count
from every entry and drop the non-positives. Every subtraction of s is
paid for by >= capacity+1 items' worth of stream weight, so the TOTAL
subtracted weight across any merge tree is <= N/(capacity+1). Hence for
every item: est <= true_count and true_count - est <= N/(capacity+1),
and any item with true_count > N/(capacity+1) is GUARANTEED present in
the merged summary (if it were dropped everywhere, its whole weight
would have been subtracted, contradicting the bound).

Spark shape: one scan; per-partition summaries built Arrow-batch by
Arrow-batch inside mapInPandas (state = one pandas Series of <= capacity
entries — pure map-side, nothing shuffles during the scan); then ONE
tiny shuffle of <= partitions x capacity candidate rows summed by item.
Summing per-partition summaries is itself a valid merge (it only skips
the final reduction, so it never adds error). Contrast with the exact
census: the shuffle payload is O(P x capacity), independent of both the
key-space size and the data size.

The exactness-verified composition (heavy_hitters_verified) recounts
ONLY the guaranteed-recall set exactly — a broadcast semi-join of the
tiny candidate set into the stream, so the second scan's shuffle is
bounded by |candidates| keys. That is the audit shape the gate needs for
a DuckDB oracle; the production operator is the one-pass misra_gries.

Reference anchor: the reference has no sketch operators (its censuses
are exact SQL over Iceberg, README.md:237-256); this extends the engine
for the 100 TB training-data path alongside rollup.py's HLL sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries(df: DataFrame, item_col: str, capacity: int) -> DataFrame:
    """One-pass candidate census: (item, est) for <= capacity x P items,
    plus one (item=NULL, est=N) row per partition carrying the stream
    total (so downstream bounds need no second scan).

    est is a LOWER bound: est <= true_count <= est + N/(capacity+1),
    and every item with true_count > N/(capacity+1) is present.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    cap = int(capacity)

    def mg(batches):
        import pandas as pd

        summary = None
        total = 0
        for pdf in batches:
            col = pdf["item"].dropna()
            total += len(col)
            if len(col) == 0:
                continue
            vc = col.value_counts()
            summary = vc if summary is None else summary.add(vc, fill_value=0)
            if len(summary) > cap:
                s = summary.nlargest(cap + 1).iloc[-1]
                summary = summary - s
                summary = summary[summary > 0]
        items = list(summary.index) if summary is not None else []
        ests = [int(v) for v in summary.values] if summary is not None else []
        yield pd.DataFrame(
            {"item": items + [None], "est": ests + [total]}
        ).astype({"est": "int64"})

    cands = df.select(F.col(item_col).cast("string").alias("item")).mapInPandas(
        mg, "item string, est long"
    )
    return cands.groupBy("item").agg(F.sum("est").alias("est"))


def verified_from_summary(
    summary: DataFrame, stream: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """Turn a merged MG summary (item/est rows + item=NULL total rows)
    into the guaranteed-recall census verified against `stream`: exact
    recount of ONLY the candidate items (broadcast semi-join — the
    second scan's shuffle is bounded by |candidates| keys), filtered to
    the deterministic threshold occurrences x (capacity+1) > N that
    Misra-Gries provably cannot miss, with the error-bound boolean.
    Shared by the batch operator and the incremental-state twin (whose
    accumulated summaries obey the SAME bound: every reduction —
    per-batch or at compaction — subtracts s from >= capacity+1 entries,
    so total subtracted weight <= N/(capacity+1) over any merge tree).
    """
    cap = int(capacity)
    totals = (
        summary.where(F.col("item").isNull())
        .groupBy()
        .agg(F.sum("est").alias("n_total"))
    )
    cands = summary.where(F.col("item").isNotNull())
    exact = (
        stream.select(F.col(item_col).cast("string").alias("item"))
        .join(F.broadcast(cands.select("item")), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(totals))
        .where(F.col("occurrences") * F.lit(cap + 1) > F.col("n_total"))
        .join(F.broadcast(cands), "item")
        .select(
            "item",
            "occurrences",
            (
                (F.col("est") <= F.col("occurrences"))
                & (
                    (F.col("occurrences") - F.col("est")) * F.lit(cap + 1)
                    <= F.col("n_total")
                )
            ).alias("est_within_bound"),
        )
        .orderBy(F.desc("occurrences"), "item")
    )


def heavy_hitters_verified(
    df: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """The guaranteed-recall set with EXACT counts + the MG error-bound
    boolean: every item whose exact count clears the deterministic
    threshold N/(capacity+1) (integer arithmetic: occurrences x
    (capacity+1) > N), which Misra-Gries provably cannot miss.

    Output (item, occurrences, est_within_bound) is exactly
    reproducible by an exact SQL census with the same HAVING clause —
    the accuracy boolean asserts est <= exact <= est + N/(capacity+1)
    and is deterministically true (the ev_sketch_rollup oracle pattern).
    Two scans by construction (candidates, then the winners' recount);
    the production census is the ONE-scan misra_gries above.
    """
    from hogflare_spark.functions.caching import cached

    cap = int(capacity)
    summary = cached(misra_gries(df, item_col, cap))
    return verified_from_summary(summary, df, item_col, cap)
