"""Text primitives shared by dedup / text-analysis operators.

Each helper has a Spark-Column form and a DuckDB-SQL-fragment twin built
from the same constants, so the correctness oracles mirror the engine
bit-for-bit instead of re-deriving the semantics by hand.

All expressions are per-row (no shuffle): tokenization, shingling,
MinHash signatures and SimHash sketches are computed inside the scan
projection, which is what lets the dedup pipeline scale — at 100 TB the
only shuffles left are the LSH bucket join and the final verify join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hogflare_spark.functions.hashing import M31, h60, h60_sql, perm_coeffs

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish surrogate: words OR single non-word-non-space marks, the usual
# pre-tokenizer shape (cf. GPT-2's regex); ASCII-safe so Java and DuckDB
# regex engines agree.
BPE_TOKEN_RE = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(col), TOKEN_SPLIT_RE)


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(lower({expr}), '\\s+')"


def shingles(tok: Column, k: int) -> Column:
    """Distinct k-token shingles (space-joined). Empty array if < k tokens."""
    idx = F.sequence(F.lit(1), F.size(tok) - (k - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, k)))
    return F.when(F.size(tok) >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(tok_expr: str, k: int) -> str:
    return (
        f"CASE WHEN len({tok_expr}) >= {k} THEN list_distinct(list_transform("
        f"generate_series(1, len({tok_expr}) - {k - 1}), "
        f"i -> array_to_string(list_slice({tok_expr}, i, i + {k - 1}), ' '))) "
        f"ELSE [] END"
    )


def shingle_hashes(sh: Column) -> Column:
    """Shingle strings → 31-bit hash values (MinHash input domain)."""
    return F.transform(sh, lambda s: h60(s) % M31)


def shingle_hashes_sql(sh_expr: str) -> str:
    return f"list_transform({sh_expr}, s -> {h60_sql('s')} % {M31})"


def _perm_min(hs: Column, a: int, b: int) -> Column:
    # closure factory: binds (a, b) without polluting the lambda's arity,
    # which PySpark inspects to build the higher-order function
    return F.array_min(F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % M31))


def minhash_signature(hs: Column, num_perm: int) -> Column:
    """Array of num_perm MinHash values from a shingle-hash array.

    Entirely per-row: num_perm affine-min scans of the hash array, no
    shuffle. Empty shingle set → all-M31 sentinel signature.
    """
    mins = [_perm_min(hs, a, b) for a, b in perm_coeffs(num_perm)]
    sig = F.array(*[F.coalesce(m, F.lit(M31).cast("long")) for m in mins])
    return sig


def minhash_signature_sql(hs_expr: str, num_perm: int) -> str:
    parts = [
        f"coalesce(list_aggregate(list_transform({hs_expr}, "
        f"h -> ({a} * h + {b}) % {M31}), 'min'), {M31})"
        for a, b in perm_coeffs(num_perm)
    ]
    return "[" + ", ".join(parts) + "]"


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: array of `bands` strings 'band_idx:v1,v2,...'."""
    keys = [
        F.concat_ws(
            ":",
            F.lit(str(j)),
            F.concat_ws(",", F.transform(F.slice(sig, j * rows + 1, rows), lambda x: x.cast("string"))),
        )
        for j in range(bands)
    ]
    return F.array(*keys)


def band_keys_sql(sig_expr: str, bands: int, rows: int) -> str:
    parts = [
        f"'{j}:' || array_to_string(list_slice({sig_expr}, {j * rows + 1}, {j * rows + rows}), ',')"
        for j in range(bands)
    ]
    return "[" + ", ".join(parts) + "]"


def _bit_vote(hs: Column, b: int) -> Column:
    # closure factory (see _perm_min) for the per-bit +1/-1 vote sum
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1),
    )


def simhash(hs: Column, bits: int = 32) -> Column:
    """SimHash sketch over shingle hashes: bit b set iff the +1/-1 vote of
    all hashes' bit b sums positive (Charikar 2002). Per-row expression."""
    total = F.lit(0).cast("long")
    for b in range(bits):
        vote = _bit_vote(hs, b)
        total = total + F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return total


def simhash_sql(hs_expr: str, bits: int = 32) -> str:
    parts = [
        f"(CASE WHEN list_sum(list_transform({hs_expr}, "
        f"h -> ((h >> {b}) & 1) * 2 - 1)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    ]
    return "(" + " + ".join(parts) + ")"


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two (distinct-element) arrays, as double."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def jaccard_sql(a_expr: str, b_expr: str) -> str:
    return (
        f"CASE WHEN len(list_distinct(list_concat({a_expr}, {b_expr}))) > 0 "
        f"THEN len(list_intersect({a_expr}, {b_expr}))::DOUBLE "
        f"/ len(list_distinct(list_concat({a_expr}, {b_expr}))) ELSE 0.0 END"
    )
