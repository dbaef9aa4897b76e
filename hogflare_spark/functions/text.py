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

import functools

from pyspark.sql import Column
from pyspark.sql import functions as F

from hogflare_spark.functions.hashing import M31, h60, h60_sql, perm_coeffs

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish surrogate: words OR single non-word-non-space marks, the usual
# pre-tokenizer shape (cf. GPT-2's regex); ASCII-safe so Java and DuckDB
# regex engines agree.
BPE_TOKEN_RE = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"


def _col_cache(fn):
    """Memoize a Column-builder on (repr(input column), scalar args).

    Building the MinHash/banding expressions is pure driver-side work —
    ~100 py4j round-trips for the 32 permutation-coefficient structs and
    the per-band concat trees — measured at 0.35-0.55 s per call
    (scripts/profile_query.py showed it as the per-batch driver gap in
    the incremental dedup gates: guide §7.3, "nothing is running").
    Column objects wrap immutable Catalyst expression trees, so the same
    object can appear in any number of plans; two inputs with the same
    unresolved repr (e.g. `col('hs')`) are the same expression. The
    cache key is the repr string, which costs one py4j toString — three
    orders of magnitude cheaper than rebuilding. Unbounded by type, but
    in practice the registry builds a handful of distinct (col, args)
    shapes per process."""
    cache: dict = {}

    @functools.wraps(fn)
    def wrapper(col, *args, **kwargs):
        try:
            key = (repr(col), args, tuple(sorted(kwargs.items())))
        except Exception:  # unreprable input: build uncached
            return fn(col, *args, **kwargs)
        out = cache.get(key)
        if out is None:
            out = fn(col, *args, **kwargs)
            cache[key] = out
        return out

    return wrapper


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


@_col_cache
def minhash_signature(hs: Column, num_perm: int) -> Column:
    """Array of num_perm MinHash values from a shingle-hash array.

    Entirely per-row and single-pass: one `aggregate` over the hash array
    whose accumulator is the whole signature, updated element-wise with
    `zip_with` against the permutation-coefficient constant array. (The
    naive form — num_perm separate array_min(transform(...)) columns —
    produces an expression tree that takes seconds to codegen; this form
    is one small expression and one scan.) Empty shingle set → all-M31
    sentinel signature. min is order-insensitive, so the per-perm
    list_aggregate('min') oracle SQL computes the identical result.
    """
    coeffs = F.array(
        *[
            F.struct(
                F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b")
            )
            for a, b in perm_coeffs(num_perm)
        ]
    )
    init = F.array_repeat(F.lit(M31).cast("long"), num_perm)
    return F.aggregate(
        hs,
        init,
        lambda acc, h: F.zip_with(
            acc, coeffs, lambda m, c: F.least(m, (c["a"] * h + c["b"]) % M31)
        ),
    )


def minhash_signature_sql(hs_expr: str, num_perm: int) -> str:
    parts = [
        f"coalesce(list_aggregate(list_transform({hs_expr}, "
        f"h -> ({a} * h + {b}) % {M31}), 'min'), {M31})"
        for a, b in perm_coeffs(num_perm)
    ]
    return "[" + ", ".join(parts) + "]"


@_col_cache
def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: array of `bands` strings 'band_idx:v1,v2,...'.

    The signature expression is let-bound via a 1-element-array transform:
    without it, CollapseProject inlines the (expensive) signature aggregate
    into every band-key expression, recomputing it `bands` times per row
    and bloating codegen. The lambda variable makes it evaluate once.
    """

    def keys_of(s: Column) -> Column:
        return F.array(
            *[
                F.concat_ws(
                    ":",
                    F.lit(str(j)),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(s, j * rows + 1, rows), lambda x: x.cast("string")
                        ),
                    ),
                )
                for j in range(bands)
            ]
        )

    return F.element_at(F.transform(F.array(sig), keys_of), 1)


def band_keys_sql(sig_expr: str, bands: int, rows: int) -> str:
    parts = [
        f"'{j}:' || array_to_string(list_slice({sig_expr}, {j * rows + 1}, {j * rows + rows}), ',')"
        for j in range(bands)
    ]
    return "[" + ", ".join(parts) + "]"


@_col_cache
def simhash(hs: Column, bits: int = 32) -> Column:
    """SimHash sketch over shingle hashes: bit b set iff the +1/-1 vote of
    all hashes' bit b sums positive (Charikar 2002).

    Single-pass like minhash_signature: the accumulator is the array of
    per-bit vote sums, updated via zip_with against the bit-power constant
    array. Bit extraction uses floor(h / 2^b) % 2 (h < 2^31 so the double
    division is exact) because shiftright needs a literal shift amount.
    """
    powers = F.array(*[F.lit(float(1 << b)) for b in range(bits)])
    init = F.array_repeat(F.lit(0).cast("long"), bits)
    votes = F.aggregate(
        hs,
        init,
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda v, p: v + (F.floor(h / p).cast("long") % 2) * 2 - 1,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p.cast("long")).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


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
