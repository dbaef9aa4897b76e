"""Z-order (Morton) keys as pure Column expressions — multi-dimensional
clustering for the lake's file layout.

The lake's cluster sort (team_id, distinct_id, created_at) gives perfect
file-skipping on the LEADING column and none on the others: a
lexicographic sort concentrates each file's min/max range on dimension 1
while dimension 2 spans the whole domain in every file. Interleaving the
bits of two (or more) dimensions into one sort key makes files cover
axis-aligned rectangles instead of stripes, so parquet row-group min/max
stats prune scans filtered on EITHER dimension — the layout trick behind
Delta/Iceberg Z-ORDER table maintenance, here as a plain deterministic
column so any writer (append, compaction rewrite) can cluster by it.

Everything is integer shift/mask arithmetic on the JVM inside
whole-stage codegen — no UDF, no sort comparator plug-in needed, because
sorting by the interleaved INTEGER is exactly the Morton curve order.
Bit budget: `bits` per dimension (default 16 → a 32-bit key for 2 dims);
values are masked into range first, so callers hash or quantize wider
domains down (for skewed domains hash first — locality in hash space
still yields balanced rectangles, which is what pruning needs).

The interleave is written as a SUM of disjoint-bit terms rather than a
bitwise-OR fold: the terms occupy disjoint bit positions, so + and | are
the same function, and + keeps the expression replicable verbatim in any
SQL dialect (the DuckDB oracle mirrors it bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key2(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low `bits` of two non-negative integer
    columns: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    Sorting by the result is the Z-curve order over (a, b)."""
    mask = (1 << bits) - 1
    am = a.cast("long").bitwiseAND(F.lit(mask))
    bm = b.cast("long").bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(am, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
        terms.append(
            F.shiftright(bm, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key2_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB mirror of zorder_key2 — identical shift/mask/sum terms."""
    mask = (1 << bits) - 1
    parts = []
    for i in range(bits):
        parts.append(f"(({a} & {mask}) >> {i} & 1) * {1 << (2 * i + 1)}")
        parts.append(f"(({b} & {mask}) >> {i} & 1) * {1 << (2 * i)}")
    return "(" + " + ".join(parts) + ")"
