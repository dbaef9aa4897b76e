"""Cross-engine deterministic hashing primitives.

Every dedup / similarity operator in this engine needs hashes that the
DuckDB correctness oracle can reproduce bit-for-bit. The shared primitive
is the first 15 hex chars of md5 (a 60-bit non-negative integer — fits a
signed int64 with headroom for modular arithmetic in BOTH engines, neither
of which wraps on overflow):

    Spark:  conv(substr(md5(s), 1, 15), 16, 10)::long
    DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

MinHash permutations are affine transforms over the Mersenne prime
M31 = 2^31 - 1: perm_i(h) = (a_i * (h % M31) + b_i) % M31, with a_i, b_i
themselves derived from md5 so both engines agree without shipping a
table. a_i * h < 2^62, so the product never overflows int64. This is the
textbook MinHash construction (Broder 1997, "On the resemblance and
containment of documents"); the LSH banding scheme follows Leskovec/
Rajaraman/Ullman, Mining of Massive Datasets §3.4.

Random-hyperplane (SimHash) planes use deterministic ±1 components
derived the same way (Charikar 2002, "Similarity estimation techniques
from rounding algorithms").
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

M31 = 2_147_483_647  # 2^31 - 1, Mersenne prime


def _py_h60(s: str) -> int:
    """Python mirror of the 60-bit md5 hash (pytest oracles)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def h60(col: Column) -> Column:
    """Spark: 60-bit non-negative int64 hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same 60-bit hash."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def perm_coeffs(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) MinHash coefficients; a_i != 0."""
    out = []
    for i in range(num_perm):
        a = _py_h60(f"minhash-a:{i}") % (M31 - 1) + 1
        b = _py_h60(f"minhash-b:{i}") % M31
        out.append((a, b))
    return out


def hyperplanes(num_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes for random-projection LSH."""
    return [
        [1 if _py_h60(f"plane:{p}:{d}") % 2 == 0 else -1 for d in range(dim)]
        for p in range(num_planes)
    ]
