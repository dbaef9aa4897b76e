"""Ordered-fold numpy kernels for the iterated trainers.

Catalyst's higher-order functions (``aggregate`` / ``zip_with`` /
``transform``) are interpreted — they never enter whole-stage codegen —
so a trainer that folds k×dim lambdas per row pays an interpreter
dispatch per array element per row, per iteration. That is the exact
pathology the block-partitioned embedding compare fixed in round 7 with
an Arrow matmul kernel (operators/similarity.embedding_near_dup_pairs);
these helpers extend the same execution tier to the trainer inner loops
(k-means assignment, linear-probe margins, ADC distance tables).

BIT-PARITY is the constraint: every dot product in the trainer family is
specified as a strict array-order fold — ``acc = acc + (x_i * w_i)``,
left to right — because that is the op sequence the DuckDB oracles
(``list_sum`` over ``generate_series``), the pure-Python sf1 replay
(plans/scale_checks._kmeans_replay_check), and the JVM Column twins all
execute. numpy's ``@``/``np.dot`` use pairwise/BLAS summation and would
differ in the last bits, which the round-to-9-decimals guard absorbs
only ALMOST always. ``ordered_dots`` therefore accumulates with one
vectorized add per array position: each element sees the identical two
IEEE-754 double ops (multiply, then add) in the identical order, so the
result is bit-identical to the interpreted fold, not merely close —
while still running as dim numpy passes per batch instead of n×k×dim
interpreter dispatches.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ordered_dots", "round9"]


def ordered_dots(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """(n, dim) × (k, dim) → (n, k) dot products via strict left-to-right
    accumulation: out[r, c] folds x[r, i] * w[c, i] over i in array
    order, starting from 0.0 — bit-identical to
    ``F.aggregate(zip_with(x, w, (a, b) -> a * b), 0.0, acc + v)``."""
    n = x.shape[0]
    k = w.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for i in range(x.shape[1]):
        acc = acc + x[:, i : i + 1] * w[:, i]
    return acc


def round9(a: np.ndarray) -> np.ndarray:
    """Portable floor-based round to 9 decimals — the same
    ``floor(x * 1e9 + 0.5) / 1e9`` sequence as the JVM and SQL twins."""
    return np.floor(a * 1e9 + 0.5) / 1e9
