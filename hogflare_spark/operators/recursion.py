"""Recursive query evaluation — the Spark-side answer to WITH RECURSIVE.

Spark SQL has no recursive CTE (SPARK-24497 open for years), but the
standard evaluation strategy for linear recursion — SEMI-NAIVE Datalog
iteration (Bancilhon 1985) — maps directly onto DataFrame joins: keep
the full result and a FRONTIER of tuples discovered last round, join
only the frontier against the base relation each iteration, stop when
the frontier empties. Only the frontier ever shuffles, so total work is
proportional to the closure size, not closure × depth (the naive
fixpoint re-derives everything every round).

This module implements the canonical instance — ancestor/transitive
closure over a parent-pointer relation (org charts, BOM explosions,
category trees, thread reply chains) — with the execution discipline an
iterative Spark job needs:

* `localCheckpoint(eager=True)` on every frontier: each level's plan
  would otherwise nest the previous level's (lineage depth O(d), and
  Catalyst re-analysis cost grows super-linearly — the same trap the
  identity fixpoint in operators/identity.py documents).
* the per-level emptiness probe is a driver-side `isEmpty()` on a
  pinned frontier — one cheap job per level, the unavoidable control
  dependency of any fixpoint (a recursive SQL engine pays the same
  barrier between levels).
* the parent relation is broadcast when dimension-sized (the common
  hierarchy case: the EDGE table is small even when the FACT table
  being grouped by the closure is 100 TB). The default is "auto": one
  count() of the edge relation decides — beyond
  BROADCAST_EDGE_ROW_LIMIT rows the iteration falls back to a shuffle
  join, because broadcasting a fact-sized edge frame once per level
  is exactly the autoBroadcastJoinThreshold / driver-memory failure
  mode a 100 TB hierarchy would hit. Pass True/False to force.
* depth is bounded by `max_depth` — a cycle in user data must not hang
  the job (the reference's identity redirects cap chases at 10 hops
  for the same reason, /root/reference/src/persons.rs:240-247).

Reference behavior anchor: hogflare itself bounds recursive chases
(persons.rs redirect chains); the closure operator generalizes that
bounded-traversal semantics to arbitrary hierarchies.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ~16 raw bytes/edge (two longs): 1M rows lands well inside the default
# 10 MB autoBroadcastJoinThreshold even with row overhead
BROADCAST_EDGE_ROW_LIMIT = 1_000_000


def ancestor_closure(
    edges: DataFrame,
    max_depth: int = 32,
    broadcast_edges: bool | str = "auto",
) -> DataFrame:
    """All (node, anc, depth) ancestor pairs reachable by following
    `edges` (columns: node, parent) up to `max_depth` hops.

    Semi-naive: level d+1 derives ONLY from level-d tuples, so each
    iteration joins a strictly-shrinking frontier (in a forest) against
    the edge relation. Terminates when the frontier empties or at
    max_depth, whichever first.

    broadcast_edges="auto" (default) broadcasts only below
    BROADCAST_EDGE_ROW_LIMIT, keeping a fact-sized hierarchy off the
    driver. r13 (guide §1.2 job count): every per-level control signal
    rides the level's own checkpoint job via `observe()` — the level-1
    row count doubles as the auto-broadcast edge count (level 1 is a
    projection of the edge relation, so the counts are equal by
    construction) and each later level's count is the emptiness probe —
    so the former 2 jobs per level (checkpoint + isEmpty) plus the
    standalone edge count() collapse to exactly ONE job per level.
    """
    if "node" not in edges.columns or "parent" not in edges.columns:
        raise ValueError("edges must have columns (node, parent)")
    from pyspark.sql import Observation

    base = edges.select("node", "parent")
    hop = base.select(F.col("node").alias("anc"), F.col("parent").alias("_next"))

    obs0 = Observation()
    level = (
        base.select(
            "node",
            F.col("parent").alias("anc"),
            F.lit(1).cast("int").alias("depth"),
        )
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    if broadcast_edges == "auto":
        broadcast_edges = int(obs0.get["n"]) <= BROADCAST_EDGE_ROW_LIMIT
    if broadcast_edges:
        hop = F.broadcast(hop)

    levels = [level]
    for d in range(2, int(max_depth) + 1):
        obs = Observation()
        nxt = (
            level.join(hop, "anc")
            .select(
                "node",
                F.col("_next").alias("anc"),
                F.lit(d).cast("int").alias("depth"),
            )
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)  # cut lineage: O(1) plan per level
        )
        if not int(obs.get["n"]):
            break
        levels.append(nxt)
        level = nxt
    return reduce(DataFrame.unionByName, levels)
