"""Tracked `.cache()` for operator-internal reuse.

Several dedup/similarity operators cache an intermediate that both sides
of a self-join (or a pairs+clusters composition) read — the cache is the
point, but a bare `df.cache()` inside an operator leaks: the returned
DataFrame keeps the cached plan alive in the JVM block manager forever,
and a long-lived driver (streaming job, notebook, query service) that
runs the operator per-batch accumulates cached blocks without bound
(r5/r6 ADVICE). Operators therefore cache through `cached()`, which
records a strong reference, and hosts call `unpersist_all()` at their
natural quiescent points (bench.py between queries, driver_sim after
each gate, a streaming job between micro-batches).

Why strong refs: unpersisting needs the DataFrame handle — a WeakSet
entry that gets collected before `unpersist_all()` runs would leave the
JVM blocks orphaned, which is the exact leak this exists to fix. The
handles themselves are a few hundred bytes of py4j proxy each.

Note Spark's cache manager matches by analyzed plan, so a re-run of the
same query between unpersist calls still reuses the cached blocks —
warm-run behavior is unchanged; only the release point becomes explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def cached(df: DataFrame) -> DataFrame:
    """`df.cache()` + register the handle for a later `unpersist_all()`."""
    df.cache()
    _LIVE.append(df)
    return df


def release(df: DataFrame, blocking: bool = False) -> bool:
    """Unpersist ONE tracked cache immediately and drop its registry
    entry. Operators that know their cache's lifetime (e.g. a trainer's
    per-fit working set, dead once the model is collected) release
    inline instead of waiting for the host's quiescent-point drain —
    which also keeps them correct under concurrent jobs that share the
    process-wide registry. Returns False if df was not tracked."""
    try:
        _LIVE.remove(df)
    except ValueError:
        return False
    try:
        df.unpersist(blocking)
    except Exception:
        pass
    return True


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every operator cache registered since the last call.
    Returns the number released. Safe to call at any quiescent point —
    in-flight results derived from a cache recompute instead of failing.

    NOTE (r7 ADVICE): the registry is process-wide and this drains ALL
    of it, so it assumes ONE concurrent consumer per driver — a second
    in-flight job's operator caches would be unpersisted mid-query
    (correctness is unaffected; Spark recomputes, silently losing the
    cache win). Hosts running concurrent jobs in one driver should skip
    the global drain and have operators `release()` their own caches."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n
