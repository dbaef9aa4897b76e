"""connected_components: the driver-side union-find fast path must equal
the distributed fixpoint loop exactly (min-label per component, numeric
and lexicographic id types), and engage only below the edge ceiling."""

from __future__ import annotations

from pyspark.sql import Row

import hogflare_spark.operators.identity as I


def _run(spark, pairs, force_loop=False):
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in pairs])
    old = I.CC_DRIVER_MAX_EDGES
    if force_loop:
        I.CC_DRIVER_MAX_EDGES = 0
    try:
        out = I.connected_components(df).collect()
    finally:
        I.CC_DRIVER_MAX_EDGES = old
    return sorted((r["id"], r["comp"]) for r in out)


def test_driver_union_find_equals_fixpoint_loop_on_strings(spark):
    pairs = [
        ("b", "a"), ("c", "b"), ("x", "y"), ("m", "m"),
        ("q", "z"), ("z", "a"),
    ]
    assert _run(spark, pairs) == _run(spark, pairs, force_loop=True)


def test_driver_union_find_equals_fixpoint_loop_on_longs(spark):
    pairs = [(2, 1), (3, 2), (10, 11), (7, 7), (99, 1)]
    fast = _run(spark, pairs)
    assert fast == _run(spark, pairs, force_loop=True)
    comp = dict(fast)
    assert comp[99] == 1 and comp[3] == 1 and comp[11] == 10 and comp[7] == 7


def test_long_chain_min_label(spark):
    # a 200-node path — pointer-jumping territory for the loop, trivial
    # for union-find; labels must still be the global min of the chain
    pairs = [(i + 1, i) for i in range(200)]
    out = dict(_run(spark, pairs))
    assert all(v == 0 for v in out.values()) and len(out) == 201
