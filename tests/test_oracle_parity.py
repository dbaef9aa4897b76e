"""Mirror of the driver's t2 gate: every registered query vs its DuckDB
oracle at sf0.001 — row count, column names, and order-insensitive value
equality (columns sorted by name, rows sorted, cell-wise compare)."""

from __future__ import annotations

import math

import pytest

from hogflare_spark import plans
from tests.conftest import SF_SMOKE

plans.load_all()

ORACLE_QUERIES = sorted(plans.ORACLES)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    sdf = plans.QUERIES[name](spark, SF_SMOKE)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(plans.ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )

    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    for i, (srow, drow) in enumerate(zip(s_norm, d_norm)):
        for j, (a, b) in enumerate(zip(srow, drow)):
            assert _cells_equal(a, b), (
                f"{name}: value mismatch at sorted-row {i} col {j}: "
                f"spark={a!r} oracle={b!r}\nspark row: {srow}\noracle row: {drow}"
            )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_registry_consistency():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert qs, "no queries registered"
