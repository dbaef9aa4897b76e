"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query smoke check at sf0.001.
`queries()` — every implemented operator/query from SURVEY.md §2,
keyed by name; each callable is (spark, sf_dir) -> DataFrame.
`oracle_sql()` — DuckDB-equivalent SQL per query (omitted only for
genuinely non-SQL-expressible ops, which get a rows-only check).

All real logic lives in the `hogflare_spark` package; this module is a
thin aggregation layer over `hogflare_spark.plans`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import hogflare_spark.plans as plans  # noqa: E402


def _registry() -> tuple[dict, dict]:
    plans.load_all()
    return plans.QUERIES, plans.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs, _ = _registry()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = _registry()
    return dict(qs)


def oracle_sql() -> dict[str, str]:
    _, oracles = _registry()
    return dict(oracles)
