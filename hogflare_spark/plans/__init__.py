"""Query layer: the registry every plan module appends to.

`QUERIES[name]` is a `(spark, sf_dir) -> DataFrame` callable; `ORACLES[name]`
is the equivalent DuckDB ANSI SQL (omitted for non-SQL-expressible ops,
which then get a rows-only check per the driver contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# names (beyond bench.py's HEADLINE list) that bench should also time
BENCH_EXTRA: set[str] = set()


def query(name: str, oracle: str | None = None):
    """Decorator: register a query plan and (optionally) its DuckDB oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so registration side-effects run."""
    from hogflare_spark.plans import (  # noqa: F401
        relational,
        relational_ext,
        relational_tpch2,
        events_analytics,
    )
    try:
        from hogflare_spark.plans import hogflare_semantics  # noqa: F401
    except ImportError:
        pass
    try:
        from hogflare_spark.plans import llm_pipeline  # noqa: F401
    except ImportError:
        pass
