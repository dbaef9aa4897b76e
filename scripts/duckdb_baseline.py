"""Ground the "vs baseline" comparison: time DuckDB (threads=32)
executing the engine's own oracle SQL for the bench.py headline query
set on the same parquet, and print one JSON line alongside-comparable
with bench.py's output.

The reference publishes no performance numbers (BASELINE.md), so the
honest stand-in for "the baseline at the same scale factor" is a strong
single-node engine running the semantically-identical SQL on the same
files. Same methodology the round-3 review used; this script makes it
reproducible in-repo:

    python bench.py                      # Spark timings (one JSON line)
    python scripts/duckdb_baseline.py    # DuckDB timings (one JSON line)

Caveats, so nobody over-reads the ratio: the oracle SQL mirrors the
ALGORITHM (e.g. the minhash oracle replays full LSH banding in SQL,
which DuckDB executes far slower than Spark's cached band keys), and a
handful of gates fabricate inputs inside the Spark query (streaming
replays, planted PII) where the oracle reads plain tables — those are
excluded here via OVERHEAD_SKIP, keeping only queries whose Spark and
SQL sides compute from the same scans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
# bench queries whose oracle is not an apples-to-apples table scan
# (fabricated inputs or fixture joins on the Spark side)
OVERHEAD_SKIP: set[str] = {
    # Spark side replays the events table as a THREE-micro-batch file
    # stream (checkpoint + state commits included); the oracle is a
    # plain batch window over the same events — not comparable work
    "ev_stream_sessionization",
}


def main() -> None:
    import duckdb

    from bench import HEADLINE
    from hogflare_spark import plans

    plans.load_all()
    names = [n for n in HEADLINE if n in plans.ORACLES]
    names += [
        n for n in sorted(plans.ORACLES) if n not in names and n in plans.BENCH_EXTRA
    ]
    names = [n for n in names if n not in OVERHEAD_SKIP]

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        best = None
        for rep in range(3):
            t0 = time.time()
            try:
                con.execute(plans.ORACLES[name]).fetchall()
                took = time.time() - t0
                if rep > 0:
                    best = took if best is None else min(best, took)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                break
        if best is not None:
            timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out: dict = {
        "metric": "duckdb_oracle_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
