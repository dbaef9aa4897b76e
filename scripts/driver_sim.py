"""Simulate the driver's t2 correctness gate: import __spark_entry__ the way
the driver does, run entry() smoke + every queries() entry vs oracle_sql()
via DuckDB at sf0.01, print a CORRECTNESS-style JSON summary."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    import duckdb

    import __spark_entry__ as e
    from hogflare_spark.session import get_spark

    spark = get_spark(app_name="driver-sim", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    entry_df = e.entry(spark)
    entry_rows = entry_df.collect()
    print(f"entry: {len(entry_rows)} rows, schema={entry_df.columns}", file=sys.stderr)

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    only = {n for n in os.environ.get("SIM_ONLY", "").split(",") if n}
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    skip = {n for n in os.environ.get("SIM_SKIP", "").split(",") if n}
    if skip:
        qs = {n: f for n, f in qs.items() if n not in skip}
    from hogflare_spark.functions.caching import unpersist_all

    # SIM_SCALE_CHECKS=1: at scaled SF dirs, queries whose DuckDB oracles
    # are super-linear get a bounded hard check (restricted-view oracle /
    # replication expectation / invariants) instead of the full oracle —
    # every query still gets a verdict, nothing is skipped.
    scale_checks = {}
    if os.environ.get("SIM_SCALE_CHECKS"):
        from hogflare_spark.plans.scale_checks import CHECKS as scale_checks

    import time

    results = {}
    for name, fn in sorted(qs.items()):
        t0 = time.monotonic()
        print(f"[sim] {name} ...", file=sys.stderr, flush=True)
        try:
            unpersist_all()  # operator caches must not accumulate across gates
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            if name in scale_checks:
                results[name] = scale_checks[name](spark, SF_DIR, srows, scols)
                continue
            if name not in oracles:
                results[name] = {"mode": "rows_only", "rows": len(srows), "ok": True}
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok_schema = sorted(scols) == sorted(dcols)
            ok_count = len(srows) == len(drows)

            # EXACT comparison (r11 verdict #2): the driver's hash is
            # bit-level, and the old round(v, 6) let two float-transport
            # gates sail through 135/135 sims and fail the real grade.
            # repr() of a float is shortest-roundtrip — equal strings
            # iff equal bits — so the sim is now a conservative
            # predictor of the driver's hash.
            def norm(rows, cols):
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                out = []
                for row in rows:
                    vals = []
                    for i in order:
                        v = row[i]
                        if isinstance(v, float):
                            v = repr(v)
                        vals.append(str(v))
                    out.append(tuple(vals))
                return sorted(out)

            # graded floats are a proven hash liability (r11: driver-env
            # divergence on doubles the sim could not see) — surface any
            # column that transports a float so the registry audit is
            # one grep over the sim output.
            float_cols = sorted(
                {
                    scols[i]
                    for row in srows
                    for i in range(len(scols))
                    if isinstance(row[i], float)
                }
            )
            ok_values = ok_schema and ok_count and norm(srows, scols) == norm(drows, dcols)
            results[name] = {
                "mode": "oracle",
                "rows": len(srows),
                "schema_match": ok_schema,
                "count_match": ok_count,
                "values_match": ok_values,
                "ok": ok_schema and ok_count and ok_values,
            }
            if float_cols:
                results[name]["float_cols"] = float_cols
        except Exception as ex:  # noqa: BLE001
            results[name] = {"ok": False, "error": str(ex)[:200]}
        print(
            f"[sim] {name} done in {time.monotonic() - t0:.1f}s ok={results[name]['ok']}",
            file=sys.stderr,
            flush=True,
        )

    n_ok = sum(1 for r in results.values() if r["ok"])
    print(json.dumps({"sf_dir": SF_DIR, "passed": n_ok, "total": len(results),
                      "queries": results}, indent=1))
    spark.stop()
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
