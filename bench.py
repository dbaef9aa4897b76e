"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q_window_top_orders_per_customer",
    "ev_daily_event_stats",
    "ev_sessionization",
    "ev_funnel_signup_purchase",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hogflare_spark import plans
    from hogflare_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="hogflare-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in plans.QUERIES]
    # extend with any registered headline-worthy extras not listed above
    names += [n for n in sorted(plans.QUERIES) if n not in names and n in plans.BENCH_EXTRA]

    # warm-up: JVM + parquet footer caches + the Python-worker pool (one
    # mapInPandas that also imports the engine's Python-side modules so
    # every pooled worker pays the import once here, before timing —
    # session setup cost, not query cost)
    plans.QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    def _warm(batches):
        import hogflare_spark.operators.normalize  # noqa: F401
        import hogflare_spark.operators.person_store  # noqa: F401
        import hogflare_spark.sources.payload  # noqa: F401

        yield from batches

    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_warm, "id long").count()

    # Timed loop is per-query crash-proof: one broken plan must not cost
    # the timings of the healthy ones, and the JSON line must always print.
    # Each query is executed four times: the FIRST run is the cold number
    # (Catalyst analysis + Janino codegen of the big expression trees paid
    # in-line — no untimed per-plan warm-up), and the WARM number is the
    # min of the remaining runs, which measure steady-state re-execution —
    # the only regime that exists at real scale, where one-time compile
    # cost amortizes to nothing across a 100 TB scan. spark.catalog
    # .clearCache() runs before every repetition so queries that .cache()
    # internally are re-executed from the parquet scans rather than served
    # from the CacheManager, and cached frames never accumulate across the
    # run (both totals compare genuine executions of the plan).
    # gc.collect() between reps: the state folds pin intermediates via
    # localCheckpoint, whose RDD blocks are freed only when the driver-side
    # references die (ContextCleaner on weak refs) — without an explicit
    # collect they accumulate across the run and the resulting memory
    # pressure/GC shows up as noise in late queries' timings.
    import gc

    timings: dict[str, float] = {}
    cold_timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        best = None
        for rep in range(4):
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            # drain the tracked-cache registry too (operators register
            # their .cache() sites there; clearCache freed the blocks,
            # this frees the handles)
            from hogflare_spark.functions.caching import unpersist_all

            unpersist_all()
            gc.collect()
            t0 = time.time()
            try:
                df = plans.QUERIES[name](spark, sf_dir)
                df.collect()
                took = time.time() - t0
                if rep == 0:
                    cold_timings[name] = round(took, 3)
                else:
                    best = took if best is None else min(best, took)
            except Exception as exc:  # noqa: BLE001 — record and keep going
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                # a query that succeeded cold but failed warm must not
                # skew the totals: drop it from BOTH sets so value and
                # value_cold always cover the same queries
                cold_timings.pop(name, None)
                break
        if best is not None:
            timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver captures only the LAST ~2000 bytes of stdout; round 9's
    # line outgrew that when the timed list went 24 -> 33 queries and the
    # driver recorded "parsed": null. Keep the driver-facing line compact
    # (warm per-query map at 2 decimals, cold TOTAL only) and write the
    # full 3-decimal detail — including the per-query cold map — to a
    # sidecar file next to this script.
    out: dict = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "value_cold": round(sum(cold_timings.values()), 3),
        "sf": sf_val,
    }
    if errors:
        # the stdout line must survive the driver's ~2000-byte tail capture
        # even when MANY queries fail: cap to the first few errors and count
        # the rest (full messages go to the sidecar detail file)
        shown = dict(list(errors.items())[:4])
        out["errors"] = {k: v[:80] for k, v in shown.items()}
        if len(errors) > len(shown):
            out["errors_truncated"] = len(errors) - len(shown)
    detail: dict = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "value_cold": round(sum(cold_timings.values()), 3),
        "queries_cold": cold_timings,
        "sf": sf_val,
    }
    if errors:
        detail["errors"] = errors
    try:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(sidecar, "w") as fh:
            json.dump(detail, fh, indent=1)
    except Exception:
        pass  # the sidecar is best-effort; the stdout line is the contract
    line = json.dumps(out)
    if len(line) > 1800:  # defensive: never outgrow the tail capture again
        out["queries"] = {
            k: round(v, 2)
            for k, v in sorted(timings.items(), key=lambda kv: -kv[1])[:30]
        }
        out["queries_truncated"] = len(timings) - len(out["queries"])
        line = json.dumps(out)
    print(line)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — the JSON line must always print
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total",
                    "value": 0.0,
                    "unit": "sec",
                    "queries": {},
                    "err": f"{type(exc).__name__}: {exc}"[:300],
                }
            )
        )
        sys.exit(1)
