"""Time a few registered queries min-of-N in one session (A/B helper).

Usage:
    python scripts/time_queries.py q_exact_quantile_value,q_recursive_ancestors [reps]

Same methodology as bench.py (clearCache + unpersist_all + gc between
reps, collect() as the action) but restricted to the named queries, so
an optimization A/B doesn't pay a full 45-query pass. Prints one line
per query: cold (first rep) and min-of-warm.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [s for s in sys.argv[1].split(",") if s]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hogflare_spark import plans
    from hogflare_spark.functions.caching import unpersist_all
    from hogflare_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    # same session warm-up as bench.py
    plans.QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    for name in names:
        times = []
        for rep in range(reps):
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            unpersist_all()
            gc.collect()
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            plans.QUERIES[name](spark, sf_dir).collect()
            times.append(time.time() - t0)
        warm = times[1:] or times
        print(
            f"{name}: cold={times[0]:.2f} warm_min={min(warm):.2f} "
            f"warm_all={[round(t, 2) for t in warm]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
