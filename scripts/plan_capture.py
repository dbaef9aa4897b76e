"""Capture .explain("formatted") for every bench-timed query.

Usage:
    python scripts/plan_capture.py before          # -> plans/r12/<q>_before.txt
    python scripts/plan_capture.py after           # -> plans/r12/<q>_after.txt
    PLAN_ONLY=q1_pricing_summary,... python scripts/plan_capture.py after

Note: several plan builders execute Spark jobs at build time (trainer
collects, checkpoint pins), so this is not free — run it on a quiet box.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLAN_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hogflare_spark import plans
    from hogflare_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    names = [n for n in bench.HEADLINE if n in plans.QUERIES]
    names += [
        n for n in sorted(plans.QUERIES) if n not in names and n in plans.BENCH_EXTRA
    ]
    only = os.environ.get("PLAN_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]

    from hogflare_spark.functions.caching import unpersist_all

    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        unpersist_all()
        try:
            df = plans.QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
