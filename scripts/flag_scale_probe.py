"""Scale probe for hf_flag_eval (r5 verdict #4 / r6 carry-over): times
the gate at a given SF dir, then times its pipeline stages separately —
context assembly (to_json struct), flag evaluation (parse_json VARIANT +
compiled Column trees + explode), and the final global orderBy — so the
super-linear suspect can be isolated instead of guessed.

    SPARK_GRAFT_SF_DIR=/root/repo/.scratch/sf1 python scripts/flag_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:44s} {best:7.3f}s", flush=True)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from hogflare_spark import plans
    from hogflare_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="flag-probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    # flags.compiler builds Column literals at import — needs the session
    plans.load_all()
    from hogflare_spark.flags.compiler import evaluate_flags_df
    from hogflare_spark.flags.model import parse_flag_config
    from hogflare_spark.plans.hogflare_semantics import _FLAG_CONFIG
    from hogflare_spark.sources.readers import load_table

    gate = plans.QUERIES["hf_flag_eval"]
    gate(spark, SF_DIR).count()  # warm

    t("full gate (with orderBy)", lambda: gate(spark, SF_DIR).collect())

    cust = load_table(spark, SF_DIR, "customer")
    contexts = cust.select(
        F.col("c_custkey"),
        F.col("c_custkey").cast("string").alias("distinct_id"),
        F.to_json(
            F.struct(
                F.col("c_name").alias("name"),
                F.col("c_mktsegment").alias("segment"),
                F.col("c_acctbal").cast("string").alias("balance"),
            )
        ).alias("person_properties"),
        F.create_map().cast("map<string,string>").alias("groups"),
        F.lit(None).cast("string").alias("group_properties"),
    )
    flags = parse_flag_config(_FLAG_CONFIG)

    t("context assembly only", lambda: contexts.count())
    ev = evaluate_flags_df(contexts, flags)
    t("eval, no sort (count)", lambda: ev.count())
    # count() lets Catalyst prune the flag expressions entirely — force
    # full evaluation JVM-side by aggregating over every output column,
    # still with zero rows transferred to the driver
    t("eval FORCED, JVM-only (agg all cols)", lambda: ev.agg(
        F.sum(F.length("value")),
        F.sum(F.length("reason")),
        F.sum(F.length("flag_key")),
        F.sum("condition_index"),
        F.sum(F.length(F.coalesce("payload", F.lit(""))))
    ).collect())
    t("eval, no sort (collect)", lambda: ev.select(
        "c_custkey", "flag_key", "value", "reason", "condition_index"
    ).collect())
    t("eval + global orderBy (collect)", lambda: ev.select(
        "c_custkey", "flag_key", "value", "reason", "condition_index"
    ).orderBy("c_custkey", "flag_key").collect())
    n = ev.count()
    print(f"rows out: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
