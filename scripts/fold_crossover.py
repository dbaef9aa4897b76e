"""Head-to-head: Arrow+Python person-fold replay vs the JVM expression
fast path, at a configurable synthetic scale.

This is the measurement behind person_state.FAST_PATH_MIN_COMMANDS
defaulting to None (auto mode keeps the replay): on local[32] with
3 keys/op the replay wins at every size that fits this machine —

    100k ops:  replay ~4s   vs expression fold ~9s   (round 4)
    2M ops:    replay ~16s  vs expression fold ~31s  (round 4)
    2M ops:    replay ~9s   vs expression fold ~35s  (round 5, after
               the sorted-mapInPandas streaming replay rewrite)

The expression fold's as-of snapshot assembly pays two extra exchanges
and three wide sorts over an ops×keys frame; the replay pays C-speed
dict work in one pinned-width exchange. The JVM path's remaining value
is Python-less executors and wholly-spillable execution — the round-5
streaming replay removed the old per-component pandas-buffer memory
argument (kernel state is O(component records), frames are O(arrow
batch)).

Usage: python scripts/fold_crossover.py [n_users] [events_per_user]
Prints one JSON line per timed run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    per_user = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from pyspark.sql import functions as F

    from hogflare_spark.operators.normalize import decode_normalize_requests
    from hogflare_spark.operators.person_state import fold_person_state
    from hogflare_spark.session import get_spark

    spark = get_spark(app_name="fold-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n_users * per_user).select(
        F.col("id").alias("request_seq"),
        (F.col("id") % n_users).cast("string").alias("uid"),
        (F.col("id") / n_users).cast("long").alias("k"),
    )
    body = F.concat(
        F.lit('{"event":"ev","distinct_id":"u'), F.col("uid"),
        F.lit('","properties":{"$set":{"k":'), F.col("k").cast("string"),
        F.lit(',"temp":'), F.col("k").cast("string"),
        F.lit('},"$set_once":{"first_k":'), F.col("k").cast("string"),
        F.lit("}}}"),
    )
    raw = base.select(
        "request_seq", F.lit("capture").alias("endpoint"), body.alias("body")
    )
    cmds = decode_normalize_requests(raw).localCheckpoint(eager=True)
    n = cmds.count()

    for fast in (False, True, False, True):
        t0 = time.time()
        snapshots, persons = fold_person_state(cmds, None, fast_path=fast)
        ns, np_ = snapshots.count(), persons.count()
        print(
            json.dumps(
                {
                    "mode": "jvm_expression" if fast else "python_replay",
                    "commands": n,
                    "sec": round(time.time() - t0, 2),
                    "snapshots": ns,
                    "persons": np_,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
