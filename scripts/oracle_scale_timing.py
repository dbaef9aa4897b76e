"""Times every registered DuckDB oracle at a (scaled) SF dir with a
per-query wall cap, via one subprocess per oracle so a quadratic plan
can be killed cleanly. Output: name, seconds (or TIMEOUT/ERROR).

    python scripts/oracle_scale_timing.py /root/repo/.scratch/sf1 45
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _run_one(sf_dir: str, sql: str, q):
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.perf_counter()
    try:
        n = len(con.execute(sql).fetchall())
        q.put(("ok", time.perf_counter() - t0, n))
    except Exception as ex:  # noqa: BLE001
        q.put(("err", time.perf_counter() - t0, str(ex)[:120]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    cap = float(sys.argv[2]) if len(sys.argv) > 2 else 45.0
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    from hogflare_spark import plans

    plans.load_all()
    for name, sql in plans.ORACLES.items():
        if only is not None and name not in only:
            continue
        q = mp.Queue()
        p = mp.Process(target=_run_one, args=(sf_dir, sql, q))
        p.start()
        p.join(cap)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"{name:40s} TIMEOUT>{cap:.0f}s", flush=True)
        else:
            status, dt, extra = q.get()
            tag = f"{dt:7.2f}s rows={extra}" if status == "ok" else f"ERROR {extra}"
            print(f"{name:40s} {tag}", flush=True)


if __name__ == "__main__":
    main()
