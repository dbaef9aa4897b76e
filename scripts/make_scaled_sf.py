"""Synthesize a larger scale factor from an existing one by replicating
every fact table R times with key offsets that preserve join structure
(replica k shifts each table's keys by k * stride(table), and every
foreign key shifts by the SAME stride as its referenced table, so each
replica is an internally-consistent copy). region/nation stay unscaled —
they are fixed-cardinality dims referenced by unshifted nationkeys.

Purpose: the sf1 SCALE PROBE (round-5 verdict item 3). The driver ships
sf{0.001,0.01,0.1}; the next cliff (fold shuffle width, minhash bucket
skew, CC rounds) appears around sf1 (~6M lineitem). Correctness at the
scaled SF stays checkable because the oracle harness (driver_sim.py)
runs DuckDB over the SAME files.

    python scripts/make_scaled_sf.py [factor] [out_dir]
    # default: 10x sf0.1 -> /root/repo/.scratch/sf1
"""

from __future__ import annotations

import os
import sys

SRC = os.environ.get("SCALE_SRC_DIR", "/root/testdata/sf0.1")

# per-table key stride = a round number above the table's max key.
# customer stride stays inside the 200k domain of
# fixtures/flag_buckets.parquet (sha1 buckets precomputed per custkey),
# so the hf_flag_* fixture-joined gates remain checkable at the scaled
# SF — factor <= 10 only.
STRIDES = {
    "customer": {"c_custkey": 20_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 20_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    import duckdb

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t, strides in STRIDES.items():
        cols = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        ]
        sel = ", ".join(
            f"({c} + r.k * {strides[c]})::BIGINT AS {c}" if c in strides else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet' "
            f"CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS k) r "
            f"ORDER BY {list(strides)[0]}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
