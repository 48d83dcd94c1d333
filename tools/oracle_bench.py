"""Time the DuckDB oracle suite — the self-referenced baseline.

The reference publishes no numbers (BASELINE.md), so the per-round
head-to-head is: engine catalog wall-clock (bench.py) vs the SAME
declared queries replayed through DuckDB on the same parquet.  This
tool produces the DuckDB side as one JSON line.

Usage: python tools/oracle_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from westtopologies_spark.queries import oracle_sql

    con = duckdb.connect()
    # same bound as check_oracle.py: the default ~80%-of-RAM limit
    # lets the buffer pool grow monotonically across the ~190-oracle
    # suite until raw allocations fail
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    timings: dict[str, float] = {}
    t_all = time.time()
    for name, sql in oracle_sql().items():
        t0 = time.time()
        con.execute(sql).fetchall()
        timings[name] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "oracle_suite_wall_clock_duckdb",
                "value": round(time.time() - t_all, 3),
                "unit": "sec",
                "queries": timings,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
