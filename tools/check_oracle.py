"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then
compares row count, column names, and values (columns sorted by
name, rows sorted, exact string compare after canonicalization).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from westtopologies_spark.queries import catalog
    from westtopologies_spark.session import get_spark

    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for spec in catalog():
        if only and spec.name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.spark(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {spec.name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok   {spec.name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {spec.name}: duckdb error: {e}")
            failures += 1
            continue

        sc, sr = rowset(s_cols, s_rows)
        dc, dr = rowset(d_cols, d_rows)
        status = []
        if len(sr) != len(dr):
            status.append(f"rowcount spark={len(sr)} duck={len(dr)}")
        if sc != dc:
            status.append(f"columns spark={sc} duck={dc}")
        if not status and sr != dr:
            n_bad = sum(1 for a, b in zip(sr, dr) if a != b)
            ex = next((a, b) for a, b in zip(sr, dr) if a != b)
            status.append(f"values differ in {n_bad}/{len(sr)} rows; first: spark={ex[0]} duck={ex[1]}")
        if status:
            print(f"FAIL {spec.name}: " + "; ".join(status))
            failures += 1
        else:
            print(f"ok   {spec.name}: {len(sr)} rows match ({time.time()-t0:.1f}s)")

    spark.stop()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
