"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then
compares row count, column names, column TYPES, and values
(columns sorted by name, rows sorted, exact string compare after
canonicalization).

Strictness mirrors the driver (round-1 lesson — VERDICT r1 #2):

- timestamps keep their tzinfo in the value canon: a DuckDB
  ``TIMESTAMP WITH TIME ZONE`` result no longer silently equals a
  naive Spark timestamp (this is exactly how ``p4_timestamp_parse``
  passed locally and failed the driver in round 1);
- column types are compared after normalization.  Equivalence
  classes are the ones the round-1 driver demonstrably accepted
  (schema_match=true rows in CORRECTNESS_r01.json): all integer
  widths collapse to one class (BIGINT/HUGEINT/INTEGER/TINYINT all
  passed against Spark int/bigint), TIMESTAMP ==
  timestamp/timestamp_ntz, VARCHAR == string.  TIMESTAMP WITH TIME
  ZONE is its own class (the driver failed p4 on it).

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

# ---------------------------------------------------------------------------
# type normalization
# ---------------------------------------------------------------------------

# Signed int widths up to 64-bit are one class — the driver hash is
# demonstrably width-insensitive (t1_topk_per_group / x2_tokenize pass
# with DuckDB BIGINT vs Spark INT across rounds 1-3).  HUGEINT /
# unsigned are NOT in the class: the driver hash distinguishes int128
# (r3 root cause — 6 red rows, all uncast DuckDB sum()), so they must
# hard-fail here even when values match.
_INT_CLASS = {"tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"}
_INT128_CLASS = {"hugeint", "uhugeint", "ubigint", "uinteger", "usmallint", "utinyint"}


def _norm_type(t: str) -> str:
    """Collapse a DuckDB or Spark type string to a canonical class."""
    t = t.strip().lower()
    # arrays: duckdb 'integer[]', spark 'array<int>'
    if t.endswith("[]"):
        return f"array<{_norm_type(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{_norm_type(t[6:-1])}>"
    if t in _INT_CLASS:
        return "int"
    if t in _INT128_CLASS:
        return "int128/unsigned (DRIVER-HASH-FATAL: cast to BIGINT)"
    if t in ("timestamp with time zone", "timestamptz"):
        return "timestamptz"
    if t in ("timestamp", "timestamp_ntz", "timestamp_ltz", "datetime"):
        return "timestamp"
    if t in ("varchar", "string", "text"):
        return "string"
    if t in ("double", "float8"):
        return "double"
    if t in ("real", "float", "float4"):
        return "float"
    if t in ("blob", "binary", "bytea"):
        return "binary"
    if t in ("boolean", "bool"):
        return "boolean"
    # decimal(p,s): keep precision/scale — force the two sides identical
    return t


def spark_types(sdf) -> dict[str, str]:
    return {f.name: _norm_type(f.dataType.simpleString()) for f in sdf.schema.fields}


# ---------------------------------------------------------------------------
# value canonicalization — NO tz stripping (driver-strict)
# ---------------------------------------------------------------------------


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
        # keep tzinfo: an aware timestamp must NOT compare equal to a
        # naive one (round-1 p4 regression class)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
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

    def fresh_con():
        # ONE CONNECTION PER ORACLE — not an optimization knob, a
        # correctness requirement for the suite: DuckDB's recursive-
        # CTE replays (w1_exact_windows, the components fixpoints)
        # leak buffer-manager accounting on the connection, after
        # which any later memory-hungry oracle fails with 'Out of
        # Memory Error: Failed to allocate block' regardless of the
        # configured limit (reproduced minimally: w1_exact_windows
        # then dd_soft_weights on one connection fails at a 24 GB
        # limit; dd_soft_weights alone passes at 8 GB).  A fresh
        # in-memory database per query gets a fresh buffer manager;
        # setup cost is milliseconds (views are lazy).
        c = duckdb.connect()
        # the heavy recursive replays (dd_soft_weights & co at sf0.1)
        # have a ~24 GB, scheduling-dependent transient peak in hash
        # operators that CANNOT spill — at a 24 GB cap they died
        # nondeterministically with 'Failed to allocate block' (and
        # DuckDB's post-OOM cleanup then SEGFAULTS the process, which
        # is why three gate runs ended abruptly at the same query).
        # The host has 125 GB and Spark holds <= ~20, so give DuckDB
        # real headroom, a spill path for the operators that can use
        # one, and a bounded thread count (hash-op memory scales with
        # threads).
        c.execute("SET memory_limit='48GB'")
        c.execute("SET temp_directory='/tmp/duckdb_spill'")
        c.execute("SET threads=16")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    failures = 0
    n_run = 0
    for spec in catalog():
        if only and spec.name not in only:
            continue
        # same ContextCleaner starvation fix as bench.py (SCALE.md
        # round-6): shuffle files / broadcast / checkpoint blocks are
        # reclaimed only on driver GC; a 248-query session without
        # one accumulates until the suite tail degrades
        n_run += 1
        if n_run % 8 == 0:
            spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        try:
            sdf = spec.spark(spark, sf_dir)
            s_cols = sdf.columns
            s_typ = spark_types(sdf)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {spec.name}: spark error: {e}")
            failures += 1
            spark.catalog.clearCache()
            continue
        if spec.oracle is None:
            print(f"ok   {spec.name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            spark.catalog.clearCache()
            continue
        con = fresh_con()
        try:
            rel = con.sql(spec.oracle)
            d_cols = list(rel.columns)
            d_typ = {c: _norm_type(str(t)) for c, t in zip(rel.columns, rel.types)}
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {spec.name}: duckdb error: {e}")
            failures += 1
            spark.catalog.clearCache()
            con.close()
            continue

        sc, sr = rowset(s_cols, s_rows)
        dc, dr = rowset(d_cols, d_rows)
        status = []
        if len(sr) != len(dr):
            status.append(f"rowcount spark={len(sr)} duck={len(dr)}")
        if sc != dc:
            status.append(f"columns spark={sc} duck={dc}")
        else:
            bad_types = {
                c: (d_typ[c], s_typ[c]) for c in dc if d_typ[c] != s_typ[c]
            }
            if bad_types:
                status.append(f"types differ (duck, spark): {bad_types}")
        if not status and sr != dr:
            n_bad = sum(1 for a, b in zip(sr, dr) if a != b)
            ex = next((a, b) for a, b in zip(sr, dr) if a != b)
            status.append(f"values differ in {n_bad}/{len(sr)} rows; first: spark={ex[0]} duck={ex[1]}")
        con.close()
        if status:
            print(f"FAIL {spec.name}: " + "; ".join(status))
            failures += 1
        else:
            print(f"ok   {spec.name}: {len(sr)} rows match ({time.time()-t0:.1f}s)")
        # drop intra-query persists, like bench.py: 190 queries'
        # accumulated pins otherwise squeeze the shared 16g driver
        # JVM for the suite's tail
        spark.catalog.clearCache()

    spark.stop()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
