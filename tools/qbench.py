"""Isolated per-query bench for optimization A/B runs (round 8).

Mirrors bench.py methodology exactly — same session factory, same
warmup (events + documents probes, footer touch), same noop sink,
same between-rep clearCache — but runs only the NAMED queries, with
``--reps`` repetitions each, and prints the run's absolute host
calibration anchors so A/B pairs taken minutes apart on this
weather-prone host can be sanity-checked for comparability.

Usage:
    python tools/qbench.py NAME [NAME ...] [--sf DIR] [--reps N]

Output: one JSON line
    {"queries": {name: [t1, t2, ...]}, "cal": {...}, "sf_dir": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from westtopologies_spark.queries import queries
    from westtopologies_spark.session import get_spark, load_table

    cat = queries()
    unknown = [n for n in args.names if n not in cat]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(
        "qbench",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.cleaner.periodicGC.interval": "30min",
        },
    )
    # bench.py warmup: session costs + text-shape probe + footers
    load_table(spark, args.sf, "events").groupBy("event_type").agg(
        F.count(F.lit(1))
    ).write.format("noop").mode("overwrite").save()
    (
        load_table(spark, args.sf, "documents")
        .limit(200)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.sum("count"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    for t in (
        "region nation customer supplier part orders "
        "lineitem events documents embeddings"
    ).split():
        load_table(spark, args.sf, t).count()

    def cal() -> dict:
        t0 = time.perf_counter()
        s = 0
        for j in range(5_000_000):
            s += j
        py_ms = (time.perf_counter() - t0) * 1000
        t0 = time.perf_counter()
        spark.range(0, 250_000).selectExpr("sum(id) AS s").collect()
        jvm_ms = (time.perf_counter() - t0) * 1000
        return {"py_ms": round(py_ms, 1), "jvm_ms": round(jvm_ms, 1)}

    out: dict[str, list[float]] = {}
    anchors = {"start": cal()}
    for name in args.names:
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            df = cat[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        out[name] = times
    anchors["end"] = cal()
    print(json.dumps({"queries": out, "cal": anchors, "sf_dir": args.sf}))
    spark.stop()


if __name__ == "__main__":
    main()
