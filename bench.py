"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed as a full pipeline ending in a cheap action
(count via noop-style aggregation) so the measured time is the real
plan execution, not result serialization to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from westtopologies_spark.queries import catalog  # noqa: E402
from westtopologies_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # get_spark now defaults spark.cleaner.periodicGC.interval
            # to 5min (the session-owned production cadence, SCALE.md
            # round-7) — the BENCH overrides it back to Spark's 30min:
            # a timer-driven full GC can land MID-QUERY (stop-the-world
            # inside a 40-stage iterative kernel distorts that one
            # entry); the explicit between-query System.gc() below
            # cleans at deterministic safe points instead.
            # SPARK_GRAFT_BENCH_PERIODIC_GC overrides the interval for
            # the A/B that measures what a long-lived production
            # driver gets from the 5-min timer ALONE (VERDICT r7 #4:
            # GC_EVERY=0 + PERIODIC_GC=5min).
            "spark.cleaner.periodicGC.interval": os.environ.get(
                "SPARK_GRAFT_BENCH_PERIODIC_GC", "30min"
            ),
        },
    )

    # two tiny untimed queries first: pay the one-off session costs
    # (JVM class loading, codegen compiler warmup, shuffle machinery,
    # parquet footer reads) that a long-lived cluster amortizes across
    # jobs — they would otherwise all land on whichever query runs
    # first. The second probe touches the documents table through the
    # explode(split())+two-agg shape shared by the text family: r6's
    # driver suite charged tx_gopher_quality 24.7s because rotation
    # put it early — profiled r7 as 9.0s session-cold / 4.1s after the
    # events-only warmup / 2.9s after this probe / 1.5s steady-state.
    from pyspark.sql import functions as F

    from westtopologies_spark.session import load_table

    load_table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1))
    ).write.format("noop").mode("overwrite").save()
    (
        load_table(spark, sf_dir, "documents")
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
    # touch every table's parquet footers once so the first TIMED
    # entry that reads a given table is not charged its first scan
    # (rotation decides which entry runs first — r7's pos-0 entry
    # paid the first orders read)
    for t in (
        "region nation customer supplier part orders "
        "lineitem events documents embeddings"
    ).split():
        load_table(spark, sf_dir, t).count()

    # Periodic driver GC between queries (r6, the in-suite-collapse
    # fix): Spark's ContextCleaner reclaims shuffle files, broadcast
    # blocks and localCheckpoint RDDs only when the DRIVER JVM
    # garbage-collects their handles — and a 16g heap running short
    # per-query jobs can go the whole 248-query suite without an
    # old-gen GC. The accumulated state (thousands of shuffle files,
    # checkpoint + broadcast blocks) degrades exactly the iterative
    # multi-stage kernels, nondeterministically: the r5 driver suite
    # measured dd_embedding_neardup at 92.4s vs 6.8s isolated, and a
    # r6 rerun collapsed a DIFFERENT set (gr_khop_reach 135s vs 4s).
    # clearCache() cannot fix this (it only drops SQL-cached plans).
    # A real long-lived cluster GCs naturally under allocation
    # pressure; in local mode we force it every GC_EVERY queries
    # (~100-300ms each, bounded overhead).
    try:
        gc_every = int(
            os.environ.get("SPARK_GRAFT_BENCH_GC_EVERY", "8").strip() or "8"
        )
    except ValueError:
        # malformed env degrades to the default instead of crashing the
        # whole bench (ADVICE r6 — mirrors the _FUZZ_X fix)
        gc_every = 8
    timings: dict[str, float] = {}
    probes: dict[str, float] = {}
    jprobes: dict[str, float] = {}

    def _ambient_probe() -> float:
        # fixed pure-Python workload (~5ms idle): a per-query ambient
        # tracer. The r7 clean runs showed multi-minute HOST stalls
        # (hypervisor steal / IO weather) inflating whole contiguous
        # catalog windows 5-45x while the single late-suite canary
        # stayed flat — per-query probes localize such windows
        # mechanically so a stalled run is diagnosed, not
        # misattributed to the entries that happened to be running.
        t0 = time.perf_counter()
        s = 0
        for j in range(200_000):
            s += j
        return time.perf_counter() - t0

    # fixed tiny Spark job (~30-60ms steady-state): the JVM-VISIBLE
    # ambient tracer (VERDICT r7 #1). The driver's r7 run proved the
    # pure-Python probe blind to JVM-side pressure: its canary query
    # ran 6x slow while the Python probes at the same positions were
    # FLAT (p5_derived_flag probe 0.9x at 6x query time) — CPU/memory
    # contention that stalls executor threads doesn't stall a 5ms
    # GIL-held Python loop. This probe runs through the same codegen,
    # scheduler and executor pool as the timed queries, so it shares
    # their fate; its plan is built once so steady-state cost is the
    # job run alone.
    _jprobe_df = spark.range(0, 250_000).selectExpr("sum(id) AS s")
    _jprobe_df.collect()  # pay codegen/first-run cost untimed

    def _jvm_probe() -> float:
        t0 = time.perf_counter()
        _jprobe_df.collect()
        return time.perf_counter() - t0

    # run-level ABSOLUTE host calibration (r8): the per-query probes
    # are relative to the run's own median, so a run taken entirely
    # inside a host slow-mode window (measured 2026-08-17: the same
    # 5M-iteration loop 208ms -> 550-650ms at near-zero load and ~1%
    # steal) looks internally flat. Recording the anchor makes
    # cross-run comparisons self-calibrating: a candidate whose
    # cal_py is 2-3x the baseline's ran on a slower host, full stop.
    def _cal() -> dict[str, float]:
        t0 = time.perf_counter()
        s = 0
        for j in range(5_000_000):
            s += j
        py_ms = (time.perf_counter() - t0) * 1000
        t0 = time.perf_counter()
        _jprobe_df.collect()
        jvm_ms = (time.perf_counter() - t0) * 1000
        return {"py_ms": round(py_ms, 2), "jvm_ms": round(jvm_ms, 2)}

    cal = {"start": _cal()}

    t_all = time.time()
    for i, spec in enumerate(catalog()):
        probes[spec.name] = round(_ambient_probe(), 5)
        jprobes[spec.name] = round(_jvm_probe(), 5)
        t0 = time.time()
        df = spec.spark(spark, sf_dir)
        # foreach-noop action: executes the whole plan, returns nothing
        df.write.format("noop").mode("overwrite").save()
        timings[spec.name] = round(time.time() - t0, 3)
        # drop intermediates persisted inside the query: caches are
        # strictly intra-query; letting 100+ queries' pins accumulate
        # eventually evicts/OOMs the execution memory pool
        spark.catalog.clearCache()
        del df
        if gc_every > 0 and (i + 1) % gc_every == 0:
            spark.sparkContext._jvm.System.gc()
    total = round(time.time() - t_all, 3)
    cal["end"] = _cal()
    write_full_report(timings, total, sf, probes, jprobes, cal)
    print(contract_line(timings, total, sf))
    spark.stop()


# The driver records a bounded tail of stdout and parses the final
# line as JSON; round 3's BENCH record came back `parsed: null`
# because the full 245-query timing map pushed the line past the
# capture window.  The contract line therefore carries a compact
# headline subset (one representative per operator family, ~1 KB);
# the COMPLETE per-query map goes to BENCH_FULL.json next to this
# script for the per-round per-query comparison.
HEADLINE = [
    "w1_window_rollup", "s3_json_parse_filter", "a3_role_assignment",
    "a5_nb_accept", "t1_topk_per_group", "x2_tokenize",
    "x4_stem_rule_based", "j5_property_scan", "m1_region_topk",
    "ts_sessionize", "ts_asof_join", "tp_pack_sequences",
    "dd_exact", "dd_minhash_lsh", "dd_semantic_dedup",
    "ann_bruteforce_topk", "ann_ivf_topk", "emb_kmeans",
    "mm_phash", "mm_cdc_chunks", "tx_tfidf", "tx_bigram_lm",
    "dv_scd2_history", "gr_pagerank", "ag_percentiles",
    "sq_shipping_priority", "gs_cube", "w2_count_batches",
]

# Keep the stdout contract line comfortably inside the driver's
# capture window (r3's full map overflowed it).
CONTRACT_LINE_MAX_BYTES = 1500


def contract_line(timings: dict[str, float], total: float, sf: float) -> str:
    # Degrade gracefully, never assert (ADVICE r4: an assert AFTER the
    # whole timed suite ran would lose the round's BENCH record): drop
    # trailing headline entries until the line fits.  The unit test
    # pins that the full headline normally fits.
    compact = {q: timings[q] for q in HEADLINE if q in timings}
    while True:
        line = json.dumps(
            {
                "metric": "catalog_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": compact,
                "sf": sf,
            }
        )
        if "\n" not in line and (
            len(line) <= CONTRACT_LINE_MAX_BYTES or not compact
        ):
            return line
        compact.pop(next(reversed(compact)))


def write_full_report(
    timings: dict[str, float],
    total: float,
    sf: float,
    probes: dict[str, float] | None = None,
    jprobes: dict[str, float] | None = None,
    cal: dict[str, dict[str, float]] | None = None,
) -> None:
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(
            {
                "metric": "catalog_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                # per-query ambient tracers: "probes" is the pure-
                # Python host tracer (_ambient_probe), "jprobes" the
                # JVM-visible Spark-job tracer (_jvm_probe) — the
                # regression gate reads BOTH (either family elevated
                # is stall evidence; VERDICT r7 #1)
                "probes": probes or {},
                "jprobes": jprobes or {},
                # absolute host-speed anchors at run start/end (r8):
                # {"start"/"end": {"py_ms", "jvm_ms"}} — lets the
                # gate see that an entire RUN sat in a host
                # slow-mode window even when its internal medians
                # are flat
                "cal": cal or {},
            },
            f,
        )
        f.write("\n")


if __name__ == "__main__":
    main()
