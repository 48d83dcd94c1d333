"""Streaming throughput bench: replay the events parquet through the
W1-aligned watermarked window rollup (the flagship streaming path) as
one availableNow run into a noop-style memory sink, and print ONE JSON
line {"metric": "stream_events_per_sec", ...}.

Measures end-to-end micro-batch execution including stream startup —
the number BASELINE.md cites. Usage:

    python tools/stream_bench.py            # $SPARK_GRAFT_SF_DIR or sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from westtopologies_spark.session import get_spark, load_table  # noqa: E402
from westtopologies_spark.streaming.stateful import (  # noqa: E402
    aligned_window_rollup_stream,
    data_driven_window_rollup_stream,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("stream-bench")

    # stage the batch table as a TIME-ORDERED parquet stream dir (8
    # chunks, increasing mtimes): a real stream arrives roughly in
    # event-time order — random-order replay makes the watermark jump
    # to max after the first micro-batch, so every later row is late
    # (dropped by the aligned path, and the rank-on-close operator
    # never sees a window go silent, so nothing ever closes)
    batch = load_table(spark, sf_dir, "events")
    stage = os.path.join("/tmp", f"stream_bench_{os.getpid()}")
    os.makedirs(stage, exist_ok=True)
    pdf_all = batch.toPandas().sort_values("ts").reset_index(drop=True)

    # SPARK_GRAFT_STREAM_REPEAT > 1 lays K time-shifted copies of the
    # replay end-to-end (ids offset, event-time contiguous), so the
    # ~5-8 s fixed stream-startup cost amortizes and the reported
    # rate approaches the SUSTAINED per-event cost — the number that
    # matters on a long-running cluster ingest. Default 1 keeps the
    # historical end-to-end measurement BASELINE.md cites.
    repeat = int(os.environ.get("SPARK_GRAFT_STREAM_REPEAT", "1"))
    if repeat > 1:
        import pandas as pd

        span = (pdf_all["ts"].max() - pdf_all["ts"].min()) + pd.Timedelta(
            minutes=11
        )
        id_span = int(pdf_all["event_id"].max()) + 1
        copies = []
        for j in range(repeat):
            c = pdf_all.copy()
            c["ts"] = c["ts"] + j * span
            c["event_id"] = c["event_id"] + j * id_span
            copies.append(c)
        pdf_all = pd.concat(copies, ignore_index=True)
    n_events = len(pdf_all)
    n_chunks = 8 * repeat
    per = (n_events + n_chunks - 1) // n_chunks
    now = time.time()
    for i in range(n_chunks):
        chunk = pdf_all.iloc[i * per : (i + 1) * per]
        p = os.path.join(stage, f"part-{i:02d}.parquet")
        chunk.to_parquet(
            p,
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(p, (now - 100 + i, now - 100 + i))
    del pdf_all

    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage)
        # round-tripped column may come back TIMESTAMP_NTZ; watermarks
        # require TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    t0 = time.time()
    q = (
        aligned_window_rollup_stream(src)
        .writeStream.format("memory")
        .queryName("stream_bench_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    elapsed = time.time() - t0
    n_windows = spark.sql("SELECT count(*) FROM stream_bench_out").collect()[0][0]

    # keyed EXACT mode (VERDICT r1 item 6): the reference's data-driven
    # flush rule with state sharded over 64 hash keys (stands in for
    # conversation-root keying via with_root_ids on the tweet stream) —
    # executor-parallel arbitrary state, not the parallelism-1 default.
    src2 = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("shard_id", F.pmod(F.xxhash64("user_id"), F.lit(64)))
    )
    t1 = time.time()
    q2 = (
        data_driven_window_rollup_stream(src2, key_cols=["shard_id"])
        .writeStream.format("memory")
        .queryName("stream_bench_keyed_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(600)
    elapsed_keyed = time.time() - t1
    n_keyed = spark.sql("SELECT count(*) FROM stream_bench_keyed_out").collect()[0][0]

    # windowed top-k: per-hour heavy-hitter rank emitted at window
    # close (applyInPandasWithState + EventTimeTimeout) — the custom
    # rank-on-close operator, state bounded by open windows x types
    from westtopologies_spark.streaming.stateful import (
        windowed_topk_stream_gaws,
    )

    src3 = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    t2 = time.time()
    q3 = (
        windowed_topk_stream_gaws(src3, interval_sec=3600, k=3)
        .writeStream.format("memory")
        .queryName("stream_bench_topk_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(600)
    elapsed_topk = time.time() - t2
    n_topk = spark.sql("SELECT count(*) FROM stream_bench_topk_out").collect()[0][0]

    # streaming LSH candidate generation: the documents table replayed
    # as doc_id-ordered micro-batches through the keyed band-bucket
    # posting-list state (ingest-time dedup candidate emitter)
    from westtopologies_spark.streaming.stateful import lsh_candidate_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stage_d = os.path.join("/tmp", f"stream_bench_docs_{os.getpid()}")
    os.makedirs(stage_d, exist_ok=True)
    dpdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    n_docs = len(dpdf)
    # docs are NOT repeated by SPARK_GRAFT_STREAM_REPEAT — keep their
    # chunk count fixed so the micro-batch size (and therefore the
    # measured per-doc cost) is independent of the events repeat
    n_chunks_d = 8
    per_d = (n_docs + n_chunks_d - 1) // n_chunks_d
    for i in range(n_chunks_d):
        chunk = dpdf.iloc[i * per_d : (i + 1) * per_d]
        p = os.path.join(stage_d, f"part-{i:02d}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (now - 100 + i, now - 100 + i))
    del dpdf
    src4 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(stage_d)
    )
    t3 = time.time()
    q4 = (
        lsh_candidate_stream(src4)
        .writeStream.format("memory")
        .queryName("stream_bench_lsh_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q4.awaitTermination(600)
    elapsed_lsh = time.time() - t3
    n_cand = spark.sql("SELECT count(*) FROM stream_bench_lsh_out").collect()[0][0]

    print(
        json.dumps(
            {
                "metric": "stream_events_per_sec",
                "value": round(n_events / elapsed, 1),
                "unit": "events/sec",
                "elapsed_sec": round(elapsed, 2),
                "n_events": n_events,
                "n_closed_windows": int(n_windows),
                "keyed_exact_events_per_sec": round(n_events / elapsed_keyed, 1),
                "keyed_exact_elapsed_sec": round(elapsed_keyed, 2),
                "keyed_exact_n_windows": int(n_keyed),
                "keyed_exact_n_keys": 64,
                "topk_events_per_sec": round(n_events / elapsed_topk, 1),
                "topk_elapsed_sec": round(elapsed_topk, 2),
                "topk_rows_emitted": int(n_topk),
                "lsh_docs_per_sec": round(n_docs / elapsed_lsh, 1),
                "lsh_elapsed_sec": round(elapsed_lsh, 2),
                "lsh_n_docs": n_docs,
                "lsh_candidates_emitted": int(n_cand),
                "repeat": repeat,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
