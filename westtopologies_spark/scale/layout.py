"""Storage-layout operators: bucketing and partitioned layout.

The two levers that remove shuffles and scans BEFORE a query runs —
at 100 TB they matter more than any per-query tuning:

- **bucketing**: write both sides of a recurring equi-join
  pre-hash-partitioned (and sorted) on the join key. Spark then
  plans the join with NO Exchange on either side — the shuffle was
  paid once at write time and amortizes over every subsequent join.
  The reference has no storage layer at all (everything transits
  RabbitMQ, SURVEY.md §1.1); this is the engine-side answer to its
  "join" workloads (J1-J6 all re-key per message).

- **hive-style partitioning**: lay files out as
  ``.../col=value/part-*.parquet`` so predicates on the partition
  column prune entire directories at planning time
  (PartitionFilters in the scan node, no file IO for pruned
  values). The right layout for time- or category-sliced scans
  (W1's per-window reads, P1's event-type filters).

Both helpers are thin, deliberately: the value is the *plan shape*
they produce, asserted by :func:`assert_no_exchange` /
:func:`scan_partition_filters` and the tests, not the write itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed
    table. ``n_buckets`` should be sized so one bucket of the LARGER
    join side fits an executor's memory at the target scale; both
    sides of a co-located join must use the same count and keys."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys.
    With matching bucket specs Spark elides BOTH exchanges (and with
    sorted buckets, both sorts) — verify with
    :func:`assert_no_exchange`."""
    return spark.table(left).join(spark.table(right), on, how)


_SHUFFLE_MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
)


def assert_no_exchange(df: DataFrame) -> None:
    """Raise if the physical plan contains a SHUFFLE exchange (a
    BroadcastExchange moves only the small side and is fine). The
    check for "this join is truly co-located"."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if any(m in plan for m in _SHUFFLE_MARKERS):
        raise AssertionError(f"plan contains a shuffle:\n{plan}")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned parquet layout. Keep partition
    cardinality moderate (directories, not rows): date / hour /
    category columns, never high-cardinality ids."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def scan_partition_filters(df: DataFrame) -> str:
    """Return the PartitionFilters clause of ``df``'s file scan ("" if
    none) — non-empty proves directory-level pruning happens at
    planning time, before any file is opened."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            start = line.index("PartitionFilters")
            return line[start:].split("]", 1)[0] + "]"
    return ""
