"""Storage-layout plan-shape tests: bucketed joins must not shuffle,
partitioned layouts must prune at planning time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from westtopologies_spark.scale import layout


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    from westtopologies_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    layout.write_bucketed(orders, "t_orders_b", ["o_orderkey"], n_buckets=8)
    layout.write_bucketed(lineitem, "t_lineitem_b", ["o_orderkey"], n_buckets=8)
    # no broadcast: at real scale neither side of this join fits in
    # one executor — the co-located sort-merge path is the target
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = layout.colocated_join(
            spark, "t_orders_b", "t_lineitem_b", ["o_orderkey"]
        )
        layout.assert_no_exchange(joined)  # the point of bucketing
        # and it still computes the right thing
        n = joined.count()
        expect = orders.join(lineitem, "o_orderkey").count()
        assert n == expect and n > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_unbucketed_join_does_exchange(spark, sf_dir):
    """Control: the same join without bucketing shuffles (so the
    no-Exchange assertion above is meaningful)."""
    from westtopologies_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    # avoid broadcast so the plain plan shows its shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(lineitem.hint("shuffle_hash"), "o_orderkey")
        with pytest.raises(AssertionError):
            layout.assert_no_exchange(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    from westtopologies_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = str(tmp_path / "events_by_type")
    layout.write_partitioned(ev, path, ["event_type"])

    one_type = ev.select("event_type").first()["event_type"]
    pruned = spark.read.parquet(path).filter(F.col("event_type") == one_type)
    pf = layout.scan_partition_filters(pruned)
    assert "event_type" in pf, pf  # directory pruning planned
    # pruned read returns exactly that slice
    assert pruned.count() == ev.filter(F.col("event_type") == one_type).count()
