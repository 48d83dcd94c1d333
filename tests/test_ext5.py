"""Round-3 fifth extension batch: the remaining TPC-H decorrelation
shapes (Q2/Q4/Q9/Q11/Q16/Q20 adapted to the partsupp-less schema),
the small-file compaction planner, hourly OHLC resampling, and PQ
asymmetric-distance top-k search — each checked against a literal
correlated-SQL form or a hand-computed reference on constructed
frames, plus ranking invariants for the ADC search.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F


def _write(tmp: str, **tables) -> None:
    for name, df in tables.items():
        df.write.parquet(f"{tmp}/{name}.parquet")


# ---------------------------------------------------------------------------
# sq_order_priority (Q4): left-semi rewrite vs literal EXISTS
# ---------------------------------------------------------------------------


def test_order_priority_matches_literal_exists(spark):
    from westtopologies_spark.queries_ext5 import sq_order_priority

    d0 = dt.datetime(1997, 2, 1)
    out_of_range = dt.datetime(1996, 2, 1)
    late = d0 + dt.timedelta(days=45)
    ontime = d0 + dt.timedelta(days=5)
    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", d0),  # one late line -> counts
            (2, "1-URGENT", d0),  # two lines, one late -> counts once
            (3, "5-LOW", d0),  # only ontime lines -> excluded
            (4, "5-LOW", out_of_range),  # date filter -> excluded
            (5, "2-HIGH", d0),  # no lines at all -> excluded
        ],
        ["o_orderkey", "o_orderpriority", "o_orderdate"],
    )
    li = spark.createDataFrame(
        [(1, late), (2, ontime), (2, late), (3, ontime), (4, late)],
        ["l_orderkey", "l_shipdate"],
    )
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, orders=orders, lineitem=li)
        got = {
            (r.o_orderpriority, r.n_orders)
            for r in sq_order_priority(spark, tmp).collect()
        }
    orders.createOrReplaceTempView("_o4")
    li.createOrReplaceTempView("_l4")
    expect = {
        (r.o_orderpriority, r.n_orders)
        for r in spark.sql(
            """
            SELECT o_orderpriority, count(*) AS n_orders FROM _o4 o
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-04-01'
              AND EXISTS (SELECT 1 FROM _l4 l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate
                                               + INTERVAL 30 DAYS)
            GROUP BY 1
            """
        ).collect()
    }
    assert got == expect == {("1-URGENT", 2)}


# ---------------------------------------------------------------------------
# sq_min_cost_supplier (Q2): argmin + tie-break + dimension filters
# ---------------------------------------------------------------------------


def test_min_cost_supplier_argmin_and_filters(spark):
    from westtopologies_spark.queries_ext5 import sq_min_cost_supplier

    li = spark.createDataFrame(
        [
            # part 1: s1 and s2 tie at min 5.0 -> lower suppkey 101 wins
            (1, 101, 5.0), (1, 101, 9.0), (1, 102, 5.0),
            # part 2: s2 strictly cheaper
            (2, 101, 8.0), (2, 102, 3.0),
            # part 3: out of the size band -> dropped
            (3, 101, 1.0),
        ],
        ["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    part = spark.createDataFrame(
        [(1, "alpha", 15), (2, "beta", 12), (3, "gamma", 40)],
        ["p_partkey", "p_name", "p_size"],
    )
    # supplier 102 sits outside the EUROPE region -> part 2 vanishes
    supplier = spark.createDataFrame(
        [(101, "s101", 10), (102, "s102", 20)],
        ["s_suppkey", "s_name", "s_nationkey"],
    )
    nation = spark.createDataFrame(
        [(10, "GERMANY", 1), (20, "BRAZIL", 2)],
        ["n_nationkey", "n_name", "n_regionkey"],
    )
    region = spark.createDataFrame(
        [(1, "EUROPE"), (2, "AMERICA")], ["r_regionkey", "r_name"]
    )
    with tempfile.TemporaryDirectory() as tmp:
        _write(
            tmp,
            lineitem=li, part=part, supplier=supplier,
            nation=nation, region=region,
        )
        rows = sq_min_cost_supplier(spark, tmp).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.p_partkey, r.s_suppkey, r.n_name, r.cost_cents) == (
        1, 101, "GERMANY", 500,
    )


# ---------------------------------------------------------------------------
# sq_important_parts (Q11): integer threshold boundary at 1.1x mean
# ---------------------------------------------------------------------------


def test_important_parts_threshold_boundary(spark):
    from westtopologies_spark.queries_ext5 import sq_important_parts

    # four parts with value 100, 100, 110, 130 cents: total=440, n=4,
    # mean=110 -> keep iff vc*4*10 > 11*440 = 4840, i.e. vc > 121.
    # Part 3 sits EXACTLY at 1.1x mean (110*1.1=121 -> 110? no:
    # vc=110 -> 4400 < 4840 out; vc=130 -> 5200 > 4840 in.
    li = spark.createDataFrame(
        [(1, 1.00), (2, 1.00), (3, 1.10), (4, 1.30)],
        ["l_partkey", "l_extendedprice"],
    )
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, lineitem=li)
        got = {
            (r.p_partkey, r.value_cents)
            for r in sq_important_parts(spark, tmp).collect()
        }
    assert got == {(4, 130)}


# ---------------------------------------------------------------------------
# sq_supplier_variety (Q16): anti-join exclusion + distinct counting
# ---------------------------------------------------------------------------


def test_supplier_variety_excludes_and_dedups(spark):
    from westtopologies_spark.queries_ext5 import sq_supplier_variety

    li = spark.createDataFrame(
        [
            # part 1: suppliers 101 (dup lines), 102, 103(excluded)
            (1, 101), (1, 101), (1, 102), (1, 103),
            # part 2 (excluded brand): supplier 101
            (2, 101),
            # part 3 (size too large): supplier 102
            (3, 102),
        ],
        ["l_partkey", "l_suppkey"],
    )
    part = spark.createDataFrame(
        [
            (1, "Brand#2", "SMALL", 10),
            (2, "Brand#1", "SMALL", 10),
            (3, "Brand#3", "LARGE", 40),
        ],
        ["p_partkey", "p_brand", "p_type", "p_size"],
    )
    supplier = spark.createDataFrame(
        [(101, 50.0), (102, 10.0), (103, -5.0)],
        ["s_suppkey", "s_acctbal"],
    )
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, lineitem=li, part=part, supplier=supplier)
        rows = sq_supplier_variety(spark, tmp).collect()
    assert len(rows) == 1
    r = rows[0]
    # duplicate (1,101) lines count once; 103 is excluded
    assert (r.p_brand, r.p_type, r.supplier_cnt) == ("Brand#2", "SMALL", 2)


# ---------------------------------------------------------------------------
# sq_dominant_suppliers (Q20): strict majority boundary
# ---------------------------------------------------------------------------


def test_dominant_suppliers_strict_majority(spark):
    from westtopologies_spark.queries_ext5 import sq_dominant_suppliers

    in_year = dt.datetime(1997, 6, 1)
    out_year = dt.datetime(1996, 6, 1)
    li = spark.createDataFrame(
        [
            # part 1 total 10: s101 ships 6 (>half) -> dominant
            (1, 101, 6.0, in_year), (1, 102, 4.0, in_year),
            # part 2 total 10: exact half each -> nobody dominant
            (2, 101, 5.0, in_year), (2, 103, 5.0, in_year),
            # part 3: s103 dominant but OUTSIDE the ship year window
            (3, 103, 9.0, out_year), (3, 102, 1.0, in_year),
        ],
        ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )
    part = spark.createDataFrame(
        [(1, "red bolt"), (2, "red gear"), (3, "red cog")],
        ["p_partkey", "p_name"],
    )
    supplier = spark.createDataFrame(
        [(101, "s101", 10), (102, "s102", 10), (103, "s103", 10)],
        ["s_suppkey", "s_name", "s_nationkey"],
    )
    nation = spark.createDataFrame(
        [(10, "GERMANY")], ["n_nationkey", "n_name"]
    )
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, lineitem=li, part=part, supplier=supplier, nation=nation)
        got = {r.s_suppkey for r in sq_dominant_suppliers(spark, tmp).collect()}
    # part 3's in-window volume is s102's 1.0 alone -> s102 ships ALL
    # of the in-window volume for part 3 and is dominant there
    assert got == {101, 102}


# ---------------------------------------------------------------------------
# dv_compaction_plan: next-fit packing on the running byte total
# ---------------------------------------------------------------------------


def test_compaction_plan_next_fit_bins(spark):
    from westtopologies_spark.queries_ext5 import dv_compaction_plan

    # one event per (day, row); props sized so each day-file is
    # exactly 3000 bytes -> with target 4096: file days 1..4 get
    # cum_before 0, 3000, 6000, 9000 -> bins 0, 0, 1, 2
    base = dt.datetime(2024, 1, 1)
    rows = [
        (day * 10 + i, base + dt.timedelta(days=day, hours=i), 1, "t", 0.0,
         "x" * 1500)
        for day in range(4)
        for i in range(2)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, events=ev)
        out = {r.bin: r for r in dv_compaction_plan(spark, tmp).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].n_files == 2 and out[0].bytes == 6000
    assert out[1].n_files == 1 and out[2].n_files == 1
    assert out[0].first_day == base
    assert out[0].last_day == base + dt.timedelta(days=1)


# ---------------------------------------------------------------------------
# ts_ohlc_hourly: first/last by (ts, event_id) total order
# ---------------------------------------------------------------------------


def test_ohlc_picks_total_order_endpoints(spark):
    from westtopologies_spark.queries_ext5 import ts_ohlc_hourly

    h = dt.datetime(2024, 1, 1, 10)
    s = dt.timedelta(seconds=1)
    ev = spark.createDataFrame(
        [
            # same-ts tie at the open: event_id 1 < 2 -> open = 7.0
            (1, h, 1, "a", 7.0, ""),
            (2, h, 1, "a", 9.0, ""),
            (3, h + 10 * s, 1, "a", 1.0, ""),
            # same-ts tie at the close: event_id 5 > 4 -> close = 8.0
            (4, h + 20 * s, 1, "a", 2.0, ""),
            (5, h + 20 * s, 1, "a", 8.0, ""),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, events=ev)
        rows = ts_ohlc_hourly(spark, tmp).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.open_v, r.high_v, r.low_v, r.close_v, r.n_events) == (
        7.0, 9.0, 1.0, 8.0, 5,
    )


# ---------------------------------------------------------------------------
# ann_pq_adc: ranking invariants + ADC exactness on a centroid corpus
# ---------------------------------------------------------------------------


def test_pq_adc_ranking_invariants(spark, sf_dir):
    from westtopologies_spark.queries_ext5 import ann_pq_adc
    from westtopologies_spark.scale import constants as C

    rows = ann_pq_adc(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == C.ADC_N_QUERIES
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, C.ADC_TOP_K + 1))
        # self-exclusion and non-negative integer distances
        assert all(r.vec_id != qid for r in rs)
        assert all(r.adc_x1e6 >= 0 for r in rs)
        # rank order agrees with (distance, vec_id) order
        key = [(r.adc_x1e6, r.vec_id) for r in rs]
        assert key == sorted(key)


def test_pq_adc_agrees_with_exact_on_code_identical_vectors(spark, sf_dir):
    """Two vectors with IDENTICAL codes must get the SAME ADC distance
    from every query — the quantization-granularity contract."""
    from westtopologies_spark.queries_ext5 import ann_pq_adc
    from westtopologies_spark.scale.similarity import pq_codes

    codes = {
        r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3)
        for r in pq_codes(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        ).collect()
    }
    adc = ann_pq_adc(spark, sf_dir).collect()
    seen: dict[tuple, int] = {}
    for r in adc:
        k = (r.query_id, codes[r.vec_id])
        if k in seen:
            assert seen[k] == r.adc_x1e6
        else:
            seen[k] = r.adc_x1e6
