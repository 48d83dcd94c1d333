"""data_driven_windows_distributed == the single-task scan, always.

The distributed W1 path (per-block record-high next() + pointer-
doubling orbit, streaming/stateful.py) must be BIT-identical to the
sequential scan whose oracle has been driver-green since round 1 —
on non-monotone timestamps, NULL measurements, NaT timestamps, any
block count, and the real testdata.  Equivalence to the scan IS
equivalence to the recursive-CTE oracle by transitivity.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from westtopologies_spark.streaming.stateful import (
    data_driven_windows,
    data_driven_windows_distributed,
)

BASE = dt.datetime(2024, 1, 1)
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _df(spark, events):
    rows = [
        (
            i,
            None if sec is None else BASE + dt.timedelta(seconds=sec),
            1,
            "click",
            None if cents is None else cents / 100.0,
            "{}",
        )
        for i, (sec, cents) in enumerate(events)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _rowset(df):
    out = []
    for r in df.collect():
        t = tuple(r)
        out.append(
            tuple(x.isoformat() if hasattr(x, "isoformat") else x for x in t)
        )
    return sorted(out)


def _assert_match(spark, events, interval_sec=600, num_blocks=4):
    df = _df(spark, events)
    scan = data_driven_windows(df, interval_sec=interval_sec, mode="scan")
    dist = data_driven_windows_distributed(
        df, interval_sec=interval_sec, num_blocks=num_blocks
    )
    assert scan.columns == dist.columns
    assert _rowset(scan) == _rowset(dist)


# non-monotone ts in arrival order is the hard case: next() is not an
# as-of join, and window starts hop arbitrarily through the seq space
events_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 7200)),  # seconds; None = NaT
        st.one_of(st.none(), st.integers(-5000, 40_000)),  # cents; None=NULL
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(events=events_strategy)
def test_random_equivalence(spark, events):
    _assert_match(spark, events, interval_sec=600, num_blocks=3)


@pytest.mark.parametrize("num_blocks", [1, 2, 7])
def test_block_count_invariance(spark, num_blocks):
    events = [(s * 97 % 2400, (s * 13) % 700) for s in range(80)]
    _assert_match(spark, events, interval_sec=300, num_blocks=num_blocks)


def test_degenerate_shapes(spark):
    _assert_match(spark, [(0, 100)])  # single event: no trigger, no row
    _assert_match(spark, [(0, 100), (601, 200)])  # exactly one window
    _assert_match(spark, [(0, None), (None, 50), (700, None)])  # NULL/NaT mix
    _assert_match(spark, [(None, 10), (0, 20), (650, 30)])  # NaT opener ends chain
    # equal timestamps: the strictly-later arrival still triggers
    _assert_match(spark, [(0, 1), (600, 2), (600, 3), (600, 4)])


def test_empty_input(spark):
    df = _df(spark, []).limit(0)
    out = data_driven_windows_distributed(df)
    assert out.columns == ["window_start", "window_end", "n_events", "sum_value"]
    assert out.count() == 0


def test_interval_zero_rejected(spark):
    with pytest.raises(ValueError):
        data_driven_windows_distributed(_df(spark, [(0, 1)]), interval_sec=0)


def test_testdata_equivalence(spark):
    """Real sf0.001 events table (monotone-ish, NULL values present)."""
    from westtopologies_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    scan = data_driven_windows(ev, mode="scan")
    dist = data_driven_windows_distributed(ev, num_blocks=8)
    assert _rowset(scan) == _rowset(dist)


def test_auto_mode_picks_scan_below_threshold(spark):
    """mode='auto' must leave small inputs on the proven scan path —
    the physical plan contains the single FlatMapGroupsInPandas, not
    the distributed join cascade."""
    df = _df(spark, [(0, 100), (700, 200)])
    plan = data_driven_windows(df, mode="auto")._jdf.queryExecution().toString()
    assert "FlatMapGroupsInPandas" in plan
