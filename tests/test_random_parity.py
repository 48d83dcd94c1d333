"""Randomized cross-engine parity: hypothesis-generated tables, the
HARDENED catalog entry run on Spark vs its DuckDB oracle, strict
value compare.

This is the missing third axis of the gate (fixed testdata at
sf0.001/0.01/0.1 only samples ONE data distribution): random shapes
reach boundary regions the synthetic corpus never does — empty texts,
one-token docs, all-duplicate corpora, single-group windows. Focused
on the round-4 fixed entries (the HUGEINT family) since their hash
history is the weakest.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_WORDS = ["the", "cat", "sat", "on", "a", "mat", "und", "der", "xyz", "q"]

documents_tables = st.lists(
    st.tuples(
        # None = NULL text; [] = empty text — both are legal corpus
        # rows the engine must survive (tx_quality_score used to THROW
        # on an empty doc: ANSI divide-by-zero)
        st.one_of(
            st.none(),
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=25),
        ),
        st.sampled_from(["en", "de", "es", "fr", "zh"]),
        st.sampled_from(["web", "wiki"]),
    ),
    min_size=1,
    max_size=20,
)

orders_customer_tables = st.tuples(
    st.lists(  # customer: (acctbal_cents, nationkey)
        st.tuples(st.integers(-200_000, 1_200_000), st.integers(0, 4)),
        min_size=1,
        max_size=25,
    ),
    st.lists(  # orders: (custkey_idx, totalprice_cents, priority, days)
        st.tuples(
            st.integers(0, 30),
            st.integers(100, 40_000_000),
            st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
            st.integers(0, 2000),
        ),
        min_size=1,
        max_size=40,
    ),
)


def _spec(name):
    from westtopologies_spark.queries import catalog

    return next(s for s in catalog() if s.name == name)


def _compare(spark, spec, tables: dict):
    """Write `tables` (name -> DataFrame) as parquet, run Spark entry
    and DuckDB oracle over them, assert strict equality."""
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from tools.check_oracle import rowset

    with tempfile.TemporaryDirectory() as tmp:
        con = duckdb.connect()
        for name, df in tables.items():
            df.coalesce(1).write.parquet(f"{tmp}/{name}.parquet")
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{tmp}/{name}.parquet/*.parquet')"
            )
        sdf = spec.spark(spark, tmp)
        s_cols, s_rows = rowset(sdf.columns, [tuple(r) for r in sdf.collect()])
        rel = con.sql(spec.oracle)
        d_cols, d_rows = rowset(list(rel.columns), rel.fetchall())
        con.close()
    assert s_cols == d_cols
    assert s_rows == d_rows


def _docs_df(spark, docs):
    rows = [
        (
            i,
            None if words is None else " ".join(words),
            lang,
            src,
            0 if words is None else len(" ".join(words)),
        )
        for i, (words, lang, src) in enumerate(docs)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.mark.parametrize(
    "entry",
    [
        "tx_entropy",
        "tx_unigram_lm",
        "tx_bigram_lm",
        "tx_heldout_nll",
        "tp_length_buckets",
        "tp_token_mixture",
        "tp_pack_sequences",
        "dd_funnel_report",
        "m1_region_topk",
    ],
)
@SET
@given(docs=documents_tables)
def test_documents_entries_random_parity(spark, entry, docs):
    _compare(spark, _spec(entry), {"documents": _docs_df(spark, docs)})


@pytest.mark.parametrize("entry", ["ag_iqr_outliers", "j8_bloom_semi_join"])
@SET
@given(tabs=orders_customer_tables)
def test_orders_entries_random_parity(spark, entry, tabs):
    cust_rows, order_rows = tabs
    base = dt.datetime(1998, 1, 1)
    cust = spark.createDataFrame(
        [
            (i, f"Customer#{i}", nk, cents / 100.0, "BUILDING")
            for i, (cents, nk) in enumerate(cust_rows)
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (
                i,
                ck % len(cust_rows),
                "O",
                cents / 100.0,
                base + dt.timedelta(days=days),
                prio,
            )
            for i, (ck, cents, prio, days) in enumerate(order_rows)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _compare(spark, _spec(entry), {"customer": cust, "orders": orders})


events_tables = st.lists(
    st.tuples(
        st.integers(0, 5),  # user
        st.integers(0, 7200),  # seconds offset
        st.sampled_from(["click", "purchase", "view", "error"]),
        # None = NULL measurement (w1's pandas scan used to CRASH on
        # one; qq deciles diverged on NULLS FIRST-vs-LAST ordering)
        st.one_of(st.none(), st.integers(0, 40_000)),  # value cents
        st.integers(0, 99),  # props k
    ),
    min_size=2,
    max_size=40,
)


def _events_df(spark, events):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=sec),
            uid,
            etype,
            None if cents is None else cents / 100.0,
            '{"k": %d}' % k,
        )
        for i, (uid, sec, etype, cents, k) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.mark.parametrize(
    "entry",
    [
        "w1_window_rollup",
        "w1_exact_windows",
        "ts_asof_join",
        "ts_ewma",
        "a3_role_features",
        "ag_qq_points",
        "ts_sessionize",
    ],
)
@SET
@given(events=events_tables)
def test_events_entries_random_parity(spark, entry, events):
    _compare(spark, _spec(entry), {"events": _events_df(spark, events)})


# algorithmically-risky batch: iterative graph traces (unrolled
# deterministic-replay oracles), the inequality-bucketed interval
# join, and the frequency-ranked dictionary encode


@pytest.mark.parametrize(
    "entry",
    ["gr_pagerank", "gr_kcore", "gr_triangles", "ts_interval_join"],
)
@SET
@given(events=events_tables)
def test_graph_entries_random_parity(spark, entry, events):
    _compare(spark, _spec(entry), {"events": _events_df(spark, events)})


@pytest.mark.parametrize("entry", ["x5_term_index_encode", "x2_tokenize"])
@SET
@given(docs=documents_tables)
def test_text_entries_random_parity(spark, entry, docs):
    _compare(spark, _spec(entry), {"documents": _docs_df(spark, docs)})


@pytest.mark.parametrize("entry", ["t1_topk_per_group"])
@SET
@given(tabs=orders_customer_tables)
def test_topk_random_parity(spark, entry, tabs):
    cust_rows, order_rows = tabs
    base = dt.datetime(1998, 1, 1)
    orders = spark.createDataFrame(
        [
            (
                i,
                ck % len(cust_rows),
                "O",
                cents / 100.0,
                base + dt.timedelta(days=days),
                prio,
            )
            for i, (ck, cents, prio, days) in enumerate(order_rows)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _compare(spark, _spec(entry), {"orders": orders})


# broad family sweep: shingle/band CTEs on degenerate docs (empty,
# one-token, all-duplicates), windowed temporal kernels on dense ties


@pytest.mark.parametrize(
    "entry",
    [
        "dd_minhash_lsh",
        "dd_ngram_jaccard",
        "dd_simhash",
        "dd_ppjoin",
        "dd_containment",
        "dd_exact",
        "dd_dup_spans",
        "tx_fingerprint",
        "tx_cooccurrence",
        "tx_repetition",
        "tx_boilerplate",
        "tx_tfidf",
        "tx_inverted_index",
    ],
)
@SET
@given(docs=documents_tables)
def test_dedup_text_random_parity(spark, entry, docs):
    _compare(spark, _spec(entry), {"documents": _docs_df(spark, docs)})


@pytest.mark.parametrize(
    "entry",
    ["ts_gap_fill", "ts_funnel", "ts_moving_stats"],
)
@SET
@given(events=events_tables)
def test_temporal_agg_random_parity(spark, entry, events):
    _compare(spark, _spec(entry), {"events": _events_df(spark, events)})


@pytest.mark.parametrize("entry", ["ag_percentiles", "ag_mad"])
@SET
@given(tabs=orders_customer_tables)
def test_rankstats_random_parity(spark, entry, tabs):
    cust_rows, order_rows = tabs
    base = dt.datetime(1998, 1, 1)
    orders = spark.createDataFrame(
        [
            (
                i,
                ck % len(cust_rows),
                "O",
                cents / 100.0,
                base + dt.timedelta(days=days),
                prio,
            )
            for i, (ck, cents, prio, days) in enumerate(order_rows)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _compare(spark, _spec(entry), {"orders": orders})
