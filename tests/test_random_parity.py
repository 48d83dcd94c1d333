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

# r9 driver-budget tier (pytest.ini): this module alone needs 40-60
# minutes (hypothesis example sweeps x Spark-vs-DuckDB replays) while
# the rest of the suite totals ~25; it runs in the explicit slow tier
# (`pytest -m slow`), re-run green each builder round.
pytestmark = pytest.mark.slow

# SPARK_GRAFT_FUZZ_X multiplies every profile's example budget for
# dedicated deep-fuzz sessions (default 1 keeps the committed suite's
# wall-clock); the boundary-bug yield of this file has been ~1 find
# per few hundred examples, so depth is pure insurance when idle
# compute is available.
import os as _os

try:
    _FUZZ_X = max(1, int(_os.environ.get("SPARK_GRAFT_FUZZ_X", "1").strip() or "1"))
except ValueError:
    # a malformed env value degrades to the default budget instead of
    # failing collection of the whole module (ADVICE r5)
    _FUZZ_X = 1

SET = settings(
    max_examples=6 * _FUZZ_X,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# accented/multibyte words pin codepoint-level parity of the
# ascii()/ord() char-folds across engine upgrades (ADVICE r4:
# verified manually to match today — Spark ascii(), DuckDB ord() and
# CPython ord() all return the Unicode codepoint — but previously
# untested: the corpus alphabet was ASCII-only)
_WORDS = [
    "the", "cat", "sat", "on", "a", "mat", "und", "der", "xyz", "q",
    "café", "über", "naïve", "日本語",
]

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
    [
        "gr_pagerank",
        "gr_kcore",
        "gr_triangles",
        "ts_interval_join",
        # r6 pre-verification sweep (VERDICT r5 #4): the rest of the
        # graph family enters the r6 driver window 10/12-never-checked
        # — fuzz each iterative/ratio kernel over random interaction
        # graphs BEFORE the driver hashes it (degenerate shapes the
        # synthetic corpus never makes: self-loop-only users, single
        # components, empty neighbor intersections, isolated dyads)
        "gr_neighbor_jaccard",
        "gr_neighbor_jaccard_capped",
        "gr_label_propagation",
        "gr_modularity",
        "gr_assortativity",
        "gr_hits",
        "gr_local_clustering",
        "gr_khop_reach",
        "gr_personalized_pagerank",
    ],
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


# ---------------------------------------------------------------------------
# round-5 window sweep (VERDICT r4 #4): pre-verify every never-checked
# driver-window entry with its own random-table profile BEFORE the
# driver hashes it.  SET4 keeps the added wall-clock bounded.
# ---------------------------------------------------------------------------

SET4 = settings(
    max_examples=4 * _FUZZ_X,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_SEGS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PTYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
_RNAMES = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_NNAMES = ["ALGERIA", "BRAZIL", "CANADA", "DENMARK", "EGYPT"]

# one random TPC-H micro-warehouse: all 7 relational tables with
# consistent FKs; dates centered on 1996-1998 so the Q-shape filters
# ('1997-*' windows etc.) see non-empty slices most of the time
warehouse_tables = st.fixed_dictionaries(
    {
        "nation_region": st.lists(
            st.integers(0, 4), min_size=5, max_size=5
        ),
        "supplier": st.lists(  # (nationkey, acctbal_cents)
            st.tuples(st.integers(0, 4), st.integers(-200_000, 1_000_000)),
            min_size=1,
            max_size=6,
        ),
        "part": st.lists(  # (name_word, brand, type, size, retail_cents)
            st.tuples(
                st.sampled_from(_WORDS),
                st.integers(1, 5),
                st.sampled_from(_PTYPES),
                st.integers(1, 50),
                st.integers(90_000, 11_000_000),
            ),
            min_size=1,
            max_size=8,
        ),
        "customer": st.lists(  # (nationkey, acctbal_cents, segment)
            st.tuples(
                st.integers(0, 4),
                st.integers(-200_000, 1_200_000),
                st.sampled_from(_SEGS),
            ),
            min_size=1,
            max_size=8,
        ),
        "orders": st.lists(  # (custidx, status, price_cents, prio, days)
            st.tuples(
                st.integers(0, 30),
                st.sampled_from("FPO"),
                st.integers(100, 40_000_000),
                st.sampled_from(_PRIOS),
                st.integers(0, 900),
            ),
            min_size=1,
            max_size=20,
        ),
        "lineitem": st.lists(
            # (orderidx, partidx, suppidx, linenumber, qty, extprice_cents,
            #  discount_pct, tax_pct, returnflag, linestatus, shipdays)
            st.tuples(
                st.integers(0, 30),
                st.integers(0, 30),
                st.integers(0, 30),
                st.integers(1, 7),
                st.integers(1, 50),
                st.integers(90_000, 10_500_000),
                st.integers(0, 10),
                st.integers(0, 8),
                st.sampled_from("NAR"),
                st.sampled_from("FO"),
                st.integers(0, 900),
            ),
            min_size=1,
            max_size=40,
        ),
    }
)


def _warehouse_dfs(spark, w):
    base = dt.datetime(1996, 1, 1)
    region = spark.createDataFrame(
        [(i, _RNAMES[i]) for i in range(5)],
        "r_regionkey int, r_name string",
    )
    nation = spark.createDataFrame(
        [(i, _NNAMES[i], rk) for i, rk in enumerate(w["nation_region"])],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [
            (i, f"Supplier#{i}", nk, cents / 100.0)
            for i, (nk, cents) in enumerate(w["supplier"])
        ],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [
            (i, f"{word} part {i}", f"Brand#{b}", t, size, cents / 100.0)
            for i, (word, b, t, size, cents) in enumerate(w["part"])
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    customer = spark.createDataFrame(
        [
            (i, f"Customer#{i}", nk, cents / 100.0, seg)
            for i, (nk, cents, seg) in enumerate(w["customer"])
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    n_cust = len(w["customer"])
    orders = spark.createDataFrame(
        [
            (
                i,
                ci % n_cust,
                status,
                cents / 100.0,
                base + dt.timedelta(days=days),
                prio,
            )
            for i, (ci, status, cents, prio, days) in enumerate(w["orders"])
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    n_ord, n_part, n_supp = (
        len(w["orders"]),
        len(w["part"]),
        len(w["supplier"]),
    )
    lineitem = spark.createDataFrame(
        [
            (
                oi % n_ord,
                pi % n_part,
                si % n_supp,
                ln,
                float(qty),
                cents / 100.0,
                disc / 100.0,
                tax / 100.0,
                rf,
                ls,
                base + dt.timedelta(days=days),
            )
            for (
                oi,
                pi,
                si,
                ln,
                qty,
                cents,
                disc,
                tax,
                rf,
                ls,
                days,
            ) in w["lineitem"]
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    return {
        "region": region,
        "nation": nation,
        "supplier": supplier,
        "part": part,
        "customer": customer,
        "orders": orders,
        "lineitem": lineitem,
    }


# never-checked window entries reading lineitem / multi-table joins
@pytest.mark.parametrize(
    "entry",
    [
        "gs_rollup",
        "ag_corr",
        "ag_weighted_quantiles",
        "sq_local_supplier_volume",
        "sq_large_orders",
        "sq_priority_late_ship",
        "j11_fuzzy_match",
    ],
)
@SET4
@given(w=warehouse_tables)
def test_warehouse_window_random_parity(spark, entry, w):
    _compare(spark, _spec(entry), _warehouse_dfs(spark, w))


# never-checked window entries reading orders (+customer)
@pytest.mark.parametrize(
    "entry",
    [
        "ag_trimmed_mean",
        "ag_profile",
        "wn_ntile_cume",
        "ud_geomean",
        "ag_histogram",
        "ag_quantile_bins",
        "ts_monthly_trend",
        "ag_contribution",
        "ag_winsorized_mean",
        "gs_cube",
        "ag_gini",
        "ag_bootstrap_ci",
        "j7_anti_join",
        "j10_salted_join",
        "sq_idle_rich_customers",
    ],
)
@SET4
@given(w=warehouse_tables)
def test_orders_window_random_parity(spark, entry, w):
    dfs = _warehouse_dfs(spark, w)
    _compare(
        spark,
        _spec(entry),
        {"orders": dfs["orders"], "customer": dfs["customer"]},
    )


# never-checked window entries reading events
@pytest.mark.parametrize(
    "entry",
    [
        "ts_session_window",
        "ts_cohort",
        "wn_range_frame",
        "ts_ewma",
        "tp_zscore",
        "ag_pivot",
        "ts_transitions",
        "ts_session_paths",
        "ts_rolling_active",
        "ts_anomaly",
        "ts_inter_event",
        "gr_neighbor_jaccard",
    ],
)
@SET4
@given(events=events_tables)
def test_events_window_random_parity(spark, entry, events):
    _compare(spark, _spec(entry), {"events": _events_df(spark, events)})


# never-checked window entries reading documents
@pytest.mark.parametrize(
    "entry",
    [
        "tx_ngram_novelty",
        "tp_stratified_sample",
        "tp_quality_gate",
        "tp_mixture",
        "tp_contamination",
        "tp_group_sample",
        "tp_priority_sample",
        "ag_cms_heavy_hitters",
        "tp_epoch_shuffle",
        "ag_hll_distinct",
    ],
)
@SET4
@given(docs=documents_tables)
def test_documents_window_random_parity(spark, entry, docs):
    _compare(spark, _spec(entry), {"documents": _docs_df(spark, docs)})


embeddings_tables = st.lists(
    # (label, 4 x coordinate_milli) — float32 column, exact milli grid
    st.tuples(
        st.integers(0, 3),
        st.lists(st.integers(-2000, 2000), min_size=4, max_size=4),
    ),
    min_size=1,
    max_size=30,
)


def _embeddings_df(spark, rows):
    return spark.createDataFrame(
        [
            (i, [m / 1000.0 for m in ms], lab)
            for i, (lab, ms) in enumerate(rows)
        ],
        "vec_id long, embedding array<float>, label int",
    )


@pytest.mark.parametrize("entry", ["tp_class_weights"])
@SET4
@given(rows=embeddings_tables)
def test_embeddings_window_random_parity(spark, entry, rows):
    _compare(spark, _spec(entry), {"embeddings": _embeddings_df(spark, rows)})


@pytest.mark.parametrize("entry", ["j9_set_ops"])
@SET4
@given(w=warehouse_tables, events=events_tables)
def test_mixed_window_random_parity(spark, entry, w, events):
    dfs = _warehouse_dfs(spark, w)
    _compare(
        spark,
        _spec(entry),
        {"orders": dfs["orders"], "events": _events_df(spark, events)},
    )


# ---------------------------------------------------------------------------
# rotation-backlog sweep (VERDICT r4 #4): the sq_/gs_/ag_/ts_/gr_
# families that enter the driver window in rounds 6-7 — pre-verify
# each on random tables before, not after, its driver row.
# ---------------------------------------------------------------------------

# 2 examples per backlog entry: the 4-example discovery pass already
# ran this round (found ts_monthly_trend's half-cent tie + nine ANSI
# divide-by-zero crashes, all fixed); the permanent suite keeps a
# bounded regression probe so full-pytest wall-clock stays sane.
SET2 = settings(
    max_examples=2 * _FUZZ_X,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)



@pytest.mark.parametrize(
    "entry",
    [
        "sq_promo_revenue",
        "sq_price_bands",
        "sq_small_quantity_revenue",
        "sq_nation_profit",
        "sq_dominant_suppliers",
        "sq_returned_revenue",
        "sq_volume_shipping",
        "gs_grouping_sets",
        "sq_market_share",
        "sq_waiting_suppliers",
        "sq_top_supplier",
        "sq_min_cost_supplier",
        "sq_supplier_variety",
        "sq_order_priority",
        "sq_forecast_revenue",
        "sq_important_parts",
        # r7: graduated to the deterministic histogram sketch — fuzz
        # the integer bucket/rank arithmetic over random order tables
        # before its first driver hash row (VERDICT r6 #4)
        "ag_approx_percentiles",
    ],
)
@SET2
@given(w=warehouse_tables)
def test_warehouse_backlog_random_parity(spark, entry, w):
    _compare(spark, _spec(entry), _warehouse_dfs(spark, w))


@pytest.mark.parametrize(
    "entry",
    [
        "sq_pareto_skyline",
        "ag_benford",
        "sq_pareto_8020",
        "sq_customer_distribution",
    ],
)
@SET2
@given(w=warehouse_tables)
def test_orders_backlog_random_parity(spark, entry, w):
    dfs = _warehouse_dfs(spark, w)
    _compare(
        spark,
        _spec(entry),
        {"orders": dfs["orders"], "customer": dfs["customer"]},
    )


@pytest.mark.parametrize(
    "entry",
    [
        "gr_label_propagation",
        "gr_modularity",
        "gr_assortativity",
        "ts_topk_hourly",
        "ts_seasonality",
        "ts_sliding_rollup",
        "ag_ks_test",
        "ts_autocorr",
        "ag_chisq_cells",
        "ts_cusum_changepoint",
        "ag_welch_ttest",
        "ts_sax_symbols",
        "ts_holt_trend",
        "ag_weight_bootstrap",
        "gs_pivot_wide",
        "gr_hits",
        "gr_local_clustering",
        "ts_mann_kendall",
        "gr_khop_reach",
        "ag_mutual_info",
        "ts_lateness_profile",
        "ts_fano_factor",
        "ts_ohlc_hourly",
        "gr_personalized_pagerank",
        "ag_survival_lifetable",
        "ts_acf_lags",
        "ts_hot_streaks",
        "ts_peak_hours",
        "j12_geo_cell_join",
        "ag_linfit",
        "ag_effect_size",
    ],
)
@SET2
@given(events=events_tables)
def test_events_backlog_random_parity(spark, entry, events):
    _compare(spark, _spec(entry), {"events": _events_df(spark, events)})


@pytest.mark.parametrize(
    "entry",
    [
        "ag_auc",
        "ag_pr_curve",
        "ag_calibration",
        "tp_temp_mixture",
        "tp_effective_mixture",
        "tp_shard_manifest",
    ],
)
@SET2
@given(docs=documents_tables)
def test_documents_backlog_random_parity(spark, entry, docs):
    _compare(spark, _spec(entry), {"documents": _docs_df(spark, docs)})


# deterministic rule-15 pins: the divide-by-zero domains hypothesis
# at 2 examples won't reliably generate — single-member groups
# (n-1 == 0 variance), pairs of constant groups (pooled variance 0),
# and all-NULL measurement groups. ag_effect_size CRASHED on the
# constant-group corpus (Spark ANSI DIVIDE_BY_ZERO vs DuckDB NULL)
# until the try_divide fix; welch shares the recipe, so pin both.
_DEGENERATE_EVENT_CORPORA = [
    # (uid, sec, etype, cents, k) rows per _events_df's convention
    [(1, 0, "click", 100, 0), (1, 1, "view", 200, 0), (1, 2, "view", 300, 0)],
    [(1, 0, "click", 100, 0), (1, 1, "view", 200, 0)],
    [(1, 0, "click", 500, 0), (1, 1, "click", 500, 0),
     (1, 2, "view", 700, 0), (1, 3, "view", 700, 0)],
    [(1, 0, "click", None, 0), (1, 1, "click", None, 0),
     (1, 2, "view", 100, 0), (1, 3, "view", 200, 0)],
]


@pytest.mark.parametrize("entry", ["ag_effect_size", "ag_welch_ttest"])
@pytest.mark.parametrize("corpus", range(len(_DEGENERATE_EVENT_CORPORA)))
def test_zero_variance_groups_parity(spark, entry, corpus):
    events = _DEGENERATE_EVENT_CORPORA[corpus]
    _compare(spark, _spec(entry), {"events": _events_df(spark, events)})
