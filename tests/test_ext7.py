"""Round-3 seventh extension batch: ACF correlogram, peak hours,
Q-Q drift points, shard manifest — hand-computed and pure-Python
references on constructed frames."""

from __future__ import annotations

import datetime as dt
import tempfile


def _write_events(spark, tmp, rows):
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(f"{tmp}/events.parquet")


def test_acf_perfect_period_two(spark):
    """An alternating 1,3,1,3,... hourly series has ACF(-1) at odd
    lags and ACF(+1) at even lags."""
    from westtopologies_spark.queries_ext7 import ts_acf_lags

    h0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(24):
        n = 1 if hour % 2 == 0 else 3
        for i in range(n):
            rows.append(
                (eid, h0 + dt.timedelta(hours=hour, minutes=i), 1, "t", 0.0, "")
            )
            eid += 1
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, tmp, rows)
        got = {r.lag: r.corr_x1e6 for r in ts_acf_lags(spark, tmp).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    for lag, corr in got.items():
        want = -1_000_000 if lag % 2 == 1 else 1_000_000
        assert abs(corr - want) <= 1, (lag, corr)


def test_peak_hours_strict_maxima_only(spark):
    from westtopologies_spark.queries_ext7 import ts_peak_hours

    h0 = dt.datetime(2024, 1, 1)
    # counts per hour: 1, 3, 1, 2, 2, 5  -> peaks at hour 1 only
    # (hour 5 is an endpoint; the 2,2 plateau is not strict)
    counts = [1, 3, 1, 2, 2, 5]
    rows = []
    eid = 0
    for hour, n in enumerate(counts):
        for i in range(n):
            rows.append(
                (eid, h0 + dt.timedelta(hours=hour, minutes=i), 1, "t", 0.0, "")
            )
            eid += 1
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, tmp, rows)
        got = [(r.n, r.prev_n, r.next_n) for r in ts_peak_hours(spark, tmp).collect()]
    assert got == [(3, 1, 1)]


def test_qq_points_match_sorted_deciles(spark):
    from westtopologies_spark.queries_ext7 import ag_qq_points

    h0 = dt.datetime(2024, 1, 1)
    clicks = [float(v) for v in range(1, 21)]  # 1..20
    purch = [float(v * 10) for v in range(1, 41)]  # 10..400
    rows = []
    eid = 0
    for v in clicks:
        rows.append((eid, h0, 1, "click", v, "")); eid += 1
    for v in purch:
        rows.append((eid, h0, 1, "purchase", v, "")); eid += 1
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, tmp, rows)
        got = {
            r.p10: (r.q_click, r.q_purchase)
            for r in ag_qq_points(spark, tmp).collect()
        }
    for p10 in range(1, 10):
        # lower-rule decile: first value whose rank*10 >= p*count
        def q(sorted_vals, p):
            n = len(sorted_vals)
            return next(
                v for i, v in enumerate(sorted_vals) if (i + 1) * 10 >= p * n
            )

        assert got[p10] == (q(clicks, p10), q(purch, p10))


def test_shard_manifest_partitions_corpus(spark, sf_dir):
    from westtopologies_spark.queries_ext7 import SHARD_N, tp_shard_manifest
    from westtopologies_spark.scale.constants import FP_MULT, SHINGLE_P

    rows = tp_shard_manifest(spark, sf_dir).collect()
    import duckdb  # noqa: F401 — only to mirror conftest table source

    n_docs_total = sum(r.n_docs for r in rows)
    got_shards = {r.shard for r in rows}
    assert got_shards <= set(range(SHARD_N))
    # a partition: every doc in exactly one shard
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert n_docs_total == len(docs)

    # pure-python replay of the polynomial hash for a few ids
    def shard_of(doc_id):
        a = 0
        for ch in str(doc_id):
            a = (a * FP_MULT + ord(ch)) % SHINGLE_P
        return a % SHARD_N

    by_shard: dict = {}
    for d in docs:
        by_shard[shard_of(d.doc_id)] = by_shard.get(shard_of(d.doc_id), 0) + 1
    assert {r.shard: r.n_docs for r in rows} == by_shard


# ---------------------------------------------------------------------------
# batch 8: payload entropy, Pareto point, Cohen's d
# ---------------------------------------------------------------------------


def test_payload_entropy_bounds_and_uniform_case(spark):
    import math
    import tempfile

    from westtopologies_spark.queries_ext7 import mm_payload_entropy

    # doc 0: one repeated char -> entropy 0; doc 1: 8 ASCII chars
    # spanning the 8 low bins exactly once -> entropy ln(8)
    # (ASCII only: the payload is UTF-8 bytes, the oracle counts
    # char codes — they coincide exactly on ASCII, per
    # mm_byte_histogram's documented equivalence)
    uniform = "".join(chr(16 * b + 1) for b in range(8))
    docs = spark.createDataFrame(
        [(0, "aaaaaaaa", "s", "x", 8), (1, uniform, "s", "x", 8)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(f"{tmp}/documents.parquet")
        got = {
            r.doc_id: (r.n_bytes, r.bin_entropy_x1e6)
            for r in mm_payload_entropy(spark, tmp).collect()
        }
    assert got[0] == (8, 0)
    assert got[1][0] == 8
    assert abs(got[1][1] - round(math.log(8) * 1e6)) <= 1


def test_pareto_8020_hand_case(spark):
    import datetime as dt
    import tempfile

    from westtopologies_spark.queries_ext7 import sq_pareto_8020

    d0 = dt.datetime(1997, 1, 1)
    # revenue per customer: 50, 30, 10, 10 (total 100) -> top 80% needs
    # 50+30=80 -> exactly 2 customers (5*80 >= 4*100)
    orders = spark.createDataFrame(
        [
            (1, 101, "O", 50.0, d0, "1-URGENT"),
            (2, 102, "O", 30.0, d0, "1-URGENT"),
            (3, 103, "O", 10.0, d0, "1-URGENT"),
            (4, 104, "O", 10.0, d0, "1-URGENT"),
        ],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    with tempfile.TemporaryDirectory() as tmp:
        orders.write.parquet(f"{tmp}/orders.parquet")
        r = sq_pareto_8020(spark, tmp).collect()[0]
    assert (r.n_customers, r.n_top80, r.top80_cents, r.total_cents) == (
        4, 2, 8000, 10000,
    )


def test_effect_size_matches_statistics(spark, sf_dir):
    """Cohen's d recomputed from raw values with python statistics."""
    import statistics

    from westtopologies_spark.queries_ext7 import ag_effect_size

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type: dict = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e.value)
    got = {
        (r.type_a, r.type_b): r.cohens_d_x1e6
        for r in ag_effect_size(spark, sf_dir).collect()
    }
    for (ta, tb), d_scaled in got.items():
        xa, xb = by_type[ta], by_type[tb]
        va, vb = statistics.variance(xa), statistics.variance(xb)
        pooled = ((len(xa) - 1) * va + (len(xb) - 1) * vb) / (
            len(xa) + len(xb) - 2
        )
        want = (statistics.fmean(xa) - statistics.fmean(xb)) / pooled**0.5
        # DECIMAL(18,4)-quantized inputs + 6dp rounding: allow 1e-3
        # relative slack vs the raw-float reference
        assert abs(d_scaled / 1e6 - want) < 1e-3, (ta, tb)


# ---------------------------------------------------------------------------
# batch 9: novelty curve, hot streaks
# ---------------------------------------------------------------------------


def test_novelty_first_doc_is_fully_novel_then_decays(spark):
    import tempfile

    from westtopologies_spark.queries_ext7 import tx_ngram_novelty

    docs = spark.createDataFrame(
        [
            (0, "a b c d", "s", "x", 7),      # 2 shingles, all novel
            (1, "a b c d", "s", "x", 7),      # exact repeat -> 0 novel
            (2, "a b c z", "s", "x", 7),      # shares 'a b c' -> 1 of 2 novel
            (3, "q", "s", "x", 1),            # < 3 tokens -> absent
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(f"{tmp}/documents.parquet")
        got = {
            r.doc_id: (r.n_shingles, r.n_novel, r.novelty_x1e4)
            for r in tx_ngram_novelty(spark, tmp).collect()
        }
    assert got == {
        0: (2, 2, 10000),
        1: (2, 0, 0),
        2: (2, 1, 5000),
    }


def test_hot_streaks_islands(spark):
    import datetime as dt
    import tempfile

    from westtopologies_spark.queries_ext7 import ts_hot_streaks

    h0 = dt.datetime(2024, 1, 1)
    # 12 hours: counts 1,1,1,1,1,1,5,5,5,1,5,5 -> avg = 28/12 ~ 2.33;
    # hot hours are 6,7,8 (run of 3) and 10,11 (run of 2, dropped)
    counts = [1, 1, 1, 1, 1, 1, 5, 5, 5, 1, 5, 5]
    rows = []
    eid = 0
    for hour, n in enumerate(counts):
        for i in range(n):
            rows.append(
                (eid, h0 + dt.timedelta(hours=hour, minutes=i), 1, "t", 0.0, "")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(f"{tmp}/events.parquet")
        got = [
            (r.len, r.n_events, r.end_h - r.start_h)
            for r in ts_hot_streaks(spark, tmp).collect()
        ]
    assert got == [(3, 15, 2)]
