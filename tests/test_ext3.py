"""Round-3 extension batch: Gopher quality rules, TextRank keywords
(product quantization and power-iteration PCA tests live here too).
"""

from __future__ import annotations

from collections import Counter

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and that cat sat with the dog"),
        (2, "spam spam spam spam spam spam spam spam spam spam"),
        (3, "one two"),
        (4, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_gopher(text: str) -> dict:
    from westtopologies_spark.scale import constants as C

    toks = text.split(" ")
    cnt = Counter(toks)
    n_words = len(toks)
    n_unique = len(cnt)
    max_word_n = max(cnt.values())
    n_word_chars = sum(len(t) for t in toks)
    stop_hits = sum(1 for t in cnt if t in C.GOPHER_STOPWORDS)
    return {
        "n_words": n_words,
        "n_unique": n_unique,
        "max_word_n": max_word_n,
        "stop_hits": stop_hits,
        "mean_wlen_x1e4": n_word_chars * 10000 // n_words,
        "unique_frac_x1e4": n_unique * 10000 // n_words,
        "top_frac_x1e4": max_word_n * 10000 // n_words,
    }


def test_gopher_matches_pure_python(docs):
    from westtopologies_spark.scale.textstats import gopher_quality

    got = {r["doc_id"]: r.asDict() for r in gopher_quality(docs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in texts.items():
        want = _py_gopher(text)
        row = got[doc_id]
        for k, v in want.items():
            assert row[k] == v, (doc_id, k, row[k], v)


def test_gopher_keep_flags(docs):
    from westtopologies_spark.scale.textstats import gopher_quality

    got = {r["doc_id"]: r["keep"] for r in gopher_quality(docs).collect()}
    # doc 2: repetition bomb (top_frac = 1.0) -> rejected
    assert got[2] == 0
    # doc 3: too short -> rejected
    assert got[3] == 0
    # doc 4: no required stopwords beyond "a", 26 words of length 1
    # (mean word length 1.0 < 3.0) -> rejected
    assert got[4] == 0


def test_textrank_shape_and_determinism(docs):
    from westtopologies_spark.scale.textstats import textrank_keywords

    out = textrank_keywords(docs, top=10).collect()
    assert len(out) <= 10
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks) and ranks[0] == 1
    scores = [r["score_x1e6"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # hub term: "the" borders cat/mat/dog/that -> highest degree in
    # doc 1's chain; must outrank a leaf like "mat"
    by_term = {r["term"]: r["score_x1e6"] for r in out}
    if "the" in by_term and "mat" in by_term:
        assert by_term["the"] > by_term["mat"]
    # rerun is identical (no RNG anywhere)
    again = textrank_keywords(docs, top=10).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_textrank_isolated_token_doc_excluded(spark):
    from westtopologies_spark.scale.textstats import textrank_keywords

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "left right")], ["doc_id", "text"]
    )
    out = textrank_keywords(docs, top=10).collect()
    terms = {r["term"] for r in out}
    # single-token docs contribute no edges; "solo" is not a node
    assert terms == {"left", "right"}


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for vid in range(60):
        emb = [
            round(math.sin(0.1 * vid + 0.37 * j), 6) for j in range(64)
        ]
        rows.append((vid, emb))
    # two exact duplicates of vector 3
    rows.append((100, rows[3][1]))
    rows.append((101, rows[3][1]))
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_pq_codes_shape_and_duplicates(vectors):
    from westtopologies_spark.scale import constants as C
    from westtopologies_spark.scale.similarity import pq_codes

    out = {r["vec_id"]: r for r in pq_codes(vectors).collect()}
    assert len(out) == 62
    for r in out.values():
        for i in range(C.PQ_M):
            assert 0 <= r[f"code_{i}"] < C.PQ_K
        assert r["err_x1e6"] >= 0
    # identical vectors -> identical codes and identical error
    for i in range(C.PQ_M):
        assert out[3][f"code_{i}"] == out[100][f"code_{i}"] == out[101][f"code_{i}"]
    assert out[3]["err_x1e6"] == out[100]["err_x1e6"]


def test_pq_seed_vectors_have_low_error(vectors):
    """A seed vector IS a codeword after round 0; after 2 Lloyd
    rounds its reconstruction error stays below the corpus mean."""
    from westtopologies_spark.scale.similarity import pq_codes

    out = {r["vec_id"]: r["err_x1e6"] for r in pq_codes(vectors).collect()}
    seeds = [vid for vid in sorted(out) if vid % 11 == 0][:16]
    mean_err = sum(out.values()) / len(out)
    seed_err = sum(out[s] for s in seeds) / len(seeds)
    assert seed_err <= mean_err


def test_pq_determinism(vectors):
    from westtopologies_spark.scale.similarity import pq_codes

    a = sorted(tuple(r) for r in pq_codes(vectors).collect())
    b = sorted(tuple(r) for r in pq_codes(vectors).collect())
    assert a == b


# ---------------------------------------------------------------------------
# PCA power iteration
# ---------------------------------------------------------------------------


def test_pca_power_matches_numpy_direction(spark):
    """On a corpus with one dominant variance direction, 6 power
    rounds align with numpy's exact top eigenvector: the x1e4
    projections must correlate > 0.99 with the exact ones."""
    import numpy as np
    from pyspark.sql import types as T

    rng_vals = []
    n, d = 80, 64
    # dominant direction: dim 0 variance >> rest (deterministic fill)
    for i in range(n):
        v = [round(((i * 37 + j * 11) % 97) / 970.0, 6) for j in range(d)]
        v[0] = round(i / 8.0, 6)
        rng_vals.append((i, v))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = spark.createDataFrame(rng_vals, schema)

    from westtopologies_spark.scale.similarity import pca_power_projection

    got = {r["vec_id"]: r for r in pca_power_projection(emb).collect()}
    assert len(got) == n
    lam = {r["lam_x1e6"] for r in got.values()}
    assert len(lam) == 1 and lam.pop() > 0

    x = np.array([v for _, v in rng_vals], dtype=np.float64)
    xc = x - x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    if top[0] < 0:
        top = -top
    exact = xc @ top
    ours = np.array([got[i]["pc1_x1e4"] / 1e4 for i in range(n)])
    corr = np.corrcoef(exact, ours)[0, 1]
    assert corr > 0.99, corr


def test_pca_sign_canonical_dim1_nonnegative_weighting(spark):
    """Flipping the corpus through the origin must flip every
    projection (up to scaled-int rounding)."""
    from pyspark.sql import types as T

    import numpy as np

    n, d = 40, 64
    rows = [
        (i, [round(((i * 13 + j * 7) % 53) / 53.0 - 0.5, 6) for j in range(d)])
        for i in range(n)
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    from westtopologies_spark.scale.similarity import pca_power_projection

    emb = spark.createDataFrame(rows, schema)
    neg = spark.createDataFrame(
        [(i, [-x for x in v]) for i, v in rows], schema
    )
    a = {r["vec_id"]: r["pc1_x1e4"] for r in pca_power_projection(emb).collect()}
    b = {r["vec_id"]: r["pc1_x1e4"] for r in pca_power_projection(neg).collect()}
    # centered projections flip with the corpus (the component's own
    # sign is re-canonicalized on dim 1, so |proj| matches; sign may
    # or may not flip depending on the component's dim-1 sign)
    av = np.array([a[i] for i in range(n)])
    bv = np.array([b[i] for i in range(n)])
    assert (abs(abs(av) - abs(bv)) <= 1).all()


# ---------------------------------------------------------------------------
# Holt double exponential smoothing
# ---------------------------------------------------------------------------


def test_holt_trend_matches_pure_python(spark):
    import datetime as dt

    from westtopologies_spark.scale.temporal import (
        HOLT_ALPHA,
        HOLT_BETA,
        holt_trend,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # type "a": counts 3, 1, 4, 1, 5 over five days
    for day, n in enumerate([3, 1, 4, 1, 5]):
        for k in range(n):
            rows.append((len(rows), base + dt.timedelta(days=day, minutes=k), "a"))
    # type "b": single day
    rows.append((len(rows), base, "b"))
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])

    got = {r["event_type"]: r for r in holt_trend(ev).collect()}

    def holt(xs, a=HOLT_ALPHA, b=HOLT_BETA):
        if len(xs) == 1:
            return xs[0], 0.0
        l, t = xs[0], xs[1] - xs[0]
        for x in xs[2:]:
            nl = a * x + (1.0 - a) * (l + t)
            t = b * (nl - l) + (1.0 - b) * t
            l = nl
        return l, t

    def half_up(x):
        # engine round is HALF_UP on the shortest decimal repr;
        # python's built-in round is banker's
        from decimal import ROUND_HALF_UP, Decimal

        return int(
            Decimal(repr(x * 10000)).quantize(Decimal("1"), ROUND_HALF_UP)
        )

    l, t = holt([3.0, 1.0, 4.0, 1.0, 5.0])
    assert got["a"]["n_days"] == 5
    assert got["a"]["level_x1e4"] == half_up(l)
    assert got["a"]["trend_x1e4"] == half_up(t)
    assert got["a"]["forecast_x1e4"] == half_up(l + t)
    assert got["b"]["n_days"] == 1
    assert got["b"]["level_x1e4"] == 10000
    assert got["b"]["trend_x1e4"] == 0


def test_pq_block_neardup_finds_exact_duplicates(vectors):
    from westtopologies_spark.scale.similarity import pq_block_neardup

    out = {(r["id_a"], r["id_b"]): r for r in pq_block_neardup(vectors).collect()}
    # exact duplicates of vector 3 share every code -> all three pairs
    for pair in [(3, 100), (3, 101), (100, 101)]:
        assert pair in out, (pair, sorted(out))
        assert out[pair]["cos_x1e6"] == 1_000_000
        assert out[pair]["is_neardup"] == 1
    for (ia, ib), r in out.items():
        assert ia < ib


def test_weight_bootstrap_ci(spark):
    import datetime as dt

    from westtopologies_spark.scale.aggstats import bootstrap_ci

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), "t", float((i * 7) % 23) + 1.0)
        for i in range(200)
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    out = bootstrap_ci(ev).collect()
    assert len(out) == 1
    r = out[0]
    exact_mean = sum(v for *_, v in rows) / len(rows)
    assert r["n"] == 200
    assert abs(r["mean_x1e4"] / 1e4 - exact_mean) < 1e-3
    # hash weights are genuinely mixed -> nonzero bootstrap spread,
    # and the normal CI brackets the point mean
    assert r["boot_se_x1e4"] > 0
    assert r["ci_lo_x1e4"] <= r["mean_x1e4"] <= r["ci_hi_x1e4"]
    # determinism
    again = bootstrap_ci(ev).collect()[0]
    assert tuple(again) == tuple(r)


def test_rrf_fusion_prefers_doubly_ranked(spark, sf_dir):
    """A neighbor in BOTH rankings outscores one found by a single
    ranker at comparable ranks; output is exactly top-k per query."""
    from westtopologies_spark.queries_ext3 import RRF_K0, RRF_SCALE, ann_rrf_fusion
    from westtopologies_spark.scale import constants as C

    out = ann_rrf_fusion(spark, sf_dir).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) <= C.ANN_TOP_K
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        scores = [r["rrf_score"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
        # max possible single-ranker score < double-hit minimum when
        # both ranks are 1: sanity of the integer contribution scale
        assert all(0 < s <= 2 * (RRF_SCALE // (RRF_K0 + 1)) for s in scores)


def test_pivot_wide_row_sums(spark, sf_dir):
    from westtopologies_spark.queries_ext3 import EVENT_TYPES, gs_pivot_wide

    rows = gs_pivot_wide(spark, sf_dir).collect()
    assert rows
    total_cells = 0
    for r in rows:
        assert r["total"] == sum(r[t] for t in EVENT_TYPES)
        total_cells += r["total"]
    # grand total equals the row count of events
    from westtopologies_spark.session import load_table

    n = load_table(spark, sf_dir, "events").count()
    assert total_cells == n


def test_skyline_matches_bruteforce(spark, sf_dir):
    """Partition-parallel skyline == quadratic dominance definition."""
    from westtopologies_spark.queries_ext3 import sq_pareto_skyline

    got = {r["o_orderkey"] for r in sq_pareto_skyline(spark, sf_dir).collect()}

    from westtopologies_spark.session import load_table

    rows = [
        (r["o_orderkey"], r["o_orderdate"], r["o_totalprice"])
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    ]
    want = set()
    for k, d, p in rows:
        dominated = any(
            (d2 > d and p2 <= p)
            or (d2 == d and p2 < p)
            # exact (date, price) duplicates: the declared semantics
            # keep only the lowest orderkey
            or (d2 == d and p2 == p and k2 < k)
            for k2, d2, p2 in rows
            if k2 != k
        )
        if not dominated:
            want.add(k)
    assert got == want
