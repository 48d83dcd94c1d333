"""Round-3 fourth extension batch: HITS, local clustering
coefficient, Zipf fit, temperature mixture, Mahalanobis outliers,
audio framing plan, Mann-Kendall trend test — each checked against a
small hand-computed or pure-Python reference.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def star_edges(spark):
    # hub node 1 points at authorities 2, 3, 4; node 5 also points at 2
    return spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 2)], ["src", "dst"]
    )


def test_hits_star_graph(spark, star_edges):
    from westtopologies_spark.ops.graph import hits

    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], ["node"])
    got = {r["user_id"]: r for r in hits(nodes, star_edges).collect()}
    # node 2 has the most in-links from the best hub -> top authority
    assert got[2]["auth_x1e6"] == 1_000_000
    # node 1 points at all three authorities -> top hub
    assert got[1]["hub_x1e6"] == 1_000_000
    # hub 5 covers a strict subset of hub 1's targets
    assert got[5]["hub_x1e6"] < got[1]["hub_x1e6"]
    assert got[5]["hub_x1e6"] > 0
    # pure authorities have no out-edges; pure hubs have no in-edges
    assert got[3]["hub_x1e6"] == 0
    assert got[1]["auth_x1e6"] == 0
    # authorities 3 and 4 are symmetric
    assert got[3]["auth_x1e6"] == got[4]["auth_x1e6"]


# ---------------------------------------------------------------------------
# local clustering coefficient
# ---------------------------------------------------------------------------


def test_local_clustering_triangle_plus_tail(spark):
    from westtopologies_spark.ops.graph import local_clustering

    # triangle 1-2-3 plus a tail 3-4
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["u", "v"]
    )
    got = {r["user_id"]: r for r in local_clustering(edges).collect()}
    # nodes 1, 2: degree 2, one triangle -> lcc = 1.0
    assert got[1]["lcc_x1e4"] == 10_000
    assert got[2]["lcc_x1e4"] == 10_000
    # node 3: degree 3, one closed wedge of three -> 2*1/(3*2) = 1/3
    assert got[3]["degree"] == 3
    assert got[3]["lcc_x1e4"] == 3_333
    # leaf node: degree 1 -> defined as 0
    assert got[4]["lcc_x1e4"] == 0
    assert got[4]["n_triangles"] == 0


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------


def test_zipf_fit_matches_numpy_reference(spark, tmp_path):
    import numpy as np

    from westtopologies_spark.queries_ext4 import tx_zipf_fit

    # corpus with a known frequency spectrum: f(tok_i) ~ i-th value
    freqs = {"alpha": 16, "beta": 8, "gamma": 4, "delta": 2, "eps": 1}
    words = [w for w, f in freqs.items() for _ in range(f)]
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en", "src0", len(" ".join(words)))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    row = tx_zipf_fit(spark, sf_dir).collect()[0]
    # pure-python reference on the same scaled-int points
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.array(
        [round(math.log(r) * 1e6) for r in range(1, len(ranked) + 1)]
    )
    y = np.array([round(math.log(f) * 1e6) for _, f in ranked])
    n = len(x)
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    intercept = (y.sum() - slope * x.sum()) / n
    assert row["n_terms"] == 5
    assert row["slope_x1e6"] == round(slope * 1e6)
    assert row["intercept_x1e6"] == round(intercept)
    # powers-of-two spectrum: exact Zipf-like decay, slope < 0
    assert row["slope_x1e6"] < 0


# ---------------------------------------------------------------------------
# temperature mixture
# ---------------------------------------------------------------------------


def test_temp_mixture_sqrt_weighting(spark, tmp_path):
    from westtopologies_spark.queries_ext4 import tp_temp_mixture

    # source A: 9 chars x 4 docs = 36; source B: 144 chars x 1 doc
    rows = [(i, "x" * 9, "en", "A", 9) for i in range(4)] + [
        (10, "y" * 144, "en", "B", 144)
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["source"]: r for r in tp_temp_mixture(spark, sf_dir).collect()}
    # sqrt(36)=6, sqrt(144)=12 -> weights 1/3 and 2/3 exactly
    assert got["A"]["w_x1e6"] == 333_333
    assert got["B"]["w_x1e6"] == 666_666
    # doc quotas: 5 total docs -> A gets 6*5//18=1, B gets 12*5//18=3
    assert got["A"]["target_docs"] == 1
    assert got["B"]["target_docs"] == 3
    # B (1 doc) is oversampled 3x
    assert got["B"]["oversample_x1e4"] == 30_000


# ---------------------------------------------------------------------------
# Mahalanobis
# ---------------------------------------------------------------------------


def test_mahalanobis_outlier_ranks_last(spark, tmp_path):
    from westtopologies_spark.queries_ext4 import emb_mahalanobis

    # 9 inliers near the origin, one far outlier
    rows = [
        (i, [float(i % 3) / 10.0, float(i % 2) / 10.0], 0) for i in range(9)
    ] + [(9, [5.0, -5.0], 1)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    sf_dir = str(tmp_path)
    emb.write.parquet(f"{sf_dir}/embeddings.parquet")
    got = emb_mahalanobis(spark, sf_dir).collect()
    scores = {r["vec_id"]: r["maha_x1e4"] for r in got}
    assert max(scores, key=scores.get) == 9
    # the outlier dominates every inlier by a wide margin
    assert scores[9] > 10 * max(v for k, v in scores.items() if k != 9)


# ---------------------------------------------------------------------------
# audio framing plan
# ---------------------------------------------------------------------------


def test_audio_frame_plan_arithmetic(spark):
    from westtopologies_spark.scale.multimodal import (
        AUDIO_FRAME,
        AUDIO_HOP,
        as_binary_docs,
        audio_frame_plan,
    )

    docs = spark.createDataFrame(
        [
            (0, "a" * 2048, "en", "s", 2048),  # 1024 samples
            (1, "b" * 100, "en", "s", 100),  # 50 samples < one frame
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = {
        r["doc_id"]: r
        for r in audio_frame_plan(as_binary_docs(docs)).collect()
    }
    r0 = got[0]
    assert r0["sample_rate"] == 8000
    assert r0["n_samples"] == 1024
    assert r0["duration_ms"] == 1024 * 1000 // 8000
    assert r0["n_frames"] == (1024 - AUDIO_FRAME) // AUDIO_HOP + 1 == 3
    assert r0["stft_cells"] == 3 * (AUDIO_FRAME // 2 + 1)
    # payload shorter than one frame -> zero frames, zero cells
    r1 = got[1]
    assert r1["n_frames"] == 0 and r1["stft_cells"] == 0
    assert r1["sample_rate"] == 12000


# ---------------------------------------------------------------------------
# Mann-Kendall
# ---------------------------------------------------------------------------


def _mk_reference(series: list[int]) -> tuple[int, int]:
    """Pure-python S and tie-corrected variance numerator."""
    n = len(series)
    s = sum(
        (1 if series[j] > series[i] else -1 if series[j] < series[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(series)
    tie_sum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    return s, n * (n - 1) * (2 * n + 5) - tie_sum


def test_mann_kendall_monotone_and_tied(spark):
    from datetime import datetime

    from westtopologies_spark.scale.temporal import mann_kendall

    # 6 days: rising with one tie pair (daily cents: 100,200,200,300,400,500)
    vals = [1.0, 2.0, 2.0, 3.0, 4.0, 5.0]
    rows = [
        (i, datetime(2024, 1, 1 + i, 12, 0, 0), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    row = mann_kendall(ev).collect()[0]
    s_ref, var_ref = _mk_reference([100, 200, 200, 300, 400, 500])
    assert row["n_days"] == 6
    assert row["s_stat"] == s_ref == 14
    assert row["var_num"] == var_ref
    z_ref = (s_ref - 1) / math.sqrt(var_ref / 18.0)
    assert row["z_x1e6"] == round(z_ref * 1e6)
    assert row["z_x1e6"] > 0  # rising series


def test_mann_kendall_constant_series_is_zero(spark):
    from datetime import datetime

    from westtopologies_spark.scale.temporal import mann_kendall

    rows = [
        (i, datetime(2024, 2, 1 + i, 9, 0, 0), 1, "view", 7.0, "{}")
        for i in range(4)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    row = mann_kendall(ev).collect()[0]
    assert row["s_stat"] == 0
    assert row["z_x1e6"] == 0
    # all four days tie: variance numerator fully cancelled
    assert row["var_num"] == 0


# ---------------------------------------------------------------------------
# k-hop reach
# ---------------------------------------------------------------------------


def test_khop_reach_path_graph(spark):
    from westtopologies_spark.ops.graph import khop_reach

    # path 1-2-3-4-5-6: from seed 1, hops cap at 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r["user_id"]: r["hop"] for r in khop_reach(seeds, edges).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_khop_reach_min_hop_on_cycle(spark):
    from westtopologies_spark.ops.graph import khop_reach

    # square 1-2-3-4-1: node 3 reachable both ways in 2 hops
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r["user_id"]: r["hop"] for r in khop_reach(seeds, edges).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2}


# ---------------------------------------------------------------------------
# Benford audit
# ---------------------------------------------------------------------------


def test_benford_digits_and_expectation(spark, tmp_path):
    from westtopologies_spark.queries_ext4 import ag_benford

    prices = [123.45, 150.0, 19.99, 2345.0, 999.0, 1.5, 0.5]  # 0.5 filtered
    rows = [
        (i, 1, "O", p, __import__("datetime").datetime(2024, 1, 1), "1-URGENT", 1, "c")
        for i, p in enumerate(prices)
    ]
    orders = spark.createDataFrame(
        rows,
        [
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority", "o_shippriority", "o_comment",
        ],
    )
    sf_dir = str(tmp_path)
    orders.write.parquet(f"{sf_dir}/orders.parquet")
    got = {r["digit"]: r for r in ag_benford(spark, sf_dir).collect()}
    # leading digits of [123, 150, 19, 2345, 999, 1]: 1 x4, 2 x1, 9 x1
    assert got[1]["n_obs"] == 4 and got[2]["n_obs"] == 1 and got[9]["n_obs"] == 1
    assert got[1]["obs_x1e6"] == 4 * 1_000_000 // 6
    assert got[1]["exp_x1e6"] == round(math.log10(2) * 1e6)
    assert got[1]["dev_x1e6"] == got[1]["obs_x1e6"] - got[1]["exp_x1e6"]


# ---------------------------------------------------------------------------
# burstiness
# ---------------------------------------------------------------------------


def test_burstiness_bursty_vs_uniform(spark, tmp_path):
    from westtopologies_spark.queries_ext4 import tx_burstiness

    # "even" appears once in every doc; "burst" 4 times in one doc of 4
    texts = ["even burst burst burst burst", "even", "even", "even"]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["tok"]: r for r in tx_burstiness(spark, sf_dir).collect()}
    # "even": df=4, cf=4, rate 1.0, VMR = 0 (perfectly uniform)
    assert got["even"]["rate_x1e4"] == 10_000
    assert got["even"]["vmr_x1e4"] == 0
    # "burst": df=1 < min_df 3 -> excluded
    assert "burst" not in got


# ---------------------------------------------------------------------------
# mutual information
# ---------------------------------------------------------------------------


def test_mutual_info_independent_is_zero(spark, tmp_path):
    from datetime import datetime

    from westtopologies_spark.queries_ext4 import ag_mutual_info

    # independent uniform grid: every (type, seg) cell equal -> MI = 0
    rows = []
    i = 0
    for et in ["a", "b"]:
        for seg in range(10):
            for _ in range(3):
                rows.append(
                    (i, datetime(2024, 3, 1, 10, 0, 0), seg, et, 1.0, "{}")
                )
                i += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf_dir = str(tmp_path)
    ev.write.parquet(f"{sf_dir}/events.parquet")
    row = ag_mutual_info(spark, sf_dir).collect()[0]
    assert row["n_cells"] == 20
    assert row["mi_x1e9"] == 0


def test_mutual_info_deterministic_is_log_nseg(spark, tmp_path):
    from datetime import datetime

    from westtopologies_spark.queries_ext4 import ag_mutual_info

    # event_type fully determined by segment (2 types, segs 0/1 only):
    # MI = H(type) = ln 2
    rows = []
    for i in range(40):
        seg = i % 2
        et = "x" if seg == 0 else "y"
        rows.append((i, datetime(2024, 3, 2, 9, 0, 0), seg, et, 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf_dir = str(tmp_path)
    ev.write.parquet(f"{sf_dir}/events.parquet")
    row = ag_mutual_info(spark, sf_dir).collect()[0]
    # per-cell: 2 cells each p=.5, ln(.5*N*N/(.5N*.5N)) = ln 2
    want = 2 * round(0.5 * math.log(2) * 1e9)
    assert row["mi_x1e9"] == want


# ---------------------------------------------------------------------------
# nDCG
# ---------------------------------------------------------------------------


def test_ndcg_ideal_constant_and_perfect_ranking():
    from westtopologies_spark.queries_ext4 import _ndcg_ideal_x1e6

    k = 5
    ideal = _ndcg_ideal_x1e6(k)
    # a ranking identical to the exact one scores ndcg exactly 1.0:
    # the per-position gains are rounded the same way as the ideal
    dcg = sum(
        round((k + 1 - i) / math.log2(i + 1) * 1_000_000)
        for i in range(1, k + 1)
    )
    assert dcg == ideal
    assert dcg * 10_000 // ideal == 10_000


def test_ndcg_bounds_on_real_data(spark):
    from westtopologies_spark.queries_ext4 import ann_ndcg

    rows = ann_ndcg(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["ndcg_x1e4"] <= 10_000
        assert r["idcg_x1e6"] > 0


# ---------------------------------------------------------------------------
# Q6 shape + vacuum plan
# ---------------------------------------------------------------------------


def test_forecast_revenue_on_testdata(spark):
    from westtopologies_spark.queries_ext4 import sq_forecast_revenue

    row = sq_forecast_revenue(spark, "/root/testdata/sf0.001").collect()[0]
    # n_lines > 0 on the synthetic data and cents are positive integers
    assert row["n_lines"] > 0
    assert isinstance(row["revenue_cents"], int) and row["revenue_cents"] > 0


def test_vacuum_plan_keep_last_k(spark):
    from datetime import datetime

    from westtopologies_spark.scale import versioning  # noqa: F401
    from westtopologies_spark.queries_ext4 import VACUUM_KEEP_K, dv_vacuum_plan
    import tempfile, os

    assert VACUUM_KEEP_K == 2
    with tempfile.TemporaryDirectory() as sf_dir:
        rows = [
            (i, datetime(2024, 5, 1 + i, 8, 0, 0), 7, "view", 1.0, "p" * (i + 1))
            for i in range(4)  # user 7: 4 versions, newest i=3
        ] + [(10, datetime(2024, 5, 1, 9, 0, 0), 8, "view", 1.0, "xy")]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        ev.write.parquet(os.path.join(sf_dir, "events.parquet"))
        got = {r["user_id"]: r for r in dv_vacuum_plan(spark, sf_dir).collect()}
    # user 7: keeps the 2 newest (props len 4, 3), vacuums len 2 + 1 = 3 bytes
    assert got[7]["n_versions"] == 4
    assert got[7]["n_keep"] == 2 and got[7]["n_vacuum"] == 2
    assert got[7]["vacuum_bytes"] == 3
    # single-version key: nothing to vacuum
    assert got[8]["n_vacuum"] == 0 and got[8]["vacuum_bytes"] == 0


# ---------------------------------------------------------------------------
# label margin
# ---------------------------------------------------------------------------


def test_label_margin_separated_clusters(spark, tmp_path):
    from westtopologies_spark.queries_ext4 import emb_label_margin

    # label 0 near +x axis, label 1 near +y axis; queries are vec 0/1
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 1),
        (2, [0.9, 0.1], 0),
        (3, [0.1, 0.9], 1),
        (4, [0.95, 0.05], 0),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    sf_dir = str(tmp_path)
    emb.write.parquet(f"{sf_dir}/embeddings.parquet")
    got = {r["query_id"]: r for r in emb_label_margin(spark, sf_dir).collect()}
    # well-separated clusters: same-label neighbor beats cross-label
    assert got[0]["margin_x1e6"] > 0
    assert got[1]["margin_x1e6"] > 0
    assert got[0]["best_same_x1e6"] > got[0]["best_diff_x1e6"]


# ---------------------------------------------------------------------------
# effective mixture
# ---------------------------------------------------------------------------


def test_effective_mixture_downweights_copies(spark, tmp_path):
    from westtopologies_spark.queries_ext4 import tp_effective_mixture

    # source A: 3 copies of one text; source B: 3 distinct texts
    rows = [
        (0, "same text", "A", 9),
        (1, "same  text", "A", 10),  # whitespace-collapse == same cluster
        (2, "Same Text", "A", 9),  # lowercase == same cluster
        (3, "alpha", "B", 5),
        (4, "beta", "B", 4),
        (5, "gamma", "B", 5),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "source", "n_chars"]
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"), "source", "n_chars"
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["source"]: r for r in tp_effective_mixture(spark, sf_dir).collect()
    }
    # A: 3 rows but one cluster of 3 -> 3 * (1e6 DIV 3) = 999999
    assert got["A"]["n_docs"] == 3
    assert got["A"]["eff_docs_x1e6"] == 999_999
    # B: 3 unique docs -> 3e6; B's share ~ 3/4 of the corpus mass
    assert got["B"]["eff_docs_x1e6"] == 3_000_000
    assert got["B"]["share_x1e6"] == 3_000_000 * 1_000_000 // 3_999_999


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence
# ---------------------------------------------------------------------------


def test_jsd_identical_halves_zero(spark, tmp_path):
    from westtopologies_spark.queries_ext4 import tx_js_divergence

    # even/odd docs carry identical token bags -> JSD == 0
    docs = spark.createDataFrame(
        [
            (0, "a b c", "en", "s", 5),
            (1, "a b c", "en", "s", 5),
            (2, "d d", "en", "s", 3),
            (3, "d d", "en", "s", 3),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    row = tx_js_divergence(spark, sf_dir).collect()[0]
    assert row["na"] == row["nb"] == 5
    assert row["jsd_x1e9"] == 0


def test_jsd_disjoint_halves_ln2(spark, tmp_path):
    from westtopologies_spark.queries_ext4 import tx_js_divergence

    # disjoint vocabularies -> JSD attains its maximum ln 2
    docs = spark.createDataFrame(
        [
            (0, "a a b", "en", "s", 5),
            (1, "x y y", "en", "s", 5),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    row = tx_js_divergence(spark, sf_dir).collect()[0]
    # sum of per-term rounded contributions: each term contributes
    # 0.5 * p * ln(2); p over each half sums to 1 -> total ln 2
    want = (
        round(0.5 * (2 / 3) * math.log(2) * 1e9)
        + round(0.5 * (1 / 3) * math.log(2) * 1e9)
    ) * 2
    assert abs(row["jsd_x1e9"] - want) <= 2  # per-term rounding only
    assert abs(row["jsd_x1e9"] / 1e9 - math.log(2)) < 1e-6


# ---------------------------------------------------------------------------
# multi-probe LSH
# ---------------------------------------------------------------------------


def test_multiprobe_recall_dominates_single(spark):
    from westtopologies_spark.queries_ext4 import ann_multiprobe_recall

    rows = ann_multiprobe_recall(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    for r in rows:
        # probing a superset of buckets can only add true neighbors
        assert r["n_multi"] >= r["n_single"]
        assert r["recall_multi_x1e4"] >= r["recall_single_x1e4"]
        assert 0 <= r["recall_multi_x1e4"] <= 10_000


def test_multiprobe_candidates_superset_of_single(spark):
    from pyspark.sql import functions as F

    from westtopologies_spark.scale import constants as C
    from westtopologies_spark.scale.similarity import (
        ann_lsh_topk,
        ann_multiprobe_topk,
    )
    from westtopologies_spark.queries import _t

    emb = _t(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < C.ANN_N_QUERIES)
    # k >= corpus size: no truncation, so the comparison is between
    # the RAW candidate sets (a finite top-k can evict a single-probe
    # candidate that ranks below k in the 9x-larger multi-probe pool)
    big_k = emb.count() + 1
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(emb, q, k=big_k).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_multiprobe_topk(emb, q, k=big_k).collect()
    }
    # multi-probe probes the query's own bucket plus 8 more -> its
    # candidate set contains every single-probe candidate
    assert single <= multi
    assert len(multi) > len(single)


# ---------------------------------------------------------------------------
# lateness profile
# ---------------------------------------------------------------------------


def test_lateness_profile_buckets(spark, tmp_path):
    from datetime import datetime, timedelta

    from westtopologies_spark.queries_ext4 import ts_lateness_profile

    t0 = datetime(2024, 6, 1, 12, 0, 0)
    # user 1 arrival order (event_id): on-time, on-time, 90 s late,
    # on-time, 11 min late (pools into the capped top bucket)
    rows = [
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + timedelta(seconds=60), 1, "view", 1.0, "{}"),
        (2, t0 + timedelta(seconds=-30), 1, "view", 1.0, "{}"),  # 90 s late
        (3, t0 + timedelta(seconds=120), 1, "view", 1.0, "{}"),
        (4, t0 + timedelta(seconds=-540), 1, "view", 1.0, "{}"),  # 660 s late
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import os

    sf_dir = str(tmp_path)
    ev.write.parquet(os.path.join(sf_dir, "events.parquet"))
    got = {
        r["late_bucket_min"]: r
        for r in ts_lateness_profile(spark, sf_dir).collect()
    }
    # three on-time events in bucket 0; one 90 s late -> bucket 1;
    # one 660 s late -> capped bucket 10
    assert got[0]["n_events"] == 3 and got[0]["max_late_s"] == 0
    assert got[1]["n_events"] == 1 and got[1]["max_late_s"] == 90
    assert got[10]["n_events"] == 1 and got[10]["max_late_s"] == 660


# ---------------------------------------------------------------------------
# threshold sweep + IVF probe sweep
# ---------------------------------------------------------------------------


def test_threshold_sweep_monotone(spark):
    from westtopologies_spark.queries_ext4 import (
        DD_SWEEP_THRESHOLDS,
        dd_threshold_sweep,
    )

    rows = {
        r["thr_x1e4"]: r["n_pairs"]
        for r in dd_threshold_sweep(spark, "/root/testdata/sf0.001").collect()
    }
    assert sorted(rows) == DD_SWEEP_THRESHOLDS
    # cumulative counts are non-increasing in the threshold
    counts = [rows[t] for t in DD_SWEEP_THRESHOLDS]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_ivf_probe_sweep_monotone(spark):
    from westtopologies_spark.queries_ext4 import ann_ivf_probe_sweep

    rows = ann_ivf_probe_sweep(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    for r in rows:
        # probing more cells can only add candidates -> recall grows
        assert r["n_probe3"] >= r["n_probe1"]
        assert r["recall_probe3_x1e4"] >= r["recall_probe1_x1e4"]
        assert 0 <= r["recall_probe3_x1e4"] <= 10_000


# ---------------------------------------------------------------------------
# source overlap + Fano factor
# ---------------------------------------------------------------------------


def test_source_overlap_counts_cross_and_within(spark, tmp_path):
    from westtopologies_spark.queries_ext4 import dd_source_overlap

    rows = [
        (0, "dup text", "A", 8),
        (1, "dup  TEXT", "A", 9),  # same cluster as 0 (normalize)
        (2, "dup text", "B", 8),  # cross-source copy
        (3, "unique", "B", 6),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "source", "n_chars"]
    ).select("doc_id", "text", F.lit("en").alias("lang"), "source", "n_chars")
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in dd_source_overlap(spark, sf_dir).collect()
    }
    # cluster {0,1,2}: pairs (0,1) within A, (0,2) and (1,2) cross A-B
    assert got[("A", "A")] == 1
    assert got[("A", "B")] == 2
    assert ("B", "B") not in got


def test_fano_factor_poisson_vs_bursty(spark, tmp_path):
    from datetime import datetime, timedelta

    from westtopologies_spark.queries_ext4 import ts_fano_factor

    t0 = datetime(2024, 7, 1, 0, 0, 0)
    rows = []
    i = 0
    # "steady": exactly 2 events every hour for 4 hours -> variance 0
    for h in range(4):
        for _ in range(2):
            rows.append((i, t0 + timedelta(hours=h), 1, "steady", 1.0, "{}"))
            i += 1
    # "bursty": all 8 events in hour 0 of the same span
    for _ in range(8):
        rows.append((i, t0, 2, "bursty", 1.0, "{}"))
        i += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf_dir = str(tmp_path)
    ev.write.parquet(f"{sf_dir}/events.parquet")
    got = {r["event_type"]: r for r in ts_fano_factor(spark, sf_dir).collect()}
    # steady: counts [2,2,2,2] over 4 observed hours -> fano = 0
    assert got["steady"]["n_hours"] == 4
    assert got["steady"]["fano_x1e4"] == 0
    assert got["steady"]["rate_x1e4"] == 20_000
    # bursty: counts [8,0,0,0] -> var/mean = (4*64-64)/(4*8) = 6.0
    assert got["bursty"]["fano_x1e4"] == 60_000
