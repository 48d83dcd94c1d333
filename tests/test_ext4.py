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
