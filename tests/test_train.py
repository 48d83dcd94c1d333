"""M2 trainer: corpus prep, grid regions, count-estimation training,
S12 artifact round-trip, and scoring integration with M1."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from westtopologies_spark.ops import train
from westtopologies_spark.ops.model import predict_locations


@pytest.fixture(scope="module")
def geo_docs(spark):
    rows = [
        # cluster around (50, 7) — "cologne"
        (0, "dom rhein karneval dom", 50.9, 6.9),
        (1, "rhein dom museum fest", 50.8, 7.1),
        (2, "karneval fest rhein dom", 50.95, 6.95),
        # cluster around (40, -74) — "nyc"
        (3, "subway pizza broadway subway", 40.7, -74.0),
        (4, "broadway pizza park subway", 40.8, -73.9),
        # dropped rows: zero/None coordinates, single-char tokens only
        (5, "ignored zero coords", 0.0, 10.0),
        (6, "ignored null coords", None, None),
        (7, "a b c", 45.0, 8.0),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lat", "lon"])


def test_prepare_corpus_filters(geo_docs):
    out = train.prepare_corpus(geo_docs)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == [0, 1, 2, 3, 4]  # P13 coord filter + P14 short-token drop
    toks = {r["doc_id"]: r["tokens"] for r in out.select("doc_id", "tokens").collect()}
    assert all(len(t) > 1 for ts in toks.values() for t in ts)


def test_train_and_roundtrip(geo_docs, tmp_path):
    corpus = train.prepare_corpus(geo_docs)
    model, word2id = train.train_location_model(corpus, n_topics=4, n_regions=4, cell_deg=2.0)
    # two occupied grid cells -> two regions with sane centers
    centers = model.regions[np.any(model.regions != 0, axis=1)]
    assert len(centers) == 2
    lat_set = sorted(round(c[0]) for c in centers)
    assert lat_set == [41, 51] or lat_set == [40, 51]
    # distributions normalized
    assert np.allclose(model.topic_word.sum(axis=1), 1.0)
    assert np.allclose(model.pi_0.sum(), 1.0)
    assert "dom" in word2id and "subway" in word2id

    out_dir = str(tmp_path / "model")
    train.save_model(model, word2id, out_dir)
    loaded, w2 = train.load_model(out_dir)
    assert w2 == word2id
    np.testing.assert_allclose(loaded.topic_word, model.topic_word, rtol=1e-8)
    np.testing.assert_allclose(loaded.regions, model.regions, atol=1e-5)


def test_trained_model_scores_with_m1(spark, geo_docs):
    corpus = train.prepare_corpus(geo_docs)
    model, word2id = train.train_location_model(corpus, n_topics=4, n_regions=4, cell_deg=2.0)
    docs = spark.createDataFrame(
        [(0, " ".join(str(word2id[w]) for w in ("dom", "rhein")))],
        ["doc_id", "token_ids"],
    )
    out = predict_locations(docs, model, top_k=2).collect()
    assert len(out) == 2
    assert abs(sum(r["probability"] for r in out)) <= 1.0 + 1e-9


def test_train_max_vocab_cap(geo_docs):
    corpus = train.prepare_corpus(geo_docs)
    model, word2id = train.train_location_model(
        corpus, n_topics=4, n_regions=4, cell_deg=2.0, max_vocab=3
    )
    # open-vocabulary cap: only the top-3 words by (tf desc, word asc)
    assert len(word2id) == 3
    assert sorted(word2id.values()) == [0, 1, 2]
    assert model.topic_word.shape == (4, 3)
    assert np.allclose(model.topic_word.sum(axis=1), 1.0)
