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
