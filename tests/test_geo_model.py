"""Unit tests for the LOD-explorer operators (ops/geo.py) and the
model-scoring kernel (ops/model.py) on tiny in-memory frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from westtopologies_spark.ops.geo import (
    GEO_LAT,
    GEO_LONG,
    OWL_SAMEAS,
    RDFS_LABEL,
    assemble_lod_output,
    dereference,
    nb_accept,
    sameas_lookup,
)
from westtopologies_spark.ops.model import LocationModel, predict_locations


def _triples(spark):
    rows = [
        ("http://dbpedia.org/resource/Koblenz", OWL_SAMEAS, "http://linkedgeodata.org/t/1", None),
        ("http://dbpedia.org/resource/Berlin", OWL_SAMEAS, "http://linkedgeodata.org/t/2", None),
        ("http://dbpedia.org/resource/AltBerlin", OWL_SAMEAS, "http://linkedgeodata.org/t/2", None),
        ("http://dbpedia.org/resource/Koblenz", GEO_LAT, "50.36", None),
        ("http://dbpedia.org/resource/Koblenz", GEO_LONG, "7.60", None),
        ("http://dbpedia.org/resource/Koblenz", RDFS_LABEL, "Koblenz", "en"),
        ("http://dbpedia.org/resource/Koblenz", RDFS_LABEL, "Coblence", "fr"),
        ("http://dbpedia.org/resource/Berlin", GEO_LAT, "52.52", None),
        ("http://dbpedia.org/resource/Berlin", GEO_LONG, "13.40", None),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string, lang string")


def test_sameas_first_match(spark):
    msgs = spark.createDataFrame(
        [("m1", "http://linkedgeodata.org/t/2")], "item string, lgd_uri string"
    )
    out = sameas_lookup(msgs, _triples(spark)).collect()
    # two sameAs subjects exist for t/2; first by subject ordering wins
    assert out[0]["dbpedia_uri"] == "http://dbpedia.org/resource/AltBerlin"


def test_dereference_and_assembly(spark):
    places = spark.createDataFrame(
        [("i1", "http://dbpedia.org/resource/Koblenz"), ("i1", "http://dbpedia.org/resource/Berlin")],
        "`itinno:item_id` string, place string",
    )
    wide = dereference(places, _triples(spark))
    rows = {r["place"]: r for r in wide.collect()}
    ko = rows["http://dbpedia.org/resource/Koblenz"]
    assert (ko["lat"], ko["lon"], ko["label"]) == ("50.36", "7.60", "Koblenz")  # en only
    be = rows["http://dbpedia.org/resource/Berlin"]
    assert be["label"] is None  # OPTIONAL label missing

    out = assemble_lod_output(wide).collect()
    assert len(out) == 1
    ents = {e["ukob:explored_entity_uri"]: e for e in out[0]["ukob:explored_entities"]}
    ko_e = ents["http://dbpedia.org/resource/Koblenz"]
    assert ko_e["ukob:explored_entity_loc"] == "POINT(50.36 7.6)"
    assert ents["http://dbpedia.org/resource/Berlin"]["ukob:explored_entity_label"] == ""


def test_nb_accept_unknown_only_rejected(spark):
    props = spark.createDataFrame(
        [("placeA", ["click", "purchase"]), ("placeB", ["zzz"])],
        "place string, props array<string>",
    )
    counts = spark.createDataFrame(
        [("click", 30, 70), ("purchase", 80, 20), ("total", 100, 200)],
        "property string, rel int, irrel int",
    )
    rows = {r["place"]: r for r in nb_accept(props, counts).collect()}
    assert rows["placeB"]["accept"] is False  # no known property -> rejected
    assert rows["placeA"]["pos_log_odds"] > rows["placeA"]["neg_log_odds"]
    assert rows["placeA"]["accept"] is True


def test_predict_locations_deterministic_topk(spark):
    docs = spark.createDataFrame(
        [(0, "1 2 3"), (1, "4 5"), (2, ""), (7, "9 9 9 9")],
        "doc_id long, token_ids string",
    )
    model = LocationModel.deterministic(n_regions=6)
    a = predict_locations(docs, model, top_k=3).collect()
    b = predict_locations(docs, model, top_k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    per_doc = {}
    for r in a:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == {0, 1, 2, 7}
    for doc_rows in per_doc.values():
        assert len(doc_rows) == 3
        assert all(0.0 <= r["probability"] <= 1.0 for r in doc_rows)
        # location key is "lon,lat" float-formatted (P10)
        lon, lat = doc_rows[0]["location"].split(",")
        assert -180 <= float(lon) <= 180 and -90 <= float(lat) <= 90


def test_predict_vectorized_matches_grouped(spark):
    """M1 vectorized (mapInPandas) == grouped (applyInPandas) scorer."""
    from westtopologies_spark.ops.model import predict_locations_vectorized

    model = LocationModel.deterministic(n_regions=12)
    docs = spark.createDataFrame(
        [(0, "1 2 3"), (1, "4 4 4 9"), (2, ""), (3, "7")],
        ["doc_id", "token_ids"],
    )
    a = {
        (r["doc_id"], r["rank_i"]): (r["location"], round(r["probability"], 9))
        for r in predict_locations(docs, model, top_k=3)
        .withColumn("rank_i", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("doc_id").orderBy(F.desc("probability"), "location")))
        .collect()
    }
    b = {
        (r["doc_id"], r["rank_i"]): (r["location"], round(r["probability"], 9))
        for r in predict_locations_vectorized(docs, model, top_k=3)
        .withColumn("rank_i", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("doc_id").orderBy(F.desc("probability"), "location")))
        .collect()
    }
    assert a == b


def test_live_lookup_parity_snapshot_vs_live(spark):
    """VERDICT r1 item 9 — J5/J6 live mode (mapInPandas + per-executor
    LRU) produces identical output to the snapshot broadcast-join mode
    over the same triples."""
    from westtopologies_spark.ops.geo import (
        live_dereference,
        live_property_scan,
        property_scan,
        snapshot_lookup_fn,
    )

    triples = _triples(spark)
    lookup = snapshot_lookup_fn(triples)

    # J5 parity
    subjects = spark.createDataFrame(
        [("http://dbpedia.org/resource/Koblenz",), ("http://dbpedia.org/resource/Berlin",)],
        "dbpedia_uri string",
    )
    snap = property_scan(triples, subjects).collect()
    live = live_property_scan(subjects, lookup).collect()
    canon = lambda rows: sorted((r["dbpedia_uri"], r["place"], tuple(r["props"])) for r in rows)
    assert canon(live) == canon(snap)
    assert len(live) > 0

    # J6 parity (including the en-only OPTIONAL label and missing lat/lon)
    places = spark.createDataFrame(
        [
            ("i1", "http://dbpedia.org/resource/Koblenz"),
            ("i1", "http://dbpedia.org/resource/Berlin"),
            ("i1", "http://dbpedia.org/resource/Nowhere"),
        ],
        "`itinno:item_id` string, place string",
    )
    from westtopologies_spark.ops.geo import dereference

    snap6 = {r["place"]: (r["lat"], r["lon"], r["label"]) for r in dereference(places, triples).collect()}
    live6 = {r["place"]: (r["lat"], r["lon"], r["label"]) for r in live_dereference(places, lookup).collect()}
    assert live6 == snap6
    assert live6["http://dbpedia.org/resource/Nowhere"] == (None, None, None)


def test_live_lookup_cache_and_error_path():
    """The LRU actually caches (one endpoint call per distinct URI)
    and endpoint errors degrade to empty results, like the bolt's
    catch-and-continue."""
    from westtopologies_spark.ops.geo import _cached_lookup

    calls = []

    def fn(uri):
        calls.append(uri)
        if uri == "boom":
            raise RuntimeError("endpoint down")
        return [("p", "o", None)]

    key = "test-cache"
    assert _cached_lookup(fn, key, "a", 10) == [("p", "o", None)]
    assert _cached_lookup(fn, key, "a", 10) == [("p", "o", None)]
    assert calls == ["a"]  # second call served from cache
    assert _cached_lookup(fn, key, "boom", 10) == []
    # eviction: tiny cache keeps only the most recent entries
    for i in range(5):
        _cached_lookup(fn, key, f"u{i}", 2)
    from westtopologies_spark.ops.geo import _LIVE_CACHE

    assert len(_LIVE_CACHE[key]) <= 2
