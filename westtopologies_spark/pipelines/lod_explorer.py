"""Pipeline 2 — lodExplorer (SURVEY.md §3.3.2).

Reference wiring: AMQP spout -> LocationCrawlerBolt -> RabbitMQ sink
(lodExplorerTopology/.../TopologyRunner.java:266-273). Per message:
explode loc_set URIs (E2) -> owl:sameAs lookup (J2) -> property scan
(J5) -> naive-Bayes screening (A5) -> dereference lat/long/label (J6)
-> assemble output doc (P8/P9) -> publish (S5).

The engine replaces the reference's synchronous SPARQL/HTTP calls
with snapshot triple tables joined broadcast-side — deterministic and
100 TB-scalable (SURVEY.md §4.2); every step is a Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..ops.geo import assemble_lod_output, dereference, nb_accept, property_scan, sameas_lookup
from ..ops.relational import explode_loc_uris


def lod_explorer_batch(
    geoparse: DataFrame,
    sameas_triples: DataFrame,
    location_triples: DataFrame,
    nb_counts: DataFrame,
) -> DataFrame:
    """Full lodExplorer flow on snapshot side tables.

    ``geoparse``: F2 rows (itinno:item_id, itinno:loc_set).
    ``sameas_triples`` / ``location_triples``: (s, p, o[, lang]) RDF
    snapshots (S10). ``nb_counts``: (property, rel, irrel) incl. the
    'total' row (S11).
    """
    uris = explode_loc_uris(geoparse)
    linked = sameas_lookup(uris, sameas_triples).filter("dbpedia_uri IS NOT NULL")
    # J5: candidate places are the URI-valued OBJECTS linked from the
    # dbpedia location uri; NB screening accepts places, which are
    # then dereferenced (the reference explores the linked entity,
    # LocationCrawlerBolt.java:267-311)
    places = property_scan(location_triples, linked)
    screened = nb_accept(places, nb_counts).filter("accept")
    accepted = places.join(screened.select("place"), "place").select("dbpedia_uri", "place")
    item_places = (
        linked.select("`itinno:item_id`", "dbpedia_uri")
        .join(accepted, "dbpedia_uri")
        .select("`itinno:item_id`", "place")
    )
    located = dereference(item_places, location_triples).filter(
        "lat IS NOT NULL AND lon IS NOT NULL"
    )
    return assemble_lod_output(located)
