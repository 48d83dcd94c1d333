"""LOD-explorer operators (SURVEY.md §2.4 J2/J3/J5/J6, §2.5 A5, §2.2 P8/P9).

The reference's LocationCrawlerBolt performs synchronous SPARQL/HTTP
calls per message (LocationCrawlerBolt.java:139,185) — a design that
cannot scale or replay deterministically. The engine's default mode
replaces the endpoints with snapshot side tables (broadcast joins);
a live-lookup mode would be an opt-in mapInPandas with a local cache
(SURVEY.md §4.2).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import wkt_point

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
GEO_LAT = "http://www.w3.org/2003/01/geo/wgs84_pos#lat"
GEO_LONG = "http://www.w3.org/2003/01/geo/wgs84_pos#long"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


def sameas_lookup(df: DataFrame, triples: DataFrame, uri_col: str = "lgd_uri") -> DataFrame:
    """J2 — LinkedGeoData URI -> DBpedia URI via `(?s, owl:sameAs, o)`,
    first subject or null.

    Reference: LocationCrawlerBolt.java:125-129. Broadcast left join
    on the (filtered) triple snapshot; "first match" made
    deterministic with a subject ordering.
    """
    links = (
        triples.filter(F.col("p") == OWL_SAMEAS)
        .select(F.col("o").alias(uri_col), F.col("s").alias("dbpedia_uri"))
    )
    w = Window.partitionBy(uri_col).orderBy("dbpedia_uri")
    first = (
        links.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    return df.join(F.broadcast(first), uri_col, "left")


def property_scan(triples: DataFrame, subject_col_df: DataFrame, subject_col: str = "dbpedia_uri") -> DataFrame:
    """J5 — per location URI: the properties pointing at each
    URI-valued object, grouped per place.

    Reference runs `SELECT ?prop ?place WHERE { <uri> ?prop ?place }`
    against a live endpoint and keeps URI objects
    (LocationCrawlerBolt.java:131-153); here a broadcast semi-join
    against the snapshot + grouped collect.
    """
    uri_objects = triples.filter(F.col("o").startswith("http"))
    scoped = uri_objects.join(
        F.broadcast(subject_col_df.select(F.col(subject_col).alias("s")).distinct()), "s"
    )
    return scoped.groupBy(F.col("s").alias(subject_col), F.col("o").alias("place")).agg(
        F.sort_array(F.collect_set("p")).alias("props")
    )


def nb_accept(
    place_props: DataFrame,
    nb_counts: DataFrame,
    pos_apriori: float = 0.5,
) -> DataFrame:
    """J3+A5 — naive-Bayes screening of candidate places by their
    property lists, with the reference's +1/+2 smoothing; accept iff
    at least one property is known and posOdds > negOdds.

    Reference: LocationCrawlerBolt.java:116-122,155-181. ``nb_counts``
    must contain the special `total` row (totalRel/totalIrrel).
    """
    totals = nb_counts.filter(F.col("property") == "total").select(
        F.col("rel").alias("_total_rel"), F.col("irrel").alias("_total_irrel")
    )
    known = nb_counts.filter(F.col("property") != "total")
    exploded = place_props.select(
        "place", F.explode("props").alias("property"), F.size("props").alias("_n_props")
    )
    scored = (
        exploded.join(F.broadcast(known), "property", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("place")
        .agg(
            F.sum(
                F.when(
                    F.col("rel").isNotNull(),
                    F.log((F.col("rel") + 1.0) / (F.col("_total_rel") + 2.0)),
                ).otherwise(F.log(1.0 / (F.col("_total_rel") + 2.0)))
            ).alias("_pos_sum"),
            F.sum(
                F.when(
                    F.col("irrel").isNotNull(),
                    F.log((F.col("irrel") + 1.0) / (F.col("_total_irrel") + 2.0)),
                ).otherwise(F.log(1.0 / (F.col("_total_irrel") + 2.0)))
            ).alias("_neg_sum"),
            F.max(F.when(F.col("rel").isNotNull(), 1).otherwise(0)).alias("_any_known"),
        )
        .select(
            "place",
            (F.col("_pos_sum") + math.log(pos_apriori)).alias("pos_log_odds"),
            (F.col("_neg_sum") + math.log(1.0 - pos_apriori)).alias("neg_log_odds"),
            ((F.col("_any_known") == 1) & (F.col("_pos_sum") + math.log(pos_apriori) > F.col("_neg_sum") + math.log(1.0 - pos_apriori))).alias("accept"),
        )
    )
    return scored


def dereference(places: DataFrame, triples: DataFrame, place_col: str = "place") -> DataFrame:
    """J6 — "dereference" a location URI against the snapshot: pivot
    its triples to a wide row with geo:lat, geo:long and the optional
    English rdfs:label (OPTIONAL + LANGMATCHES -> left join + lang
    filter).

    Reference: LocationCrawlerBolt.java:183-209.
    """
    wide = (
        triples.groupBy(F.col("s").alias(place_col))
        .agg(
            F.max(F.when(F.col("p") == GEO_LAT, F.col("o"))).alias("lat"),
            F.max(F.when(F.col("p") == GEO_LONG, F.col("o"))).alias("lon"),
            F.max(
                F.when((F.col("p") == RDFS_LABEL) & (F.col("lang") == "en"), F.col("o"))
            ).alias("label"),
        )
    )
    return places.join(F.broadcast(wide), place_col, "left")


def assemble_lod_output(df: DataFrame, item_col: str = "itinno:item_id") -> DataFrame:
    """P8+P9 — build the sink document:
    {itinno:item_id, ukob:explored_entities:[{uri,label,loc}]}
    with loc = "POINT(lat long)" (lat-first) and '' for missing labels.

    Reference: LocationCrawlerBolt.java:300-315.
    """
    entity = F.struct(
        F.col("place").alias("ukob:explored_entity_uri"),
        F.coalesce(F.col("label"), F.lit("")).alias("ukob:explored_entity_label"),
        wkt_point(F.col("lat").cast("double"), F.col("lon").cast("double")).alias(
            "ukob:explored_entity_loc"
        ),
    )
    return (
        df.withColumn("_entity", entity)
        .groupBy(F.col(f"`{item_col}`"))
        .agg(F.collect_list("_entity").alias("ukob:explored_entities"))
    )
