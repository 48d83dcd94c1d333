"""Approximate-nearest-neighbor search over embedding columns.

Two strategies over ``array<float>`` vectors:

- brute-force cosine top-k: broadcast the (small) query set against
  the corpus — the exact baseline. One shuffle (the per-query top-k
  aggregation); the corpus scan is embarrassingly parallel.
- sign-LSH bucketed: 8 deterministic random hyperplanes -> 8-bit
  bucket signature; candidates = corpus rows in the query's bucket;
  exact cosine rerank inside the bucket. At 100 TB the bucket join
  replaces the full scan with a keyed equi-join that prunes ~255/256
  of the corpus per query (multi-probe = widen the bucket set).

All arithmetic is double-precision with deterministic left-fold
summation; hyperplane components are exact-representable doubles
generated from an integer LCG (:func:`..constants.lsh_plane`), so
the DuckDB oracle reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import constants as C


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _normed(emb: DataFrame, vec_col: str, id_col: str, prefix: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return emb.select(
        F.col(id_col).alias(f"{prefix}id"),
        v.alias(f"{prefix}v"),
        _norm(v).alias(f"{prefix}n"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame | Column,
    k: int = C.ANN_TOP_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine per query vector (self-matches excluded).

    ``queries`` is either a DataFrame or a boolean Column predicate
    selecting query rows out of the corpus (preferred: norms are
    computed once, the query side is a filter of the same scan).

    The query side is broadcast — at any corpus scale this is one
    parallel scan plus a per-query top-k; ties broken by neighbor id
    on the similarity rounded to 6 decimals (stable across engines).
    """
    c = _normed(corpus, vec_col, id_col, "c_")
    if isinstance(queries, Column):
        q = corpus.filter(queries)
    else:
        q = queries
    q = _normed(q, vec_col, id_col, "q_")
    sim = F.round(_dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 6)
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            sim.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def hyperplane_buckets(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = C.EMBEDDING_DIM,
) -> DataFrame:
    """(vec_id, bucket): sign-LSH signature. Bit p of the bucket is
    1 iff the dot product with deterministic hyperplane p is >= 0
    (rounded at 1e-9 to keep the sign stable across engines)."""
    v = F.col(vec_col).cast("array<double>")
    bucket = None
    for p in range(C.LSH_N_PLANES):
        plane = F.array(*[F.lit(x) for x in C.lsh_plane(p, dim)])
        bit = F.when(F.round(_dot(v, plane), 9) >= 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return emb.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame | Column,
    k: int = C.ANN_TOP_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = C.EMBEDDING_DIM,
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's hyperplane
    bucket; exact cosine rerank within the bucket. Queries landing in
    sparse buckets return < k rows — the documented recall trade-off
    of single-probe LSH (the oracle replicates the same bucketing).

    As with :func:`cosine_topk`, pass ``queries`` as a Column
    predicate when the query set is a slice of the corpus — the
    bucket signature (8 x 64-term dot products) is then planned once
    and the query side is a cheap filter of it.
    """
    c_all = _normed(corpus, vec_col, id_col, "c_").join(
        hyperplane_buckets(corpus, vec_col, id_col, dim).withColumnsRenamed(
            {"vec_id": "c_id"}
        ),
        "c_id",
    )
    if isinstance(queries, Column):
        q_src = corpus.filter(queries)
    else:
        q_src = queries
    q = _normed(q_src, vec_col, id_col, "q_").join(
        hyperplane_buckets(q_src, vec_col, id_col, dim).withColumnsRenamed(
            {"vec_id": "q_id"}
        ),
        "q_id",
    )
    c = c_all
    sim = F.round(_dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 6)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            sim.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
