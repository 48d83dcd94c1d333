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


def recall_overlap(
    exact_topk: DataFrame, approx_topk: DataFrame, k: int
) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against the
    exact ground truth: (query_id, k, n_overlap, recall_x1e4) — one
    k-row-per-query left join + count, recall as an exact scaled
    BIGINT.  Shared by the prefix-truncation audit
    (``emb_prefix_recall``) and the LSH audit (``ann_recall_audit``);
    both sides must carry (query_id, neighbor_id)."""
    approx = approx_topk.select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    j = exact_topk.select("query_id", "neighbor_id").join(
        approx,
        (F.col("query_id") == F.col("a_qid"))
        & (F.col("neighbor_id") == F.col("a_nid")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.lit(k).cast("long").alias("k"),
        F.count("a_nid").alias("n_overlap"),
        F.expr(f"count(a_nid) * 10000 div {int(k)}")
        .cast("long")
        .alias("recall_x1e4"),
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


def _nearest_centroid(vectors: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid): each vector's nearest centroid by cosine
    (rounded to 6 decimals; ties -> smallest cid). The centroid table
    is broadcast — the assignment is one parallel scan, the argmax is
    a per-vector aggregation with map-side combine. Expressed as
    max + equality join back (not a struct-max) so the DuckDB oracle
    states the identical comparison semantics."""
    sim = F.round(
        _dot(F.col("c_v"), F.col("cent_v")) / (F.col("c_n") * F.col("cent_n")), 6
    )
    scored = vectors.crossJoin(F.broadcast(cents)).select(
        "c_id", F.col("cid"), sim.alias("_sim")
    )
    best = scored.groupBy("c_id").agg(F.max("_sim").alias("_best"))
    return (
        scored.join(best, ["c_id"])
        .filter(F.col("_sim") == F.col("_best"))
        .groupBy("c_id")
        .agg(F.min("cid").alias("cid"))
    )


def ivf_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = C.EMBEDDING_DIM,
    n_lists: int = C.IVF_N_LISTS,
    stride: int = C.IVF_SEED_STRIDE,
) -> DataFrame:
    """(cid, cent_v, cent_n): IVF coarse-quantizer cells.

    Deterministic training (no RNG, oracle-replicable): seeds are the
    ``n_lists`` smallest vec_ids divisible by ``stride`` (a stride
    sample of the corpus; cid = the seed's vec_id, so no global
    renumbering), refined with ONE Lloyd step — assign every vector
    to its nearest seed, average each cell, round components to 9
    decimals (absorbs engine summation-order ulps). Cells that end
    up empty after assignment drop out, exactly as in the oracle.

    At scale: the seed pick is a top-k (no sort of the corpus), the
    Lloyd assignment is a broadcast-join scan, and the per-cell mean
    is one map-side-combinable aggregation — nothing quadratic.
    """
    # referenced by the seed pick, the Lloyd assignment and the cell
    # mean — materialize the normed corpus once
    v = _normed(emb, vec_col, id_col, "c_").persist()
    seeds = (
        v.filter(F.col("c_id") % stride == 0)
        .orderBy("c_id")
        .limit(n_lists)
        .select(
            F.col("c_id").alias("cid"),
            F.col("c_v").alias("cent_v"),
            F.col("c_n").alias("cent_n"),
        )
    )
    assigned = _nearest_centroid(v, seeds)
    members = v.join(assigned, "c_id")
    mean_v = F.array(
        *[
            F.round(F.avg(F.element_at(F.col("c_v"), i + 1)), 9)
            for i in range(dim)
        ]
    )
    return (
        members.groupBy("cid")
        .agg(mean_v.alias("cent_v"))
        .withColumn("cent_n", _norm(F.col("cent_v")))
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame | Column,
    k: int = C.ANN_TOP_K,
    n_probe: int = C.IVF_N_PROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = C.EMBEDDING_DIM,
) -> DataFrame:
    """IVF ANN: corpus partitioned into coarse-quantizer cells
    (:func:`ivf_centroids`); each query searches only its ``n_probe``
    nearest cells, with an exact cosine rerank inside them. Neighbors
    outside the probed cells are missed — the standard IVF recall
    trade-off, replicated exactly by the oracle.

    100 TB shape: the centroid table is tiny and broadcast twice
    (corpus assignment, query probe pick); the only corpus-sized
    shuffle is the per-query top-k. The cell assignment would be
    computed once and persisted as a column in a real deployment —
    here it stays in-plan so the query is self-contained.
    """
    cents = ivf_centroids(corpus, vec_col, id_col, dim).persist()
    c = _normed(corpus, vec_col, id_col, "c_").persist()
    cell_of = _nearest_centroid(c, cents)
    c = c.join(cell_of, "c_id")

    q_src = corpus.filter(queries) if isinstance(queries, Column) else queries
    q = _normed(q_src, vec_col, id_col, "q_")
    qsim = F.round(
        _dot(F.col("q_v"), F.col("cent_v")) / (F.col("q_n") * F.col("cent_n")), 6
    )
    qw = Window.partitionBy("q_id").orderBy(F.desc("_qsim"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("q_id", "q_v", "q_n", "cid", qsim.alias("_qsim"))
        .withColumn("_pr", F.row_number().over(qw))
        .filter(F.col("_pr") <= n_probe)
        .select("q_id", "q_v", "q_n", "cid")
    )

    sim = F.round(_dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 6)
    scored = (
        c.join(F.broadcast(probes), "cid")
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


def vector_norms(emb: DataFrame) -> DataFrame:
    """(vec_id, l2_norm): per-vector L2 norm as a pure array fold —
    zero shuffle, whole-stage codegen over the packed array column.
    The fold (Spark ``aggregate`` with 0.0 seed == DuckDB
    ``list_reduce`` with a prepended seed) is left-to-right on both
    engines, so the double sums are bit-identical pre-round."""
    v = F.col("embedding").cast("array<double>")
    return emb.select("vec_id", F.round(_norm(v), 6).alias("l2_norm"))


def label_centroids(emb: DataFrame) -> DataFrame:
    """Per-label centroid, long form (label, dim, centroid): the
    class-prototype computation behind centroid classifiers and
    IVF-style coarse quantizers.  posexplode fans each vector into
    (dim, value) rows — a bounded x`dim` inflation that partial
    aggregation collapses map-side to one partial sum per (label,
    dim) per task, so the shuffle is tiny regardless of corpus
    size (this is how you average a billion vectors without ever
    materializing a per-group array)."""
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim0", "v"
            ),
        )
        .select("label", (F.col("dim0") + 1).alias("dim"), "v")
        .groupBy("label", "dim")
        .agg(F.round(F.avg("v"), 6).alias("centroid"))
    )


def kmeans_assignments(
    emb: DataFrame,
    k: int = C.KMEANS_K,
    iters: int = C.KMEANS_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = C.EMBEDDING_DIM,
    stride: int = C.KMEANS_SEED_STRIDE,
) -> DataFrame:
    """Spherical k-means: ``iters`` unrolled Lloyd iterations (assign
    by cosine, re-center by component mean), then the final
    per-vector assignment (vec_id, cluster_id, cosine).

    Fully deterministic (no RNG — seeds are a stride sample of the
    corpus, ties break to the smallest centroid id on the 6-decimal
    rounded similarity), so the DuckDB oracle replays the identical
    iteration trace.  Scale shape per iteration: the centroid table
    (k rows) is broadcast, assignment is one parallel scan, the
    re-center is a map-side-combinable aggregation — the classic
    mini-batch-free distributed k-means; the corpus scan is persisted
    once and reused by every round.  No driver-side loop state beyond
    plan construction (cf. ops.graph.pagerank's unrolled rounds).
    """
    v = _normed(emb, vec_col, id_col, "c_").persist()
    cents = (
        v.filter(F.col("c_id") % stride == 0)
        .orderBy("c_id")
        .limit(k)
        .select(
            F.col("c_id").alias("cid"),
            F.col("c_v").alias("cent_v"),
            F.col("c_n").alias("cent_n"),
        )
    )
    mean_v = F.array(
        *[
            F.round(F.avg(F.element_at(F.col("c_v"), i + 1)), 9)
            for i in range(dim)
        ]
    )
    for _ in range(iters):
        assigned = _nearest_centroid(v, cents)
        cents = (
            v.join(assigned, "c_id")
            .groupBy("cid")
            .agg(mean_v.alias("cent_v"))
            .withColumn("cent_n", _norm(F.col("cent_v")))
            # materialize the k-row centroid table each round: it is
            # referenced several times downstream (assignment scored +
            # best + next iteration), and without truncation the
            # re-computation of the unrolled lineage grows ~2^iters
            .localCheckpoint()
        )
    sim = F.round(
        _dot(F.col("c_v"), F.col("cent_v")) / (F.col("c_n") * F.col("cent_n")), 6
    )
    scored = v.crossJoin(F.broadcast(cents)).select(
        "c_id", "cid", sim.alias("_sim")
    )
    best = scored.groupBy("c_id").agg(F.max("_sim").alias("_best"))
    return (
        scored.join(best, "c_id")
        .filter(F.col("_sim") == F.col("_best"))
        .groupBy("c_id")
        .agg(F.min("cid").alias("cluster_id"), F.max("_sim").alias("cosine"))
        .select(F.col("c_id").alias("vec_id"), "cluster_id", "cosine")
    )


def quantize_stats(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = C.EMBEDDING_DIM,
) -> DataFrame:
    """Scalar int8 quantization audit: per vector, the min/max range,
    and the reconstruction MSE of the 8-bit code (code = round((x -
    min)/scale), scale = range/255) — the 4x embedding-storage
    compression every large vector corpus applies, with the error it
    costs.  All elementwise expressions + one explicit left fold
    (array order), so the oracle reproduces the arithmetic
    bit-for-bit before rounding; degenerate constant vectors get
    scale 0 and MSE 0 rather than a divide-by-zero."""
    v = F.col(vec_col).cast("array<double>")
    mn = F.array_min(v)
    mx = F.array_max(v)
    sc = (mx - mn) / F.lit(255.0)
    err2 = F.transform(
        v,
        lambda x: F.when(
            sc > 0,
            F.pow(x - (mn + F.round((x - mn) / sc) * sc), F.lit(2.0)),
        ).otherwise(F.lit(0.0)),
    )
    mse = (
        F.aggregate(err2, F.lit(0.0), lambda acc, e: acc + e) / F.lit(float(dim))
    )
    return emb.select(
        F.col(id_col),
        F.round(mn, 6).alias("vmin"),
        F.round(mx, 6).alias("vmax"),
        F.round(mse, 9).alias("mse_q"),
    )
