"""Fourth catalog-extension batch (round 3 continuation): link
analysis and corpus-curation statistics that round out the graph,
text, train-prep, embedding, multimodal, and temporal families —
HITS hub/authority scores, per-node clustering coefficients, a Zipf
law fit over the term-frequency spectrum, temperature-weighted
source mixture planning, diagonal-Mahalanobis embedding outlier
scores, an audio-modality framing plan, and the Mann-Kendall trend
test.

Same oracle discipline as the earlier batches (ORACLE_DISCIPLINE.md,
driver-hash rules): every computed output ships as an exact integer
— positive-domain ``DIV`` ratios, half-up integer cents, per-round
1e-9 rounding for the iterative kernel, and scaled-BIGINT wraps
composed IDENTICALLY in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .ops import graph as G
from .queries import _event_edges, _register, _t
from .queries_graph import _DEDGES_CTE, _TW_CTE, _UEDGES_CTE
from .scale import multimodal as MM
from .scale import temporal as TS

# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999) — fixed-iteration link
# analysis over the reply graph, max-normalized for cross-engine
# exactness (max is aggregation-order-independent; L2 is not)
# ---------------------------------------------------------------------------


def _hits_sql() -> str:
    sql = (
        _TW_CTE
        + _DEDGES_CTE
        + """
    , nodes AS (SELECT DISTINCT user_id AS node FROM events),
    h0 AS (SELECT node, 1.0 AS h FROM nodes)
    """
    )
    for i in range(1, G.HITS_ITERS + 1):
        sql += f"""
    , ra{i} AS (
      SELECT e.dst, round(sum(h.h), 9) AS raw_a
      FROM dedges e JOIN h{i - 1} h ON h.node = e.src GROUP BY 1
    ),
    am{i} AS (SELECT max(raw_a) AS m FROM ra{i}),
    a{i} AS (
      SELECT n.node, round(coalesce(r.raw_a, 0.0) / am.m, 9) AS a
      FROM nodes n LEFT JOIN ra{i} r ON r.dst = n.node CROSS JOIN am{i} am
    ),
    rh{i} AS (
      SELECT e.src, round(sum(a.a), 9) AS raw_h
      FROM dedges e JOIN a{i} a ON a.node = e.dst GROUP BY 1
    ),
    hm{i} AS (SELECT max(raw_h) AS m FROM rh{i}),
    h{i} AS (
      SELECT n.node, round(coalesce(r.raw_h, 0.0) / hm.m, 9) AS h
      FROM nodes n LEFT JOIN rh{i} r ON r.src = n.node CROSS JOIN hm{i} hm
    )
    """
    it = G.HITS_ITERS
    sql += f"""
    SELECT a.node AS user_id,
           CAST(round(a.a * 1000000) AS BIGINT) AS auth_x1e6,
           CAST(round(h.h * 1000000) AS BIGINT) AS hub_x1e6
    FROM a{it} a JOIN h{it} h ON h.node = a.node
    """
    return sql


@_register(
    "gr_hits",
    _hits_sql(),
    doc="HITS hub/authority scores (Kleinberg 1999), 2 unrolled "
    "rounds over the directed reply edges — the link-analysis "
    "complement of gr_pagerank (the reference's role cascade, "
    "RoleAnalysisBolt.java, separates the same answerer/asker "
    "populations heuristically). Declared semantics: per-node sums "
    "rounded 1e-9, MAX-normalized each half-round (max is "
    "aggregation-order-independent, unlike the textbook L2 norm, so "
    "both engines replay the identical trace). Two keyed shuffles + "
    "one scalar broadcast per round; no collect. Hash-exact output "
    "(scaled BIGINT). Graph-analytics extension.",
)
def gr_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    tweets = _event_edges(spark, sf_dir)
    nodes = tweets.select(F.col("author_id").alias("node")).distinct()
    return G.hits(nodes, G.directed_edges(tweets))


# ---------------------------------------------------------------------------
# per-node local clustering coefficient — all-integer (DIV x1e4)
# ---------------------------------------------------------------------------


@_register(
    "gr_local_clustering",
    _TW_CTE
    + _UEDGES_CTE
    + """
    , deg AS (
      SELECT node AS user_id, count(*) AS degree FROM (
        SELECT u AS node FROM uedges UNION ALL SELECT v FROM uedges
      ) GROUP BY 1
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM uedges e1
      JOIN uedges e2 ON e2.u = e1.v
      JOIN uedges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tcnt AS (
      SELECT user_id, count(*) AS n_triangles FROM (
        SELECT a AS user_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    )
    SELECT d.user_id, d.degree,
           coalesce(t.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN (coalesce(t.n_triangles, 0) * 2 * 10000)
                       // (d.degree * (d.degree - 1))
                ELSE 0 END AS lcc_x1e4
    FROM deg d LEFT JOIN tcnt t ON t.user_id = d.user_id
    """,
    doc="Per-node local clustering coefficient 2*tri/(deg*(deg-1)): "
    "the community-cohesion score behind friend-of-friend quality "
    "checks, computed from the ordered-edge triangle kernel plus one "
    "symmetric-degree aggregation. Degrees and triangle counts are "
    "exact BIGINTs, so the coefficient ships as positive-domain "
    "integer division x1e4 — hash-exact. Graph-analytics extension.",
)
def gr_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.local_clustering(G.user_edges(_event_edges(spark, sf_dir)))


# ---------------------------------------------------------------------------
# Zipf's-law fit over the term-frequency spectrum — the corpus-health
# diagnostic (natural corpora fit slope ~ -1; synthetic/templated
# text departs visibly)
# ---------------------------------------------------------------------------

ZIPF_TOP_V = 10_000  # rank cap: bounds the regression frame AND keeps
# the 1e6-scaled log sums inside BIGINT (1e4 * (1.2e7)^2 ~ 1.4e18 < 2^63)


@_register(
    "tx_zipf_fit",
    f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT tok, count(*) AS f FROM toks WHERE tok <> '' GROUP BY 1),
    rk AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM tf
    ),
    pts AS (
      SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM rk WHERE r <= {ZIPF_TOP_V}
    ),
    s AS (
      SELECT count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n AS n_terms,
           CAST(round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000
           ) AS BIGINT) AS slope_x1e6,
           CAST(round(
             (CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE)
           ) AS BIGINT) AS intercept_x1e6
    FROM s WHERE n >= 2
    """,
    doc="Zipf's-law fit: OLS slope/intercept of ln(frequency) vs "
    "ln(rank) over the top-10k terms — the corpus-health diagnostic "
    "(natural text fits slope ~ -1; templated or synthetic text "
    "departs). Per-term logs round to 1e6-scaled BIGINTs FIRST, so "
    "the four sufficient statistics fold as exact integers "
    "(order-free) and the closed form runs as one shared double "
    "expression — the ag_linfit pattern over the term spectrum. The "
    "rank window runs on the tf frame (vocabulary-sized, capped at "
    "10k — bounded however large the corpus). Text-analysis "
    "extension. Hash-exact output (scaled BIGINT).",
)
def tx_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    # vocabulary-sized frame: one partition for the global rank
    # window (same trade as the tx_textrank/BPE vocab frames)
    w = Window.orderBy(F.desc("f"), F.asc("tok"))
    rk = (
        tf.coalesce(1)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= ZIPF_TOP_V)
    )
    pts = rk.select(
        F.round(F.log(F.col("r").cast("double")) * 1_000_000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * 1_000_000)
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).filter(F.col("n") >= 2)
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    slope_c = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope_c * 1_000_000).cast("long").alias("slope_x1e6"),
        F.round((syd - slope_c * sxd) / nd).cast("long").alias("intercept_x1e6"),
    )


# ---------------------------------------------------------------------------
# temperature-weighted source mixture plan (the multi-corpus sampling
# schedule of GPT-3/PaLM-style training: weight ~ size^(1/T), T=2)
# ---------------------------------------------------------------------------


@_register(
    "tp_temp_mixture",
    """
    WITH src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars_total
      FROM documents GROUP BY 1
    ),
    sq AS (
      SELECT source, n_docs, n_chars_total,
             CAST(round(sqrt(CAST(n_chars_total AS DOUBLE)) * 1000000)
                  AS BIGINT) AS s
      FROM src
    ),
    tot AS (
      SELECT CAST(sum(s) AS BIGINT) AS st,
             CAST(sum(n_docs) AS BIGINT) AS nd
      FROM sq
    )
    SELECT source, n_docs, n_chars_total,
           (s * 1000000) // st AS w_x1e6,
           (s * nd) // st AS target_docs,
           (((s * nd) // st) * 10000) // n_docs AS oversample_x1e4
    FROM sq CROSS JOIN tot
    """,
    doc="Temperature-weighted source mixture plan (T=2: sampling "
    "weight ~ sqrt of per-source character mass — the multi-corpus "
    "schedule of GPT-3/PaLM-style training that upsamples small "
    "high-quality sources): per-source weight, target document "
    "quota, and oversampling factor. sqrt is IEEE-correctly-rounded "
    "on both engines, so round(sqrt*1e6) BIGINT is exact; every "
    "downstream ratio is positive-domain integer division over an "
    "integer total — fully hash-exact with NO rounding precedent "
    "risk. One map-combinable groupBy + a broadcast scalar total. "
    "Training-data-prep extension.",
)
def tp_temp_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
    )
    sq = src.withColumn(
        "s",
        F.round(F.sqrt(F.col("n_chars_total").cast("double")) * 1_000_000).cast(
            "long"
        ),
    )
    tot = sq.agg(
        F.sum("s").cast("long").alias("st"),
        F.sum("n_docs").cast("long").alias("nd"),
    )
    return sq.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars_total",
        F.expr("(s * 1000000) DIV st").alias("w_x1e6"),
        F.expr("(s * nd) DIV st").alias("target_docs"),
        F.expr("(((s * nd) DIV st) * 10000) DIV n_docs").alias(
            "oversample_x1e4"
        ),
    )


# ---------------------------------------------------------------------------
# diagonal-Mahalanobis embedding outlier score — variance-scaled
# distance from the corpus centroid (the cheap whitening-free novelty
# scorer; the full-covariance version factors through emb_covariance)
# ---------------------------------------------------------------------------


@_register(
    "emb_mahalanobis",
    """
    WITH e AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    st AS (SELECT d, count(*) AS n, sum(v) AS sx, sum(v * v) AS sxx
           FROM e GROUP BY 1),
    mv AS (
      SELECT d, round(sx / n, 6) AS mu,
             round((sxx - sx * sx / n) / (n - 1), 6) AS var
      FROM st
    ),
    c AS (
      SELECT e.vec_id, e.label,
             CAST(round(((e.v - mv.mu) * (e.v - mv.mu) / mv.var) * 10000)
                  AS BIGINT) AS ct
      FROM e JOIN mv ON mv.d = e.d WHERE mv.var > 0
    )
    SELECT vec_id, label, CAST(sum(ct) AS BIGINT) AS maha_x1e4
    FROM c GROUP BY 1, 2
    """,
    doc="Diagonal-Mahalanobis embedding outlier score: per-dimension "
    "mean/variance over the corpus (rounded 1e-6, the emb_covariance "
    "exact-moment pattern), then each vector's variance-scaled "
    "squared distance from the centroid — the cheap novelty/garbage "
    "scorer that flags off-manifold embeddings before expensive "
    "near-dup or ANN stages. Per-dimension contributions round to "
    "x1e4 BIGINT FIRST, so the per-vector sum folds order-free. "
    "Plan: one posexplode + map-combinable groupBy(dim) (64 rows "
    "broadcast back), one groupBy(vec) — no self-join, no UDF. "
    "Embedding-column extension. Hash-exact output (scaled BIGINT).",
)
def emb_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("d0", "v")
    ).select(
        "vec_id",
        "label",
        (F.col("d0") + 1).alias("d"),
        F.col("v").cast("double").alias("v"),
    )
    st = e.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sx"),
        F.sum(F.col("v") * F.col("v")).alias("sxx"),
    )
    mv = st.select(
        "d",
        F.round(F.col("sx") / F.col("n"), 6).alias("mu"),
        F.round(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1),
            6,
        ).alias("var"),
    ).filter(F.col("var") > 0)
    c = e.join(F.broadcast(mv), "d").select(
        "vec_id",
        "label",
        F.round(
            (F.col("v") - F.col("mu"))
            * (F.col("v") - F.col("mu"))
            / F.col("var")
            * 10_000
        )
        .cast("long")
        .alias("ct"),
    )
    return c.groupBy("vec_id", "label").agg(
        F.sum("ct").cast("long").alias("maha_x1e4")
    )


# ---------------------------------------------------------------------------
# audio-modality framing plan — metadata-only batcher math, the audio
# sibling of mm_tile_plan (images); all positive-domain integers
# ---------------------------------------------------------------------------


@_register(
    "mm_audio_frames",
    f"""
    WITH b AS (
      SELECT doc_id,
             CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
             strlen(text) // 2 AS n_samples
      FROM documents
    ),
    b2 AS (
      SELECT *, CASE WHEN n_samples >= {MM.AUDIO_FRAME}
                     THEN ((n_samples - {MM.AUDIO_FRAME})
                            // {MM.AUDIO_HOP}) + 1
                     ELSE 0 END AS n_frames
      FROM b
    )
    SELECT doc_id, sample_rate, n_samples,
           (n_samples * 1000) // sample_rate AS duration_ms,
           n_frames,
           CAST({MM.AUDIO_FRAME // 2 + 1} AS BIGINT) AS n_fft_bins,
           n_frames * {MM.AUDIO_FRAME // 2 + 1} AS stft_cells,
           least(n_frames // 16, 7) AS pad_bucket
    FROM b2
    """,
    doc="Audio-modality framing plan: treat each binary payload as "
    "16-bit mono PCM at a deterministic per-item sample rate (fake "
    "container metadata, same stub boundary as the image decode) and "
    "emit the speech-batcher numbers — sample count, duration, STFT "
    "frame count (512/256 window/hop), spectrogram cells, and a "
    "padding bucket for length-sorted GPU packing — BEFORE any "
    "sample is decoded. Pure positive-domain integer expressions in "
    "the scan stage (no shuffle, no UDF), the audio sibling of "
    "mm_tile_plan. Multimodal extension.",
)
def mm_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    bdocs = MM.as_binary_docs(_t(spark, sf_dir, "documents"))
    return MM.audio_frame_plan(bdocs)


# ---------------------------------------------------------------------------
# Mann-Kendall trend test on the daily activity series — exact-integer
# S statistic and tie-corrected variance numerator
# ---------------------------------------------------------------------------


@_register(
    "ts_mann_kendall",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS yc
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT CASE WHEN b.yc > a.yc THEN 1
                  WHEN b.yc < a.yc THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    s AS (SELECT CAST(coalesce(sum(sgn), 0) AS BIGINT) AS s_stat FROM p),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
    tt AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_sum
      FROM (SELECT count(*) AS t FROM daily GROUP BY yc)
    ),
    f AS (
      SELECT s_stat, n_days,
             CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_sum
                  AS BIGINT) AS var_num
      FROM s CROSS JOIN nn CROSS JOIN tt
    )
    SELECT n_days, s_stat, var_num,
           CAST(round(
             CASE WHEN s_stat > 0
                    THEN (s_stat - 1) / sqrt(var_num / 18.0)
                  WHEN s_stat < 0
                    THEN (s_stat + 1) / sqrt(var_num / 18.0)
                  ELSE 0.0 END * 1000000
           ) AS BIGINT) AS z_x1e6
    FROM f
    """,
    doc="Mann-Kendall trend test over the daily activity series — "
    "the nonparametric is-this-metric-drifting monitor that "
    "precedes an OLS fit (ag_linfit). Daily values fold as half-up "
    "integer cents, so the S statistic, day count, and tie-corrected "
    "variance numerator n(n-1)(2n+5)-sum(t(t-1)(2t+5)) are all exact "
    "BIGINTs; only the normal-approximation z rides one shared "
    "double expression into a scaled int. The O(days^2) pair join "
    "runs over the PRE-AGGREGATED daily frame (bounded by calendar "
    "days at any corpus size) with the build side broadcast. "
    "Temporal extension. Hash-exact output.",
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.mann_kendall(_t(spark, sf_dir, "events"))
