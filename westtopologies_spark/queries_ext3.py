"""Third catalog-extension batch (round 3 continuation): published
LLM-corpus curation operators re-expressed Spark-first —
Gopher/MassiveText document quality rules, corpus-level TextRank
keyword extraction, product quantization (PQ) codebooks for
embedding compression, and top-principal-component extraction via
fixed-iteration power method.

Same oracle discipline as the earlier batches (ORACLE_DISCIPLINE.md):
every computed output column is an exact integer (scaled x1eK via
positive-domain integer division or a round-then-cast on a value both
engines already agree on bit-for-bit), iterative kernels round at
1e-9 per round so the oracle replays the identical trace, and every
column is aliased identically in both plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops import graph as G
from .queries import _register, _t
from .scale import constants as C
from .scale import textstats

# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, "Scaling Language
# Models: ... Gopher" Table A1 filters, re-thresholded for the
# synthetic corpus)
# ---------------------------------------------------------------------------


def _gopher_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in C.GOPHER_STOPWORDS)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    g1 AS (SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY 1, 2),
    g2 AS (
      SELECT doc_id,
             CAST(sum(n) AS BIGINT) AS n_words,
             count(*) AS n_unique,
             CAST(max(n) AS BIGINT) AS max_word_n,
             CAST(sum(length(tok) * n) AS BIGINT) AS n_word_chars,
             CAST(sum(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END)
                  AS BIGINT) AS stop_hits
      FROM g1 GROUP BY 1
    ),
    g3 AS (
      SELECT doc_id, n_words, n_unique, max_word_n, stop_hits,
             CAST((n_word_chars * 10000) // n_words AS BIGINT) AS mean_wlen_x1e4,
             CAST((n_unique * 10000) // n_words AS BIGINT) AS unique_frac_x1e4,
             CAST((max_word_n * 10000) // n_words AS BIGINT) AS top_frac_x1e4
      FROM g2
    )
    SELECT doc_id, n_words, n_unique, max_word_n, stop_hits,
           mean_wlen_x1e4, unique_frac_x1e4, top_frac_x1e4,
           CAST(CASE WHEN n_words >= {C.GOPHER_MIN_WORDS}
                      AND mean_wlen_x1e4 >= {C.GOPHER_MEAN_WLEN_MIN_X1E4}
                      AND mean_wlen_x1e4 <= {C.GOPHER_MEAN_WLEN_MAX_X1E4}
                      AND unique_frac_x1e4 >= {C.GOPHER_UNIQUE_FRAC_MIN_X1E4}
                      AND top_frac_x1e4 <= {C.GOPHER_TOP_FRAC_MAX_X1E4}
                      AND stop_hits >= {C.GOPHER_MIN_STOP_HITS}
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM g3
    """


@_register(
    "tx_gopher_quality",
    _gopher_sql(),
    doc="Gopher/MassiveText document quality rules: word-count "
    "bounds, mean-word-length bounds, required-stopword hits, "
    "repetition caps (modal-word and distinct-word fractions). "
    "All-integer output (positive-domain integer division x1e4); "
    "two map-side-combinable shuffles regardless of corpus size. "
    "LLM-pipeline extension (quality gate family).",
)
def tx_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.gopher_quality(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# TextRank keywords (Mihalcea & Tarau 2004) — term adjacency graph +
# the repo's fixed-iteration PageRank kernel
# ---------------------------------------------------------------------------


def _textrank_sql() -> str:
    d = G.PR_DAMPING
    base = 1.0 - d
    sql = f"""
    WITH tl AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    p0 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                    i -> struct_pack(a := t[i], b := t[i + 1]))) AS pr
      FROM tl
    ),
    e0 AS (SELECT pr.a AS src, pr.b AS dst FROM p0 WHERE pr.a <> pr.b),
    dedges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst FROM e0
      )
    ),
    nodes AS (SELECT DISTINCT src AS node FROM dedges),
    outdeg AS (SELECT src, count(*) AS outdeg FROM dedges GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    pr0 AS (SELECT node, round(1.0 / n, 9) AS pr, n FROM nodes CROSS JOIN nn)
    """
    for i in range(1, G.PR_ITERS + 1):
        sql += f"""
    , in{i} AS (
      SELECT e.dst, sum(p.pr / o.outdeg) AS in_mass
      FROM dedges e
      JOIN pr{i - 1} p ON p.node = e.src
      JOIN outdeg o ON o.src = e.src
      GROUP BY 1
    ),
    pr{i} AS (
      SELECT p.node,
             round({base!r} / p.n + {d!r} * coalesce(i.in_mass, 0.0), 9) AS pr,
             p.n
      FROM pr{i - 1} p LEFT JOIN in{i} i ON i.dst = p.node
    )
    """
    sql += f"""
    , fin AS (
      SELECT node AS term,
             CAST(round(round(pr, 6) * 1000000) AS BIGINT) AS score_x1e6
      FROM pr{G.PR_ITERS}
    )
    SELECT CAST(row_number() OVER (ORDER BY score_x1e6 DESC, term ASC) AS INT)
             AS rank,
           term, score_x1e6
    FROM fin
    QUALIFY rank <= {C.TEXTRANK_TOP_K}
    """
    return sql


@_register(
    "tx_textrank",
    _textrank_sql(),
    doc="TextRank keyword extraction: undirected distinct "
    "adjacency edges between consecutive tokens, ranked by the "
    "same fixed-iteration PageRank kernel as the user graph "
    "(per-round 1e-9 rounding; score emitted as exact x1e6 "
    "BIGINT). Top-k is a vocabulary-cardinality sort after "
    "aggregation. LLM-pipeline extension (keyword family).",
)
def tx_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.textrank_keywords(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011) — M independent euclidean
# codebooks over vector subspaces
# ---------------------------------------------------------------------------


def _pq_cte_parts() -> list[str]:
    """WITH-clause parts replaying :func:`similarity.pq_codes`'s
    deterministic trace, ending in a CTE ``pqcodes(vec_id, code_0..,
    err_x1e6)`` — composable into larger oracles (the PQ-blocked
    near-dup below)."""
    m, sd, k = C.PQ_M, C.PQ_SUB_DIM, C.PQ_K
    sub_selects = "\n      UNION ALL\n      ".join(
        f"SELECT vec_id, {i} AS m, v[{i * sd + 1}:{(i + 1) * sd}] AS sv FROM base"
        for i in range(m)
    )
    sqdist = (
        f"round(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, {sd} + 1), "
        f"i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), "
        f"(x, y) -> x + y), 6)"
    )
    means = ", ".join(f"round(avg(s.sv[{j + 1}]), 9)" for j in range(sd))
    parts = [
        f"""base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sub AS (
      {sub_selects}
    ),
    seeds AS (
      SELECT vec_id,
             CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
      FROM (SELECT vec_id FROM base WHERE vec_id % {C.PQ_SEED_STRIDE} = 0
            ORDER BY vec_id LIMIT {k})
    ),
    c0 AS (
      SELECT s.m, sd.cid, s.sv AS cv
      FROM sub s JOIN seeds sd USING (vec_id)
    )"""
    ]
    for i in range(C.PQ_ITERS):
        parts.append(
            f"""sc{i} AS (
      SELECT s.vec_id, s.m, c.cid, {sqdist} AS d
      FROM sub s JOIN c{i} c ON c.m = s.m
    ),
    b{i} AS (SELECT vec_id, m, min(d) AS bd FROM sc{i} GROUP BY 1, 2),
    a{i} AS (
      SELECT sc.vec_id, sc.m, min(sc.cid) AS cid
      FROM sc{i} sc JOIN b{i} b
        ON sc.vec_id = b.vec_id AND sc.m = b.m AND sc.d = b.bd
      GROUP BY 1, 2
    ),
    c{i + 1} AS (
      SELECT s.m, a.cid, [{means}]::DOUBLE[] AS cv
      FROM a{i} a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m
      GROUP BY s.m, a.cid
    )"""
        )
    fin = C.PQ_ITERS
    parts.append(
        f"""scf AS (
      SELECT s.vec_id, s.m, c.cid, {sqdist} AS d
      FROM sub s JOIN c{fin} c ON c.m = s.m
    ),
    bf AS (SELECT vec_id, m, min(d) AS bd FROM scf GROUP BY 1, 2),
    af AS (
      SELECT sc.vec_id, sc.m, min(sc.cid) AS cid, max(b.bd) AS bd
      FROM scf sc JOIN bf b
        ON sc.vec_id = b.vec_id AND sc.m = b.m AND sc.d = b.bd
      GROUP BY 1, 2
    )"""
    )
    codes = ", ".join(
        f"CAST(min(CASE WHEN m = {i} THEN cid END) AS INT) AS code_{i}"
        for i in range(m)
    )
    parts.append(
        f"""pqcodes AS (
      SELECT vec_id, {codes},
             CAST(round(sum(bd) * 1000000) AS BIGINT) AS err_x1e6
      FROM af GROUP BY vec_id
    )"""
    )
    return parts


def _pq_sql() -> str:
    return (
        "WITH "
        + ",\n    ".join(_pq_cte_parts())
        + "\n    SELECT * FROM pqcodes"
    )


@_register(
    "ann_pq_codes",
    _pq_sql(),
    doc="Product quantization: 4 independent euclidean k-means "
    "codebooks (16 codewords, 2 unrolled Lloyd rounds each) over "
    "16-dim subspaces, assigning each vector a 4x4-bit code plus "
    "its exact scaled-int reconstruction error. One corpus explode "
    "(x4 subspace rows, persisted); every round is a broadcast-hash "
    "join against the 64-row codebook plus a map-side-combinable "
    "re-centering — only the codebook crosses the network. "
    "LLM-pipeline extension (embedding-compression family).",
)
def ann_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import similarity

    return similarity.pq_codes(_t(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Top principal component by fixed-iteration power method + corpus
# projection (the PCA building block: eigen-direction without any
# driver-side linear-algebra collect)
# ---------------------------------------------------------------------------


def _pca_power_sql() -> str:
    v0 = round(1.0 / C.EMBEDDING_DIM**0.5, 9)
    sql = f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    s AS (SELECT d, sum(v) AS sx FROM e GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM embeddings),
    p AS (
      SELECT a.d AS dim_i, b.d AS dim_j, sum(a.v * b.v) AS sxy
      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.d <= b.d
      GROUP BY 1, 2
    ),
    ut AS MATERIALIZED (
      SELECT dim_i, dim_j,
             round((sxy - sa.sx * sb.sx / n) / (n - 1), 6) AS cov
      FROM p
      JOIN s sa ON sa.d = dim_i
      JOIN s sb ON sb.d = dim_j
      CROSS JOIN nn
    ),
    cov AS MATERIALIZED (
      SELECT dim_i, dim_j, cov FROM ut
      UNION ALL
      SELECT dim_j AS dim_i, dim_i AS dim_j, cov FROM ut WHERE dim_i < dim_j
    ),
    v0 AS (SELECT DISTINCT dim_i AS d, {v0!r} AS vv FROM cov)
    """
    for i in range(1, C.PCA_POWER_ITERS + 1):
        sql += f"""
    , w{i} AS (
      SELECT c.dim_i, round(sum(c.cov * v.vv), 9) AS wv
      FROM cov c JOIN v{i - 1} v ON v.d = c.dim_j
      GROUP BY 1
    ),
    n{i} AS (SELECT round(sqrt(sum(wv * wv)), 9) AS nrm FROM w{i}),
    v{i} AS (
      SELECT dim_i AS d, round(wv / nrm, 9) AS vv FROM w{i} CROSS JOIN n{i}
    )
    """
    t = C.PCA_POWER_ITERS
    sql += f"""
    , sgn AS (
      SELECT CASE WHEN vv < 0 THEN -1.0 ELSE 1.0 END AS sgn
      FROM v{t} WHERE d = 1
    ),
    vs AS (SELECT d, vv * sgn AS vv FROM v{t} CROSS JOIN sgn),
    mu AS (SELECT d, round(sx / n, 9) AS mu FROM s CROSS JOIN nn),
    proj AS (
      SELECT e.vec_id,
             CAST(round(sum((e.v - m.mu) * vv.vv) * 10000) AS BIGINT)
               AS pc1_x1e4
      FROM e
      JOIN mu m ON m.d = e.d
      JOIN vs vv ON vv.d = e.d
      GROUP BY 1
    )
    SELECT vec_id, pc1_x1e4,
           CAST(round(nrm * 1000000) AS BIGINT) AS lam_x1e6
    FROM proj CROSS JOIN n{t}
    """
    return sql


@_register(
    "emb_pca_power",
    _pca_power_sql(),
    doc="Top principal component by fixed-iteration power method "
    "(6 rounds on the 64x64 rounded covariance, per-round 1e-9 "
    "rounding, dim-1 sign canonicalization) plus each vector's "
    "centered projection as exact x1e4 BIGINT and the eigenvalue "
    "estimate as x1e6.  Fully declarative: iteration state is a "
    "64-row DataFrame; only the covariance scan and the projection "
    "scan touch the corpus. LLM-pipeline extension (embedding "
    "analytics family).",
)
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import similarity

    return similarity.pca_power_projection(_t(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Holt double exponential smoothing of the daily activity series
# ---------------------------------------------------------------------------


def _holt_sql() -> str:
    from .scale.temporal import HOLT_ALPHA, HOLT_BETA

    a, b = float(HOLT_ALPHA), float(HOLT_BETA)
    ca, cb = 1.0 - a, 1.0 - b
    new_l = f"{a!r} * e[1] + {ca!r} * (acc[1] + acc[2])"
    return f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(x ORDER BY day) AS xs FROM daily GROUP BY 1
    ),
    folded AS (
      SELECT event_type, len(xs) AS n_days,
             CASE WHEN len(xs) = 1 THEN [xs[1], 0.0]
             ELSE list_reduce(
               list_prepend([xs[1], xs[2] - xs[1]],
                            list_transform(xs[3:], x -> [x, 0.0])),
               (acc, e) -> [
                 {new_l},
                 {b!r} * (({new_l}) - acc[1]) + {cb!r} * acc[2]
               ])
             END AS lb
      FROM series
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           CAST(round(lb[1] * 10000) AS BIGINT) AS level_x1e4,
           CAST(round(lb[2] * 10000) AS BIGINT) AS trend_x1e4,
           CAST(round((lb[1] + lb[2]) * 10000) AS BIGINT) AS forecast_x1e4
    FROM folded
    """


@_register(
    "ts_holt_trend",
    _holt_sql(),
    doc="Holt double (level+trend) exponential smoothing of each "
    "event type's daily count series: init l1=x1, b1=x2-x1, "
    "standard recurrences as ONE left fold (Spark aggregate == "
    "DuckDB list_reduce, state packed as a [l, b] pair), final "
    "state + one-step forecast as exact x1e4 ints. The corpus "
    "collapses map-side to (type, day) rows before any per-key "
    "list exists. Temporal-analytics extension.",
)
def ts_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale.temporal import holt_trend

    return holt_trend(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# PQ-blocked near-duplicate detection: same full code tuple ->
# candidate pair -> exact-cosine confirm
# ---------------------------------------------------------------------------


def _pq_neardup_sql() -> str:
    from .queries_scale import _DOT, _NORM

    d = C.EMBEDDING_DIM
    on = " AND ".join(f"a.code_{i} = b.code_{i}" for i in range(C.PQ_M))
    dot = _DOT.format(d=d, a="va.v", b="vb.v")
    parts = list(_pq_cte_parts())
    parts.append(
        f"""cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM pqcodes a JOIN pqcodes b ON {on} AND a.vec_id < b.vec_id
    ),
    normed AS (SELECT vec_id, v, {_NORM.format(v="v")} AS nrm FROM base),
    sim AS (
      SELECT c.id_a, c.id_b,
             CAST(round(round({dot} / (va.nrm * vb.nrm), 6) * 1000000)
                  AS BIGINT) AS cos_x1e6
      FROM cand c
      JOIN normed va ON va.vec_id = c.id_a
      JOIN normed vb ON vb.vec_id = c.id_b
    )"""
    )
    thr = int(C.NEARDUP_COSINE_THRESHOLD * 1_000_000)
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT id_a, id_b, cos_x1e6,
           CAST(CASE WHEN cos_x1e6 >= {thr} THEN 1 ELSE 0 END AS INT)
             AS is_neardup
    FROM sim"""
    )


@_register(
    "dd_pq_neardup",
    _pq_neardup_sql,  # lazy: builder imports sibling-submodule helpers
    doc="Near-dup candidate generation by product-quantization "
    "blocking: pairs sharing the FULL 4-code tuple (16^4 blocks -> "
    "near-linear candidate mass) confirmed with the exact cosine "
    "from the raw embeddings. Composes the ann_pq_codes trace as "
    "its blocking stage; the all-pairs exact kernel exists "
    "separately as dd_embedding_neardup. LLM-pipeline extension "
    "(dedup family).",
)
def dd_pq_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import similarity

    return similarity.pq_block_neardup(_t(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Deterministic bootstrap CI (double-or-nothing weight bootstrap)
# ---------------------------------------------------------------------------


def _bootstrap_sql() -> str:
    from .scale import aggstats as A

    w = (
        f"((((event_id * {A.BOOT_A} + r * {A.BOOT_C} + {A.BOOT_D}) "
        f"% {A.BOOT_P}) % 2) * 2)"
    )
    bf = float(A.BOOT_B)
    return f"""
    WITH rr AS (
      SELECT event_type, event_id, value, unnest(range(0, {A.BOOT_B})) AS r
      FROM events
    ),
    res AS (
      SELECT event_type, r,
             sum(CAST(value AS DECIMAL(18,2)) * {w}) AS swx,
             sum({w}) AS sw
      FROM rr GROUP BY 1, 2
    ),
    means AS (
      SELECT event_type, CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS m
      FROM res
    ),
    boot AS (
      SELECT event_type, sum(m) AS sm, sum(m * m) AS sm2
      FROM means GROUP BY 1
    ),
    base AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS mean
      FROM events GROUP BY 1
    ),
    fin AS (
      SELECT b.event_type, b.n, b.mean,
             sqrt((t.sm2 - t.sm * t.sm / {bf!r}) / {bf - 1.0!r}) AS se
      FROM base b JOIN boot t ON t.event_type = b.event_type
    )
    SELECT event_type, n,
           CAST(round(mean * 10000) AS BIGINT) AS mean_x1e4,
           CAST(round(se * 10000) AS BIGINT) AS boot_se_x1e4,
           CAST(round((mean - {A.BOOT_Z!r} * se) * 10000) AS BIGINT)
             AS ci_lo_x1e4,
           CAST(round((mean + {A.BOOT_Z!r} * se) * 10000) AS BIGINT)
             AS ci_hi_x1e4
    FROM fin
    """


@_register(
    "ag_weight_bootstrap",
    _bootstrap_sql(),
    doc="Multiplier (double-or-nothing weight) bootstrap CI for "
    "mean(value) per event type — the n-preserving counterpart of "
    "ag_bootstrap_ci's half-sample subsampling: 16 resamples whose 0/2 weights come from the "
    "parity of an affine hash of (event_id, resample) routed through "
    "an odd prime — replayable with no RNG state, mergeable "
    "map-side. DECIMAL value sums; all outputs exact scaled ints. "
    "Statistical-rigor extension (uncertainty family).",
)
def ag_weight_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale.aggstats import bootstrap_ci

    return bootstrap_ci(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of the exact and LSH ANN rankings
# ---------------------------------------------------------------------------

RRF_K0 = 60  # standard RRF dampening constant
RRF_SCALE = 1_000_000_000  # integer-exact contribution: SCALE div (K0 + rank)


def _rrf_sql() -> str:
    from .queries_scale import _ann_bruteforce_sql, _ann_lsh_sql

    k = C.ANN_TOP_K
    return f"""
    WITH exact_r AS ({_ann_bruteforce_sql()}),
    lsh_r AS ({_ann_lsh_sql()}),
    fused AS (
      SELECT coalesce(e.query_id, l.query_id) AS query_id,
             coalesce(e.neighbor_id, l.neighbor_id) AS neighbor_id,
             coalesce({RRF_SCALE} // ({RRF_K0} + e.rank), 0)
               + coalesce({RRF_SCALE} // ({RRF_K0} + l.rank), 0) AS rrf_score
      FROM exact_r e
      FULL OUTER JOIN lsh_r l
        ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
    )
    SELECT query_id,
           CAST(row_number() OVER (
             PARTITION BY query_id
             ORDER BY rrf_score DESC, neighbor_id ASC) AS INT) AS rank,
           neighbor_id,
           CAST(rrf_score AS BIGINT) AS rrf_score
    FROM fused
    QUALIFY rank <= {k}
    """


@_register(
    "ann_rrf_fusion",
    _rrf_sql,  # lazy: builder imports sibling-submodule helpers
    doc="Reciprocal-rank fusion of the exact brute-force and "
    "sign-LSH ANN rankings: per (query, neighbor), score = sum of "
    "SCALE div (60 + rank) over the rankers that returned it "
    "(integer-exact RRF — same monotone ordering, no float "
    "canonicalization), re-ranked to top-k. The standard recipe "
    "for combining retrievers with incomparable scores. Composes "
    "the two existing search plans plus one k-rows-per-query full "
    "outer join. LLM-pipeline extension (retrieval family).",
)
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .scale import similarity

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < C.ANN_N_QUERIES)
    e = similarity.cosine_topk(emb, q).select(
        F.col("query_id").alias("e_qid"),
        F.col("neighbor_id").alias("e_nid"),
        F.col("rank").alias("e_rank"),
    )
    lsh = similarity.ann_lsh_topk(emb, q).select(
        F.col("query_id").alias("l_qid"),
        F.col("neighbor_id").alias("l_nid"),
        F.col("rank").alias("l_rank"),
    )
    fused = (
        e.join(
            lsh,
            (F.col("e_qid") == F.col("l_qid"))
            & (F.col("e_nid") == F.col("l_nid")),
            "full_outer",
        )
        .select(
            F.coalesce("e_qid", "l_qid").alias("query_id"),
            F.coalesce("e_nid", "l_nid").alias("neighbor_id"),
            (
                F.coalesce(
                    F.expr(f"{RRF_SCALE} div ({RRF_K0} + e_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"{RRF_SCALE} div ({RRF_K0} + l_rank)"), F.lit(0)
                )
            ).alias("rrf_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= C.ANN_TOP_K)
        .select(
            "query_id", "rank", "neighbor_id", F.col("rrf_score").cast("long")
        )
    )


# ---------------------------------------------------------------------------
# Explicit PIVOT: long event stream -> wide per-day type-count matrix
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _pivot_sql() -> str:
    cells = ",\n           ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {t}"
        for t in EVENT_TYPES
    )
    total = " + ".join(EVENT_TYPES)
    return f"""
    WITH wide AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             {cells}
      FROM events GROUP BY 1
    )
    SELECT day, {', '.join(EVENT_TYPES)}, {total} AS total FROM wide
    """


@_register(
    "gs_pivot_wide",
    _pivot_sql(),
    doc="Explicit PIVOT surface: the long event stream becomes a "
    "wide per-day type-count matrix via DataFrame pivot() with a "
    "DECLARED value list (an undeclared pivot would scan once just "
    "to enumerate columns — never acceptable at corpus scale); "
    "missing cells coalesce to 0 to match the oracle's CASE sums. "
    "One map-side-combinable aggregation. Rollup-family extension.",
)
def gs_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    cols = [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
        for t in EVENT_TYPES
    ]
    out = wide.select("day", *cols)
    total = None
    for t in EVENT_TYPES:
        total = F.col(t) if total is None else total + F.col(t)
    return out.withColumn("total", total)


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier): cheapest-vs-freshest orders
# ---------------------------------------------------------------------------


def _skyline_sql() -> str:
    return """
    WITH pts AS (
      SELECT o_orderkey, o_orderdate,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    ),
    ranked AS (
      SELECT o_orderkey, o_orderdate, price,
             min(price) OVER (
               ORDER BY o_orderdate DESC, price ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_price_newer
      FROM pts
    )
    SELECT o_orderkey, o_orderdate,
           CAST(price * 100 AS BIGINT) AS price_cents
    FROM ranked
    WHERE best_price_newer IS NULL OR price < best_price_newer
    """


@_register(
    "sq_pareto_skyline",
    _skyline_sql(),
    doc="2-D skyline / Pareto frontier (maximize recency, minimize "
    "price): a row survives iff no strictly-newer order is at most "
    "as cheap — computed as ONE sort + running-min window instead "
    "of the naive quadratic dominance anti-join (the O(n log n) "
    "sort-filter skyline; at cluster scale, range-partition by the "
    "sort key and carry each partition's running min forward). "
    "DECIMAL prices; integer-cents output. SQL-surface extension.",
)
def sq_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-parallel sort-filter skyline.

    The oracle states the semantics as one global running-min window;
    executing that literally would funnel the fact table through a
    single partition.  Instead: range-partition by the total sort
    order (equal keys never split), compute the running min WITHIN
    each partition, and carry the min of all earlier partitions
    forward through a partition-count-sized prefix table (broadcast).
    The survivor set is identical to the global window by
    construction — every preceding row is either in the same
    partition (in-partition window) or in an earlier one (prefix
    min).  Reference for the dominance shape: none in the reference
    repo — SQL-surface extension.
    """
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    order_cols = [F.desc("o_orderdate"), F.asc("price"), F.asc("o_orderkey")]
    part = o.repartitionByRange(*order_cols).withColumn(
        "pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = part.withColumn("in_min", F.min("price").over(w_in))
    # prefix table: one row per range partition -> strictly-earlier
    # partitions' running min (tiny; unpartitioned window over it is
    # partition-count-sized, not data-sized)
    w_pre = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        part.groupBy("pid")
        .agg(F.min("price").alias("pmin"))
        .withColumn("pre_min", F.min("pmin").over(w_pre))
        .select("pid", "pre_min")
    )
    # least() skips NULLs (first row of a partition has no in_min;
    # partition 0 has no pre_min) -> NULL only when BOTH are absent,
    # i.e. the globally first row
    joined = ranked.join(F.broadcast(prefix), "pid").withColumn(
        "best_price_newer", F.least("in_min", "pre_min")
    )
    return joined.filter(
        F.col("best_price_newer").isNull()
        | (F.col("price") < F.col("best_price_newer"))
    ).select(
        "o_orderkey",
        "o_orderdate",
        (F.col("price") * 100).cast("long").alias("price_cents"),
    )
