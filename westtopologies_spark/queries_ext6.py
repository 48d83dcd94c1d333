"""Sixth catalog-extension batch (round 3, fourth continuation):
personalized PageRank (seed-teleport link analysis), a
Kaplan-Meier-style survival life table over user activity spans, and
a TRUE iterative BPE tokenizer trainer + fertility audit — each
round recounts adjacent token pairs after the previous merge has
been applied corpus-wide, unlike the single-round candidate list of
``tx_bpe_merges``.

Same oracle discipline as the earlier batches (ORACLE_DISCIPLINE.md,
driver-hash rules): scores ship as scaled BIGINTs composed
IDENTICALLY on both engines, life-table and tokenizer outputs are
exact integers, and iterative kernels round at 1e-9 per round so the
oracle replays the identical trace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .ops import graph as G
from .queries import _ckpt_small, _event_edges, _register, _t
from .queries_graph import _DEDGES_CTE, _TW_CTE
from .scale import textstats

# ---------------------------------------------------------------------------
# personalized PageRank — random walk with restart to a seed set
# ---------------------------------------------------------------------------


def _ppr_sql() -> str:
    d = G.PR_DAMPING
    base = 1.0 - d
    s = G.PPR_SEED_STRIDE
    seed = f"CASE WHEN node % {s} = 0 THEN 1 ELSE 0 END"
    sql = (
        _TW_CTE
        + _DEDGES_CTE
        + f"""
    , nodes AS (SELECT DISTINCT user_id AS node FROM events),
    outdeg AS (SELECT src, count(*) AS outdeg FROM dedges GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM nodes
           WHERE node % {s} = 0),
    pr0 AS (SELECT node, round(({seed}) / ns, 9) AS pr, ns
            FROM nodes CROSS JOIN nn)
    """
    )
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
             round({base!r} * (({seed.replace("node", "p.node")}) / p.ns)
                   + {d!r} * coalesce(i.in_mass, 0.0), 9) AS pr,
             p.ns
      FROM pr{i - 1} p LEFT JOIN in{i} i ON i.dst = p.node
    )
    """
    sql += f"""
    SELECT node AS user_id,
           CAST(round(round(pr, 6) * 1000000) AS BIGINT) AS ppr_x1e6
    FROM pr{G.PR_ITERS}
    """
    return sql


@_register(
    "gr_personalized_pagerank",
    _ppr_sql(),
    doc="Personalized PageRank (random walk with restart): "
    "teleportation restricted to the deterministic seed set "
    "(node % 50 == 0) — the seed-centric relevance score behind "
    "crawl prioritization and recommendation, next to the global "
    "gr_pagerank. Same fixed-unrolled-rounds recipe (damping 0.85, "
    "per-round 1e-9 rounding, dangling mass dropped identically); "
    "the seed indicator is a pure expression, so personalization "
    "adds zero joins or network cost over the global variant. "
    "Output is the 6dp score as an exact scaled BIGINT. "
    "Graph-analytics extension.",
)
def gr_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    tweets = _event_edges(spark, sf_dir)
    nodes = _ckpt_small(
        tweets.select(F.col("author_id").alias("node")).distinct(), 4
    )
    return G.personalized_pagerank(nodes, _ckpt_small(G.directed_edges(tweets)))


# ---------------------------------------------------------------------------
# survival life table over user activity spans (Kaplan-Meier input)
# ---------------------------------------------------------------------------

SURVIVAL_CENSOR_DAYS = 2


@_register(
    "ag_survival_lifetable",
    f"""
    WITH span AS (
      SELECT user_id, date_trunc('day', min(ts)) AS f,
             date_trunc('day', max(ts)) AS l
      FROM events GROUP BY 1
    ),
    mx AS (SELECT max(l) AS ml FROM span),
    obs AS (
      SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t_days,
             CASE WHEN date_diff('day', l, ml) >= {SURVIVAL_CENSOR_DAYS}
                  THEN 1 ELSE 0 END AS ev
      FROM span CROSS JOIN mx
    ),
    tab AS (
      SELECT t_days,
             CAST(sum(ev) AS BIGINT) AS n_events,
             CAST(sum(1 - ev) AS BIGINT) AS n_censored,
             CAST(count(*) AS BIGINT) AS n
      FROM obs GROUP BY 1
    )
    SELECT t_days,
           CAST(sum(n) OVER (ORDER BY t_days DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_at_risk,
           n_events, n_censored
    FROM tab
    """,
    doc="Survival life table over user activity spans: duration = "
    "days between a user's first and last event; a user still "
    "active within the censoring horizon of the corpus end is "
    "right-censored, otherwise their dropout was observed. Emits "
    "the classical (t, n_at_risk, n_events, n_censored) table — "
    "all exact integers; the Kaplan-Meier product S(t) derives "
    "row-by-row downstream (a float product has no order-free "
    "exact form, so it stays OUT of the hash surface). One keyed "
    "span aggregate, a 1-row corpus-end broadcast, and a "
    "duration-keyed rollup; the final cumulative window runs over "
    "<= corpus-day-span rows. Aggregate-statistics extension.",
)
def ag_survival_lifetable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("f"),
        F.date_trunc("day", F.max("ts")).alias("l"),
    )
    mx = span.agg(F.max("l").alias("ml"))
    obs = span.crossJoin(F.broadcast(mx)).select(
        F.datediff("l", "f").cast("long").alias("t_days"),
        F.when(
            F.datediff("ml", "l") >= SURVIVAL_CENSOR_DAYS, 1
        ).otherwise(0).alias("ev"),
    )
    tab = obs.groupBy("t_days").agg(
        F.sum("ev").cast("long").alias("n_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("n_censored"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy(F.desc("t_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return tab.select(
        "t_days",
        F.sum("n").over(w).cast("long").alias("n_at_risk"),
        "n_events",
        "n_censored",
    )


# ---------------------------------------------------------------------------
# true iterative BPE: merge table + fertility audit
# ---------------------------------------------------------------------------

_BPE_SEP = chr(31)
_BPE_DUCK_FOLD = (
    "string_split(list_reduce(list_prepend('', ts), "
    "(acc, t) -> CASE WHEN regexp_extract(acc, '[^" + _BPE_SEP + "]*$') = a "
    "AND t = b THEN acc || t ELSE acc || chr(31) || t END), chr(31))[2:]"
)


def _bpe_duck_pairs(src: str) -> str:
    return (
        f"flatten(list_transform(list_filter({src}, ts -> length(ts) >= 2), "
        f"ts -> list_transform(range(1, length(ts)), "
        f"i -> {{'a': ts[i], 'b': ts[i+1]}})))"
    )


def _bpe_duck_rounds(rounds: int) -> str:
    """Shared WITH-chain: t0 (char tokens) .. t{rounds} (all merges
    applied), with m1..m{rounds} the per-round argmax merges."""
    sql = """
    WITH t0 AS (
      SELECT doc_id, list_transform(regexp_extract_all(lower(text), '[a-z]+'),
             w -> list_transform(range(1, length(w)+1), i -> w[i])) AS toks
      FROM documents
    )"""
    for r in range(1, rounds + 1):
        sql += f""",
    p{r} AS (
      SELECT pr.a AS a, pr.b AS b, count(*) AS n
      FROM t{r - 1}, unnest({_bpe_duck_pairs("toks")}) AS u(pr)
      GROUP BY 1, 2
    ),
    m{r} AS (SELECT a, b, CAST(n AS BIGINT) AS n FROM p{r}
             ORDER BY n DESC, a, b LIMIT 1),
    t{r} AS (
      SELECT doc_id, list_transform(toks, ts -> {_BPE_DUCK_FOLD}) AS toks
      FROM t{r - 1} CROSS JOIN m{r}
    )"""
    return sql


def _bpe_train_sql() -> str:
    rounds = textstats.BPE_TRAIN_ROUNDS
    union = "\n      UNION ALL ".join(
        f"SELECT {r} AS rank, a AS merge_a, b AS merge_b, n AS n_pair FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return (
        _bpe_duck_rounds(rounds)
        + f"""
    SELECT CAST(rank AS INT) AS rank, merge_a, merge_b, n_pair FROM (
      {union}
    )"""
    )


def _bpe_apply_sql() -> str:
    rounds = textstats.BPE_TRAIN_ROUNDS
    return (
        _bpe_duck_rounds(rounds)
        + f"""
    SELECT t0.doc_id,
           CAST(length(t0.toks) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(t0.toks, ts -> length(ts)))
                AS BIGINT) AS n_chars,
           CAST(list_sum(list_transform(t{rounds}.toks, ts -> length(ts)))
                AS BIGINT) AS n_tokens,
           CAST((list_sum(list_transform(t{rounds}.toks, ts -> length(ts)))
                 * 10000)
                // list_sum(list_transform(t0.toks, ts -> length(ts)))
                AS BIGINT) AS fertility_x1e4
    FROM t0 JOIN t{rounds} USING (doc_id)
    WHERE list_sum(list_transform(t0.toks, ts -> length(ts))) > 0
    """
    )


@_register(
    "tx_bpe_train",
    _bpe_train_sql(),
    doc="TRUE iterative BPE training (Sennrich et al. 2016): each of "
    "the 4 rounds recounts adjacent TOKEN pairs after the previous "
    "merge has been fused corpus-wide, so later merges can build on "
    "earlier symbols — the real trainer, where tx_bpe_merges is "
    "only round 1's candidate list. Per round: in-row pair "
    "generation over the current token arrays, one "
    "map-side-combined count on a tiny key space, and a 1-row "
    "argmax (ties lexicographic) that IS the model artifact; merge "
    "application is a pure in-row fold, so the corpus is never "
    "shuffled. Output (rank, merge_a, merge_b, n_pair) — the "
    "learned merge table. Text-analysis extension.",
)
def tx_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.bpe_train_table(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# IVFADC — IVF cell restriction + PQ asymmetric-distance scoring
# ---------------------------------------------------------------------------


def _ivfadc_sql() -> str:
    from .queries_ext3 import _pq_cte_parts
    from .queries_scale import _DOT, _NORM
    from .scale import constants as C

    d = C.EMBEDDING_DIM
    fin = C.PQ_ITERS
    sd = C.PQ_SUB_DIM
    mean_list = ", ".join(f"round(avg(n.v[{i + 1}]), 9)" for i in range(d))
    sdot = _DOT.format(d=d, a="n.v", b="s.cv")
    cdot = _DOT.format(d=d, a="n.v", b="c.cv")
    pdot = _DOT.format(d=d, a="q.qv", b="c.cv")
    qdist = (
        f"round(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, {sd} + 1), "
        f"i -> (q.sv[i] - c.cv[i]) * (q.sv[i] - c.cv[i]))), "
        f"(x, y) -> x + y), 6)"
    )
    parts = _pq_cte_parts()
    parts.append(
        f"""normed AS (
      SELECT vec_id, v, {_NORM.format(v="v")} AS nrm FROM base
    ),
    iseeds AS (
      SELECT vec_id AS cid, v AS cv, nrm AS cn FROM normed
      WHERE vec_id % {C.IVF_SEED_STRIDE} = 0 ORDER BY vec_id LIMIT {C.IVF_N_LISTS}
    ),
    s_scored AS (
      SELECT n.vec_id, s.cid, round({sdot} / (n.nrm * s.cn), 6) AS sim
      FROM normed n CROSS JOIN iseeds s
    ),
    s_best AS (SELECT vec_id, max(sim) AS best FROM s_scored GROUP BY vec_id),
    s_assign AS (
      SELECT sc.vec_id, min(sc.cid) AS cid
      FROM s_scored sc JOIN s_best b ON sc.vec_id = b.vec_id AND sc.sim = b.best
      GROUP BY sc.vec_id
    ),
    icents AS (
      SELECT a.cid, [{mean_list}]::DOUBLE[] AS cv
      FROM s_assign a JOIN normed n USING (vec_id) GROUP BY a.cid
    ),
    icents_n AS (
      SELECT cid, cv, {_NORM.format(v="cv")} AS cn FROM icents
    ),
    c_scored AS (
      SELECT n.vec_id, c.cid, round({cdot} / (n.nrm * c.cn), 6) AS sim
      FROM normed n CROSS JOIN icents_n c
    ),
    c_best AS (SELECT vec_id, max(sim) AS best FROM c_scored GROUP BY vec_id),
    c_assign AS (
      SELECT sc.vec_id, min(sc.cid) AS cid
      FROM c_scored sc JOIN c_best b ON sc.vec_id = b.vec_id AND sc.sim = b.best
      GROUP BY sc.vec_id
    ),
    qids AS (
      SELECT vec_id AS query_id FROM base
      WHERE vec_id % {C.ADC_QUERY_STRIDE} = {C.ADC_QUERY_OFFSET}
      ORDER BY vec_id LIMIT {C.ADC_N_QUERIES}
    ),
    qn AS (
      SELECT n.vec_id AS q_id, n.v AS qv, n.nrm AS qnrm
      FROM normed n JOIN qids q ON n.vec_id = q.query_id
    ),
    q_probe AS (
      SELECT query_id, cid FROM (
        SELECT q.q_id AS query_id, c.cid,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round({pdot} / (q.qnrm * c.cn), 6) DESC, c.cid ASC)
                 AS pr
        FROM qn q CROSS JOIN icents_n c)
      WHERE pr <= {C.IVF_N_PROBE}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id
      FROM c_assign a JOIN q_probe p ON a.cid = p.cid
      WHERE a.vec_id <> p.query_id
    ),
    qsub AS (
      SELECT q.query_id, s.m, s.sv
      FROM sub s JOIN qids q ON s.vec_id = q.query_id
    ),
    lut AS (
      SELECT q.query_id, c.m, c.cid,
             CAST(round({qdist} * 1000000) AS BIGINT) AS lut_x1e6
      FROM qsub q JOIN c{fin} c ON c.m = q.m
    ),
    adc AS (
      SELECT cd.query_id, cd.vec_id,
             CAST(sum(l.lut_x1e6) AS BIGINT) AS adc_x1e6
      FROM cand cd
      JOIN af a ON a.vec_id = cd.vec_id
      JOIN lut l ON l.query_id = cd.query_id AND l.m = a.m AND l.cid = a.cid
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, vec_id, adc_x1e6,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY adc_x1e6, vec_id)
               AS INT) AS rk
      FROM adc
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT * FROM ranked WHERE rk <= {C.ADC_TOP_K}"
    )


@_register(
    "ann_ivfadc_topk",
    _ivfadc_sql,  # lazy: builder imports queries_ext3/queries_scale helpers
    doc="IVFADC (Jegou et al. 2011) — the production billion-scale "
    "ANN composition: the IVF coarse quantizer (ann_ivf_topk's "
    "deterministic cells) restricts each query to its 3 nearest "
    "cells, and the candidates inside them are scored by PQ "
    "asymmetric distance (ann_pq_adc's integer LUT sums) — the "
    "corpus is searched as an inverted file of 4x4-bit codes, raw "
    "vectors touched only to train the quantizers. Same query set "
    "and arithmetic as ann_pq_adc, so the cell-restriction recall "
    "loss is directly measurable against it. Per-query work is "
    "(N/n_lists)*n_probe code lookups. LLM-pipeline extension "
    "(similarity-search family).",
)
def ann_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import similarity

    return similarity.ann_ivfadc_topk(_t(spark, sf_dir, "embeddings"))


@_register(
    "tx_bpe_apply",
    _bpe_apply_sql(),
    doc="Tokenizer application + fertility audit: apply the 4 learned "
    "BPE merges (left-greedy, in learning order) to every document "
    "and report n_words / n_chars / n_tokens and tokens-per-char "
    "fertility as a scaled integer — the compression audit run "
    "before committing to a tokenizer at corpus scale. The merge "
    "table is driver-side model state (4 rows, the same bounded "
    "artifact pattern as ops.train); application is one in-row "
    "expression pass over the corpus — zero shuffles. Documents "
    "with no alphabetic text are excluded (fertility undefined). "
    "Text-analysis extension.",
)
def tx_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.bpe_fertility(_t(spark, sf_dir, "documents"))
