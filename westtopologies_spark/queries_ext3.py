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
