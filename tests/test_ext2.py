"""Unit tests for the round-2 extension operators beyond the oracle
harness: algebraic properties and hand-computed micro-fixtures.

(The oracle harness pins Spark==DuckDB on the driver tables; these
pin the operators to FIRST PRINCIPLES on inputs small enough to
verify by hand, the SURVEY §5 strategy.)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# ---------------------------------------------------------------------------


def test_jl_projection_matches_numpy(spark):
    """The engine projection of a known vector equals the same ±1
    matrix applied in plain Python."""
    import numpy as np

    from westtopologies_spark.queries_ext2 import (
        _JL_A,
        _JL_B,
        _JL_M,
        JL_IN_DIM,
        JL_OUT_DIM,
    )

    rng = np.random.RandomState(7)
    vec = rng.randn(JL_IN_DIM).astype("float32")
    df = spark.createDataFrame(
        [(0, [float(x) for x in vec])], "vec_id long, embedding array<float>"
    )
    # the catalog fn loads from parquet; replicate its expression here
    scale = float(JL_OUT_DIM) ** 0.5
    sign = lambda i, j: (  # noqa: E731
        1.0 if ((i * _JL_A + j * _JL_B) % _JL_M) % 2 == 0 else -1.0
    )
    expect = {
        j: round(
            sum(float(vec[i]) * sign(i, j) for i in range(JL_IN_DIM)) / scale,
            4,
        )
        + 0.0
        for j in range(JL_OUT_DIM)
    }

    def proj_expr(j):
        def s(i):
            h = ((i * _JL_A + F.lit(j) * _JL_B) % _JL_M) % 2
            return F.when(h == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

        return (
            F.round(
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(JL_IN_DIM - 1)),
                    F.lit(0.0),
                    lambda acc, i: acc
                    + F.element_at("embedding", i + 1).cast("double") * s(i),
                )
                / scale,
                4,
            )
            + 0.0
        )

    got = df.select(
        F.posexplode(
            F.array(*[proj_expr(j) for j in range(JL_OUT_DIM)])
        ).alias("dim", "proj")
    ).collect()
    for r in got:
        assert abs(r.proj - expect[r.dim]) < 1e-9, (r.dim, r.proj, expect[r.dim])


# ---------------------------------------------------------------------------
# chi-square term association
# ---------------------------------------------------------------------------


def test_chi2_hand_computed(spark):
    """2x2 contingency chi-square against the textbook formula on a
    corpus tiny enough to count by hand."""
    from westtopologies_spark import queries_ext2 as q2

    rows = [
        (1, "en", "cat cat dog"),
        (2, "en", "cat bird"),
        (3, "de", "dog dog dog"),
        (4, "de", "bird dog"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    # replicate the operator body with min_count=1, k large
    tok = docs.select(
        "lang",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("token"),
    )
    cnt = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("a"))
    tot_tok = cnt.groupBy("token").agg(F.sum("a").alias("ta"))
    tot_lang = cnt.groupBy("lang").agg(F.sum("a").alias("tl"))
    n = cnt.agg(F.sum("a").alias("nn"))
    a, ta, tl, nn = F.col("a"), F.col("ta"), F.col("tl"), F.col("nn")
    d = nn - ta - tl + a
    chi2 = (
        nn.cast("double")
        * F.pow((a * d - (ta - a) * (tl - a)).cast("double"), 2)
        / (
            ta.cast("double")
            * (nn - ta).cast("double")
            * tl.cast("double")
            * (nn - tl).cast("double")
        )
    )
    got = {
        (r.lang, r.token): r.c
        for r in cnt.join(tot_tok, "token")
        .join(tot_lang, "lang")
        .crossJoin(n)
        .select("lang", "token", chi2.alias("c"))
        .collect()
    }
    # tokens: en = [cat cat dog cat bird] (5), de = [dog dog dog bird dog] (5)
    # N = 10; for ("en","cat"): a=3, ta=3, tl=5 -> b=0, c=2, d=5
    N, a_, ta_, tl_ = 10, 3, 3, 5
    b_, c_, d_ = ta_ - a_, tl_ - a_, N - ta_ - tl_ + a_
    expect = (
        N
        * (a_ * d_ - b_ * c_) ** 2
        / (ta_ * (N - ta_) * tl_ * (N - tl_))
    )
    assert abs(got[("en", "cat")] - expect) < 1e-12


# ---------------------------------------------------------------------------
# Z-order locality
# ---------------------------------------------------------------------------


def test_zorder_bbox_is_tight(spark, sf_dir):
    """Each coarse z-bucket must bound a rectangle no larger than the
    cell implied by the dropped bits: 2^14 interleaved low bits =
    2^7 x 2^7 per dimension."""
    from westtopologies_spark.queries_ext2 import dv_zorder_locality

    out = dv_zorder_locality(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.x_max - r.x_min < 128, r
        assert r.y_max - r.y_min < 128, r


def test_zorder_key_is_morton(spark, sf_dir):
    """Spot-check the bit interleave on a known pair: x=3 (0b11),
    y=1 (0b01) -> z = x bits at even positions + y bits at odd =
    0b0111 = 7."""
    from westtopologies_spark.queries_ext2 import _Z_BITS, _z_terms

    df = spark.createDataFrame([(3, 1)], "x long, y long")
    z = df.select(
        F.expr(
            _z_terms("x", "y", lambda c, b: f"shiftright({c}, {b})")
        ).alias("z")
    ).collect()[0].z
    assert z == 7


# ---------------------------------------------------------------------------
# perceptual block hash
# ---------------------------------------------------------------------------


def test_block_hash_identical_payloads_share_signature(spark):
    from westtopologies_spark.scale.multimodal import (
        as_binary_docs,
        block_hash_signatures,
    )

    text = "the quick brown fox jumps over the lazy dog " * 20
    docs = spark.createDataFrame(
        [(1, text, "a"), (2, text, "b"), (3, text[::-1], "c")],
        "doc_id long, text string, source string",
    )
    sigs = {
        r.doc_id: tuple(r.bands)
        for r in block_hash_signatures(as_binary_docs(docs)).collect()
    }
    assert sigs[1] == sigs[2]  # identical payloads -> identical signature
    assert len(sigs[1]) == 4
    assert all(0 <= b <= 0xFFFF for b in sigs[1])


def test_block_hash_constant_payload_all_ones(spark):
    """A constant byte stream has every block mean == global mean, so
    the >= comparison sets every bit: all bands 0xFFFF."""
    from westtopologies_spark.scale.multimodal import (
        as_binary_docs,
        block_hash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 256, "s")], "doc_id long, text string, source string"
    )
    (row,) = block_hash_signatures(as_binary_docs(docs)).collect()
    assert tuple(row.bands) == (0xFFFF,) * 4


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def test_lpa_two_cliques_with_bridge(spark):
    """Two triangles joined by one bridge edge must end in two
    communities labeled by each clique's min id."""
    from westtopologies_spark.ops.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "u long, v long",
    )
    out = {r.user_id: r.community_id for r in label_propagation(edges).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == out[5] == out[6]
    assert out[4] != 1


# ---------------------------------------------------------------------------
# held-out NLL
# ---------------------------------------------------------------------------


def test_heldout_nll_hand_computed(spark):
    """Laplace unigram NLL on a 2-train / 1-eval corpus, checked
    against the closed form."""
    from westtopologies_spark import queries_ext2 as q2

    # train: doc 0,1 (doc_id % 10 < 8); eval: doc 8
    rows = [
        (0, "a a b"),
        (1, "b c"),
        (8, "a d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # run the operator body against this frame via monkeypatched _t
    real_t = q2._t
    try:
        q2._t = lambda spark_, sf_, name: docs
        out = {r.doc_id: r for r in q2.tx_heldout_nll(spark, "unused").collect()}
    finally:
        q2._t = real_t
    # T=5 train tokens, V=3 types; eval doc 8: a (c=2), d (c=0)
    t_, v_ = 5, 3
    expect = -(math.log(3 / (t_ + v_)) + math.log(1 / (t_ + v_))) / 2
    assert out[8].n_tokens == 2
    # catalog output is the hash-exact scaled BIGINT (VERDICT r2 #3)
    assert out[8].mean_nll_x1e6 == round(round(expect, 6) * 1e6)


def test_modularity_stats_two_cliques(spark):
    """Two triangles + one bridge edge: the per-community integer
    sufficient statistics of Newman modularity match hand values."""
    import westtopologies_spark.queries_graph as QG
    from pyspark.sql import functions as F
    from westtopologies_spark.ops import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "u long, v long",
    )
    lab = G.label_propagation(edges).select("user_id", "community_id")
    # reproduce the gr_modularity aggregation on the toy graph
    sym = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    la = lab.select(F.col("user_id").alias("u"), F.col("community_id").alias("ca"))
    lb = lab.select(F.col("user_id").alias("v"), F.col("community_id").alias("cb"))
    ec = (
        edges.join(la, "u").join(lb, "v")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community_id"))
        .agg(F.count(F.lit(1)).alias("in_edges"))
    )
    dc = (
        lab.join(deg, lab.user_id == deg.node)
        .groupBy("community_id")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.sum("d").alias("degree_sum"))
    )
    out = {r["community_id"]: r for r in dc.join(ec, "community_id", "left").collect()}
    # community {1,2,3}: 3 internal edges; degrees 2,2,3 -> sum 7
    # community {4,5,6}: 3 internal edges; degrees 3,2,2 -> sum 7
    assert len(out) == 2
    for r in out.values():
        assert r["n_nodes"] == 3 and r["in_edges"] == 3 and r["degree_sum"] == 7


def test_waiting_suppliers_decorrelation_equivalent(spark):
    """sq_waiting_suppliers replaces Q21's correlated EXISTS /
    NOT-EXISTS pair with one grouped pass; verify the rewrite against
    a literal exists-form computation on a constructed forest of
    orders covering every qualification case:

    - o1: two suppliers, only s1 late  -> counts for s1
    - o2: two suppliers, both late     -> excluded (other late supplier)
    - o3: single supplier, late        -> excluded (no other supplier)
    - o4: two suppliers, none late     -> excluded (no late lineitem)
    - o5: status 'O'                   -> excluded (status filter)
    """
    import datetime as dt

    from westtopologies_spark.queries_ext2 import sq_waiting_suppliers

    d0 = dt.datetime(1997, 1, 1)
    late = d0 + dt.timedelta(days=90)
    ontime = d0 + dt.timedelta(days=10)
    orders = spark.createDataFrame(
        [(1, "F", d0), (2, "F", d0), (3, "F", d0), (4, "F", d0), (5, "O", d0)],
        ["o_orderkey", "o_orderstatus", "o_orderdate"],
    )
    li = spark.createDataFrame(
        [
            (1, 101, late), (1, 102, ontime),
            (2, 101, late), (2, 102, late),
            (3, 101, late),
            (4, 101, ontime), (4, 102, ontime),
            (5, 101, late), (5, 102, ontime),
        ],
        ["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    supplier = spark.createDataFrame(
        [(101, "s101"), (102, "s102")], ["s_suppkey", "s_name"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        orders.write.parquet(f"{tmp}/orders.parquet")
        li.write.parquet(f"{tmp}/lineitem.parquet")
        supplier.write.parquet(f"{tmp}/supplier.parquet")
        got = {
            (r.s_suppkey, r.numwait)
            for r in sq_waiting_suppliers(spark, tmp).collect()
        }
    # literal exists-form reference via SQL on the same frames
    orders.createOrReplaceTempView("_o")
    li.createOrReplaceTempView("_l")
    expect = {
        (r.l_suppkey, r.numwait)
        for r in spark.sql(
            """
            SELECT l1.l_suppkey, count(DISTINCT l1.l_orderkey) AS numwait
            FROM _l l1 JOIN _o o ON o.o_orderkey = l1.l_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
              AND EXISTS (SELECT 1 FROM _l l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (
                    SELECT 1 FROM _l l3 JOIN _o o3
                      ON o3.o_orderkey = l3.l_orderkey
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate > o3.o_orderdate
                            + INTERVAL 60 DAYS)
            GROUP BY 1
            """
        ).collect()
    }
    assert got == expect == {(101, 1)}
