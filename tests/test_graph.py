"""Structural invariants for the graph-analytics operators.

Oracle parity is covered by test_oracle_parity; these check the
mathematical properties that parity alone would not catch if both
engines shared the same mistake.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from westtopologies_spark.ops import graph as G
from westtopologies_spark.queries import _event_edges


@pytest.fixture(scope="module")
def edges(spark, sf_dir):
    return G.user_edges(_event_edges(spark, sf_dir)).cache()


def test_edges_are_ordered_and_distinct(edges):
    rows = edges.collect()
    pairs = [(r.u, r.v) for r in rows]
    assert all(u < v for u, v in pairs)
    assert len(pairs) == len(set(pairs))


def test_triangle_total_divisible_by_three(edges):
    tri = G.triangle_counts(edges)
    total = tri.agg(F.sum("n_triangles")).collect()[0][0]
    assert total is not None and total % 3 == 0


def test_triangles_match_bruteforce(edges):
    adj: dict[int, set[int]] = {}
    for r in edges.collect():
        adj.setdefault(r.u, set()).add(r.v)
        adj.setdefault(r.v, set()).add(r.u)
    expected: dict[int, int] = {}
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for n in (a, b, c):
                        expected[n] = expected.get(n, 0) + 1
    got = {r.user_id: r.n_triangles for r in G.triangle_counts(edges).collect()}
    assert got == expected


def test_jaccard_bounds_and_symmetric_pairs(edges):
    rows = G.neighbor_jaccard(edges).collect()
    assert rows, "expected some co-neighbor pairs"
    for r in rows:
        assert r.ua < r.ub
        assert 0.0 < r.jaccard <= 1.0
        assert r.n_common >= G.JACCARD_MIN_COMMON


def test_jaccard_cap_is_identity_below_cap(edges):
    """The catalog entry's in-plan degree cap (top-32 by the md5
    order, VERDICT r6 #5) is a pure guardrail when no node exceeds
    it: capped == uncapped exactly (sf0.001's max degree is 14).
    This pins the uncapped exact form the capped catalog entry
    replaced."""
    exact = {
        (r.ua, r.ub): (r.n_common, r.jaccard)
        for r in G.neighbor_jaccard(edges).collect()
    }
    capped = {
        (r.ua, r.ub): (r.n_common, r.jaccard)
        for r in G.neighbor_jaccard(edges, max_degree=32).collect()
    }
    assert capped == exact


def test_jaccard_cap_bounds_hub_fanout(spark):
    """On a graph with hubs above the cap, the capped kernel's
    n_common (and therefore any shared neighbor's wedge fan-out)
    is bounded by the cap while the uncapped form is not."""
    leaves = list(range(2, 44))  # two hubs sharing 42 leaves
    rows = [(0, leaf) for leaf in leaves] + [(1, leaf) for leaf in leaves]
    g = spark.createDataFrame(rows, "u long, v long")
    # uncapped: the hub pair shares all 42 leaves (every leaf pair
    # also appears — they share the two hubs)
    un = {(r.ua, r.ub): r.n_common for r in G.neighbor_jaccard(g).collect()}
    assert un[(0, 1)] == 42
    cp = {
        (r.ua, r.ub): r.n_common
        for r in G.neighbor_jaccard(g, max_degree=32).collect()
    }
    assert all(n <= 32 for n in cp.values())
    # the hub pair's overlap is capped at 32 kept neighbors per hub
    assert cp.get((0, 1), 0) <= 32


def test_pagerank_mass_and_floor(spark, sf_dir):
    tweets = _event_edges(spark, sf_dir)
    nodes = tweets.select(F.col("author_id").alias("node")).distinct()
    pr = G.pagerank(nodes, G.directed_edges(tweets)).collect()
    n = len(pr)
    floor = (1.0 - G.PR_DAMPING) / n
    assert all(r.pagerank >= round(floor, 6) - 1e-6 for r in pr)
    # total mass <= 1 (dangling mass is dropped, never created);
    # allow the per-node output rounding (5e-7 each) to stack
    assert sum(r.pagerank for r in pr) <= 1.0 + 5e-7 * n + 1e-9


def test_kcore_peels_tails(spark):
    from westtopologies_spark.ops.graph import kcore_peel

    # path 1-2-3-4 with a triangle 4-5-6: 2-core is exactly the triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)], ["u", "v"]
    )
    out = {r["user_id"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=5).collect()}
    assert out == {4: 2, 5: 2, 6: 2}


def test_kcore_keeps_cycle(spark):
    from westtopologies_spark.ops.graph import kcore_peel

    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"])
    out = kcore_peel(cyc, k=2, rounds=3).collect()
    assert {r["user_id"] for r in out} == {1, 2, 3, 4}
    assert all(r["degree"] == 2 for r in out)
