"""Round-3 sixth extension batch: personalized PageRank, survival
life table, iterative BPE trainer + fertility — checked against
pure-Python references (randomized for BPE and PPR, hand-computed
for the life table)."""

from __future__ import annotations

import datetime as dt
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# ---------------------------------------------------------------------------
# personalized PageRank vs pure-Python trace
# ---------------------------------------------------------------------------


def _r9(x):
    import math

    return math.floor(x * 1e9 + 0.5) / 1e9  # HALF_UP, non-negative domain


def _py_ppr(nodes, dedges, stride, iters=3, d=0.85):
    seeds = [n for n in nodes if n % stride == 0]
    ns = float(len(seeds))
    reset = {n: (1.0 / ns if n % stride == 0 else 0.0) for n in nodes}
    pr = {n: _r9(reset[n]) for n in nodes}
    outs: dict = {}
    for s, _ in dedges:
        outs[s] = outs.get(s, 0) + 1
    for _ in range(iters):
        in_mass = {n: 0.0 for n in nodes}
        for s, t in dedges:
            in_mass[t] += pr[s] / outs[s]
        pr = {
            n: _r9((1.0 - d) * reset[n] + d * in_mass[n]) for n in nodes
        }
    import math

    # output trace: round(pr, 6) then * 1e6 -> BIGINT (both half-up)
    return {
        n: int(math.floor(math.floor(pr[n] * 1e6 + 0.5) / 1e6 * 1e6 + 0.5))
        for n in nodes
    }


@st.composite
def seeded_digraphs(draw):
    n = draw(st.integers(2, 9))
    m = draw(st.integers(1, 14))
    edges = sorted(
        {
            p
            for p in draw(
                st.lists(
                    st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
                    min_size=m,
                    max_size=m,
                )
            )
            if p[0] != p[1]
        }
    )
    return n, edges


@SET
@given(seeded_digraphs())
def test_ppr_matches_python_trace(spark, graph):
    from westtopologies_spark.ops.graph import personalized_pagerank

    n, edges = graph
    if not edges:
        return
    # stride 2: seeds = the even nodes (>= 1 seed always, node 0)
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    e_df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["user_id"]: r["ppr_x1e6"]
        for r in personalized_pagerank(nodes_df, e_df, stride=2).collect()
    }
    want = _py_ppr(list(range(n)), edges, stride=2)
    for i in range(n):
        # +-1 at the 1e6 scale for half-up binary-representation edges
        assert abs(got[i] - want[i]) <= 1, (i, edges)


def test_ppr_no_seed_reachability_means_zero(spark):
    """Mass only flows FROM the seed set: a node unreachable from any
    seed (and not a seed) scores exactly 0."""
    from westtopologies_spark.ops.graph import personalized_pagerank

    nodes = spark.createDataFrame([(0,), (1,), (2,), (3,)], ["node"])
    # 0 is the only seed (stride 50); 1 -> 2 is a component with no
    # path from 0; 0 -> 3 is seeded flow
    edges = spark.createDataFrame([(1, 2), (0, 3)], ["src", "dst"])
    got = {
        r["user_id"]: r["ppr_x1e6"]
        for r in personalized_pagerank(nodes, edges, stride=50).collect()
    }
    assert got[1] == 0 and got[2] == 0
    assert got[0] > 0 and got[3] > 0


# ---------------------------------------------------------------------------
# survival life table: hand-computed reference
# ---------------------------------------------------------------------------


def test_lifetable_hand_case(spark):
    from westtopologies_spark.queries_ext6 import ag_survival_lifetable

    d0 = dt.datetime(2024, 1, 1, 12)
    day = dt.timedelta(days=1)
    rows = []
    eid = 0

    def user(uid, first_day, last_day):
        nonlocal eid
        for dd in (first_day, last_day):
            rows.append((eid, d0 + dd * day, uid, "t", 0.0, ""))
            eid += 1

    user(1, 0, 10)  # corpus end = day 10 -> censored (gap 0)
    user(2, 0, 10)  # censored, duration 10
    user(3, 2, 5)   # gap 5 >= 2 -> event, duration 3
    user(4, 0, 3)   # gap 7 >= 2 -> event, duration 3
    user(5, 9, 9)   # duration 0, gap 1 < 2 -> censored
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(f"{tmp}/events.parquet")
        got = {
            r.t_days: (r.n_at_risk, r.n_events, r.n_censored)
            for r in ag_survival_lifetable(spark, tmp).collect()
        }
    # durations: 10(c), 10(c), 3(e), 3(e), 0(c)
    assert got == {
        10: (2, 0, 2),
        3: (4, 2, 0),
        0: (5, 0, 1),
    }


# ---------------------------------------------------------------------------
# iterative BPE vs pure-Python trainer
# ---------------------------------------------------------------------------


def _py_bpe(texts, rounds=4):
    import re

    docs = [re.findall(r"[a-z]+", t.lower()) for t in texts]
    toks = [[list(w) for w in ws] for ws in docs]
    merges = []
    for _ in range(rounds):
        counts: dict = {}
        for ws in toks:
            for ts in ws:
                for i in range(len(ts) - 1):
                    counts[(ts[i], ts[i + 1])] = counts.get(
                        (ts[i], ts[i + 1]), 0
                    ) + 1
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, n))
        for ws in toks:
            for wi, ts in enumerate(ws):
                out: list = []
                for t in ts:
                    if out and out[-1] == a and t == b:
                        out[-1] = a + b
                    else:
                        out.append(t)
                ws[wi] = out
    fert = {}
    for i, ws in enumerate(toks):
        n_chars = sum(len(w) for w in docs[i])
        if n_chars == 0:
            continue
        n_tokens = sum(len(ts) for ts in ws)
        fert[i] = (
            len(docs[i]),
            n_chars,
            n_tokens,
            (n_tokens * 10000) // n_chars,
        )
    return merges, fert


@st.composite
def word_corpora(draw):
    word = st.text(alphabet="abcd", min_size=1, max_size=6)
    doc = st.lists(word, min_size=0, max_size=8)
    return [
        " ".join(ws)
        for ws in draw(st.lists(doc, min_size=1, max_size=6))
    ]


@SET
@given(word_corpora())
def test_bpe_matches_python_trainer(spark, texts):
    from westtopologies_spark.scale.textstats import (
        bpe_fertility,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges, _ = bpe_train(df)
    want_merges, want_fert = _py_bpe(texts)
    assert merges == want_merges
    got = {
        r.doc_id: (r.n_words, r.n_chars, r.n_tokens, r.fertility_x1e4)
        for r in bpe_fertility(df).collect()
    }
    assert got == want_fert


# ---------------------------------------------------------------------------
# IVFADC: same arithmetic as the unrestricted ADC scan, recall-only loss
# ---------------------------------------------------------------------------


def test_ivfadc_dominated_by_unrestricted_adc(spark, sf_dir):
    """IVFADC searches a SUBSET of the corpus (the probed cells), so:
    (a) any pair it returns carries the identical integer ADC distance
    the unrestricted scan assigns, and (b) at every rank its distance
    is >= the unrestricted scan's distance at that rank (it can only
    miss neighbors, never invent closer ones)."""
    from westtopologies_spark.queries_ext5 import ann_pq_adc
    from westtopologies_spark.queries_ext6 import ann_ivfadc_topk

    full = {
        (r.query_id, r.vec_id): r.adc_x1e6
        for r in ann_pq_adc(spark, sf_dir).collect()
    }
    full_by_rank: dict = {}
    for (q, _), d in full.items():
        full_by_rank.setdefault(q, []).append(d)
    for q in full_by_rank:
        full_by_rank[q].sort()
    ivf = ann_ivfadc_topk(spark, sf_dir).collect()
    assert ivf, "IVFADC returned nothing"
    for r in ivf:
        if (r.query_id, r.vec_id) in full:
            assert full[(r.query_id, r.vec_id)] == r.adc_x1e6
        if r.rk <= len(full_by_rank.get(r.query_id, [])):
            assert r.adc_x1e6 >= full_by_rank[r.query_id][r.rk - 1]
