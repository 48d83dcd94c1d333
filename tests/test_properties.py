"""Property-based tests (hypothesis): the hardest kernels checked
against independent pure-Python references on randomized inputs.
Example counts are kept small — each example round-trips through
Spark (~1s); the point is shape coverage, not volume."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

EPOCH = dt.datetime(2024, 1, 1)


@st.composite
def event_streams(draw):
    n = draw(st.integers(1, 60))
    offsets = draw(
        st.lists(st.integers(0, 5000), min_size=n, max_size=n)
    )
    # arrival order = list order; event time may jitter non-monotonically
    return [
        (i, EPOCH + dt.timedelta(seconds=off), float(i % 7))
        for i, off in enumerate(sorted(offsets))
    ]


def _py_w1_exact(rows, interval_sec=600):
    """Independent reimplementation of the reference flush rule
    (DiscussionTreeBolt.java:107-110,130-168)."""
    out, start, n, total = [], None, 0, 0.0
    for _seq, ts, val in rows:
        if start is None:
            start, n, total = ts, 0, 0.0
        n += 1
        total += val
        if ts >= start + dt.timedelta(seconds=interval_sec):
            out.append((start, ts, n, round(total, 2)))
            start = None
    return out


@SET
@given(event_streams())
def test_w1_exact_matches_python_reference(spark, rows):
    from westtopologies_spark.streaming.stateful import data_driven_windows

    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = [
        (r["window_start"], r["window_end"], r["n_events"], r["sum_value"])
        for r in data_driven_windows(df).collect()
    ]
    assert sorted(got) == sorted(_py_w1_exact(rows))


@SET
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12),
        min_size=2,
        max_size=8,
    )
)
def test_ngram_jaccard_matches_set_math(spark, token_lists):
    from westtopologies_spark.scale.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    # independent reference: python set Jaccard over token 3-grams
    shingles = [
        {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}
        for toks in token_lists
    ]
    for a in range(len(shingles)):
        for b in range(a + 1, len(shingles)):
            inter = len(shingles[a] & shingles[b])
            if inter:
                want = round(inter / len(shingles[a] | shingles[b]), 4)
                assert got[(a, b)] == want
            else:
                assert (a, b) not in got  # no shared shingle -> no pair


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    st.lists(
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=3,
        max_size=14,
    )
)
def test_ann_ivf_dominated_by_bruteforce(spark, vecs):
    """IVF invariants on random vectors: (a) reranked cosines are the
    exact numpy cosine rounded at 6; (b) ranks are consecutive with
    non-increasing cosine; (c) at every rank the IVF cosine is <= the
    exact brute-force cosine at that rank (IVF searches a subset of
    the corpus, so it can only miss, never invent, neighbors)."""
    import numpy as np

    from westtopologies_spark.scale.similarity import ann_ivf_topk, cosine_topk
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    k = 3
    ivf = ann_ivf_topk(df, F.col("vec_id") == 0, k=k, n_probe=1, dim=4).collect()
    bf = {
        r["rank"]: r["cosine"]
        for r in cosine_topk(df, df.filter(F.col("vec_id") == 0), k=k).collect()
    }

    A = np.array([np.array(v, dtype=np.float32).astype(np.float64) for v in vecs])
    A = A / np.linalg.norm(A, axis=1, keepdims=True)
    rows = sorted(ivf, key=lambda r: r["rank"])
    for i, r in enumerate(rows):
        assert r["rank"] == i + 1  # consecutive ranks
        want = round(float(A[0] @ A[r["neighbor_id"]]), 6)
        assert abs(r["cosine"] - want) < 2e-6  # exact rerank
        if i > 0:
            assert r["cosine"] <= rows[i - 1]["cosine"]
        assert r["cosine"] <= bf[r["rank"]] + 1e-9  # dominance


@SET
@given(st.lists(st.integers(-1000, 1000), min_size=4, max_size=40))
def test_tercile_levels_match_reference_rule(spark, values):
    """Boundaries#train: low/mid = (v[n/3]+v[n/3+1])/2 (0-indexed
    sorted), mid/high analog; #getLevel: <= -> low/med, else high."""
    from westtopologies_spark.ops.roles import tercile_levels

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], ["user_id", "x"]
    )
    got = {r["user_id"]: r["x_level"] for r in tercile_levels(df, ("x",)).collect()}

    s = sorted(float(v) for v in values)
    n = len(s)
    lm = (s[n // 3] + s[n // 3 + 1]) / 2
    mh = (s[2 * n // 3] + s[2 * n // 3 + 1]) / 2
    for i, v in enumerate(values):
        want = "low" if v <= lm else ("med" if v <= mh else "high")
        assert got[i] == want, (v, lm, mh)


# ---------------------------------------------------------------------------
# weighted quantiles / MAD / priority sampling vs pure-Python references
# ---------------------------------------------------------------------------


@st.composite
def weighted_values(draw):
    n = draw(st.integers(1, 30))
    vals = draw(
        st.lists(
            st.floats(-100, 100, allow_nan=False, allow_infinity=False),
            min_size=n,
            max_size=n,
        )
    )
    weights = draw(st.lists(st.integers(1, 9), min_size=n, max_size=n))
    return [(round(v, 2), w) for v, w in zip(vals, weights)]


@given(weighted_values())
@SET
def test_weighted_quantiles_match_bruteforce(spark, rows):
    from westtopologies_spark.scale.aggstats import weighted_quantiles

    df = spark.createDataFrame([("g", v, w) for v, w in rows], ["k", "v", "w"])
    got = {
        r["p10"]: r["wq_cents"]
        for r in weighted_quantiles(df, "v", "w", ["k"]).collect()
    }
    # brute force: expand each value w times, take the lower-rule quantile
    expanded = sorted(v for v, w in rows for _ in range(w))
    n = len(expanded)
    for p10 in (5, 9):
        idx = next(i for i in range(n) if (i + 1) * 10 >= p10 * n)
        assert got[p10] == round(expanded[idx] * 100)


@given(weighted_values())
@SET
def test_mad_matches_bruteforce(spark, rows):
    import statistics

    from westtopologies_spark.scale.aggstats import mad

    df = spark.createDataFrame([("g", float(v)) for v, _ in rows], ["k", "v"])
    r = mad(df, "v", ["k"]).collect()[0]
    # exact-integer reference: work in cents (values are 2-dp exact)
    cents = sorted(round(v * 100) for v, _ in rows)

    def med_x2(xs):
        n = len(xs)
        i, rem = divmod(n - 1, 2)
        return (2 - rem) * xs[i] + (rem * xs[i + 1] if rem else 0)

    m2 = med_x2(cents)
    devs_x2 = sorted(abs(2 * c - m2) for c in cents)
    assert r["median_x1e4"] == m2 * 50
    assert r["mad_x1e4"] == med_x2(devs_x2) * 25


@given(st.integers(1, 40), st.integers(1, 15))
@SET
def test_priority_sample_matches_bruteforce(spark, n_rows, n_pick):
    from westtopologies_spark.scale import constants as C
    from westtopologies_spark.scale.trainprep import PRIORITY_SALT, priority_sample

    rows = [(i, 3 + (i * 17) % 50) for i in range(n_rows)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = [
        r["doc_id"]
        for r in priority_sample(df, n=n_pick)
        .orderBy("doc_id")
        .collect()
    ]
    pri = {
        i: w * float(C.FP_P) / ((i * C.SIMHASH_A + PRIORITY_SALT) % C.FP_P + 1)
        for i, w in rows
    }
    expect = sorted(
        sorted(pri, key=lambda i: (-pri[i], i))[: min(n_pick, n_rows)]
    )
    assert got == expect


@st.composite
def random_texts(draw):
    n_docs = draw(st.integers(1, 6))
    alphabet = "ab cd"  # tiny alphabet -> frequent boundary collisions
    return [
        (i, "".join(draw(st.lists(st.sampled_from(alphabet), min_size=1, max_size=120))))
        for i in range(n_docs)
    ]


def _py_cdc(text, w=8, d=64, m=31, p=None):
    """Independent pure-Python CDC reference (same constants as
    scale.multimodal.cdc_chunks)."""
    from westtopologies_spark.scale.constants import FP_MULT, FP_P

    assert m == FP_MULT
    p = p or FP_P
    codes = [ord(c) for c in text]
    L = len(codes)
    bpos = [
        i
        for i in range(w, L + 1)
        if sum(codes[i - 1 - k] * m**k for k in range(w)) % d == 0 and i < L
    ]
    starts, ends = [0] + bpos, bpos + [L]
    out = []
    for k, (s, e) in enumerate(zip(starts, ends), start=1):
        fp = 0
        for c in codes[s:e]:
            fp = (fp * m + c) % p
        out.append((k, e - s, fp))
    return out


@SET
@given(random_texts())
def test_cdc_chunks_match_python_reference(spark, docs):
    from westtopologies_spark.scale.multimodal import cdc_chunks

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_len, r.chunk_fp)
        )
    for doc_id, text in docs:
        expect = _py_cdc(text)
        assert sorted(got.get(doc_id, [])) == sorted(expect), (doc_id, text)
        # chunks reassemble the payload exactly
        assert sum(ln for _, ln, _ in expect) == len(text)


def _py_minhash_bands(text):
    """Independent pure-Python reference for row_shingle_arrays ->
    band buckets (char vocab mode)."""
    from westtopologies_spark.scale.constants import (
        FP_MULT,
        MINHASH_BAND_ROWS,
        MINHASH_COEFFS,
        SHINGLE_N,
        SHINGLE_P,
    )

    def tid(tok):
        a = 0
        for ch in tok:
            a = (a * FP_MULT + ord(ch)) % SHINGLE_P
        return a

    tids = [tid(t) for t in text.split(" ")]
    if len(tids) < SHINGLE_N:
        return None
    sh = set()
    for i in range(len(tids) - SHINGLE_N + 1):
        acc = tids[i]
        for k in range(1, SHINGLE_N):
            acc = acc * FP_MULT + tids[i + k]
        sh.add(acc % SHINGLE_P)
    mh = [min((s * a + b) % SHINGLE_P for s in sh) for a, b in MINHASH_COEFFS]
    rows = MINHASH_BAND_ROWS
    out = []
    for band in range(len(MINHASH_COEFFS) // rows):
        bucket = 0
        for r in range(rows):
            bucket += mh[band * rows + r] * SHINGLE_P ** (rows - 1 - r)
        out.append((band, bucket))
    return out


@SET
@given(random_texts())
def test_row_band_buckets_match_python_reference(spark, docs):
    from westtopologies_spark.scale.dedup import row_band_buckets

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {}
    for r in row_band_buckets(df).collect():
        got.setdefault(r.doc_id, []).append((r.band, r.bucket))
    for doc_id, text in docs:
        expect = _py_minhash_bands(text)
        if expect is None:
            assert doc_id not in got, (doc_id, text)
        else:
            assert sorted(got[doc_id]) == sorted(expect), (doc_id, text)


# ---------------------------------------------------------------------------
# bounded-hop BFS reach vs pure-python BFS
# ---------------------------------------------------------------------------


@st.composite
def small_graphs(draw):
    n = draw(st.integers(2, 14))
    m = draw(st.integers(1, 2 * n))
    edges = {
        tuple(sorted(p))
        for p in draw(
            st.lists(
                st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
                min_size=m,
                max_size=m,
            )
        )
        if p[0] != p[1]
    }
    seeds = draw(
        st.lists(st.integers(0, n - 1), min_size=1, max_size=3, unique=True)
    )
    return sorted(edges), sorted(seeds)


def _py_bfs(edges, seeds, hops):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, hops + 1):
        nxt = set()
        for u in frontier:
            for w in adj.get(u, ()):
                if w not in dist:
                    nxt.add(w)
        for w in nxt:
            dist[w] = h
        frontier = nxt
    return dist


@SET
@given(small_graphs())
def test_khop_reach_matches_python_bfs(spark, graph):
    from westtopologies_spark.ops.graph import KHOP_HOPS, khop_reach

    edges, seeds = graph
    if not edges:
        return
    e_df = spark.createDataFrame(edges, ["u", "v"])
    s_df = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {
        r["user_id"]: r["hop"] for r in khop_reach(s_df, e_df).collect()
    }
    assert got == _py_bfs(edges, seeds, KHOP_HOPS)


# ---------------------------------------------------------------------------
# Mann-Kendall statistics vs pure-python pair enumeration
# ---------------------------------------------------------------------------


@SET
@given(st.lists(st.integers(-3, 3), min_size=2, max_size=15))
def test_mann_kendall_matches_python_pairs(spark, day_values):
    from westtopologies_spark.scale.temporal import mann_kendall

    rows = [
        (
            i,
            EPOCH + dt.timedelta(days=i, hours=3),
            1,
            "view",
            float(v),
            "{}",
        )
        for i, v in enumerate(day_values)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = mann_kendall(ev).collect()[0]
    cents = [round(v * 100) for v in day_values]
    n = len(cents)
    s = sum(
        (cents[j] > cents[i]) - (cents[j] < cents[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie_sum = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(cents).values()
    )
    var_num = n * (n - 1) * (2 * n + 5) - tie_sum
    assert got["n_days"] == n
    assert got["s_stat"] == s
    assert got["var_num"] == var_num
    if s > 0:
        want_z = round((s - 1) / (var_num / 18.0) ** 0.5 * 1e6)
    elif s < 0:
        want_z = round((s + 1) / (var_num / 18.0) ** 0.5 * 1e6)
    else:
        want_z = 0
    assert got["z_x1e6"] == want_z


# ---------------------------------------------------------------------------
# HITS vs pure-python replication of the declared trace
# ---------------------------------------------------------------------------


def _py_hits(nodes, dedges, iters):
    import math

    def r(x, k):  # Spark/DuckDB HALF_UP on the non-negative domain
        s = 10**k
        return math.floor(x * s + 0.5) / s

    h = {n: 1.0 for n in nodes}
    a = {}
    ins, outs = {}, {}
    for s, d in dedges:
        ins.setdefault(d, []).append(s)
        outs.setdefault(s, []).append(d)
    for _ in range(iters):
        raw_a = {d: r(sum(h[s] for s in srcs), 9) for d, srcs in ins.items()}
        m = max(raw_a.values())
        a = {n: r(raw_a.get(n, 0.0) / m, 9) for n in nodes}
        raw_h = {s: r(sum(a[d] for d in dsts), 9) for s, dsts in outs.items()}
        m = max(raw_h.values())
        h = {n: r(raw_h.get(n, 0.0) / m, 9) for n in nodes}
    return (
        {n: math.floor(a[n] * 1e6 + 0.5) for n in nodes},
        {n: math.floor(h[n] * 1e6 + 0.5) for n in nodes},
    )


@st.composite
def small_digraphs(draw):
    n = draw(st.integers(3, 10))
    m = draw(st.integers(2, 2 * n))
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
@given(small_digraphs())
def test_hits_matches_python_trace(spark, graph):
    from westtopologies_spark.ops.graph import HITS_ITERS, hits

    n, edges = graph
    if not edges:
        return
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    e_df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["user_id"]: r for r in hits(nodes_df, e_df).collect()}
    want_a, want_h = _py_hits(list(range(n)), edges, HITS_ITERS)
    for i in range(n):
        # exact trace replication; +-1 at the 1e6 scale tolerated for
        # binary-representation edge cases of the half-up reference
        assert abs(got[i]["auth_x1e6"] - want_a[i]) <= 1, (i, edges)
        assert abs(got[i]["hub_x1e6"] - want_h[i]) <= 1, (i, edges)


# ---------------------------------------------------------------------------
# PQ asymmetric-distance search: full deterministic trace (subspace
# k-means fit + LUT + integer ADC sum + ranking) vs pure Python
# ---------------------------------------------------------------------------

_PQ_DIM, _PQ_M, _PQ_SD, _PQ_K, _PQ_IT = 4, 2, 2, 3, 2
_PQ_STRIDE, _PQ_QSTRIDE, _PQ_QOFF, _PQ_NQ, _PQ_TOPK = 3, 5, 1, 2, 3


@st.composite
def small_vector_corpora(draw):
    n = draw(st.integers(6, 24))
    # quarter-grid coordinates: exactly representable doubles, so the
    # only fp sensitivity left is the mean/round trace itself
    vecs = [
        [q / 4.0 for q in draw(
            st.lists(st.integers(-32, 32), min_size=_PQ_DIM, max_size=_PQ_DIM)
        )]
        for _ in range(n)
    ]
    return [(i, v) for i, v in enumerate(vecs)]


def _pq_r(x, k):
    """Spark F.round semantics: HALF_UP over the shortest decimal
    repr (BigDecimal.valueOf(Double.toString)) — python's builtin
    round() is banker's and diverges on the exact halves the
    quarter-grid corpus produces (e.g. 10.3515625 at 6dp)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-k), rounding=ROUND_HALF_UP
        )
    )


def _py_pq_adc(rows):
    """Independent pure-Python replay of _pq_fit + pq_adc_topk."""
    sub = {
        (i, mm): tuple(v[mm * _PQ_SD:(mm + 1) * _PQ_SD])
        for i, v in rows
        for mm in range(_PQ_M)
    }
    ids = sorted(i for i, _ in rows)
    seeds = [i for i in ids if i % _PQ_STRIDE == 0][:_PQ_K]
    cents = {
        (mm, cid): sub[(sid, mm)]
        for cid, sid in enumerate(seeds)
        for mm in range(_PQ_M)
    }

    def sqd(a, b):
        return _pq_r(sum((x - y) * (x - y) for x, y in zip(a, b)), 6)

    assign = {}
    for _ in range(_PQ_IT + 1):  # iters rounds + the final assignment
        assign = {}
        for (i, mm), sv in sub.items():
            ds = [
                (sqd(sv, cv), cid)
                for (cm, cid), cv in cents.items()
                if cm == mm
            ]
            bd = min(d for d, _ in ds)
            cid = min(c for d, c in ds if d == bd)
            assign[(i, mm)] = (cid, bd)
        groups: dict = {}
        for (i, mm), (cid, _) in assign.items():
            groups.setdefault((mm, cid), []).append(sub[(i, mm)])
        cents = {
            key: tuple(
                _pq_r(sum(sv[j] for sv in svs) / len(svs), 9)
                for j in range(_PQ_SD)
            )
            for key, svs in groups.items()
        }
    # NOTE: the loop above re-centers AFTER the final assignment too,
    # but `assign` already holds the final-round assignment
    qids = [i for i in ids if i % _PQ_QSTRIDE == _PQ_QOFF][:_PQ_NQ]
    # centroids as of the final assignment round = cents BEFORE the
    # last re-centering: recompute them from the trace
    cents_fit = {
        (mm, cid): tuple(
            _pq_r(sum(sv[j] for sv in svs) / len(svs), 9)
            for j in range(_PQ_SD)
        )
        for (mm, cid), svs in _pq_groups_after(sub, seeds, _PQ_IT).items()
    }
    out = []
    for q in qids:
        lut = {
            (mm, cid): int(_pq_r(sqd(sub[(q, mm)], cv) * 1_000_000, 0))
            for (mm, cid), cv in cents_fit.items()
        }
        scored = []
        for i in ids:
            if i == q:
                continue
            adc = sum(lut[(mm, assign[(i, mm)][0])] for mm in range(_PQ_M))
            scored.append((adc, i))
        scored.sort()
        for rk, (adc, i) in enumerate(scored[:_PQ_TOPK], start=1):
            out.append((q, i, adc, rk))
    return sorted(out)


def _pq_groups_after(sub, seeds, iters):
    """Assignment groups after exactly ``iters`` Lloyd rounds (the
    codebook the final assignment is scored against)."""
    cents = {
        (mm, cid): sub[(sid, mm)]
        for cid, sid in enumerate(seeds)
        for mm in range(_PQ_M)
    }

    def sqd(a, b):
        return _pq_r(sum((x - y) * (x - y) for x, y in zip(a, b)), 6)

    groups: dict = {}
    for _ in range(iters):
        assign = {}
        for (i, mm), sv in sub.items():
            ds = [
                (sqd(sv, cv), cid)
                for (cm, cid), cv in cents.items()
                if cm == mm
            ]
            bd = min(d for d, _ in ds)
            assign[(i, mm)] = min(c for d, c in ds if d == bd)
        groups = {}
        for (i, mm), cid in assign.items():
            groups.setdefault((mm, cid), []).append(sub[(i, mm)])
        cents = {
            key: tuple(
                _pq_r(sum(sv[j] for sv in svs) / len(svs), 9)
                for j in range(_PQ_SD)
            )
            for key, svs in groups.items()
        }
    return groups


@SET
@given(small_vector_corpora())
def test_pq_adc_matches_python_trace(spark, rows):
    from westtopologies_spark.scale.similarity import pq_adc_topk

    df = spark.createDataFrame(
        [(i, v) for i, v in rows], ["vec_id", "embedding"]
    )
    got = sorted(
        (r.query_id, r.vec_id, r.adc_x1e6, r.rk)
        for r in pq_adc_topk(
            df,
            nq=_PQ_NQ, topk=_PQ_TOPK, m=_PQ_M, sub_dim=_PQ_SD,
            k=_PQ_K, iters=_PQ_IT, stride=_PQ_STRIDE,
            qstride=_PQ_QSTRIDE, qoffset=_PQ_QOFF,
        ).collect()
    )
    assert got == _py_pq_adc(rows)


# ---------------------------------------------------------------------------
# compaction planner: next-fit bin assignment vs pure Python
# ---------------------------------------------------------------------------


@SET
@given(st.lists(st.integers(1, 9000), min_size=1, max_size=30))
def test_compaction_bins_match_python_next_fit(spark, sizes):
    import tempfile

    from westtopologies_spark.queries_ext5 import (
        COMPACT_TARGET_BYTES,
        dv_compaction_plan,
    )

    rows = [
        (d, EPOCH + dt.timedelta(days=d), 1, "t", 0.0, "x" * sz)
        for d, sz in enumerate(sizes)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(f"{tmp}/events.parquet")
        got = {
            r.bin: (r.n_files, r.bytes)
            for r in dv_compaction_plan(spark, tmp).collect()
        }
    expect: dict = {}
    cum = 0
    for sz in sizes:  # day order == list order
        b = cum // COMPACT_TARGET_BYTES
        n, tot = expect.get(b, (0, 0))
        expect[b] = (n + 1, tot + sz)
        cum += sz
    assert got == expect


# ---------------------------------------------------------------------------
# ag_linfit bucketing parity on PRE-1996 timestamps (VERDICT r3 #4)
# ---------------------------------------------------------------------------
#
# x = minutes since 1996-01-01 goes NEGATIVE for earlier events; DuckDB
# integer `//` truncates toward zero while Spark F.floor floors, so the
# oracle must use explicit floor() — this test pins that parity on
# randomized timestamps straddling the epoch, end-to-end through the
# hardened catalog entry (portable half-up K=6 wrap included).


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(-3 * 365 * 24 * 60, 3 * 365 * 24 * 60),  # minutes vs 1996
            st.integers(0, 60_000),  # value cents
        ),
        min_size=3,
        max_size=40,
    )
)
def test_ag_linfit_parity_pre_1996(spark, points):
    import tempfile

    import duckdb

    from westtopologies_spark.queries import catalog

    spec = next(s for s in catalog() if s.name == "ag_linfit")
    epoch96 = dt.datetime(1996, 1, 1)
    rows = [
        (i, epoch96 + dt.timedelta(minutes=m, seconds=7), 1, "t", c / 100.0, "x")
        for i, (m, c) in enumerate(points)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as tmp:
        ev.coalesce(1).write.parquet(f"{tmp}/events.parquet")
        sdf = spec.spark(spark, tmp)
        s_rows = sorted(tuple(r) for r in sdf.collect())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp}/events.parquet/*.parquet')"
        )
        d_rows = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
        con.close()
    assert s_rows == d_rows


# ---------------------------------------------------------------------------
# m1_region_topk: fixed-point scorer vs pure-Python reference
# ---------------------------------------------------------------------------


def _py_m1_topk(texts):
    """Pure-Python replica of the fixed-point M1 pipeline (same
    quantized model constants, same char-fold ids, same
    left-associated float chain)."""
    import math

    from westtopologies_spark.ops.model import (
        M1Q_LOG_SCALE,
        M1Q_REGIONS,
        M1Q_RT_SCALE,
        M1Q_TOP_K,
        M1Q_TOPICS,
        M1Q_VOCAB,
        det_exp_py,
        quantized_model,
    )
    from westtopologies_spark.scale import constants as C

    log_tw_q, log_pi_q, rt_q = quantized_model()
    out = []
    for doc_id, text in texts:
        toks = [t for t in text.split(" ") if len(t) > 1]
        tids = []
        for t in toks:
            a = 0
            for ch in t:
                a = (a * C.FP_MULT + ord(ch)) % C.SHINGLE_P
            tids.append(a % M1Q_VOCAB)
        n = len(tids)
        if n < 1:
            continue
        lt = [
            log_pi_q[k] * n + sum(log_tw_q[k][t] for t in tids)
            for k in range(M1Q_TOPICS)
        ]
        m = max(lt)
        # deterministic exp (ADVICE r4): same exactly-rounded IEEE
        # chain as both engines, not CPython's libm exp
        es = [det_exp_py((x - m) / (float(M1Q_LOG_SCALE) * n)) for x in lt]
        sc = []
        for l in range(M1Q_REGIONS):
            s = rt_q[l][0] * es[0]
            for k in range(1, M1Q_TOPICS):
                s = s + rt_q[l][k] * es[k]
            sc.append(s)
        tot = sc[0]
        for l in range(1, M1Q_REGIONS):
            tot = tot + sc[l]
        probs = [s / tot for s in sc]
        ranked = sorted(range(M1Q_REGIONS), key=lambda l: (-probs[l], l))
        for r, l in enumerate(ranked[:M1Q_TOP_K], start=1):
            out.append(
                (doc_id, r, l, int(math.floor(probs[l] * M1Q_RT_SCALE + 0.5)))
            )
    return sorted(out)


@SET
@given(
    st.lists(
        st.text(
            # éü日 pin codepoint-level char-fold parity (ADVICE r4)
            alphabet=st.sampled_from("abcdefgh XYZ'#@éü日"),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_m1_region_topk_matches_python(spark, texts):
    import tempfile

    from westtopologies_spark.queries import catalog

    spec = next(s for s in catalog() if s.name == "m1_region_topk")
    rows = [(i, t, "en", "src") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    with tempfile.TemporaryDirectory() as tmp:
        docs.coalesce(1).write.parquet(f"{tmp}/documents.parquet")
        got = sorted(tuple(r) for r in spec.spark(spark, tmp).collect())
    assert got == _py_m1_topk([(i, t) for i, t in enumerate(texts)])


# ---------------------------------------------------------------------------
# ts_sessionize / tp_pack_sequences vs pure-Python references
# (the two longest-red driver entries — HUGEINT-fixed in round 4)
# ---------------------------------------------------------------------------


def _py_sessionize(rows, gap_s):
    """rows: (event_id, user_id, sec, cents). Replays the hardened
    catalog semantics: per user in (ts, event_id) order, new session
    on gap > gap_s, exact cent sums."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, uid, sec, cents in rows:
        by_user[uid].append((sec, eid, cents))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for sec, _eid, cents in evs:
            if prev is None or sec - prev > gap_s:
                sid += 1
            key = (uid, sid)
            lo, hi, n, s = out.get(key, (sec, sec, 0, 0))
            out[key] = (min(lo, sec), max(hi, sec), n + 1, s + cents)
            prev = sec
    return sorted(
        (u, sid, lo, hi, n, s) for (u, sid), (lo, hi, n, s) in out.items()
    )


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 8000),  # seconds offset (gap 1800s)
            st.integers(0, 50_000),  # value cents
        ),
        min_size=1,
        max_size=50,
    )
)
def test_ts_sessionize_matches_python(spark, events):
    import tempfile

    from westtopologies_spark.queries import catalog
    from westtopologies_spark.scale.temporal import SESSION_GAP_S

    spec = next(s for s in catalog() if s.name == "ts_sessionize")
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=sec), uid, "t", cents / 100.0, "x")
        for i, (uid, sec, cents) in enumerate(events)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as tmp:
        ev.coalesce(1).write.parquet(f"{tmp}/events.parquet")
        got = sorted(tuple(r) for r in spec.spark(spark, tmp).collect())
    base_sec = int(base.timestamp())
    expect = [
        (u, sid, base_sec + lo, base_sec + hi, n, s)
        for (u, sid, lo, hi, n, s) in _py_sessionize(
            [(i, uid, sec, cents) for i, (uid, sec, cents) in enumerate(events)],
            SESSION_GAP_S,
        )
    ]
    assert got == expect


@SET
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),  # source shard
            st.integers(0, 120),  # token count per doc
        ),
        min_size=1,
        max_size=40,
    )
)
def test_tp_pack_sequences_matches_python(spark, docs):
    import tempfile

    from westtopologies_spark.queries import catalog
    from westtopologies_spark.scale import trainprep as TP

    spec = next(s for s in catalog() if s.name == "tp_pack_sequences")
    b = TP.PACK_BUDGET
    # n tokens == len(text.split(' ')): k words -> k tokens (k >= 1;
    # an empty text still splits to one empty token, matching both
    # engines' string_split semantics)
    rows = [
        (i, " ".join(["w"] * max(k, 1)) if k > 0 else "", src, src)
        for i, (src, k) in enumerate(docs)
    ]
    ddf = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    with tempfile.TemporaryDirectory() as tmp:
        ddf.coalesce(1).write.parquet(f"{tmp}/documents.parquet")
        got = sorted(tuple(r) for r in spec.spark(spark, tmp).collect())
    from collections import defaultdict

    per_bin = defaultdict(lambda: [0, 0])
    cum = defaultdict(int)
    for i, (src, k) in enumerate(docs):  # doc_id order == index order
        n_tok = max(k, 1) if k > 0 else 1  # ''.split(' ') -> ['']
        start = cum[src]
        bin_id = start // b
        per_bin[(src, bin_id)][0] += 1
        per_bin[(src, bin_id)][1] += n_tok
        cum[src] = start + n_tok
    expect = sorted(
        (src, bid, n, s, s * 10000 // b)
        for (src, bid), (n, s) in per_bin.items()
    )
    assert got == expect


# ---------------------------------------------------------------------------
# deterministic exp/ln (rule 17): accuracy vs libm + engine parity
# ---------------------------------------------------------------------------


@given(st.floats(min_value=-40.0, max_value=0.0))
def test_det_exp_accuracy(x):
    import math

    import pytest

    from westtopologies_spark.ops.model import det_exp_py

    got, ref = det_exp_py(x), math.exp(x)
    assert got == pytest.approx(ref, rel=1e-14)


@given(st.floats(min_value=0.01, max_value=1e6))
def test_det_ln_accuracy_and_roundtrip(x):
    import math

    import pytest

    from westtopologies_spark.ops.model import det_exp_py, det_ln_py

    got, ref = det_ln_py(x), math.log(x)
    assert got == pytest.approx(ref, abs=1e-13, rel=1e-13)
    assert det_exp_py(min(det_ln_py(x), 0.0)) == pytest.approx(
        min(x, 1.0), rel=1e-12
    )


def test_det_ln_matches_spark_sql(spark):
    """The staged det-ln SQL on Spark equals the CPython replica
    BITWISE (the whole point: one chain, three runtimes)."""
    from westtopologies_spark.ops.model import det_ln_py, det_ln_stages

    vals = [0.01, 0.99, 1.0, 1.5, 2.0, 123.45, 99999.99, 3.14159]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    for name, sql in det_ln_stages("x", "l"):
        df = df.withColumn(name, __import__("pyspark.sql.functions", fromlist=["expr"]).expr(sql))
    got = {r["x"]: r["lln"] for r in df.collect()}
    for v in vals:
        assert got[v] == det_ln_py(v), v
