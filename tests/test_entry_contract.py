"""Driver-contract regression tests for ``__spark_entry__``:
the exact invariants the per-round driver relies on (smoke-run
entry(), queries()/oracle_sql() key discipline, stable entry schema,
and the hash-exact output discipline for window-eligible queries)."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def entry_mod():
    sys.path.insert(0, REPO)
    return importlib.import_module("__spark_entry__")


def test_entry_runs_with_stable_schema(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.columns == [
        "window_start",
        "event_type",
        "n_events",
        "n_users",
        "sum_value",
    ]
    assert len(df.take(5)) > 0


def test_oracle_keys_subset_of_queries(entry_mod):
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    # rows-only entries are the documented model exceptions
    # (ag_hll_distinct graduated to a hard oracle in r5 — the
    # deterministic fixed-hash HLL; ag_approx_percentiles in r7 —
    # the deterministic integer-histogram sketch)
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "m1_predict_locations",
    }


def test_window_queries_have_no_unprecedented_double_outputs(spark, entry_mod):
    """Hash-exact discipline (ORACLE_DISCIPLINE.md round-3 sweep):
    a correctness-window query may only emit double columns if it
    already has a driver value-hash PASS on record (precedent) or is
    rows-only by design (oracle=None — never hashed) — a NEVER-
    driver-checked window entrant with a double output would re-expose
    the ts_sessionize failure class. The rule itself lives in
    queries.py::window_double_offenders and is SHARED with
    tools/preflight.py stage 2 (VERDICT r4 #7)."""
    from westtopologies_spark.queries import window_double_offenders

    assert not window_double_offenders(spark), window_double_offenders(spark)


def test_no_entry_emits_complex_typed_outputs(spark, entry_mod):
    """Primitive-only outputs, CATALOG-WIDE (rows-only entries
    included): the driver's pandas canonicalizer cannot factorize
    array/map/struct values — ag_approx_percentiles' array<double>
    output was the one red r5 row, which proved rows-only entries
    are canonicalized too. Rule lives in
    queries.py::complex_output_offenders, shared with
    tools/preflight.py."""
    from westtopologies_spark.queries import complex_output_offenders

    assert not complex_output_offenders(spark), complex_output_offenders(spark)


@pytest.mark.parametrize(
    "submodule",
    [
        "queries_ext",
        "queries_ext2",
        "queries_ext3",
        "queries_ext4",
        "queries_ext5",
        "queries_ext6",
        "queries_ext7",
        "queries_scale",
        "queries_graph",
    ],
)
def test_submodule_first_import_order(submodule):
    """Importing ANY catalog submodule BEFORE the root queries module
    must still yield the full hardened catalog (regression class: the
    hash-exact sweep used to run at module scope and saw a partial
    _CATALOG; r5 found SEVEN more first-import breaks — eager oracle
    builders importing sibling-submodule helpers at registration time.
    Fixed via lazy-callable oracles + early pure-literal CTE blocks;
    every lazy oracle must resolve to a string at catalog access)."""
    import subprocess

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import westtopologies_spark.%s\n"
        "import westtopologies_spark.queries as q\n"
        "specs = q._ordered()\n"
        "assert len(specs) >= 181, len(specs)\n"
        "assert all(isinstance(s.oracle, (str, type(None))) for s in specs)\n"
        "assert any('_x1e' in (s.oracle or '')\n"
        "           for s in specs if s.name == 'ag_pivot')\n"
        "print('ok')\n" % (REPO, submodule)
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout


def test_bench_contract_line_is_one_compact_json_line():
    """BENCH_r03.json came back parsed:null — the full per-query map
    overflowed the driver's stdout capture.  Pin the contract: one
    line, valid JSON, required keys, bounded size, even with every
    catalog entry present in the timing map."""
    import json
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench
    from westtopologies_spark.queries import catalog

    timings = {s.name: 123.456 for s in catalog()}
    line = bench.contract_line(timings, 999.9, 0.1)
    assert "\n" not in line
    assert len(line) <= bench.CONTRACT_LINE_MAX_BYTES
    parsed = json.loads(line)
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf"}
    assert parsed["queries"]  # non-empty headline subset
    assert set(parsed["queries"]) <= set(timings)
    # graceful degradation (ADVICE r4): pathological timing values must
    # trim the headline map, not crash after the timed suite already ran
    fat = {s.name: 1.23456789e12 for s in catalog()}
    fat_line = bench.contract_line(fat, 9.9e12, 0.1)
    assert len(fat_line) <= bench.CONTRACT_LINE_MAX_BYTES
    assert json.loads(fat_line)["metric"] == "catalog_suite_wall_clock"


def test_bench_regression_gate_flags_r5_shape():
    """tools/bench_regress.py (VERDICT r5 #3) must flag the exact
    r4->r5 per-query collapse it was built for, scale thresholds by
    the canary's ambient-load ratio, and stay quiet on a uniformly
    slower machine."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_regress", os.path.join(REPO, "tools", "bench_regress.py")
    )
    br = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(br)
    base = {
        "p5_derived_flag": 0.231,
        "ann_ivf_topk": 3.9,
        "dd_embedding_neardup": 6.2,
        "x2_tokenize": 0.5,
        "tiny": 0.2,
    }
    cand = {
        "p5_derived_flag": 0.262,
        "ann_ivf_topk": 40.7,
        "dd_embedding_neardup": 92.4,
        "x2_tokenize": 0.55,
        "tiny": 0.8,  # 4x but sub-floor: timer noise, never a flag
    }
    flags, ratio = br.compare(base, cand)
    assert {f[0] for f in flags} == {"ann_ivf_topk", "dd_embedding_neardup"}
    assert 1.0 < ratio < 1.3
    # ambient slowdown (everything 2x, canary included) is not rot
    flags2, _ = br.compare(base, {k: v * 2 for k, v in base.items()})
    assert not flags2
    # queries on only one side are informational, never flagged
    flags3, _ = br.compare(base, {"p5_derived_flag": 0.24, "brand_new": 99.0})
    assert not flags3


def test_pin_list_is_self_maintaining():
    """The driver-window pin head derives from the committed
    CORRECTNESS artifacts: latest-round failures re-check first,
    fix-carrying never-checked entries stay pinned until their first
    driver row, sentinels always present — and every pin is a real
    catalog name inside the 50-entry window."""
    from westtopologies_spark.queries import (
        _PIN_UNTIL_CHECKED,
        _PIN_UNTIL_RECHECKED,
        _SENTINELS,
        _hard_signal_rounds,
        _latest_round_failures,
        _rounds_with_row,
        _top_priority,
        catalog,
    )

    pins = _top_priority()
    names = {s.name for s in catalog()}
    assert set(pins) <= names
    assert len(pins) <= 25  # never starve the rotating backlog
    window = [s.name for s in catalog()[:50]]
    assert window[: len(pins)] == pins
    for s in _SENTINELS:
        assert s in pins
    checked = _hard_signal_rounds()
    for n in _PIN_UNTIL_CHECKED:
        assert (n in pins) == (checked.get(n, 0) == 0)
    rounds = _rounds_with_row()
    for n, after in _PIN_UNTIL_RECHECKED.items():
        assert (n in pins) == (not any(r > after for r in rounds.get(n, ())))
    for n in _latest_round_failures():
        assert n in pins
