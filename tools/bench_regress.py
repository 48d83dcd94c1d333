"""Per-query bench regression gate (VERDICT r5 #3).

Round 5's bench went 324.8 s -> 570.5 s with a GREEN 49/50
correctness file — perf rot arrived silently alongside healthy
correctness pins. This tool is the perf analogue of the pin list:
compare a fresh BENCH_FULL.json against the previous round's
committed one, load-normalized, and fail on >3x per-query
regressions that also cost >2.5 s of real wall-clock (the r6
calibration: clean same-code runs show ~2x noise on 1-4 s entries,
the real failure class is 4-15x on multi-second ones).

    python tools/bench_regress.py [baseline.json] [candidate.json]

Defaults: baseline = `git show HEAD:BENCH_FULL.json` (the last
committed record — after the round lands its bench, HEAD carries the
round-N numbers for round N+1 to gate against); candidate =
./BENCH_FULL.json on disk (written by the bench.py run you just did).

Rules:
- the ambient-load normalizer is the MEDIAN candidate/baseline ratio
  over the stable multi-second shared entries (baseline >=
  STABLE_BASE_SEC), clamped to [0.5, 2.0] — NOT a single sub-second
  canary entry, whose own noise or co-regression would multiply
  every threshold and mask exactly the 4-9x collapses the gate
  exists for (ADVICE r6). A median over dozens of entries is robust
  to a minority victim set; the upward clamp enforces the bench
  contract (benches run SOLO — ambient beyond 2x means re-run on an
  idle box, not auto-forgive the whole suite). The legacy canary
  ratio is still printed for continuity with the driver's records;
- only queries whose candidate time exceeds ABS_FLOOR_SEC are
  eligible (sub-second entries are timer noise);
- a query flags when candidate > REGRESS_X * baseline * load_ratio
  and the normalized delta exceeds MIN_DELTA_SEC;
- queries present on only one side are reported informationally,
  never flagged (catalog churn is the correctness gate's business);
- flags downgrade to warnings on per-entry stall evidence (either
  probe family — Python host tracer or JVM Spark-job tracer — >3x
  the run median, one corroborated hop of inheritance), on a
  KNOWN_JUMPY pin up to its absolute ceiling, or when the RUN shows
  suite-wide load evidence (canary >= 3x AND >= 15% of stable
  entries > 2.5x) — in which case the record cannot gate and the
  output says to re-run solo (VERDICT r7 #1: the driver's 666s
  run with a 6.4x canary and flat Python probes must classify as
  load-not-regression mechanically).

Exit 0 clean, 1 on any hard flag.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CANARY = "p5_derived_flag"
# Calibration (r6, measured): clean idle same-code runs show ~2x
# run-to-run variance on 1-4s entries (catalog-position, codegen-cold
# and straggler effects), while the real failure class this gate
# exists for — the r5 ContextCleaner collapse — is 4-15x on multi-
# second entries. 3x + a 2.5s minimum absolute delta separates the
# two cleanly: the r5 victims (ann_ivf_topk 9.2x/+37s,
# dd_embedding_neardup 13.1x/+86s, emb_quantize 6.7x/+15s) all flag;
# an 11-entry 2x-drift list from a healthy 422s run does not.
REGRESS_X = 3.0
ABS_FLOOR_SEC = 1.5
# a regression also needs to cost real wall-clock, not just ratio:
# 0.4s -> 1.6s is 4x but irrelevant to a 500s suite
MIN_DELTA_SEC = 2.5
# entries feeding the median load normalizer: stable multi-second
# baselines only (sub-2s entries are the timer-noise class)
STABLE_BASE_SEC = 2.0
LOAD_RATIO_MIN, LOAD_RATIO_MAX = 0.5, 2.0
# median needs a quorum; below it fall back to the legacy canary
STABLE_QUORUM = 5
# Known-variance pins (BASELINE.md round-7 "jumpy class"): iterative /
# codegen-compile-bound kernels whose COLD first run is 4-10x their
# warm time and whose in-suite slot is always cold — isolated warm
# numbers pinned in BASELINE.md (bpe ~5s, modularity ~5.6s, pq_codes
# ~5s, gopher ~1.5s). Their flags print as warnings, not failures —
# UP TO the per-entry absolute ceiling (r8, ADVICE r7: an unbounded
# pin means genuine rot on these four can never fail the gate). The
# ceilings are ~1.5x the worst CLEAN cold number ever measured
# (BASELINE.md: bpe 27.9s, modularity 22.9s, pq_codes 20.3s, gopher
# 9.0s); a candidate above its ceiling flags HARD like any entry.
KNOWN_JUMPY = {
    "tx_bpe_train": 42.0,
    "ann_pq_codes": 30.0,
    "gr_modularity": 35.0,
    "tx_gopher_quality": 14.0,
}

# Suite-load classifier (r8, VERDICT r7 #1): the driver's r7 run
# (666.6s, canary 6.4x) carried heterogeneous JVM-side contention the
# flat pure-Python probes could not see, so per-entry stall evidence
# missed real victims and three load artifacts flagged hard. When the
# RUN ITSELF shows suite-wide load evidence — the fixed trivial
# canary query several-x slow AND a broad fraction of stable entries
# inflated — hard flags downgrade to "suite-load" warnings and the
# gate exits clean with an explicit re-run-solo instruction. Both
# conditions must hold: a genuine single-entry regression never moves
# the canary, and a genuine suite-wide code regression that somehow
# inflated the canary would still show up on the mandated solo
# re-run (the bench contract: gates are taken on solo runs).
SUITE_LOAD_CANARY_X = 3.0
SUITE_LOAD_ENTRY_X = 2.5
SUITE_LOAD_FRACTION = 0.15
# probe elevation thresholds: >3x the run median = direct stall
# evidence; >=1.5x = corroborating evidence for one-hop inheritance
PROBE_STALL_X = 3.0
PROBE_CORROBORATE_X = 1.5


def _load_queries(blob: str | bytes) -> dict[str, float]:
    data = json.loads(blob)
    q = data.get("queries", data)
    return {k: float(v) for k, v in q.items()}


def _probe_elevation(blob: str | bytes) -> dict[str, float]:
    """Per-entry ambient elevation: for each query, the MAX of its
    probe/run-median ratio across both probe families — the pure-
    Python host tracer ("probes") and the JVM-visible Spark-job
    tracer ("jprobes", r8). Either family elevated counts: the host
    tracer sees hypervisor steal / IO weather the JVM rides out, the
    JVM tracer sees GC pauses and executor-pool contention a 5ms
    GIL-held loop never feels (the driver's r7 blind spot)."""
    import statistics

    data = json.loads(blob)
    out: dict[str, float] = {}
    for key in ("probes", "jprobes"):
        fam = data.get(key) or {}
        if len(fam) < 10:
            continue
        med = statistics.median(fam.values())
        if med <= 0:
            continue
        for n, v in fam.items():
            r = v / med
            if r > out.get(n, 0.0):
                out[n] = r
    return out


def _stalled_by_probe(blob: str | bytes) -> set[str]:
    """Entries with DIRECT stall evidence: a probe >PROBE_STALL_X the
    run median means the host/JVM was stalled when that entry STARTED
    — implicating it and the entry that ran just before the probe.
    Measured example: ann_rrf_fusion 2.5->60.7s with its probe at
    6.1x median while every neighbor was flat."""
    data = json.loads(blob)
    elev = _probe_elevation(blob)
    names = list(data.get("queries", elev))
    out: set[str] = set()
    for i, n in enumerate(names):
        if elev.get(n, 0.0) > PROBE_STALL_X:
            out.add(n)
            if i > 0:
                out.add(names[i - 1])
    return out


def _cal_ratio(base_blob: str | bytes | None, cand_blob: str | bytes) -> float:
    """Candidate/baseline host-speed ratio from the absolute run
    anchors (``cal``: {"start"/"end": {"py_ms", ...}}, written by
    bench.py since r8). >1 means the candidate ran on a slower host.
    Returns 1.0 when either side lacks anchors (older records)."""
    def anchors(blob):
        try:
            cal = json.loads(blob).get("cal") or {}
        except (TypeError, ValueError):
            return None
        vals = [v.get("py_ms") for v in cal.values() if isinstance(v, dict)]
        vals = [v for v in vals if v]
        return (sum(vals) / len(vals)) if vals else None

    b = anchors(base_blob) if base_blob is not None else None
    c = anchors(cand_blob)
    if not b or not c:
        return 1.0
    return c / b


# a candidate whose absolute host anchor is this much slower than the
# baseline's ran in a host slow-mode window — the whole record is
# weather (measured 2026-08-17: 2.6-3.1x at near-zero load)
CAL_SLOW_HOST_X = 2.0


def _suite_load_evidence(
    base: dict[str, float], cand: dict[str, float]
) -> tuple[bool, float, float]:
    """(is_loaded, canary_ratio, inflated_fraction) — see the
    SUITE_LOAD_* constants for the rule and its rationale."""
    canary = (
        cand[CANARY] / base[CANARY]
        if base.get(CANARY, 0) > 0 and cand.get(CANARY, 0) > 0
        else float("nan")
    )
    stable = [
        cand[n] / b
        for n, b in base.items()
        if b >= STABLE_BASE_SEC and cand.get(n, 0) > 0
    ]
    frac = (
        sum(1 for r in stable if r > SUITE_LOAD_ENTRY_X) / len(stable)
        if stable
        else 0.0
    )
    loaded = (
        len(stable) >= STABLE_QUORUM
        and canary >= SUITE_LOAD_CANARY_X
        and frac >= SUITE_LOAD_FRACTION
    )
    return loaded, canary, frac


def _load_ratio(
    base: dict[str, float], cand: dict[str, float]
) -> tuple[float, int]:
    """Ambient-load normalizer: median cand/base ratio over the
    stable multi-second shared entries, clamped (see module doc);
    returns (ratio, n_stable_entries).  Falls back to the legacy
    single-entry canary when the stable set is below quorum."""
    import statistics

    ratios = [
        cand[n] / b
        for n, b in base.items()
        if b >= STABLE_BASE_SEC and cand.get(n, 0) > 0
    ]
    if len(ratios) >= STABLE_QUORUM:
        raw = statistics.median(ratios)
    elif base.get(CANARY, 0) > 0 and cand.get(CANARY, 0) > 0:
        raw = cand[CANARY] / base[CANARY]
    else:
        raw = 1.0
    return min(max(raw, LOAD_RATIO_MIN), LOAD_RATIO_MAX), len(ratios)


def compare(
    base: dict[str, float], cand: dict[str, float]
) -> tuple[list[tuple[str, float, float, float]], float]:
    """Returns (flags, load_ratio); each flag is
    (name, base_sec, cand_sec, normalized_ratio)."""
    ratio, _ = _load_ratio(base, cand)
    flags = []
    for name, c in cand.items():
        b = base.get(name)
        if b is None or b <= 0:
            continue
        if c < ABS_FLOOR_SEC or (c - b * ratio) < MIN_DELTA_SEC:
            continue
        norm = c / (b * ratio)
        if norm > REGRESS_X:
            flags.append((name, b, c, norm))
    flags.sort(key=lambda f: -f[3])
    return flags, ratio


def main() -> int:
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            base_blob: str | bytes = f.read()
    else:
        base_blob = subprocess.run(
            ["git", "show", "HEAD:BENCH_FULL.json"],
            cwd=REPO,
            capture_output=True,
            check=True,
        ).stdout
    base = _load_queries(base_blob)
    cand_path = (
        sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_FULL.json")
    )
    with open(cand_path) as f:
        cand_blob = f.read()
    cand = _load_queries(cand_blob)
    stalled = _stalled_by_probe(cand_blob)
    cal_r = _cal_ratio(base_blob, cand_blob)

    flags, ratio = compare(base, cand)
    _, n_stable = _load_ratio(base, cand)
    canary = (
        cand[CANARY] / base[CANARY]
        if base.get(CANARY, 0) > 0 and cand.get(CANARY, 0) > 0
        else float("nan")
    )
    only_base = sorted(set(base) - set(cand))
    only_cand = sorted(set(cand) - set(base))
    print(
        f"bench regression gate: {len(cand)} candidate queries vs "
        f"{len(base)} baseline; load ratio {ratio:.3f} "
        f"(median of {n_stable} stable entries, clamped "
        f"[{LOAD_RATIO_MIN},{LOAD_RATIO_MAX}]; legacy canary {canary:.3f}; "
        f"host cal ratio {cal_r:.2f})"
    )
    if only_base:
        print(f"  (info) missing from candidate: {', '.join(only_base[:10])}")
    if only_cand:
        print(f"  (info) new in candidate: {', '.join(only_cand[:10])}")
    # a host storm outlives a single probe interval (observed: a
    # 60.7s stalled entry followed by an 11.3s inflated successor
    # whose own between-wave probe was flat) — a flagged entry
    # ADJACENT to a directly-stalled one inherits its evidence, but
    # (r8, ADVICE r7) only ONE hop from a DIRECT stall and only if
    # the inheritor's own probe shows at least mild elevation: the
    # old transitive loop let a chain of real regressions clustered
    # in catalog order be entirely forgiven by one noisy probe.
    names = list(cand)
    flagged_names = {f[0] for f in flags}
    elev = _probe_elevation(cand_blob)
    direct = set(stalled)
    for i, n in enumerate(names):
        if (
            n in flagged_names
            and n not in direct
            and elev.get(n, 0.0) >= PROBE_CORROBORATE_X
            and (
                (i > 0 and names[i - 1] in direct)
                or (i + 1 < len(names) and names[i + 1] in direct)
            )
        ):
            stalled.add(n)
    # a KNOWN_JUMPY pin forgives cold-compile variance only up to its
    # absolute ceiling (r8, ADVICE r7) — above it, the pin expires
    # and the entry flags hard like any other
    loaded, l_canary, l_frac = _suite_load_evidence(base, cand)
    slow_host = cal_r >= CAL_SLOW_HOST_X
    hard, soft = [], []
    for f in flags:
        name, _, c, _ = f
        if name in stalled:
            soft.append((f, "host-stall evidence (ambient probe >3x median)"))
        elif name in KNOWN_JUMPY and c <= KNOWN_JUMPY[name]:
            soft.append(
                (f, f"known-variance pin <= {KNOWN_JUMPY[name]:.0f}s ceiling")
            )
        elif loaded:
            soft.append(
                (
                    f,
                    f"suite-load evidence (canary {l_canary:.1f}x, "
                    f"{l_frac:.0%} of stable entries >"
                    f"{SUITE_LOAD_ENTRY_X}x) — re-run solo to gate",
                )
            )
        elif slow_host:
            soft.append(
                (
                    f,
                    f"slow-host anchor (candidate cal {cal_r:.1f}x "
                    "baseline) — re-run when the host recovers",
                )
            )
        else:
            hard.append(f)
    for (name, b, c, norm), why in soft:
        print(f"  (warn) {name:30s} {b:8.2f}s -> {c:8.2f}s  ({norm:.1f}x) {why}")
    if loaded:
        print(
            f"LOADED RUN: suite-wide ambient-load evidence (canary "
            f"{l_canary:.1f}x, {l_frac:.0%} of stable entries >"
            f"{SUITE_LOAD_ENTRY_X}x baseline) — this record cannot gate; "
            "re-run the bench solo on an idle box"
        )
    if slow_host:
        print(
            f"SLOW-HOST RUN: candidate's absolute host anchor is "
            f"{cal_r:.1f}x the baseline's (cal.py_ms) — the whole record "
            "is host weather; re-run when the host recovers"
        )
    if not hard:
        print(
            f"clean: no query above {REGRESS_X}x its load-normalized "
            f"baseline (floor {ABS_FLOOR_SEC}s, min delta {MIN_DELTA_SEC}s"
            f"{'; ' + str(len(soft)) + ' downgraded warnings' if soft else ''})"
        )
        return 0
    print(f"FLAGGED {len(hard)} queries (> {REGRESS_X}x normalized baseline):")
    for name, b, c, norm in hard:
        print(f"  {name:30s} {b:8.2f}s -> {c:8.2f}s  ({norm:.1f}x)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
