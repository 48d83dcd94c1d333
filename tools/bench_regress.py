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
  never flagged (catalog churn is the correctness gate's business).

Exit 0 clean, 1 on any flag.
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
# a real code regression on them still surfaces in the warning text
# and in the committed per-round BENCH_FULL history.
KNOWN_JUMPY = {
    "tx_bpe_train",
    "ann_pq_codes",
    "gr_modularity",
    "tx_gopher_quality",
}


def _load_queries(blob: str | bytes) -> dict[str, float]:
    data = json.loads(blob)
    q = data.get("queries", data)
    return {k: float(v) for k, v in q.items()}


def _stalled_by_probe(blob: str | bytes) -> set[str]:
    """Entries with host-stall evidence from bench.py's per-query
    ambient probes (r7): a probe >3x the run median means the host
    was stalled (hypervisor steal / IO weather) when that entry
    STARTED — implicating it and the entry that ran just before the
    probe. Measured example: ann_rrf_fusion 2.5->60.7s with its probe
    at 6.1x median while every neighbor was flat."""
    import statistics

    data = json.loads(blob)
    probes = data.get("probes") or {}
    if len(probes) < 10:
        return set()
    med = statistics.median(probes.values())
    if med <= 0:
        return set()
    names = list(data.get("queries", probes))
    out: set[str] = set()
    for i, n in enumerate(names):
        if probes.get(n, 0) > 3 * med:
            out.add(n)
            if i > 0:
                out.add(names[i - 1])
    return out


def _baseline_from_git() -> dict[str, float]:
    out = subprocess.run(
        ["git", "show", "HEAD:BENCH_FULL.json"],
        cwd=REPO,
        capture_output=True,
        check=True,
    ).stdout
    return _load_queries(out)


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
            base = _load_queries(f.read())
    else:
        base = _baseline_from_git()
    cand_path = (
        sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_FULL.json")
    )
    with open(cand_path) as f:
        cand_blob = f.read()
    cand = _load_queries(cand_blob)
    stalled = _stalled_by_probe(cand_blob)

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
        f"[{LOAD_RATIO_MIN},{LOAD_RATIO_MAX}]; legacy canary {canary:.3f})"
    )
    if only_base:
        print(f"  (info) missing from candidate: {', '.join(only_base[:10])}")
    if only_cand:
        print(f"  (info) new in candidate: {', '.join(only_cand[:10])}")
    # a host storm outlives a single probe interval (observed: a
    # 60.7s stalled entry followed by an 11.3s inflated successor
    # whose own between-wave probe was flat) — flagged entries
    # CONTIGUOUS with a probe-stalled one inherit its evidence
    names = list(cand)
    flagged_names = {f[0] for f in flags}
    grew = True
    while grew:
        grew = False
        for i, n in enumerate(names):
            if n in flagged_names and n not in stalled:
                if (i > 0 and names[i - 1] in stalled) or (
                    i + 1 < len(names) and names[i + 1] in stalled
                ):
                    stalled.add(n)
                    grew = True
    hard = [f for f in flags if f[0] not in KNOWN_JUMPY and f[0] not in stalled]
    soft = [f for f in flags if f[0] in KNOWN_JUMPY or f[0] in stalled]
    for name, b, c, norm in soft:
        why = (
            "host-stall evidence (ambient probe >3x median)"
            if name in stalled
            else "known-variance pin, BASELINE.md"
        )
        print(f"  (warn) {name:30s} {b:8.2f}s -> {c:8.2f}s  ({norm:.1f}x) {why}")
    if not hard:
        print(
            f"clean: no query above {REGRESS_X}x its load-normalized "
            f"baseline (floor {ABS_FLOOR_SEC}s, min delta {MIN_DELTA_SEC}s"
            f"{'; ' + str(len(soft)) + ' known-variance warnings' if soft else ''})"
        )
        return 0
    print(f"FLAGGED {len(hard)} queries (> {REGRESS_X}x normalized baseline):")
    for name, b, c, norm in hard:
        print(f"  {name:30s} {b:8.2f}s -> {c:8.2f}s  ({norm:.1f}x)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
