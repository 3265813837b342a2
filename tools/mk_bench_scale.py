#!/usr/bin/env python3
"""Merge a scaled-replica Bench run with a same-code sf0.1 run into a
BENCH_sfN.json artifact: per-query seconds at both scales, the ratio,
a per-query ratio BUDGET, and the flagged_super_linear gate.

Usage: mk_bench_scale.py <bench_big_raw.json> <bench_base_raw.json>
                         <out> <factor>

Default budget: at fixed local[32] parallelism, FACTORx data should
cost <= FACTORx plus shuffle/spill overhead -> budget ratio is
1.2*FACTOR, and a flag additionally requires the big side to cost
>= 2 s (sub-second baselines are noise-dominated: the JVM/scheduling
floor is ~0.1-0.3 s, so a 0.2 s -> 2.5 s "12.5x" at 10x is floor
arithmetic, not a scaling pathology).

Per-query OVERRIDES document the cases where the honest budget is not
linear-in-data, with the reason recorded in the artifact itself so a
reader never mistakes an exemption for an oversight.
"""
import json
import sys


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from bench_common import prelaunch_of, assert_idle, steal_of

# name -> (budget_ratio_fn(factor), reason)
OVERRIDES = {
    # The TRUE answer is Theta(n^2): the synthetic embeddings are
    # isotropic with a ~5e-4 base rate of cos >= 0.4, so found pairs
    # grow quadratically (r12 100x probe: 154 -> 1.75M pairs while
    # per-found-pair cost FELL ~70x). No algorithm is sub-quadratic on
    # this corpus at this threshold; budget the ANSWER, not the plan.
    "q_sim_neardup_lsh": (lambda f: 1.2 * f * f,
                          "answer-bound: found-pair count is Theta(n^2) "
                          "on the isotropic corpus (ROUND_NOTES r12 #5)"),
}


def main():
    big = json.load(open(sys.argv[1]))
    base = json.load(open(sys.argv[2]))
    out_path = sys.argv[3]
    factor = float(sys.argv[4])
    # artifact-hygiene guards (VERDICT r13 wrong #1): the base side must
    # actually be the sf0.1 run (not a replica run passed in the wrong
    # position), the big side must be a DIFFERENT dir, and neither may
    # be a SPARK_GRAFT_BENCH_QUERIES subset run
    assert base.get("sf") == "/root/testdata/sf0.1", \
        f"base artifact sf={base.get('sf')!r}, expected /root/testdata/sf0.1"
    assert big.get("sf") != base.get("sf"), \
        "big and base artifacts declare the same sf dir"
    for name, r in (("big", big), ("base", base)):
        assert not r.get("subset"), f"{name} artifact is a subset run"
        # ratios from a contended machine are not scaling evidence.
        # Prefer loadavg_prelaunch (tools/run_bench.sh records it before
        # the JVM starts; must be near-idle). loadavg_start is read
        # AFTER the ~30 s 32-thread warm-up, which alone lifts the
        # 1-min figure to ~2-4 on an idle box, so its fallback bound is
        # lenient — it exists to catch co-tenant storms (15+), not
        # self-warmup. GRAFT_BENCH_ALLOW_LOAD=1 overrides (debug only).
        # VERDICT r16 next #3: the BENCH_FULL idle discipline (< 1.1)
        # applies to the replica ratio runs too — r16's 100x ratio rose
        # 5.28 -> 6.41 on UNCHANGED plans purely from run conditions.
        # For min-merged inputs every contributing run must be idle.
        # ADVICE r19: guard hoisted into bench_common.assert_idle so
        # runs-key presence uses the SAME is-not-None rule as
        # prelaunch_of provenance.
        assert_idle(name, r, pre_bound=1.1)
    qa, qb = big["queries"], base["queries"]
    rows = {}
    flagged = []
    for name in sorted(qa):
        sN, s0 = qa[name], qb.get(name)
        ratio = round(sN / s0, 2) if s0 else None
        budget_fn, reason = OVERRIDES.get(
            name, (lambda f: 1.2 * f, None))
        budget = round(budget_fn(factor), 1)
        rows[name] = {"big_sec": round(sN, 3),
                      "sf01_sec": round(s0, 3) if s0 is not None else None,
                      "ratio": ratio, "budget": budget}
        if reason:
            rows[name]["budget_reason"] = reason
        if ratio is not None and ratio > budget and sN >= 2.0:
            flagged.append(name)
    out = {
        "metric": f"total_x{int(factor)}",
        "value": big["value"],
        "unit": "sec",
        "big_dir": big.get("sf"),
        "factor": factor,
        "sf01_total": base["value"],
        "total_ratio": round(big["value"] / base["value"], 2),
        "loadavg": {"big": [big.get("loadavg_start"), big.get("loadavg_end")],
                    "sf01": [base.get("loadavg_start"),
                             base.get("loadavg_end")]},
        # the untainted idle-gate evidence (VERDICT r16 next #3): the
        # pre-JVM loadavg of EVERY contributing run, as asserted above
        "loadavg_prelaunch": {"big": prelaunch_of(big),
                              "sf01": prelaunch_of(base)},
    "steal_pct": {"big": steal_of(big),
                  "sf01": steal_of(base)},
        "codegen_error_total": [big.get("codegen_error_total"),
                                base.get("codegen_error_total")],
        "errors": [big.get("errors"), base.get("errors")],
        "flag_rule": "ratio > per-query budget (default 1.2*factor) "
                     "and big >= 2s",
        "flagged_super_linear": flagged,
        "queries": rows,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    worst = sorted((r["ratio"], n) for n, r in rows.items()
                   if r["ratio"] is not None)[-10:]
    print(f"total {big['value']:.1f}s vs sf0.1 {base['value']:.1f}s "
          f"(ratio {out['total_ratio']}, factor {factor:g})")
    print("worst ratios:")
    for r, n in reversed(worst):
        print(f"  {n}: {rows[n]['sf01_sec']}s -> {rows[n]['big_sec']}s "
              f"({r}x, budget {rows[n]['budget']}x)")
    print(f"flagged: {flagged}")


if __name__ == "__main__":
    main()
