#!/usr/bin/env python3
"""Merge a 10x-SKEWED-replica Bench run (ScaleTestdata skew mode:
Zipf doc lengths + boilerplate chrome + LSH mega-code) with a
same-code sf0.1 run and a GuardProbe census into BENCH_sf1_skew.json.

The artifact's claim is NOT linear scaling — the skew exists to force
the hot-bucket guards onto their tier-2/3 branches on DATA (the probe
numbers record the cap crossings) — so per-query budgets carry
answer-bound overrides for the families whose TRUE answer the skew
inflates, with the reason recorded in the artifact.

Usage: mk_bench_skew.py <bench_skew_raw.json> <bench_sf01_raw.json>
                        <guard_probe.json> <out>
"""
import json
import sys


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from bench_common import prelaunch_of, assert_idle, steal_of

# name -> (budget_ratio, reason). Default budget mirrors mk_bench_sf1:
# 12x for 10x data, flag needs big >= 2 s.
OVERRIDES = {
    "q_dedup_simhash": (
        200,
        "answer-bound: the sqrt-scaled menu plant that pushes the modal "
        "band bucket past the 8192 cap also creates ~1e5-1e6 genuine "
        "hamming<=8 pairs (uniform per-bit flip ~0.19 -> per-pair "
        "disagreement 0.31, P(h<=8) ~ 4e-4 over C(45k,2))"),
    "q_dedup_ngram": (
        100,
        "answer-bound: chrome grams raise jaccard between same-band "
        "docs; qualifying pairs grow with the planted block"),
    "q_sim_neardup_lsh": (
        1000,
        "answer-bound: the LSH mega-code plant is ~2.5k jittered copies "
        "of one direction (cos ~ 0.9997) -> C(2.5k,2) ~ 3.1M genuine "
        "pair rows; the bounded q_sim_neardup_topk stays at n*k"),
    "q_dedup_cluster": (
        100,
        "answer-bound: consumes the inflated near-dup edge set"),
    "q_dedup_minhash": (
        100,
        "answer-bound: chrome grams raise banded-jaccard candidates "
        "and qualifying pairs on the planted band"),
    "q_dedup_minhash_k2": (
        100,
        "answer-bound: the same chrome band blow-up as q_dedup_minhash "
        "amplified by the k=2 predicate (less-discriminative 2-gram "
        "shingles -> more band collisions AND more genuinely "
        "qualifying J>=0.8 pairs; the dial's DEDUP_QUALITY curve and "
        "the skew pair census record both). Production guidance for "
        "chrome corpora is to de-chrome first — the composed "
        "q_dedup_pipeline does, and holds ~4x here"),
    "q_span_dedup": (
        50,
        "answer-bound: chrome/menu spans repeat corpus-wide, so the "
        "covered-position rebuild touches most planted docs"),
    "q_dedup_exact": (
        50,
        "answer-bound: Zipf repetition multiplies text volume ~1.5x "
        "and hash-groupBy cost follows bytes, not rows"),
    "q_decontaminate": (
        50,
        "answer-bound: the chrome plant genuinely contaminates every "
        "planted train doc against every planted bench doc, so the "
        "(train, bench) distinct pair set — which n_bench_docs must "
        "materialize exactly — is ~40M rows; the gram-stats branch "
        "stays linear (see TextQueries.decontaminate r14 notes)"),
    "q_lang_id_ngram": (
        30,
        "volume-bound: Zipf repetition + boilerplate raise corpus "
        "chars ~2x and the per-doc gram arrays follow chars"),
}


def main():
    skewed = json.load(open(sys.argv[1]))
    base = json.load(open(sys.argv[2]))
    guard = json.load(open(sys.argv[3]))
    out_path = sys.argv[4]
    assert base.get("sf") == "/root/testdata/sf0.1", \
        f"base artifact sf={base.get('sf')!r}, expected /root/testdata/sf0.1"
    assert skewed.get("sf") != base.get("sf"), \
        "skewed and base artifacts declare the same sf dir"
    assert guard.get("dir") == skewed.get("sf"), \
        "guard probe ran on a different dir than the skewed bench"
    for name, r in (("skewed", skewed), ("base", base)):
        assert not r.get("subset"), f"{name} artifact is a subset run"
        # ratios from a contended machine are not scaling evidence.
        # Prefer loadavg_prelaunch (tools/run_bench.sh records it before
        # the JVM starts; must be near-idle). loadavg_start is read
        # AFTER the ~30 s 32-thread warm-up, which alone lifts the
        # 1-min figure to ~2-4 on an idle box, so its fallback bound is
        # lenient — it exists to catch co-tenant storms (15+), not
        # self-warmup. GRAFT_BENCH_ALLOW_LOAD=1 overrides (debug only).
        # r20: shared guard (bench_common.assert_idle) — the old
        # scalar-only copy ignored a min-merged input's per-run list.
        assert_idle(name, r, pre_bound=2.0)
    # the probe numbers ARE the point: refuse to publish an artifact
    # whose replica did not actually cross the caps
    for fam in ("simhash", "ngram", "lsh"):
        k, cap = f"{fam}_max_{'bucket' if fam == 'simhash' else 'block' if fam == 'ngram' else 'code'}", f"{fam}_cap"
        assert guard[k] > guard[cap], \
            f"{fam} guard did not engage: {k}={guard[k]} <= cap {guard[cap]}"
    qa, qb = skewed["queries"], base["queries"]
    rows = {}
    flagged = []
    for name in sorted(qa):
        sN, s0 = qa[name], qb.get(name)
        ratio = round(sN / s0, 2) if s0 else None
        budget, reason = OVERRIDES.get(name, (12, None))
        rows[name] = {"skew_sec": round(sN, 3),
                      "sf01_sec": round(s0, 3) if s0 is not None else None,
                      "ratio": ratio, "budget": budget}
        if reason:
            rows[name]["budget_reason"] = reason
        if ratio is not None and ratio > budget and sN >= 2.0:
            flagged.append(name)
    out = {
        "metric": "total_sf1_skew",
        "value": skewed["value"],
        "unit": "sec",
        "skew_dir": skewed.get("sf"),
        "sf01_total": base["value"],
        "total_ratio": round(skewed["value"] / base["value"], 2),
        "guard_census": guard,
        "loadavg": {"skew": [skewed.get("loadavg_start"),
                             skewed.get("loadavg_end")],
                    "sf01": [base.get("loadavg_start"),
                             base.get("loadavg_end")]},
        # pre-JVM loadavg of every contributing run (idle-gate evidence)
        "loadavg_prelaunch": {"skew": prelaunch_of(skewed),
                              "sf01": prelaunch_of(base)},
    "steal_pct": {"skew": steal_of(skewed),
                  "sf01": steal_of(base)},
        "codegen_error_total": [skewed.get("codegen_error_total"),
                                base.get("codegen_error_total")],
        "errors": [skewed.get("errors"), base.get("errors")],
        "flag_rule": "ratio > per-query budget (default 12) and "
                     "skew >= 2s; answer-bound overrides recorded inline",
        "flagged_super_linear": flagged,
        "queries": rows,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    worst = sorted((r["ratio"], n) for n, r in rows.items()
                   if r["ratio"] is not None)[-10:]
    print(f"total {skewed['value']:.1f}s vs sf0.1 {base['value']:.1f}s "
          f"(ratio {out['total_ratio']})")
    print("worst ratios:")
    for r, n in reversed(worst):
        print(f"  {n}: {rows[n]['sf01_sec']}s -> {rows[n]['skew_sec']}s "
              f"({r}x, budget {rows[n]['budget']}x)")
    print(f"flagged: {flagged}")


if __name__ == "__main__":
    main()
