#!/usr/bin/env python3
"""Merge a 10x-replica Bench run with a same-code sf0.1 run into
BENCH_sf1.json: per-query seconds at both scales plus the 10x/1x
ratio, flagging anything scaling worse than ~linear-in-data.

Usage: mk_bench_sf1.py <bench_sf1_raw.json> <bench_sf01_raw.json> <out>

At fixed local[32] parallelism, 10x data should cost <=10x plus
shuffle/spill overhead; the flag threshold is 12x. Sub-second sf0.1
queries are noise-dominated (JVM/scheduling floor ~0.1-0.3 s), so the
flag additionally requires the 10x side to cost >= 2 s — a 0.2 s ->
2.5 s "12.5x" is floor arithmetic, not a scaling pathology.
"""
import json
import sys


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from bench_common import prelaunch_of, assert_idle, steal_of

a = json.load(open(sys.argv[1]))  # 10x
b = json.load(open(sys.argv[2]))  # sf0.1
# artifact-hygiene guards (VERDICT r13 wrong #1): scale and fullness
# are asserted, not assumed
assert b.get("sf") == "/root/testdata/sf0.1", \
    f"base artifact sf={b.get('sf')!r}, expected /root/testdata/sf0.1"
assert a.get("sf") != b.get("sf"), "both artifacts declare the same sf dir"
assert not a.get("subset") and not b.get("subset"), \
    "refusing subset artifacts as scale evidence"
# idle-at-start guard: contended ratios are not scaling evidence.
# Prefer loadavg_prelaunch (recorded by tools/run_bench.sh before the
# JVM starts; must be near-idle); loadavg_start is self-inflated by the
# in-JVM warm-up, so its fallback bound is lenient and only catches
# co-tenant storms. GRAFT_BENCH_ALLOW_LOAD=1 overrides (debug only).
# r20: shared guard (bench_common.assert_idle) — the old scalar-only
# copy here ignored a min-merged input's per-run list, so one contended
# contributing run could slip through.
for name, r in (("10x", a), ("base", b)):
    assert_idle(name, r, pre_bound=2.0)
qa, qb = a["queries"], b["queries"]
rows = {}
flagged = []
for name in sorted(qa):
    s1, s01 = qa[name], qb.get(name)
    ratio = round(s1 / s01, 2) if s01 else None
    rows[name] = {"sf1_sec": round(s1, 3), "sf01_sec": round(s01, 3)
                  if s01 is not None else None, "ratio": ratio}
    if ratio is not None and ratio > 12 and s1 >= 2.0:
        flagged.append(name)
out = {
    "metric": "total_sf1",
    "value": a["value"],
    "unit": "sec",
    "sf1_dir": a.get("sf"),
    "sf01_total": b["value"],
    "total_ratio": round(a["value"] / b["value"], 2),
    "loadavg": {"sf1": [a.get("loadavg_start"), a.get("loadavg_end")],
                "sf01": [b.get("loadavg_start"), b.get("loadavg_end")]},
    # pre-JVM loadavg of every contributing run (the idle-gate evidence)
    "loadavg_prelaunch": {"sf1": prelaunch_of(a), "sf01": prelaunch_of(b)},
    "steal_pct": {"sf1": steal_of(a),
                  "sf01": steal_of(b)},
    "codegen_error_total": [a.get("codegen_error_total"),
                            b.get("codegen_error_total")],
    "flag_threshold": "ratio > 12 and sf1 >= 2s",
    "flagged_super_linear": flagged,
    "queries": rows,
}
json.dump(out, open(sys.argv[3], "w"), indent=1)
worst = sorted((r["ratio"], n) for n, r in rows.items()
               if r["ratio"] is not None)[-8:]
print(f"total {a['value']:.1f}s vs sf0.1 {b['value']:.1f}s "
      f"(ratio {out['total_ratio']})")
print("worst ratios:")
for r, n in reversed(worst):
    print(f"  {n}: {rows[n]['sf01_sec']}s -> {rows[n]['sf1_sec']}s "
          f"({r}x)")
print(f"flagged: {flagged}")
