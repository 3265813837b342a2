#!/usr/bin/env python3
"""Merge persist-mode and local-mode Bench runs at one or more scales
into BENCH_persist.json: the price of the executor-loss-safe barrier
mode (persist(DISK_ONLY) laziness + reliable checkpoint() for the
iterative loops), per scale, with the per-query deltas that carry it.

r15 priced persist at sf0.1 only (+16%); reliable-checkpoint I/O grows
with data, so VERDICT r15 next #5 asks for the 10x point too.

Usage: mk_bench_persist.py <out> <label:persist_raw:local_raw> ...
e.g.   mk_bench_persist.py BENCH_persist.json \
           sf0.1:/tmp/p01.json:/tmp/l01.json \
           sf1:/tmp/p10.json:/tmp/l10.json
"""
import json
import sys

out = sys.argv[1]
sections = {}
for spec in sys.argv[2:]:
    label, p_path, l_path = spec.split(":", 2)
    p = json.load(open(p_path))
    l = json.load(open(l_path))
    assert p.get("barrier") == "persist", f"{p_path} is not a persist run"
    assert l.get("barrier", "local") == "local", f"{l_path} is not local"
    assert p.get("sf") == l.get("sf"), \
        f"scale mismatch: {p.get('sf')} vs {l.get('sf')}"
    assert not p.get("subset") and not l.get("subset"), \
        "refusing subset artifacts"
    pq, lq = p["queries"], l["queries"]
    assert set(pq) == set(lq), "query inventories differ"
    deltas = sorted(
        ((k, round(pq[k] - lq[k], 3), round(pq[k], 3), round(lq[k], 3))
         for k in pq if pq[k] is not None and lq[k] is not None),
        key=lambda t: -t[1])
    sections[label] = {
        "sf": p["sf"],
        "persist_sec": round(p["value"], 2),
        "local_sec": round(l["value"], 2),
        "delta_pct": round(100.0 * (p["value"] - l["value"]) / l["value"], 1),
        "n_queries": len(pq),
        "loadavg_prelaunch_persist": p.get("loadavg_prelaunch",
                                           "unrecorded"),
        "loadavg_prelaunch_local": l.get("loadavg_prelaunch",
                                         "unrecorded"),
        # the ten queries paying the most for the safe mode, absolute
        "top_deltas": [
            {"query": k, "delta_sec": d, "persist_sec": ps, "local_sec": ls}
            for k, d, ps, ls in deltas[:10]],
    }
json.dump({"metric": "persist_price", "scales": sections},
          open(out, "w"), indent=1)
print(json.dumps({k: {kk: v[kk] for kk in
                      ("persist_sec", "local_sec", "delta_pct")}
                  for k, v in sections.items()}))
