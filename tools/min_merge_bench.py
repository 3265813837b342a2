#!/usr/bin/env python3
"""Min-merge per-query seconds across repeated same-code Bench runs
(each already min-of-2 internally) into one BENCH_FULL-shaped JSON.
Co-tenant interference on this host is sustained (minutes), so a
single run's interleaved min-of-2 cannot shed it; the min across
runs spread over a longer window can.

THIS TOOL IS THE ONLY WRITER OF BENCH_FULL.json (VERDICT r14 wrong
#2): graft.Bench emits raw runs as BENCH_RAW_LAST.json (gitignored)
and refuses a BENCH_FULL target, so a driver end-of-round raw run can
no longer clobber the committed idle-window merge. The merged
artifact always carries `min_of_runs`, distinguishing it from any raw
single run.

Usage:
  min_merge_bench.py out.json run1.json run2.json [...]"""
import json
import sys

runs = [json.load(open(p)) for p in sys.argv[2:]]
# artifact-hygiene guards (VERDICT r13 wrong #1: a 10x pressure-run
# artifact was min-merged over the sf0.1 evidence because nothing
# checked the scale): every input must declare the SAME sf dir, and
# subset runs (SPARK_GRAFT_BENCH_QUERIES) are never full-suite evidence
sfs = {r.get("sf") for r in runs}
assert len(sfs) == 1, f"refusing to merge runs with mixed sf dirs: {sfs}"
# a persist-mode run prices different barriers — never min-merge it
# with local-mode evidence
modes = {r.get("barrier", "local") for r in runs}
assert len(modes) == 1, \
    f"refusing to merge runs with mixed barrier modes: {modes}"
for p, r in zip(sys.argv[2:], runs):
    assert not r.get("subset"), f"{p} is a subset run, not full-suite"
    assert set(r["queries"]) == set(runs[0]["queries"]), \
        f"{p} has a different query inventory than {sys.argv[2]}"
base = dict(runs[0])
qs = {}
for q in runs[0]["queries"]:
    qs[q] = min(r["queries"][q] for r in runs if q in r["queries"])
base["queries"] = qs
base["value"] = sum(qs.values())
base["min_of_runs"] = len(runs)
base["loadavg_runs"] = [
    [r.get("loadavg_start"), r.get("loadavg_end")] for r in runs]
# pre-JVM idleness per contributing run (mk_bench_scale gates on
# these: EVERY run of a merged ratio input must have started idle)
base["loadavg_prelaunch_runs"] = [
    r.get("loadavg_prelaunch") for r in runs]
# hypervisor steal share over each run's measured passes (r20: loadavg
# cannot see co-tenant steal — prelaunch 0.22 with the suite 3x slow;
# Bench samples /proc/stat around the passes). Carried per run so a
# reader can tell which contributing windows were stolen from.
base["steal_pct_runs"] = [r.get("steal_pct") for r in runs]
json.dump(base, open(sys.argv[1], "w"), indent=1)
print(f"merged {len(runs)} runs -> total {base['value']:.1f}s")
