"""Shared helpers for the bench-merge tools (ADVICE r18: prelaunch_of
was copy-pasted identically into mk_bench_scale/sf1/skew)."""


def prelaunch_of(r):
    """Pre-JVM loadavg of every contributing run. ADVICE r17: when an
    input artifact predates the field, a bare [null] reads as idle-gate
    evidence that is actually absent — emit an explicit marker.
    ADVICE r18: key-presence tested with `in` + is-not-None, not
    truthiness — an explicitly-recorded EMPTY runs list means 'recorded
    as empty' (a tool bug worth surfacing as-is), not 'absent'."""
    runs = runs_of(r)
    if runs is not None:
        return runs
    if r.get("loadavg_prelaunch") is not None:
        return [r["loadavg_prelaunch"]]
    return "unrecorded"


def runs_of(r):
    """The per-run prelaunch list, or None when the key is absent.
    ADVICE r19: mk_bench_scale's hygiene guard kept its own truthiness
    copy of the runs-key presence logic, so an explicitly-recorded
    EMPTY list fell back to the scalar field there while prelaunch_of
    surfaced it as [] — provenance and the guard could disagree on the
    same artifact. ONE presence rule (`is not None`), used by both."""
    if r.get("loadavg_prelaunch_runs") is not None:
        return r["loadavg_prelaunch_runs"]
    return None


def assert_idle(name, r, pre_bound, start_bound=8.0):
    """Shared idle-at-start guard for the merge tools (r20: the three
    mk_bench_* tools each carried a near-identical copy; skew/sf1's
    checked only the scalar field, so a min-merged input whose runs
    list held a contended run slipped their guard). Checks EVERY
    contributing run's prelaunch loadavg < pre_bound; falls back to the
    lenient post-warmup loadavg_start < start_bound only when no
    prelaunch evidence exists. GRAFT_BENCH_ALLOW_LOAD=1 overrides
    (debug only)."""
    import os
    runs = runs_of(r)
    pres = runs if runs is not None else [r.get("loadavg_prelaunch")]
    assert pres, \
        f"{name} artifact records an EMPTY loadavg_prelaunch_runs " \
        "list — a merge-tool bug, not idle evidence; rebuild the input"
    if all(p is not None for p in pres):
        ok = all(float(str(p).split()[0]) < pre_bound for p in pres)
    else:
        ok = float(str(r.get("loadavg_start", "0")).split()[0]) < start_bound
    assert ok or os.environ.get("GRAFT_BENCH_ALLOW_LOAD"), \
        f"{name} artifact started under load (prelaunch={pres!r}, " \
        f"start={r.get('loadavg_start')!r}); re-run on an idle machine"


def steal_of(r):
    """Hypervisor steal share over the run's measured passes (r20:
    Bench samples /proc/stat around the passes — loadavg cannot see
    co-tenant steal). A min-merged input carries the per-run list;
    a raw run the scalar; inputs predating the field read as
    'unrecorded'."""
    if r.get("steal_pct_runs") is not None:
        return r["steal_pct_runs"]
    if r.get("steal_pct") is not None:
        return [r["steal_pct"]]
    return "unrecorded"
