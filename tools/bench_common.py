"""Shared helpers for the bench-merge tools (ADVICE r18: prelaunch_of
was copy-pasted identically into mk_bench_scale/sf1/skew)."""


def prelaunch_of(r):
    """Pre-JVM loadavg of every contributing run. ADVICE r17: when an
    input artifact predates the field, a bare [null] reads as idle-gate
    evidence that is actually absent — emit an explicit marker.
    ADVICE r18: key-presence tested with `in` + is-not-None, not
    truthiness — an explicitly-recorded EMPTY runs list means 'recorded
    as empty' (a tool bug worth surfacing as-is), not 'absent'."""
    if r.get("loadavg_prelaunch_runs") is not None:
        return r["loadavg_prelaunch_runs"]
    if r.get("loadavg_prelaunch") is not None:
        return [r["loadavg_prelaunch"]]
    return "unrecorded"
