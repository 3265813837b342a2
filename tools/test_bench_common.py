"""Tests for bench_common (run: python3 tools/test_bench_common.py).
Pins the ADVICE r19 contract: runs-key presence is decided once
(`is not None`, runs_of) and shared by provenance (prelaunch_of) and
the merge-tool hygiene guard (assert_idle) — an explicitly-empty runs
list is surfaced/refused, never silently scalar-fallback'd."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_common as bc


def expect_refusal(fn, label):
    try:
        fn()
    except AssertionError:
        return
    raise SystemExit(f"FAIL: {label}")


def main():
    # ONE presence rule: is-not-None, not truthiness
    assert bc.runs_of({}) is None
    assert bc.runs_of({"loadavg_prelaunch_runs": []}) == []
    assert bc.runs_of({"loadavg_prelaunch_runs": ["0.5 0.4 0.3"]}) == \
        ["0.5 0.4 0.3"]
    # provenance mirrors it
    assert bc.prelaunch_of({"loadavg_prelaunch_runs": []}) == []
    assert bc.prelaunch_of({"loadavg_prelaunch": "0.5 0.4 0.3"}) == \
        ["0.5 0.4 0.3"]
    assert bc.prelaunch_of({}) == "unrecorded"
    # guard accepts idle evidence at the given bound
    bc.assert_idle("t", {"loadavg_prelaunch": "0.5 0.4 0.3"}, 1.1)
    bc.assert_idle("t", {"loadavg_prelaunch_runs": ["0.5 0 0",
                                                    "0.9 0 0"]}, 1.1)
    # ONE contended contributing run fails the whole list
    expect_refusal(
        lambda: bc.assert_idle(
            "t", {"loadavg_prelaunch_runs": ["0.5 0 0", "1.5 0 0"]}, 1.1),
        "contended run slipped the per-run check")
    # explicitly-empty runs list is a tool bug, not absent evidence —
    # must refuse even when the scalar field looks idle
    expect_refusal(
        lambda: bc.assert_idle(
            "t", {"loadavg_prelaunch_runs": [],
                  "loadavg_prelaunch": "0.1 0 0"}, 1.1),
        "empty runs list slipped")
    # unrecorded prelaunch falls back to the lenient loadavg_start bound
    bc.assert_idle("t", {"loadavg_start": "3.0 0 0"}, 1.1)
    expect_refusal(
        lambda: bc.assert_idle("t", {"loadavg_start": "12.0 0 0"}, 1.1),
        "co-tenant storm slipped the fallback bound")
    print("bench_common: all tests pass")


if __name__ == "__main__":
    main()
