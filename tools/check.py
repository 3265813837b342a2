#!/usr/bin/env python3
"""Value-compare Spark Verify dumps against DuckDB oracle SQL.

Usage: check.py <verify_out_dir> <sf_dir> [json_out]

With json_out, also writes a per-query artifact in the driver's
CORRECTNESS_r{N}.json shape (rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err); hash_match here means the value-compare
passed (np.isclose on floats, exact elsewhere).
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)

con = duckdb.connect()
# large-SF safety: without a cap DuckDB grows intermediates in RAM
# (the simhash/minhash oracles unnest per-word rows — observed >100 GB
# RSS on the 10x replica); a memory_limit + temp_directory makes it
# spill instead of flirting with the OOM killer
mem = os.environ.get("CHECK_DUCKDB_MEM", "48GB")
tmp = os.environ.get("CHECK_DUCKDB_TMP", "/tmp/duckdb_spill")
os.makedirs(tmp, exist_ok=True)
con.execute(f"SET memory_limit='{mem}'")
con.execute(f"SET temp_directory='{tmp}'")
if os.environ.get("CHECK_DUCKDB_THREADS"):
    con.execute(
        f"SET threads={int(os.environ['CHECK_DUCKDB_THREADS'])}")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.splitext(os.path.basename(p))[0]
    # driver testdata ships single files; ScaleTestdata replicas ship
    # Spark-written DIRECTORIES of part files under the same name
    src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

def float_treated(s: pd.Series) -> bool:
    """Columns that force float treatment on BOTH frames: genuine
    floats, plus decimal/object columns (DuckDB returns HUGEINT sums
    and DECIMAL aggregates that way) which may carry fractional or
    beyond-int64 values."""
    return (pd.api.types.is_float_dtype(s)
            or str(s.dtype).startswith("decimal")
            or s.dtype == object)

def joint_float_cols(a: pd.DataFrame, b: pd.DataFrame) -> set:
    """Decide the float set ONCE across both frames so canon() builds
    identical sort-key orders for each (a column float-treated in one
    frame but exact in the other would misalign the row sort)."""
    return {c for c in a.columns
            if float_treated(a[c]) or (c in b.columns
                                       and float_treated(b[c]))}

def canon(df: pd.DataFrame, as_float: set) -> pd.DataFrame:
    """Sorted columns + rows. Columns in `as_float` are coerced to
    float64 and later compared with np.isclose; integer columns stay
    int64 and are compared EXACTLY (ADVICE r16: casting ints to
    float64 loses precision above 2^53 and gives large ids/counts a
    magnitude-proportional tolerance — a false-pass risk). Float
    values are kept UNROUNDED (compared later with np.isclose);
    rounding is used only to build a deterministic sort key, so
    boundary-straddling values (e.g. x.4999995 vs x.5000005) can't
    false-FAIL an exact compare of rounded representations."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if c in as_float:
            try:
                df[c] = df[c].astype("float64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    key = df.copy()
    for c in key.columns:
        if pd.api.types.is_float_dtype(key[c]):
            key[c] = key[c].round(6)
    # Sort on NON-float columns first (every query output carries exact
    # id/group columns): rows then align positionally on exact keys, and
    # the rounded float keys only break ties. A float straddling a
    # rounding boundary (x.4999995 vs x.5000005) can therefore misalign
    # only rows that tie on every exact column — and that residual case
    # is handled by the tolerant re-match fallback below.
    exact_cols = [c for c in key.columns
                  if not pd.api.types.is_float_dtype(key[c])]
    float_cols = [c for c in key.columns
                  if pd.api.types.is_float_dtype(key[c])]
    order = key.sort_values(by=exact_cols + float_cols,
                            kind="mergesort").index
    return df.loc[order].reset_index(drop=True)

def rematch(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    """Tolerant fallback for rows the positional compare flagged: greedy
    bipartite match where a pair matches iff every float column is
    np.isclose and every other column is exactly equal. Rescues the
    rounding-boundary sort misalignment without loosening the compare —
    it passes only if EVERY flagged row finds a distinct partner."""
    if len(a) != len(b) or len(a) > 2000:  # genuine fails stay fails
        return False
    a = a.reset_index(drop=True)
    b = b.reset_index(drop=True)
    used = np.zeros(len(b), dtype=bool)
    fcols = [c for c in a.columns if pd.api.types.is_float_dtype(a[c])
             and pd.api.types.is_float_dtype(b[c])]
    ecols = [c for c in a.columns if c not in fcols]
    for i in range(len(a)):
        cand = ~used
        for c in ecols:
            av = a.at[i, c]
            cand &= ((b[c] == av) |
                     (pd.isna(b[c]) & pd.isna(av))).to_numpy()
        for c in fcols:
            av = a.at[i, c]
            cand &= (np.isclose(b[c], av, rtol=1e-6, atol=1e-9) |
                     (b[c].isna() & pd.isna(av))).to_numpy()
        j = np.flatnonzero(cand)
        if len(j) == 0:
            return False
        used[j[0]] = True
    return True

def mismatches(a: pd.DataFrame, b: pd.DataFrame) -> pd.Series:
    """Per-row any-column mismatch: np.isclose for float columns
    (rtol=1e-6, atol=1e-9, NaN==NaN), exact for everything else."""
    bad = pd.Series(False, index=a.index)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) and \
                pd.api.types.is_float_dtype(b[c]):
            col_ok = np.isclose(a[c], b[c], rtol=1e-6, atol=1e-9) | \
                (a[c].isna() & b[c].isna())
            bad |= ~col_ok
        else:
            bad |= (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
    return bad

json_out = sys.argv[3] if len(sys.argv) > 3 else None
report = {}

def record(name, rows_m, schema_m, hash_m, s_rows, o_rows, err=None):
    report[name] = {"rows_match": rows_m, "schema_match": schema_m,
                    "hash_match": hash_m, "spark_rows": s_rows,
                    "oracle_rows": o_rows, "err": err}

ok = fail = 0
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
# CHECK_ONLY: comma-separated query names — lets a harness shard the
# run across parallel processes (the 10x replica's heaviest oracles
# take tens of minutes each; serial order would put them in one tail)
if os.environ.get("CHECK_ONLY"):
    only = set(os.environ["CHECK_ONLY"].split(","))
    names = [n for n in names if n in only]
for qi, name in enumerate(names):
    if os.environ.get("CHECK_PROGRESS"):
        import time
        print(f"[{qi + 1}/{len(names)}] {name} "
              f"@{time.strftime('%H:%M:%S')}", flush=True)
    spark_df = pd.concat(
        [pd.read_parquet(p) for p in
         glob.glob(os.path.join(out_dir, name, "*.parquet"))],
        ignore_index=True)
    sql = oracles.get(name)
    if sql is None:
        print(f"-- {name}: no oracle (rows-only) spark_rows={len(spark_df)}")
        record(name, True, True, True, len(spark_df), None,
               "no oracle (rows-only)")
        ok += 1
        continue
    try:
        oracle_df = con.execute(sql).fetchdf()
        as_float = (joint_float_cols(spark_df, oracle_df)
                    | joint_float_cols(oracle_df, spark_df))
        a, b = canon(spark_df, as_float), canon(oracle_df, as_float)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs "
                  f"{list(b.columns)}")
            record(name, len(a) == len(b), False, False, len(a), len(b))
            fail += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            record(name, False, True, False, len(a), len(b))
            fail += 1
        else:
            bad = mismatches(a, b)
            if int(bad.sum()) > 0 and rematch(a[bad], b[bad]):
                bad[:] = False  # sort-boundary misalignment, rescued
            if int(bad.sum()) == 0:
                record(name, True, True, True, len(a), len(b))
                ok += 1
            else:
                print(f"FAIL {name}: {int(bad.sum())} differing rows; "
                      "first:")
                print(a[bad].head(2))
                print(b[bad].head(2))
                record(name, True, True, False, len(a), len(b),
                       f"{int(bad.sum())} differing rows")
                fail += 1
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: oracle error {e}")
        record(name, False, False, False, len(spark_df), None, str(e))
        fail += 1
if json_out:
    with open(json_out, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
print(f"== {ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
