#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the same tables,
and compares row count, schema (sorted column names), and cell values
(column-name-sorted, exact for ints/strings, tiny epsilon report for floats).
"""
import json, math, struct, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    return df

def canon_dtypes(df):
    """Collapse representation-only dtype differences between the two
    readers (pd.read_parquet vs duckdb .df()) so the local gate tracks the
    driver's hash semantics: integer WIDTH differences (int32 vs int64,
    nullable Int64) and datetime UNIT differences (ns vs us) hash equal on
    the driver; object-typed columns (DuckDB HUGEINT/DECIMAL) do NOT and
    must stay a distinct dtype so that class is still caught locally."""
    out = df.copy()
    for c in out.columns:
        k = str(out[c].dtype)
        if k.startswith(("int", "uint", "Int", "UInt")):
            # nullable ints with nulls promote to float64 in BOTH readers'
            # default paths; without nulls they are plain int64 values
            out[c] = out[c].astype("float64") if out[c].isna().any() \
                else out[c].astype("int64")
        elif k.startswith(("float", "Float")):
            out[c] = out[c].astype("float64")
        elif k.startswith("bool"):
            out[c] = out[c].astype("bool") if not out[c].isna().any() \
                else out[c].astype("object")
        elif k.startswith("datetime64") and "," not in k:
            out[c] = out[c].astype("datetime64[ns]")
        elif k.startswith("datetime64[") and "," in k:  # tz-aware: unit only
            tz = k.split(",", 1)[1].rstrip("]").strip()
            out[c] = out[c].astype(f"datetime64[ns, {tz}]")
    return out

def compare(name, got, want):
    problems = []
    if list(sorted(got.columns)) != list(sorted(want.columns)):
        return [f"schema mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"]
    if len(got) != len(want):
        return [f"rowcount mismatch: spark={len(got)} oracle={len(want)}"]
    got, want = canon_dtypes(norm(got)), canon_dtypes(norm(want))
    # Dtype strictness AFTER canonicalization: the driver hashes physical
    # values, so a DuckDB HUGEINT (pandas object) vs Spark int64 diverges
    # even when every value is equal. Catch that class locally — but not
    # width/unit-only differences the driver hashes as equal (see
    # canon_dtypes).
    for c in got.columns:
        if str(got[c].dtype) != str(want[c].dtype):
            problems.append(
                f"col {c}: dtype mismatch spark={got[c].dtype} oracle={want[c].dtype}"
                " (driver hash would diverge — cast in the oracle SQL)")
    if problems:
        return problems
    for c in got.columns:
        a, b = got[c].values, want[c].values
        for i in range(len(a)):
            x, y = a[i], b[i]
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or pd.isna(x)
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            if xn and yn:
                continue
            if xn != yn:
                problems.append(f"col {c} row {i}: null mismatch spark={x} oracle={y}")
            elif isinstance(x, float) or isinstance(y, float):
                # Compare BIT PATTERNS, not ==: the driver hashes physical
                # bytes, so -0.0 vs +0.0 (== under IEEE) still hash-diverges.
                # Round 10 shipped q_ar_spread red exactly because this line
                # used x != y and -0.0 == 0.0 is True in Python.
                if struct.pack("<d", float(x)) != struct.pack("<d", float(y)):
                    problems.append(f"col {c} row {i}: float diff spark={x!r} oracle={y!r} (d={abs(float(x)-float(y)):.3e})")
            elif x != y:
                problems.append(f"col {c} row {i}: value diff spark={x!r} oracle={y!r}")
            if len(problems) >= 5:
                return problems
    return problems

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"   {p}")
            fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
