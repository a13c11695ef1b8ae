#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <verifyOutDir> <sfDir>

Reads each <outDir>/<name> parquet dir (Spark result) and runs the matching
SQL from <outDir>/oracle_sql.json in DuckDB with views over <sfDir>'s tables,
then compares: column names (sorted), row counts, and cell values (rows
sorted by all columns). Exact equality for ints/strings; exact for doubles
(driver hash-matches, so bit-parity is the bar); numeric equality for
Decimal with a warning when scales differ.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
from decimal import Decimal

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if pd.isna(a) and pd.isna(b):
        return True, None
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True, None
        return False, f"double mismatch {a!r} vs {b!r}"
    if isinstance(a, Decimal) or isinstance(b, Decimal):
        if Decimal(str(a)) == Decimal(str(b)):
            warn = None
            if str(a) != str(b):
                warn = f"decimal repr differs: {a} vs {b}"
            return True, warn
        return False, f"decimal mismatch {a} vs {b}"
    if hasattr(a, "isoformat") and hasattr(b, "isoformat"):
        return (a == b), (None if a == b else f"ts {a} vs {b}")
    ok = a == b
    return ok, None if ok else f"{a!r} vs {b!r}"

def main(out_dir, sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    raw = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify emits each oracle under both '<name>' and '<name>.parquet'
    # (driver keys by output-dir name); collapse to one logical entry.
    oracle = {}
    for k, v in raw.items():
        oracle[k[:-len(".parquet")] if k.endswith(".parquet") else k] = v
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}.parquet"
        if not os.path.isdir(spark_dir):
            spark_dir = f"{out_dir}/{name}"  # legacy layout
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        got = norm(con.execute(
            f"SELECT * FROM read_parquet({files!r})").df())
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        bad = []
        warns = []
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c], exp[c])):
                ok, msg = cmp_cell(a, b)
                if not ok:
                    bad.append(f"  [{c}][row {i}]: {msg}")
                    if len(bad) > 5:
                        break
                elif msg:
                    warns.append(f"  [{c}][row {i}]: WARN {msg}")
            if len(bad) > 5:
                break
        if bad:
            print(f"FAIL {name}:")
            print("\n".join(bad[:6]))
            n_fail += 1
        else:
            extra = f" ({len(warns)} repr warns, e.g.{warns[0]})" if warns else ""
            print(f"PASS {name}: {len(got)} rows{extra}")
            n_pass += 1
    # Rows-only sweep (driver behavior for queries lacking oracle SQL):
    # pandas-load + sort every result dir NOT covered above — catches
    # outputs the driver's checker can't even normalize (e.g. array cols).
    for d in sorted(os.listdir(out_dir)):
        base = d[:-len(".parquet")] if d.endswith(".parquet") else d
        if base in oracle or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        files = glob.glob(f"{out_dir}/{d}/*.parquet")
        if not files:
            print(f"FAIL {base}: rows-only: no parquet files")
            n_fail += 1
            continue
        try:
            df = pd.concat([pd.read_parquet(f) for f in files])
            df = df.reindex(sorted(df.columns), axis=1)
            if len(df):
                df = df.sort_values(by=list(df.columns), kind="mergesort",
                                    na_position="first")
            print(f"PASS {base}: rows-only, {len(df)} rows")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {base}: rows-only load/sort: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
