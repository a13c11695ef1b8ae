#!/usr/bin/env python3
"""Strict driver-twin check: dtype + exact-repr parity between the Spark
parquet results and the DuckDB oracle. The driver's hash gate is stricter
than oracle_check.py's numeric compare — rows can match numerically while
the hash differs (e.g. Decimal object vs float64, int64 vs float64,
Decimal scale '1.5' vs '1.50'). This script reports every column whose
pandas dtype or cell repr differs so the oracle/Spark typing can be pinned.

Usage: hash_check.py <verifyOutDir> <sfDir> [name ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df

def main(out_dir, sf_dir, only):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    raw = json.load(open(f"{out_dir}/oracle_sql.json"))
    oracle = {}
    for k, v in raw.items():
        oracle[k[:-len(".parquet")] if k.endswith(".parquet") else k] = v
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True))
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        probs = []
        if list(got.columns) != list(exp.columns):
            probs.append(f"columns {list(got.columns)} vs {list(exp.columns)}")
        elif len(got) != len(exp):
            probs.append(f"rows {len(got)} vs {len(exp)}")
        else:
            for c in got.columns:
                dg, de = str(got[c].dtype), str(exp[c].dtype)
                if dg != de:
                    probs.append(f"[{c}] dtype spark={dg} oracle={de} "
                                 f"(e.g. {got[c].iloc[0]!r} vs {exp[c].iloc[0]!r})")
                    continue
                for i, (a, b) in enumerate(zip(got[c], exp[c])):
                    if repr(a) != repr(b) and not (pd.isna(a) and pd.isna(b)):
                        probs.append(f"[{c}][row {i}] repr {a!r} vs {b!r}")
                        break
        if probs:
            print(f"FAIL {name}:")
            for p in probs[:8]:
                print(f"  {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows strict")
            n_pass += 1
    print(f"== {n_pass} strict-pass / {n_fail} strict-fail ==")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2], set(sys.argv[3:])) else 0)
