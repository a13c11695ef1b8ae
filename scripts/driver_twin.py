#!/usr/bin/env python3
"""Driver-hash twin: models the driver's hash gate as str()-equality of
sorted cell matrices (validated against CORRECTNESS_r02.json: every
hash_match:false row str-mismatches, every hash_match:true row str-matches).

Usage: driver_twin.py <verifyOutDir> <sfDir> [--validate CORRECTNESS.json] [name ...]
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

def cells(df):
    return [[str(v) for v in row] for row in df.itertuples(index=False)]

def main(argv):
    out_dir, sf_dir = argv[0], argv[1]
    validate = None
    rest = argv[2:]
    if rest and rest[0] == "--validate":
        validate = json.load(open(rest[1])); rest = rest[2:]
    only = set(rest)
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
    n_pass = n_fail = n_agree = n_disagree = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True))
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
        diff = None
        if ok:
            cg, ce = cells(got), cells(exp)
            for i, (rg, re_) in enumerate(zip(cg, ce)):
                if rg != re_:
                    cols = list(got.columns)
                    d = [(cols[j], a, b) for j, (a, b) in enumerate(zip(rg, re_)) if a != b]
                    diff = f"row {i}: " + "; ".join(f"[{c}] {a!r} vs {b!r}" for c, a, b in d[:3])
                    ok = False
                    break
        else:
            diff = (f"columns {list(got.columns)} vs {list(exp.columns)}"
                    if list(got.columns) != list(exp.columns)
                    else f"rows {len(got)} vs {len(exp)}")
        verdict = "PASS" if ok else "FAIL"
        if ok: n_pass += 1
        else:  n_fail += 1
        extra = ""
        if validate is not None:
            drv = validate.get(f"{name}.parquet", {})
            dh = drv.get("hash_match")
            if dh is None:
                extra = " [driver: n/a]"
            elif dh == ok:
                n_agree += 1; extra = " [driver agrees]"
            else:
                n_disagree += 1; extra = f" [DRIVER DISAGREES: hash_match={dh}]"
        print(f"{verdict} {name}{extra}" + (f"\n  {diff}" if diff else ""))
    print(f"== {n_pass} pass / {n_fail} fail"
          + (f" | twin-vs-driver: {n_agree} agree, {n_disagree} disagree"
             if validate is not None else "") + " ==")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:]) else 0)
