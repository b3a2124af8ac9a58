#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json, runs each SQL in DuckDB against the
parquet tables in <sf_dir>, and compares with the Spark parquet dump at
<verify_out_dir>/<name>/. Compare: sort columns by name, sort rows, compare
values cell-by-cell (floats to 1e-9 rel tolerance for diagnosis; also report
exact-string hash equality which is what the real driver likely does).
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def cellstr(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def dfhash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cellstr(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    # optional --skip=a,b,c (used by fuzz_oracle.py for the closure-family
    # oracles whose recursive CTE is cubic in clique size): names excluded
    # from THIS compare only — the verify artifact is never rewritten, so
    # a later unfiltered re-run sees the full oracle set.
    skip = set()
    for a in sys.argv[3:]:
        if a.startswith("--skip="):
            skip |= {s.strip() for s in a[len("--skip="):].split(",") if s.strip()}
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if skip:
        dropped = sorted(skip & oracle.keys())
        oracle = {k: v for k, v in oracle.items() if k not in skip}
        print(f"skipping {len(dropped)} oracles: {', '.join(dropped)}")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
        except Exception:
            pass
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        d, s = norm(ddf), norm(sdf)
        if list(d.columns) != list(s.columns):
            print(f"FAIL {name}: columns duckdb={list(d.columns)} spark={list(s.columns)}")
            n_fail += 1
            continue
        if len(d) != len(s):
            print(f"FAIL {name}: rows duckdb={len(d)} spark={len(s)}")
            n_fail += 1
            continue
        hd, hs = dfhash(d), dfhash(s)
        if hd == hs:
            print(f"PASS {name} ({len(d)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: hash mismatch ({len(d)} rows)")
            # show first differing cells
            shown = 0
            for i in range(len(d)):
                for c in d.columns:
                    a, b = d.iloc[i][c], s.iloc[i][c]
                    if cellstr(a) != cellstr(b):
                        print(f"   row {i} col {c}: duckdb={a!r} spark={b!r}")
                        shown += 1
                        if shown >= 5:
                            break
                if shown >= 5:
                    break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
