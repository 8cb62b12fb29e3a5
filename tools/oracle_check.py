#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB with the sfDir parquet tables registered as views, and
compares against the Spark-written parquet at <verifyOutDir>/<name>/ —
columns sorted by name, rows sorted, values stringified then hashed.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}".rstrip("0").rstrip(".")
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        if hasattr(v, "isoformat"):  # datetime-like: compare at µs
            try:
                return pd.Timestamp(v).floor("us").isoformat()
            except Exception:
                return str(v)
        return str(v)
    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for tname in TABLES:
        p = f"{sf_dir}/{tname}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in spark_files])
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        hg, hw = canon(got), canon(want)
        rows_ok = len(got) == len(want)
        cols_ok = sorted(got.columns) == sorted(want.columns)
        if hg == hw:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}, cols_ok={cols_ok}, hash {hg[:8]} vs {hw[:8]}")
            if cols_ok and rows_ok:
                # show first differing row for debugging
                g = got.reindex(sorted(got.columns), axis=1).astype(str).sort_values(list(sorted(got.columns))).reset_index(drop=True)
                w = want.reindex(sorted(want.columns), axis=1).astype(str).sort_values(list(sorted(want.columns))).reset_index(drop=True)
                diff = (g != w).any(axis=1)
                if diff.any():
                    i = diff.idxmax()
                    print(f"  first diff row {i}:\n    spark: {g.iloc[i].to_dict()}\n    duck : {w.iloc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
