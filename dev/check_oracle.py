#!/usr/bin/env python3
"""Dev-only mimic of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff exactly. Not part of the
library (driver-side python is available in this container)."""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        got = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
            continue
        for c in w.columns:
            if str(w[c].dtype) != str(g[c].dtype):
                print(f"  DTYPE {name}.{c}: duckdb={w[c].dtype} spark={g[c].dtype}")
        if len(w) != len(g):
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
            continue
        # exact value compare (driver hashes values — we need bitwise equality)
        try:
            eq = w.reset_index(drop=True).astype(object).where(pd.notnull(w), None) \
                 .equals(g.reset_index(drop=True).astype(object).where(pd.notnull(g), None))
        except Exception as e:
            eq = False
        if eq:
            print(f"OK   {name} ({len(w)} rows)")
            n_ok += 1
        else:
            diff = (w.values != g.values)
            print(f"FAIL {name}: value mismatch ({diff.sum()} cells)")
            for i in range(min(len(w), 2000)):
                if (w.iloc[i].values != g.iloc[i].values).any():
                    print("  want:", dict(w.iloc[i]))
                    print("  got :", dict(g.iloc[i]))
                    break
    print(f"== {n_ok}/{len(oracle)} oracle-matched")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
