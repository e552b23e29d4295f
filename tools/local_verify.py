#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in outDir, executes the matching oracle SQL
from oracle_sql.json in DuckDB over the same sfDir parquet tables, then
canonicalizes both sides (columns sorted by name, rows sorted, doubles
rounded to 1e-9) and hash-compares.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype("float64").round(9)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list,)) or
                type(v).__name__ == "ndarray" else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def h(df):
    return hashlib.sha256(df.to_csv(index=False, float_format="%.9f").encode()).hexdigest()[:16]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_weak = 0
    for d in sorted(glob.glob(f"{out_dir}/*")):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        got = pq.read_table(d).to_pandas()
        if name not in oracles:
            status = "WEAK-OK(rows>0)" if len(got) > 0 else "WEAK-EMPTY"
            n_weak += 1
            print(f"  {name:35s} {status} rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  {name:35s} ORACLE-SQL-ERROR: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        schema_ok = list(g.columns) == list(e.columns)
        rows_ok = len(g) == len(e)
        hash_ok = schema_ok and rows_ok and h(g) == h(e)
        if hash_ok:
            n_pass += 1
            print(f"  {name:35s} PASS rows={len(g)}")
        else:
            n_fail += 1
            print(f"  {name:35s} FAIL schema_ok={schema_ok} rows={len(g)}/{len(e)}")
            if schema_ok and rows_ok:
                import pandas as pd
                neq = (g != e) & ~(g.isna() & e.isna())
                bad = neq.any(axis=1)
                print("    first diffs:")
                print(pd.concat([g[bad].head(3).add_suffix("_got"),
                                 e[bad].head(3).add_suffix("_exp")], axis=1).to_string())
            else:
                print(f"    got cols: {list(g.columns)}")
                print(f"    exp cols: {list(e.columns)}")
    print(f"PASS={n_pass} FAIL={n_fail} WEAK={n_weak}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
